"""Codec round-trip + fidelity + phash tests (north_rule per-row invariant:
lossless exact, lossy PSNR ≥ 40 dB)."""

import numpy as np
import pytest

from ieps_crawler_ray.functions import image_codec as ic


@pytest.fixture(scope="module")
def imgs():
    return [ic.procedural_image(i) for i in range(8)]


def test_png_roundtrip_exact(imgs):
    for img in imgs:
        data = ic.encode_png(img)
        dec, fmt = ic.decode_image(data)
        assert fmt == "png"
        assert np.array_equal(dec, img)


def test_png_decoder_handles_all_filters():
    # exercise filters 1-4 by hand-crafting rows
    import struct, zlib
    img = ic.procedural_image(3, min_size=16, max_size=16)
    h, w = img.shape[:2]
    # encode with filter 2 (Up) rows after row 0
    raw = bytearray()
    prev = np.zeros(w * 3, np.int32)
    flat = img.reshape(h, w * 3).astype(np.int32)
    for y in range(h):
        f = 0 if y == 0 else 2
        raw.append(f)
        line = flat[y] if f == 0 else (flat[y] - prev) & 0xFF
        raw += bytes(line.astype(np.uint8))
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + ic._png_chunk(b"IHDR", ihdr)
            + ic._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + ic._png_chunk(b"IEND", b""))
    dec = ic.decode_png(data)
    assert np.array_equal(dec, img)


def test_bmp_roundtrip_exact(imgs):
    for img in imgs:
        data = ic.encode_bmp(img)
        dec, fmt = ic.decode_image(data)
        assert fmt == "bmp"
        assert np.array_equal(dec, img)


def test_qjpg_lossy_psnr_over_40(imgs):
    for img in imgs:
        data = ic.encode_qjpg(img)
        dec, fmt = ic.decode_image(data)
        assert fmt == "jpeg"
        assert dec.shape == img.shape
        p = ic.psnr(img, dec)
        assert p >= 40.0, f"PSNR {p:.2f} < 40"


def test_qjpg_smaller_than_raw(imgs):
    img = imgs[0]
    assert len(ic.encode_qjpg(img)) < img.nbytes


def test_phash_properties(imgs):
    h0 = ic.phash64(imgs[0])
    assert ic.phash64(imgs[0]) == h0  # deterministic
    assert -(1 << 63) <= h0 < (1 << 63)
    # lossy roundtrip barely moves the hash; different image moves it a lot
    dec, _ = ic.decode_image(ic.encode_qjpg(imgs[0]))
    assert ic.hamming64(h0, ic.phash64(dec)) <= 6
    dists = [ic.hamming64(h0, ic.phash64(im)) for im in imgs[1:]]
    assert np.median(dists) > 10


def test_procedural_image_deterministic():
    a = ic.procedural_image(7)
    b = ic.procedural_image(7)
    assert np.array_equal(a, b)
    assert a.shape[0] >= 32 and a.shape[1] >= 32
