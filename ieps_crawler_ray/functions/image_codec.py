"""Image encode / decode / perceptual-hash kernels (pure numpy + zlib).

The reference crawler stores image bytes opaquely (``crawldb.sql:61-72``,
``DomainWorkerActor.scala:221-242``); the north_rule adds a decode + phash +
caption stage with per-row fidelity checks (decoded-pixel allclose, PSNR ≥
40 dB for lossy formats, exact caption equality).

This container ships no image libraries (no PIL / opencv / libjpeg), so the
codecs here are from-scratch implementations of public formats:

* ``png``  — real PNG (RGB8, zlib DEFLATE, filters 0–4 on decode, filter 0
  on encode). Lossless.
* ``bmp``  — real BMP (24-bit BGR, bottom-up, BITMAPINFOHEADER). Lossless.
* ``jpeg`` — STAND-IN lossy codec (magic ``QJPG``): 8×8 block DCT-II +
  uniform quantization + zlib, the same transform family as baseline JPEG
  but NOT the JPEG container (no Huffman tables — a real libjpeg would slot
  in here in production). Deterministic, with PSNR ≥ 40 dB at the default
  quantization step; exercises the lossy-fidelity path end to end.

``phash64`` is the classic pHash: area-resize to 32×32 grayscale → 2-D
DCT-II → top-left 8×8 coefficients → median threshold → 64-bit signed int.

All kernels are vectorized numpy and run inside ``map_batches`` stateless
tasks (``batch_format="pyarrow"``); per-image work is a handful of matmuls.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """RGB8 HxWx3 -> PNG bytes (filter 0 rows)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or ilace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * 3
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f = filters[y]
        line = raw[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w * 3, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = line + prior
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-recurrence
            rec = np.empty(w * 3, dtype=np.int32)
            for x in range(w * 3):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 1:
                    rec[x] = line[x] + a
                elif f == 3:
                    rec[x] = line[x] + ((a + b) >> 1)
                else:
                    cc = prior[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    rec[x] = line[x] + pred
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec & 0xFF
    return out.reshape(h, w, 3)


# --------------------------------------------------------------------------
# BMP (24-bit, bottom-up)
# --------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    pad = row_size - w * 3
    bgr = img[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                       2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack("<I", data[10:14])
    hsize, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=row_size * abs(h), offset=data_offset)
    rows = raw.reshape(abs(h), row_size)[:, :w * 3].reshape(abs(h), w, 3)
    img = rows[::-1] if h > 0 else rows
    return np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB


# --------------------------------------------------------------------------
# QJPG — deterministic lossy DCT codec (jpeg stand-in; see module docstring)
# --------------------------------------------------------------------------

_QJPG_MAGIC = b"QJPG"
_QJPG_QSTEP = 6  # uniform quantization step; PSNR ≈ 45 dB on natural-ish data


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    t = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    t[0, :] /= np.sqrt(2.0)
    return t


_DCT8 = _dct_matrix(8)


def _blockify(chan: np.ndarray) -> tuple:
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(chan, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    hh, ww = padded.shape
    blocks = padded.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return blocks, hh, ww


def encode_qjpg(img: np.ndarray, qstep: int = _QJPG_QSTEP) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    coeffs = []
    for ch in range(3):
        blocks, hh, ww = _blockify(img[:, :, ch])
        # DCT-II on both axes of every 8x8 block: T @ B @ T'
        d = np.einsum("ij,abjk,lk->abil", _DCT8, blocks - 128.0, _DCT8)
        q = np.round(d / qstep).astype(np.int16)
        coeffs.append(q)
    payload = zlib.compress(np.concatenate([q.ravel() for q in coeffs])
                            .astype("<i2").tobytes(), 6)
    head = _QJPG_MAGIC + struct.pack("<IIH", w, h, qstep)
    return head + payload


def decode_qjpg(data: bytes) -> np.ndarray:
    if data[:4] != _QJPG_MAGIC:
        raise ValueError("not a QJPG")
    w, h, qstep = struct.unpack("<IIH", data[4:14])
    hh, ww = h + ((-h) % 8), w + ((-w) % 8)
    n_per_chan = (hh // 8) * (ww // 8) * 64
    flat = np.frombuffer(zlib.decompress(data[14:]), dtype="<i2").astype(np.float64)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        q = flat[ch * n_per_chan:(ch + 1) * n_per_chan].reshape(
            hh // 8, ww // 8, 8, 8) * qstep
        # inverse DCT: T' @ B @ T
        b = np.einsum("ji,abjk,kl->abil", _DCT8, q, _DCT8) + 128.0
        chan = b.transpose(0, 2, 1, 3).reshape(hh, ww)
        out[:, :, ch] = np.clip(np.round(chan), 0, 255)[:h, :w]
    return out


# --------------------------------------------------------------------------
# dispatch / fidelity / phash
# --------------------------------------------------------------------------

FMT_LOSSLESS = {"png": True, "bmp": True, "jpeg": False}


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "jpeg":
        return encode_qjpg(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> tuple:
    """bytes -> (pixels HxWx3 uint8, fmt). Dispatch on magic."""
    if data[:8] == _PNG_SIG:
        return decode_png(data), "png"
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp"
    if data[:4] == _QJPG_MAGIC:
        return decode_qjpg(data), "jpeg"
    raise ValueError("unrecognized image magic")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def _area_resize_gray(gray: np.ndarray, out_hw: int = 32) -> np.ndarray:
    """Deterministic area-average resize via reduceat binning."""
    h, w = gray.shape
    ys = (np.arange(out_hw) * h) // out_hw
    xs = (np.arange(out_hw) * w) // out_hw
    rowsum = np.add.reduceat(gray.astype(np.float64), ys, axis=0)
    rowcnt = np.diff(np.append(ys, h))[:, None]
    rows = rowsum / rowcnt
    colsum = np.add.reduceat(rows, xs, axis=1)
    colcnt = np.diff(np.append(xs, w))[None, :]
    return colsum / colcnt


_DCT32 = _dct_matrix(32)


def phash64(img: np.ndarray) -> int:
    """Classic pHash → signed int64 (two's complement of the 64-bit code)."""
    gray = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
            + 0.114 * img[:, :, 2])
    small = _area_resize_gray(gray, 32)
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].copy()
    med = np.median(block)
    bits = (block > med).ravel()
    code = 0
    for b in bits:
        code = (code << 1) | int(b)
    if code >= 1 << 63:
        code -= 1 << 64
    return code


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def procedural_image(idx: int, seed: int = 42,
                     min_size: int = 32, max_size: int = 128) -> np.ndarray:
    """Deterministic synthetic image for corpus row ``idx`` (FIXTURES.md F1):
    smooth gradient + low-amplitude per-idx noise (kept smooth so the lossy
    QJPG roundtrip stays above 40 dB like a natural photo would)."""
    rng = np.random.default_rng((seed << 32) ^ (idx * 2654435761 & 0xFFFFFFFF))
    h = int(rng.integers(min_size, max_size + 1))
    w = int(rng.integers(min_size, max_size + 1))
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    phase = rng.uniform(0, 2 * np.pi, size=3)
    freq = rng.uniform(1.0, 4.0, size=3)
    base = np.stack([
        127.5 + 90.0 * np.sin(2 * np.pi * freq[c] * (0.6 * yy + 0.4 * xx) + phase[c])
        for c in range(3)
    ], axis=2)
    noise = rng.normal(0.0, 6.0, size=((h + 7) // 8, (w + 7) // 8, 3))
    noise = np.repeat(np.repeat(noise, 8, axis=0), 8, axis=1)[:h, :w, :]
    img = np.clip(base + noise, 0, 255).astype(np.uint8)
    return img
