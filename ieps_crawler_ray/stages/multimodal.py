"""Multimodal actor-pool stages: image / audio / video payloads as opaque
``binary`` columns with typed metadata, processed by callable classes
behind ``map_batches(Cls, concurrency=N, batch_size=B)``.

Design contract (training-data-pipeline extension of SURVEY.md §2.2 M10):
payload bytes ride in ``large_binary`` columns, batches stay SMALL (binary
rows are wide — size ``batch_size`` so batch x concurrency fits worker
heap), per-actor setup (codec tables, models) happens once in
``__init__``.

The image path is REAL (the deterministic pure-numpy codecs from
``functions/image_codec``). Audio ``codec="wav"`` and video
``codec="y4m"`` are REAL too: RIFF/PCM16 and YUV4MPEG2 are standard
uncompressed interchange formats fully parseable in pure numpy
(``functions/audio_codec`` / ``functions/video_codec``). Compressed
formats (mp3/h264/...) remain stubbed: ``codec="real"`` raises
NotImplementedError at the documented integration point, and the
deterministic fake decoder exercises the Ray-side plumbing — schema,
actor signature, batch shapes, output layout — exactly as a production
codec would.

Environment check (re-verified each round; last: round 5, 2026-08-18):
none of PIL / imageio / cv2 / av / soundfile / pydub / torchvision /
librosa / turbojpeg / simplejpeg / lance is installed in this container
and there is no ffmpeg binary, so the
``codec="real"`` branches stay honest NotImplementedError integration
points. Wiring order when a wheel appears: import in ``__init__`` (once
per actor), decode in ``_decode``/``_frames``, and add a
corpus-contract oracle query like the WAV/Y4M ones.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _resize_nn(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy (index-gather, vectorized)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(th) * h) // th, h - 1)
    xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return img[ys[:, None], xs[None, :]]


class ImageResizeStage:
    """Decode -> resize -> re-encode thumbnails. Stateless per batch but
    shipped as a callable class: production variants hold codec contexts
    or GPU handles built once per actor."""

    def __init__(self, target_w: int = 32, target_h: int = 32,
                 out_fmt: str = "png"):
        from ..functions import image_codec as ic
        self.ic = ic
        self.tw, self.th = target_w, target_h
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blobs, ws, hs, ok = [], [], [], [], []
        for i in range(batch.num_rows):
            ids.append(batch.column("image_id")[i].as_py())
            data = batch.column("bytes")[i].as_py()
            try:
                img, _fmt = self.ic.decode_image(data)
                thumb = _resize_nn(img, self.tw, self.th)
                blobs.append(self.ic.encode_image(thumb, self.out_fmt))
                ws.append(thumb.shape[1])
                hs.append(thumb.shape[0])
                ok.append(True)
            except Exception:
                blobs.append(None)
                ws.append(None)
                hs.append(None)
                ok.append(False)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "thumb": pa.array(blobs, pa.large_binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "ok": pa.array(ok, pa.bool_()),
        })


def augment_features(img: np.ndarray) -> tuple:
    """Deterministic training-augmentation features for one decoded image
    (pure integer arithmetic — bit-identical on any host): horizontal
    flip, center crop to 3/4 size, and the crop's integer mean luma.
    Returns (phash_flip, phash_crop, luma_milli)."""
    from ..functions import image_codec as ic
    flip = img[:, ::-1]
    h, w = flip.shape[:2]
    ch, cw = max(h * 3 // 4, 1), max(w * 3 // 4, 1)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    crop = flip[y0:y0 + ch, x0:x0 + cw]
    lum = (299 * crop[..., 0].astype(np.int64)
           + 587 * crop[..., 1].astype(np.int64)
           + 114 * crop[..., 2].astype(np.int64)) // 1000
    luma_milli = int(lum.sum() * 1000 // lum.size)
    return ic.phash64(flip), ic.phash64(np.ascontiguousarray(crop)), \
        luma_milli


class ImageAugmentStage:
    """Decode -> flip/crop augmentation -> integer feature row (the
    deterministic skeleton of a training-data augmentation stage; a
    production variant would emit the augmented bytes and random
    parameters — here the ops are pinned so a no-Ray replay of the same
    kernel is a bit-exact oracle)."""

    def __init__(self):
        from ..functions import image_codec as ic
        self.ic = ic

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, pf, pc, lm = [], [], [], []
        for i in range(batch.num_rows):
            ids.append(batch.column("image_id")[i].as_py())
            img, _fmt = self.ic.decode_image(
                batch.column("bytes")[i].as_py())
            a, b, c = augment_features(img)
            pf.append(a)
            pc.append(b)
            lm.append(c)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "phash_flip": pa.array(pf, pa.int64()),
            "phash_crop": pa.array(pc, pa.int64()),
            "luma_milli": pa.array(lm, pa.int64()),
        })


def quality_features(img: np.ndarray) -> tuple:
    """Integer-exact per-image quality features (bit-identical on any
    host — every op is int64 arithmetic): mean luma, RMS-contrast
    variance and Laplacian-variance sharpness, each scaled x1000 with
    floor division (var*1000 = (n*ss - s^2)*1000 // n^2, exact).
    Returns (luma_milli, contrast_mvar, blur_mvar)."""
    g = (299 * img[..., 0].astype(np.int64)
         + 587 * img[..., 1].astype(np.int64)
         + 114 * img[..., 2].astype(np.int64)) // 1000
    n = int(g.size)
    s = int(g.sum())
    ss = int((g * g).sum())
    luma_milli = s * 1000 // n
    contrast_mvar = (n * ss - s * s) * 1000 // (n * n)
    if g.shape[0] >= 3 and g.shape[1] >= 3:
        lap = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
               - g[1:-1, :-2] - g[1:-1, 2:])
        ni = int(lap.size)
        ls = int(lap.sum())
        lss = int((lap * lap).sum())
        blur_mvar = (ni * lss - ls * ls) * 1000 // (ni * ni)
    else:
        blur_mvar = 0
    return luma_milli, contrast_mvar, blur_mvar


class ImageQualityStage:
    """Decode -> integer quality features + phash + dims, the scoring
    half of a training-data image-curation pipeline (filter thresholds
    live in the query so the same scores serve many policies). Emits one
    row per image: (image_id, w, h, phash, luma_milli, contrast_mvar,
    blur_mvar)."""

    def __init__(self):
        from ..functions import image_codec as ic
        self.ic = ic

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, ph, lu, co, bl = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            ids.append(batch.column("image_id")[i].as_py())
            img, _fmt = self.ic.decode_image(
                batch.column("bytes")[i].as_py())
            a, b, c = quality_features(img)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            ph.append(self.ic.phash64(img))
            lu.append(a)
            co.append(b)
            bl.append(c)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "phash": pa.array(ph, pa.int64()),
            "luma_milli": pa.array(lu, pa.int64()),
            "contrast_mvar": pa.array(co, pa.int64()),
            "blur_mvar": pa.array(bl, pa.int64()),
        })


def tile_grid_features(img: np.ndarray, tile: int = 16) -> list:
    """Non-overlapping ``tile`` x ``tile`` patch grid (ViT-style prep,
    remainder dropped) -> per-tile integer mean RGB x1000. Vectorized:
    one reshape + two sums per image. Returns
    [(ty, tx, r_milli, g_milli, b_milli), ...] in row-major order."""
    h, w = img.shape[:2]
    nty, ntx = h // tile, w // tile
    if nty == 0 or ntx == 0:
        return []
    grid = img[:nty * tile, :ntx * tile].astype(np.int64) \
        .reshape(nty, tile, ntx, tile, 3)
    sums = grid.sum(axis=(1, 3))  # (nty, ntx, 3)
    means = sums * 1000 // (tile * tile)
    out = []
    for ty in range(nty):
        for tx in range(ntx):
            m = means[ty, tx]
            out.append((ty, tx, int(m[0]), int(m[1]), int(m[2])))
    return out


class ImageTileStage:
    """Decode -> patch-grid fan-out (one input image row -> many tile
    rows), the flat-map shape of a ViT patch-extraction stage. Tile
    features are integer means so a no-Ray replay is a bit-exact
    oracle."""

    def __init__(self, tile: int = 16):
        from ..functions import image_codec as ic
        self.ic = ic
        self.tile = tile

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, tys, txs, rs, gs, bs = [], [], [], [], [], []
        for i in range(batch.num_rows):
            iid = batch.column("image_id")[i].as_py()
            img, _fmt = self.ic.decode_image(
                batch.column("bytes")[i].as_py())
            for ty, tx, r, g, b in tile_grid_features(img, self.tile):
                ids.append(iid)
                tys.append(ty)
                txs.append(tx)
                rs.append(r)
                gs.append(g)
                bs.append(b)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ty": pa.array(tys, pa.int64()),
            "tx": pa.array(txs, pa.int64()),
            "r_milli": pa.array(rs, pa.int64()),
            "g_milli": pa.array(gs, pa.int64()),
            "b_milli": pa.array(bs, pa.int64()),
        })


def tile_gradient_features(img: np.ndarray, tile: int = 16,
                           edge_milli: int = 8000):
    """Adjacent-tile luma gradient stats over the SAME non-overlapping
    patch grid as ``tile_grid_features`` (sharpness / edge-density
    features for image curation): per-tile integer mean RGB x1000 →
    integer luma ``(299r + 587g + 114b) // 1000`` → absolute luma
    difference between horizontally and vertically adjacent tiles.
    All arithmetic is nonneg int64 floor division, so a SQL self-join
    over the exported tile table replays it bit-exactly. Returns
    ``(n_grads, grad_sum, grad_max, n_edges)`` with ``n_edges`` the
    count of gradients ≥ ``edge_milli``, or None when the grid has no
    adjacent tile pair (the oracle's join yields no rows there)."""
    h, w = img.shape[:2]
    nty, ntx = h // tile, w // tile
    if nty == 0 or ntx == 0:
        return None
    grid = img[:nty * tile, :ntx * tile].astype(np.int64) \
        .reshape(nty, tile, ntx, tile, 3)
    means = grid.sum(axis=(1, 3)) * 1000 // (tile * tile)
    luma = (299 * means[..., 0] + 587 * means[..., 1]
            + 114 * means[..., 2]) // 1000
    d = np.concatenate([np.abs(luma[:, 1:] - luma[:, :-1]).ravel(),
                        np.abs(luma[1:, :] - luma[:-1, :]).ravel()])
    if d.size == 0:
        return None
    return (int(d.size), int(d.sum()), int(d.max()),
            int((d >= edge_milli).sum()))


class ImageGradientStage:
    """Decode -> adjacent-tile luma gradient energy, one row per image
    (the sharpness/edge-density half of an image-curation scorer; the
    blur_mvar in ImageQualityStage is pixel-local, this is structural).
    Emits (image_id, n_grads, grad_sum, grad_max, n_edges,
    edge_frac_milli); images whose grid has no adjacent tile pair are
    dropped (matching the oracle's self-join)."""

    def __init__(self, tile: int = 16):
        from ..functions import image_codec as ic
        self.ic = ic
        self.tile = tile

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ngs, sums, maxs, nes, fracs = [], [], [], [], [], []
        for i in range(batch.num_rows):
            img, _fmt = self.ic.decode_image(
                batch.column("bytes")[i].as_py())
            f = tile_gradient_features(img, self.tile)
            if f is None:
                continue
            ng, gs, gm, ne = f
            ids.append(batch.column("image_id")[i].as_py())
            ngs.append(ng)
            sums.append(gs)
            maxs.append(gm)
            nes.append(ne)
            fracs.append(ne * 1000 // ng)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "n_grads": pa.array(ngs, pa.int64()),
            "grad_sum": pa.array(sums, pa.int64()),
            "grad_max": pa.array(maxs, pa.int64()),
            "n_edges": pa.array(nes, pa.int64()),
            "edge_frac_milli": pa.array(fracs, pa.int64()),
        })


AUDIO_FEATURE_SCHEMA = pa.schema([
    ("audio_id", pa.string()),
    ("n_samples", pa.int64()),
    ("sample_rate", pa.int32()),
    ("features", pa.list_(pa.float32())),   # frame-level energy bands
])


class AudioFeatureStage:
    """Audio bytes -> clip features. ``codec="wav"`` REALLY decodes
    RIFF/PCM16 (``functions/audio_codec``); ``codec="fake"`` derives a
    deterministic pseudo-waveform from the payload hash (plumbing tests);
    ``codec="real"`` is the integration point for compressed formats (no
    mp3/ogg library in this container)."""

    def __init__(self, codec: str = "fake", n_bands: int = 8,
                 sample_rate: int = 16_000):
        if codec not in ("fake", "wav", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        from ..functions import audio_codec as ac
        self.ac = ac
        self.codec = codec
        self.n_bands = n_bands
        self.sample_rate = sample_rate

    def _decode(self, data: bytes):
        if self.codec == "real":
            raise NotImplementedError(
                "no compressed-audio library in this environment; plug a "
                "real decoder here (bytes -> float32 waveform). WAV "
                "payloads decode for real via codec='wav'.")
        if self.codec == "wav":
            return self.ac.decode_wav(data)
        seed = int.from_bytes(
            hashlib.blake2b(data, digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        n = 1 + (seed % 4096)
        return rng.standard_normal(n).astype(np.float32), self.sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, srs, feats = [], [], [], []
        for i in range(batch.num_rows):
            ids.append(batch.column("audio_id")[i].as_py())
            wave, sr = self._decode(batch.column("bytes")[i].as_py())
            ns.append(len(wave))
            srs.append(sr)
            feats.append([float(x)
                          for x in self.ac.band_rms(wave, self.n_bands)])
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "sample_rate": pa.array(srs, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        }, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("frame_idx", pa.int32()),
    ("frame", pa.large_binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
])


class VideoFrameSampleStage:
    """Video bytes -> every ``stride``-th frame as an encoded image row
    (1 input row -> N output rows: the flat-map shape). ``codec="y4m"``
    REALLY demuxes+decodes YUV4MPEG2 (``functions/video_codec``);
    ``codec="fake"`` derives deterministic frames from the payload hash;
    ``codec="real"`` raises NotImplementedError (integration point for
    compressed codecs — no h264/vp9 library in this container)."""

    def __init__(self, codec: str = "fake", stride: int = 10,
                 frame_w: int = 16, frame_h: int = 12, out_fmt: str = "bmp"):
        from ..functions import image_codec as ic
        from ..functions import video_codec as vc
        if codec not in ("fake", "y4m", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        self.ic = ic
        self.vc = vc
        self.codec = codec
        self.stride = stride
        self.fw, self.fh = frame_w, frame_h
        self.out_fmt = out_fmt

    def _frames(self, data: bytes):
        if self.codec == "real":
            raise NotImplementedError(
                "no compressed-video library in this environment; plug a "
                "real demuxer+decoder here (bytes -> iterator of frames). "
                "Y4M payloads decode for real via codec='y4m'.")
        if self.codec == "y4m":
            frames, _fps = self.vc.decode_y4m(data)
            for idx in range(0, len(frames), self.stride):
                yield idx, frames[idx]
            return
        seed = int.from_bytes(
            hashlib.blake2b(data, digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        n_frames = 1 + (seed % 60)
        for idx in range(0, n_frames, self.stride):
            yield idx, (rng.random((self.fh, self.fw, 3)) * 255
                        ).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, frames, ws, hs = [], [], [], [], []
        for i in range(batch.num_rows):
            vid = batch.column("video_id")[i].as_py()
            for idx, frame in self._frames(batch.column("bytes")[i].as_py()):
                vids.append(vid)
                idxs.append(idx)
                frames.append(self.ic.encode_image(frame, self.out_fmt))
                ws.append(frame.shape[1])
                hs.append(frame.shape[0])
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.large_binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        }, schema=VIDEO_FRAME_SCHEMA)
