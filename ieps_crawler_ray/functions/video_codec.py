"""Pure-numpy Y4M (YUV4MPEG2) video codec.

Y4M is the standard uncompressed interchange format (mjpegtools/ffmpeg):
an ASCII stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C420``
followed by ``FRAME`` records of raw planar YUV — fully parseable with
numpy. This makes the video stage's demux/decode path REAL for Y4M
payloads; compressed codecs (h264/vp9) remain the documented integration
point.

BT.601 full-range YUV<->RGB matrices, 4:2:0 chroma subsampling with 2x2
box down/upsampling (deterministic, exactly invertible for flat 2x2
blocks).
"""

from __future__ import annotations

import numpy as np


def _rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]])
    yuv = rgb.astype(np.float64) @ m.T
    yuv[..., 1:] += 128.0
    return np.clip(np.round(yuv), 0, 255).astype(np.uint8)


def _yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    f = yuv.astype(np.float64)
    f[..., 1:] -= 128.0
    m = np.array([[1.0, 0.0, 1.402],
                  [1.0, -0.344136, -0.714136],
                  [1.0, 1.772, 0.0]])
    rgb = f @ m.T
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_y4m(frames: list, fps: int = 25) -> bytes:
    """List of HxWx3 uint8 RGB frames (even dims) -> Y4M 4:2:0 bytes."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()]
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("frame size mismatch")
        yuv = _rgb_to_yuv(fr)
        y = yuv[..., 0]
        # 2x2 box-mean chroma subsample
        u = yuv[..., 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        v = yuv[..., 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        out.append(b"FRAME\n")
        out.append(y.tobytes())
        out.append(np.round(u).astype(np.uint8).tobytes())
        out.append(np.round(v).astype(np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes):
    """Y4M bytes -> (list of HxWx3 uint8 RGB frames, fps). C420 only."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = 25
    for tok in data[:nl].split()[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
        elif tok[:1] == b"C" and tok not in (b"C420", b"C420jpeg",
                                             b"C420mpeg2"):
            raise ValueError(f"unsupported chroma mode {tok!r} — only "
                             "4:2:0 is implemented")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frames = []
    pos = nl + 1
    while pos < len(data):
        fe = data.find(b"\n", pos)
        if fe < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME header")
        pos = fe + 1
        if pos + ysz + 2 * csz > len(data):
            raise ValueError("truncated frame payload")
        y = np.frombuffer(data[pos:pos + ysz],
                          dtype=np.uint8).reshape(h, w)
        u = np.frombuffer(data[pos + ysz:pos + ysz + csz],
                          dtype=np.uint8).reshape(h // 2, w // 2)
        v = np.frombuffer(data[pos + ysz + csz:pos + ysz + 2 * csz],
                          dtype=np.uint8).reshape(h // 2, w // 2)
        pos += ysz + 2 * csz
        # 2x2 nearest upsample
        uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)
        vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
        frames.append(_yuv_to_rgb(np.stack([y, uu, vv], axis=-1)))
    return frames, fps


def procedural_video(idx: int, seed: int = 42, w: int = 16, h: int = 12,
                     max_frames: int = 60) -> list:
    """Deterministic clip idx: a moving gradient block, 1..max_frames
    frames — structured enough that frame sampling is observable."""
    rng = np.random.default_rng(seed * 7_000_003 + idx)
    n = 1 + int(rng.integers(0, max_frames))
    base = (rng.random((h, w, 3)) * 80).astype(np.uint8)
    frames = []
    for k in range(n):
        fr = base.copy()
        x = (k * 3) % w
        fr[:, x:min(x + 4, w)] = np.clip(
            fr[:, x:min(x + 4, w)].astype(int) + 120, 0, 255)
        frames.append(fr.astype(np.uint8))
    return frames
