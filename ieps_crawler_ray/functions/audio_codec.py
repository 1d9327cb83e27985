"""Pure-numpy WAV (RIFF / PCM16) codec + waveform features.

No audio library ships in this container, but WAV is a trivial container:
RIFF header, ``fmt `` chunk, ``data`` chunk of little-endian PCM16 — all
parseable with struct + numpy. This makes the audio stage's decode path
REAL for WAV payloads; compressed formats (mp3/ogg/flac) remain the
documented integration point.

Features are classic DSP in numpy: per-band RMS, zero-crossing rate and
spectral centroid (rfft) — the kind of featurization a training-data
pipeline runs over audio corpora.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(wave: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float32/float64 waveform in [-1, 1] -> mono PCM16 WAV bytes."""
    pcm = np.clip(np.asarray(wave, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    data = pcm16.tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                byte_rate, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple:
    """WAV bytes -> (float32 waveform in [-1, 1], sample_rate). Walks the
    RIFF chunk list (tolerates extra chunks like LIST/INFO); mono or
    first-channel of interleaved PCM16."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = None
    n_channels = 1
    bits = 16
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt_tag, n_channels, sample_rate = struct.unpack(
                "<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (fmt={fmt_tag}, bits={bits})"
                    " — only PCM16 is implemented")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    if n_channels > 1:
        samples = samples[::n_channels]
    return (samples.astype(np.float32) / 32767.0), int(sample_rate)


def band_rms(wave: np.ndarray, n_bands: int = 8) -> np.ndarray:
    """RMS energy of n_bands equal time slices (float64)."""
    out = np.zeros(n_bands)
    for i, b in enumerate(np.array_split(wave.astype(np.float64), n_bands)):
        out[i] = np.sqrt(np.mean(b * b)) if len(b) else 0.0
    return out


def zero_crossing_rate(wave: np.ndarray) -> float:
    if len(wave) < 2:
        return 0.0
    s = np.signbit(wave.astype(np.float64))
    return float(np.mean(s[1:] != s[:-1]))


def spectral_centroid(wave: np.ndarray, sample_rate: int) -> float:
    """Magnitude-weighted mean frequency in Hz (rfft over the whole clip)."""
    if len(wave) < 2:
        return 0.0
    mag = np.abs(np.fft.rfft(wave.astype(np.float64)))
    freqs = np.fft.rfftfreq(len(wave), d=1.0 / sample_rate)
    tot = mag.sum()
    return float((freqs * mag).sum() / tot) if tot > 0 else 0.0


def procedural_wave(idx: int, seed: int = 42,
                    sample_rate: int = 16_000) -> np.ndarray:
    """Deterministic test clip idx: a mix of 2-4 sines + noise floor,
    0.05-0.4 s — enough structure that the features discriminate."""
    rng = np.random.default_rng(seed * 1_000_003 + idx)
    n = int(sample_rate * rng.uniform(0.05, 0.4))
    t = np.arange(n) / sample_rate
    wave = np.zeros(n)
    for _ in range(rng.integers(2, 5)):
        f = rng.uniform(60, sample_rate / 2.5)
        wave += rng.uniform(0.1, 0.5) * np.sin(2 * np.pi * f * t +
                                               rng.uniform(0, 2 * np.pi))
    wave += rng.normal(0, 0.01, n)
    peak = np.abs(wave).max()
    return (wave / peak * 0.9 if peak > 0 else wave).astype(np.float32)
