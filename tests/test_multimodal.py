"""Multimodal actor-pool stage plumbing: image resize (real codecs),
audio features and video frame sampling (deterministic fake decode; the
real-codec path is an explicit NotImplementedError integration point)."""

import pandas as pd
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ieps_crawler_ray.sources.corpus import build_corpus_rows
from ieps_crawler_ray.stages.multimodal import (AUDIO_FEATURE_SCHEMA,
                                                VIDEO_FRAME_SCHEMA,
                                                AudioFeatureStage,
                                                ImageResizeStage,
                                                VideoFrameSampleStage)


def test_image_resize_stage_over_dataset(ray_session):
    corpus = build_corpus_rows(12)
    ds = rd.from_arrow(corpus).map_batches(
        ImageResizeStage, fn_constructor_kwargs={"target_w": 24,
                                                 "target_h": 16},
        batch_format="pyarrow", batch_size=4, concurrency=2)
    out = ds.to_pandas()
    assert len(out) == 12
    assert out["ok"].all()
    assert (out["w"] == 24).all() and (out["h"] == 16).all()
    from ieps_crawler_ray.functions import image_codec as ic
    img, fmt = ic.decode_image(out["thumb"].iloc[0])
    assert fmt == "png" and img.shape == (16, 24, 3)


def _payload_table(prefix, n):
    rng = np.random.default_rng(5)
    return pa.table({
        f"{prefix}_id": pa.array([f"{prefix}{i:04d}" for i in range(n)]),
        "bytes": pa.array([rng.bytes(100 + i) for i in range(n)],
                          pa.large_binary()),
    })


def test_audio_feature_stage_fake_codec(ray_session):
    t = _payload_table("audio", 10)
    ds = rd.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=4,
        concurrency=2)
    out = ds.to_pandas()
    assert len(out) == 10
    assert all(len(f) == 8 for f in out["features"])
    # deterministic: same payload -> same features
    again = rd.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=10,
        concurrency=1).to_pandas()
    assert np.allclose(np.stack(out.sort_values("audio_id")["features"]),
                       np.stack(again.sort_values("audio_id")["features"]))


def test_video_frame_sample_flatmap_shape(ray_session):
    t = _payload_table("video", 6)
    ds = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", batch_size=3,
        concurrency=2)
    out = ds.to_pandas()
    assert len(out) >= 6           # >= one frame per video
    assert set(out.columns) == {f.name for f in VIDEO_FRAME_SCHEMA}
    from ieps_crawler_ray.functions import image_codec as ic
    img, fmt = ic.decode_image(out["frame"].iloc[0])
    assert fmt == "bmp" and img.shape == (12, 16, 3)


def test_real_codec_paths_are_explicit_stubs():
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(codec="real")._decode(b"xx")
    with pytest.raises(NotImplementedError):
        list(VideoFrameSampleStage(codec="real")._frames(b"xx"))
    with pytest.raises(ValueError):
        AudioFeatureStage(codec="mp3")


# ------------------------- real WAV / Y4M codec paths ----------------------

def test_wav_roundtrip_pcm16():
    from ieps_crawler_ray.functions import audio_codec as ac
    w = ac.procedural_wave(7, sample_rate=8_000)
    w2, sr = ac.decode_wav(ac.encode_wav(w, 8_000))
    assert sr == 8_000 and len(w2) == len(w)
    assert np.abs(w - w2).max() <= 1.01 / 32767  # PCM16 quantization bound
    with pytest.raises(ValueError):
        ac.decode_wav(b"not a riff stream")


def test_y4m_roundtrip_and_chroma_bounds():
    from ieps_crawler_ray.functions import video_codec as vc
    frames = vc.procedural_video(3)
    dec, fps = vc.decode_y4m(vc.encode_y4m(frames, fps=30))
    assert fps == 30 and len(dec) == len(frames)
    for a, b in zip(frames, dec):
        ya = vc._rgb_to_yuv(a)[..., 0].astype(int)
        yb = vc._rgb_to_yuv(b)[..., 0].astype(int)
        err = np.abs(ya - yb)
        clipped = ((b == 0) | (b == 255)).any(axis=-1)
        assert err[~clipped].max(initial=0) <= 1  # unclipped: exact + rounding

    flat = np.full((12, 16, 3), 77, np.uint8)  # flat blocks: exact
    d2, _ = vc.decode_y4m(vc.encode_y4m([flat]))
    assert (d2[0] == flat).all()
    with pytest.raises(ValueError):
        vc.decode_y4m(b"AVI nonsense")


def test_audio_stage_wav_codec_real_decode(ray_session):
    from ieps_crawler_ray.functions import audio_codec as ac
    waves = [ac.procedural_wave(i) for i in range(6)]
    t = pa.table({
        "audio_id": pa.array([f"a{i}" for i in range(6)], pa.string()),
        "bytes": pa.array([ac.encode_wav(w, 16_000) for w in waves],
                          pa.large_binary())})
    out = rd.from_arrow(t).map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"codec": "wav"},
        batch_format="pyarrow", batch_size=3, concurrency=2).to_pandas() \
        .sort_values("audio_id").reset_index(drop=True)
    assert list(out["n_samples"]) == [len(w) for w in waves]
    assert (out["sample_rate"] == 16_000).all()
    # features match the pure-python DSP on the decoded waveform
    w0 = ac.decode_wav(ac.encode_wav(waves[0], 16_000))[0]
    assert np.allclose(out["features"].iloc[0],
                       ac.band_rms(w0, 8), atol=1e-6)


def test_video_stage_y4m_codec_real_decode(ray_session):
    from ieps_crawler_ray.functions import video_codec as vc
    clips = [vc.procedural_video(i, max_frames=25) for i in range(4)]
    t = pa.table({
        "video_id": pa.array([f"v{i}" for i in range(4)], pa.string()),
        "bytes": pa.array([vc.encode_y4m(c) for c in clips],
                          pa.large_binary())})
    out = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"codec": "y4m", "stride": 10},
        batch_format="pyarrow", batch_size=2, concurrency=2).to_pandas()
    want = sum(len(range(0, len(c), 10)) for c in clips)
    assert len(out) == want
    from ieps_crawler_ray.functions import image_codec as ic
    row = out.sort_values(["video_id", "frame_idx"]).iloc[0]
    img, fmt = ic.decode_image(row["frame"])
    assert fmt == "bmp" and img.shape == clips[0][0].shape


def test_image_augment_stage_matches_pure_kernel(ray_session):
    """The actor-pool augment stage must be bit-identical to a no-Ray
    replay of the same flip/crop/luma kernel (the corpus-contract oracle
    pattern used for audio/video)."""
    from ieps_crawler_ray.functions import image_codec as ic
    from ieps_crawler_ray.stages.multimodal import (ImageAugmentStage,
                                                    augment_features)

    corpus = build_corpus_rows(10)
    out = rd.from_arrow(corpus).map_batches(
        ImageAugmentStage, batch_format="pyarrow", batch_size=4,
        concurrency=2).to_pandas().set_index("image_id").sort_index()
    assert len(out) == 10
    for i in range(corpus.num_rows):
        img, _ = ic.decode_image(corpus.column("bytes")[i].as_py())
        pf, pc, lm = augment_features(img)
        row = out.loc[corpus.column("image_id")[i].as_py()]
        assert (row["phash_flip"], row["phash_crop"],
                row["luma_milli"]) == (pf, pc, lm)


def test_augment_features_flip_involution():
    """Flipping twice restores the original phash; crop luma is within
    the 8-bit range scaled by 1000."""
    from ieps_crawler_ray.functions import image_codec as ic
    from ieps_crawler_ray.stages.multimodal import augment_features

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    pf, pc, lm = augment_features(img)
    pf2, _, _ = augment_features(img[:, ::-1])
    assert pf2 == ic.phash64(img[:, ::-1][:, ::-1])  # flip of flip == id
    assert 0 <= lm <= 255_000
    assert isinstance(pf, int) and isinstance(pc, int)


def test_image_quality_stage_matches_pure_kernel(ray_session):
    from ieps_crawler_ray.functions import image_codec as ic
    from ieps_crawler_ray.stages.multimodal import (ImageQualityStage,
                                                    quality_features)

    corpus = build_corpus_rows(8)
    out = rd.from_arrow(corpus).map_batches(
        ImageQualityStage, batch_format="pyarrow", batch_size=4,
        concurrency=2).to_pandas().set_index("image_id")
    for i in range(corpus.num_rows):
        img, _ = ic.decode_image(corpus.column("bytes")[i].as_py())
        lu, co, bl = quality_features(img)
        row = out.loc[corpus.column("image_id")[i].as_py()]
        assert (row["luma_milli"], row["contrast_mvar"],
                row["blur_mvar"]) == (lu, co, bl)
        assert (row["w"], row["h"]) == (img.shape[1], img.shape[0])
        assert row["phash"] == ic.phash64(img)


def test_image_tile_stage_fanout_counts_and_values(ray_session):
    from ieps_crawler_ray.functions import image_codec as ic
    from ieps_crawler_ray.stages.multimodal import (ImageTileStage,
                                                    tile_grid_features)

    corpus = build_corpus_rows(6)
    out = rd.from_arrow(corpus).map_batches(
        ImageTileStage, batch_format="pyarrow", batch_size=2,
        concurrency=2).to_pandas()
    want = 0
    for i in range(corpus.num_rows):
        img, _ = ic.decode_image(corpus.column("bytes")[i].as_py())
        tiles = tile_grid_features(img)
        want += len(tiles)
        iid = corpus.column("image_id")[i].as_py()
        got = out[out["image_id"] == iid].sort_values(["ty", "tx"])
        assert [tuple(r) for r in
                got[["ty", "tx", "r_milli", "g_milli",
                     "b_milli"]].to_numpy()] == tiles
    assert len(out) == want


def test_tile_kernel_integer_means():
    from ieps_crawler_ray.stages.multimodal import tile_grid_features

    img = np.full((20, 35, 3), 7, dtype=np.uint8)
    tiles = tile_grid_features(img, tile=16)
    # 20//16 x 35//16 = 1x2 tiles, remainder dropped
    assert [(t[0], t[1]) for t in tiles] == [(0, 0), (0, 1)]
    assert all(t[2:] == (7000, 7000, 7000) for t in tiles)
    assert tile_grid_features(img[:8, :8]) == []


def test_image_curation_collapses_planted_dups(ray_session):
    from ieps_crawler_ray.pipelines.flagship import (_curation_corpus_rows,
                                                     image_curation)

    out = image_curation("/root/testdata/sf0.001")
    # thresholds hold on every kept row
    assert (np.minimum(out["w"], out["h"]) >= 48).all()
    assert (out["contrast_mvar"] >= 1_200_000).all()
    assert (out["blur_mvar"] >= 19_000).all()
    # exact-dup collapse: one row per phash, keep-first by image_id
    assert not out["phash"].duplicated().any()
    inp = _curation_corpus_rows(60)
    # every planted duplicated phash that survives the filter must be
    # represented by its dup id (dupNNN sorts before imgNNN)
    kept_ids = set(out["image_id"])
    dup_ids = {i for i in inp.column("image_id").to_pylist()
               if i.startswith("dup")}
    surviving_dup_phashes = set(
        out.loc[out["image_id"].str.startswith("dup"), "phash"])
    for iid in kept_ids:
        if iid.startswith("img"):
            twin = "dup" + iid[3:]
            assert twin not in dup_ids or \
                out.loc[out["image_id"] == iid, "phash"].iloc[0] \
                not in surviving_dup_phashes


def test_image_dedup_vs_reference_planted_copies(ray_session):
    """Every planted cpy row must match its img twin within 2 bits; the
    novel rows (different procedural images, min inter-phash hamming ~10)
    must not match anything."""
    from ieps_crawler_ray.pipelines.flagship import image_dedup_vs_reference

    out = image_dedup_vs_reference("/root/testdata/sf0.001")
    cpy = out[out["image_id"].str.startswith("cpy")]
    assert len(cpy) == 15  # 60 ref images, every 4th copied
    assert cpy["is_dup"].all()
    assert (cpy["ref_id"] == "img" + cpy["image_id"].str[3:]).all()
    assert (cpy["hamming"] <= 2).all()
    novel = out[out["image_id"].str.startswith("img")]
    assert not novel["is_dup"].any()
    assert novel["ref_id"].isna().all()


def test_image_aspect_bucket_pack_invariant_and_exact(ray_session):
    """Pack output must be identical for any range-bucket count and
    equal to a single-threaded replay of the packing rule."""
    from ieps_crawler_ray.pipelines.flagship import (
        _ASPECT_LADDER_MILLI, image_aspect_bucket_pack)

    a = image_aspect_bucket_pack("/root/testdata/sf0.001", n_range=4) \
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    b = image_aspect_bucket_pack("/root/testdata/sf0.001", n_range=16) \
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    corpus = build_corpus_rows(60)
    ladder = np.array(_ASPECT_LADDER_MILLI)
    rows = []
    for i in range(corpus.num_rows):
        w = corpus.column("w")[i].as_py()
        h = corpus.column("h")[i].as_py()
        r = w * 1000 // h
        rows.append((corpus.column("image_id")[i].as_py(),
                     int(ladder[np.argmin(np.abs(r - ladder))]), w * h))
    rows.sort()
    seen = {}
    expect = {}
    for iid, bm, px in rows:
        start = seen.get(bm, 0)
        expect[iid] = (bm, px, start, start // 1_048_576)
        seen[bm] = start + px
    for _, row in a.iterrows():
        assert expect[row["image_id"]] == (
            row["bucket_milli"], row["pixels"],
            row["start_px"], row["batch_idx"])


def test_quality_features_flip_invariant():
    """Luma/contrast/blur are permutation-sums — horizontal flip must
    not change any of them (the augment pipeline relies on scoring
    being orientation-free)."""
    from ieps_crawler_ray.stages.multimodal import quality_features

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    assert quality_features(img) == quality_features(img[:, ::-1])
    assert quality_features(img) == quality_features(img[::-1, :])


def test_tile_means_consistent_with_crop_mean():
    """Sum of per-tile channel means equals the covered crop's channel
    sum (up to the x1000 floor per tile) — the tile kernel loses no
    mass inside the grid."""
    from ieps_crawler_ray.stages.multimodal import tile_grid_features

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    tiles = tile_grid_features(img, tile=16)
    # exact: tile means are (sum*1000)//256 with 256 | 1000*sum ⇔ check
    # via reconstruction bound instead: each tile mean differs from the
    # true mean by < 1/1000
    for ty, tx, r, g, b in tiles:
        crop = img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
        for ch, got in ((0, r), (1, g), (2, b)):
            true = int(crop[..., ch].astype(np.int64).sum()) * 1000 // 256
            assert got == true


def test_watermark_heuristic_matches_local_recompute(ray_session):
    """image_watermark_heuristic vs an independent pandas recompute of
    the same integer contract from the raw tile features."""
    from ieps_crawler_ray.pipelines.flagship import (
        image_tiles, image_watermark_heuristic)

    SF = "/root/testdata/sf0.001"
    got = image_watermark_heuristic(SF)
    tiles = image_tiles(SF)
    t = tiles.copy()
    t["luma"] = (299 * t["r_milli"] + 587 * t["g_milli"]
                 + 114 * t["b_milli"]) // 1000
    rows = []
    for iid, g in t.groupby("image_id"):
        ny = int(g["ty"].max()) + 1
        band = g["ty"] >= ny - max(ny // 4, 1)
        bn, bs = int(band.sum()), int(g.loc[band, "luma"].sum())
        bs2 = int((g.loc[band, "luma"] ** 2).sum())
        rn, rs = int((~band).sum()), int(g.loc[~band, "luma"].sum())
        delta = bs // bn - rs // rn
        nvar = bn * bs2 - bs * bs
        rows.append((iid, delta, nvar,
                     delta >= 4000 and nvar <= 600_000_000 * bn * bn))
    want = pd.DataFrame(rows, columns=[
        "image_id", "band_minus_rest_milli", "band_uniformity_nvar",
        "watermarked"]).sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # the heuristic must split the corpus non-degenerately
    assert 0 < int(got["watermarked"].sum()) < len(got)


def test_patch_psnr_matches_local_recompute(ray_session):
    """image_patch_psnr vs an independent pandas recompute of the same
    quantize-and-compare contract from the raw tile features."""
    import math

    from ieps_crawler_ray.pipelines.flagship import (
        image_patch_psnr, image_tiles)

    SF = "/root/testdata/sf0.001"
    got = image_patch_psnr(SF)
    tiles = image_tiles(SF)
    rows = []
    for iid, g in tiles.groupby("image_id"):
        sse = 0
        for c in ("r_milli", "g_milli", "b_milli"):
            e = g[c] % 8000 - 4000
            sse += int((e * e).sum())
        n = 3 * len(g)
        if sse == 0:
            psnr = -1.0
        else:
            psnr = math.floor(
                10 * math.log10(float(255_000 * 255_000 * n)
                                / float(sse)) * 1e6 + 0.5) / 1e6
        rows.append((iid, n, sse, psnr, sse == 0 or psnr >= 40.0))
    want = pd.DataFrame(rows, columns=[
        "image_id", "n_samples", "sse", "psnr_db",
        "psnr_ge_40"]).sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # 8000-milli quantization sits right at the 40 dB bar (q^2/12 noise
    # ~= 40.9 dB): every image must report a real positive PSNR
    assert (got["sse"] > 0).all() and (got["psnr_db"] > 0).all()


def test_dominant_colors_matches_local_recompute(ray_session):
    """image_dominant_colors vs an independent recompute of the 64-cell
    palette ranking from the raw tile features."""
    from ieps_crawler_ray.pipelines.flagship import (
        image_dominant_colors, image_tiles)

    SF = "/root/testdata/sf0.001"
    got = image_dominant_colors(SF)
    tiles = image_tiles(SF)
    t = tiles.copy()
    t["cell"] = (t["r_milli"] // 64_000 * 16 + t["g_milli"] // 64_000 * 4
                 + t["b_milli"] // 64_000)
    rows = []
    for iid, g in t.groupby("image_id"):
        c = g.groupby("cell").size().reset_index(name="n_tiles")
        c = c.sort_values(["n_tiles", "cell"],
                          ascending=[False, True]).head(3)
        tot = len(g)
        for rk, (_, r) in enumerate(c.iterrows(), start=1):
            rows.append((iid, rk, int(r["cell"]), int(r["n_tiles"]),
                         int(r["n_tiles"]) * 1000 // tot))
    want = pd.DataFrame(rows, columns=[
        "image_id", "rank", "cell", "n_tiles", "frac_milli"])
    pd.testing.assert_frame_equal(got, want)
    # ranks are dense from 1 and fractions are sane
    assert set(got[got["rank"] == 1]["image_id"]) \
        == set(got["image_id"].unique())
    assert got["frac_milli"].between(0, 1000).all()


def test_politeness_audit_conformance(ray_session):
    """The audit table itself must prove the politeness contract: zero
    violations, and min gap == robots delay for every multi-slot
    domain (ST3 made visible as data)."""
    from ieps_crawler_ray.pipelines.flagship import crawl_politeness_audit

    got = crawl_politeness_audit("/root/testdata/sf0.001")
    assert len(got) > 0
    assert (got["n_violations"] == 0).all()
    multi = got[got["n_fetch_slots"] >= 2]
    assert len(multi) > 0
    assert (multi["min_gap_ms"] == multi["delay_ms"]).all()
    single = got[got["n_fetch_slots"] < 2]
    assert (single["min_gap_ms"] == -1).all()
    # both robots-specified and default delays must appear in the world
    assert got["delay_ms"].nunique() >= 2


def test_dedup_psnr_verify_accepts_reencodes(ray_session):
    """Every QJPG re-encode pair from the dedup-vs-reference candidate
    join must survive pixel verification (re-encodes of the same photo
    clear 25 dB at patch-grid resolution by a wide margin), with exact
    grid agreement and sane sentinels."""
    from ieps_crawler_ray.pipelines.flagship import image_dedup_psnr_verify

    got = image_dedup_psnr_verify("/root/testdata/sf0.001")
    assert len(got) > 0
    cpy = got[got["image_id"].str.startswith("cpy")]
    assert len(cpy) > 0
    # every candidate pair here is a true re-encode: all verified
    assert bool(cpy["verified"].all())
    # pair ids line up (cpyNNN matched to imgNNN)
    assert (cpy["image_id"].str[3:] == cpy["ref_id"].str[3:]).all()
    lossy = cpy[cpy["sse"] > 0]
    if len(lossy):
        assert (lossy["psnr_db"] >= 25.0).all()
        assert (lossy["n_samples"] > 0).all()
    lossless = cpy[cpy["sse"] == 0]
    assert (lossless["psnr_db"] == -1.0).all()


def test_blocked_preserves_rows_and_splits(ray_session):
    """_blocked must be a pure re-blocking: same rows, real block
    parallelism for the downstream stages."""
    from ieps_crawler_ray.pipelines.flagship import _blocked
    from ieps_crawler_ray.sources.corpus import build_corpus_rows

    tbl = build_corpus_rows(70)
    ds = _blocked(tbl, rows_per_block=32)
    assert ds.num_blocks() == 3  # 32 + 32 + 6
    got = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
    want = tbl.to_pandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # small tables stay single-block (no pointless task fan-out)
    assert _blocked(build_corpus_rows(8), rows_per_block=32) \
        .num_blocks() == 1


def test_image_gradient_stage_matches_pure_kernel(ray_session):
    """The actor-pool gradient stage reproduces a no-Ray replay of the
    tile-gradient kernel exactly (the corpus-contract shape the
    image_tile_gradients SQL oracle also replays via self-joins)."""
    from ieps_crawler_ray.functions import image_codec as ic
    from ieps_crawler_ray.stages.multimodal import (ImageGradientStage,
                                                    tile_gradient_features)

    corpus = build_corpus_rows(8)
    out = rd.from_arrow(corpus).map_batches(
        ImageGradientStage, batch_format="pyarrow", batch_size=3,
        concurrency=2).to_pandas().set_index("image_id")
    n_expected = 0
    for i in range(corpus.num_rows):
        img, _ = ic.decode_image(corpus.column("bytes")[i].as_py())
        f = tile_gradient_features(img)
        iid = corpus.column("image_id")[i].as_py()
        if f is None:
            assert iid not in out.index
            continue
        n_expected += 1
        row = out.loc[iid]
        assert (int(row["n_grads"]), int(row["grad_sum"]),
                int(row["grad_max"]), int(row["n_edges"])) == f
        assert int(row["edge_frac_milli"]) == f[3] * 1000 // f[0]
    assert len(out) == n_expected > 0


def test_tile_gradient_kernel_known_values():
    from ieps_crawler_ray.stages.multimodal import tile_gradient_features

    # two horizontal tiles: luma 7000 vs 19000 -> one gradient of 12000
    img = np.full((16, 32, 3), 7, dtype=np.uint8)
    img[:, 16:, :] = 19
    assert tile_gradient_features(img, tile=16) == (1, 12000, 12000, 1)
    # flat image: gradients exist but are all zero (below edge cut)
    flat = np.full((32, 32, 3), 9, dtype=np.uint8)
    assert tile_gradient_features(flat, tile=16) == (4, 0, 0, 0)
    # single tile -> no adjacent pair -> None
    assert tile_gradient_features(np.zeros((16, 16, 3), np.uint8),
                                  tile=16) is None
