"""Data-pipeline tests: fixture tree, scanning/windowing, label policies,
decode backends (incl. the native C++ core), batching."""

import numpy as np
import pytest

from cvad_tpu.config import DataConfig
from cvad_tpu.data import (BatchLoader, ClipDataset, SyntheticClipDataset,
                           clip_windows, make_synthetic_clips,
                           scan_video_folders, write_synthetic_video_tree)
from cvad_tpu.data.datasets import UCSDPed2Dataset, create_avenue_dataloaders
from cvad_tpu.data.frames import ClipSpec
from cvad_tpu.data.labels import assign_labels


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ucsd")
    write_synthetic_video_tree(str(root), videos_per_split=2,
                               frames_per_video=20, hw=(32, 32), fmt="pgm")
    return str(root)


def test_scan_and_windows(video_tree):
    videos = scan_video_folders(video_tree + "/Train")
    assert len(videos) == 2
    assert all(len(frames) == 20 for _, frames in videos)
    clips = clip_windows(videos, clip_len=8, stride=4)
    # starts 0,4,8,12 per video
    assert len(clips) == 8
    assert all(len(c.frames) == 8 for c in clips)


def test_gt_folders_excluded(tmp_path):
    (tmp_path / "Test001").mkdir()
    (tmp_path / "Test001_gt").mkdir()
    for d in ("Test001", "Test001_gt"):
        for i in range(3):
            (tmp_path / d / f"{i}.pgm").write_bytes(b"P5\n2 2\n255\n" + bytes(4))
    videos = scan_video_folders(str(tmp_path))
    assert [v for v, _ in videos] == ["Test001"]


def test_max_clips_per_video(video_tree):
    videos = scan_video_folders(video_tree + "/Train")
    clips = clip_windows(videos, clip_len=8, stride=2, max_clips_per_video=3)
    per_video = {}
    for c in clips:
        per_video[c.video] = per_video.get(c.video, 0) + 1
    assert all(v == 3 for v in per_video.values())


def test_label_policies():
    def mkclips(video, n, start_stride, vi):
        return [ClipSpec(video, tuple(f"f{i}" for i in range(8)), s * start_stride, vi)
                for s in range(n)]

    clips = mkclips("Test001", 5, 4, 0) + mkclips("Test002", 5, 4, 1)
    lengths = [24, 24]
    for policy in ("heuristic_v1", "hardcoded_v2", "split_binary",
                   "mixed_simple", "none"):
        train = assign_labels(policy, clips, "Train", lengths)
        test = assign_labels(policy, clips, "Test", lengths)
        assert train.shape == test.shape == (10,)
        assert set(np.unique(train)) <= {0.0, 1.0}
    # train split is all-normal for the UCSD policies (reference behavior)
    for policy in ("heuristic_v1", "hardcoded_v2", "split_binary"):
        assert assign_labels(policy, clips, "Train", lengths).sum() == 0
    # split_binary test is all-anomalous (video_anomaly_detection.py:40)
    assert assign_labels("split_binary", clips, "Test", lengths).sum() == 10
    # hardcoded_v2: video 1 (in anomaly set) middle clips anomalous
    hv2 = assign_labels("hardcoded_v2", clips, "Test", lengths)
    assert hv2[:5].sum() > 0


def test_clip_dataset_decode(video_tree):
    cfg = DataConfig(clip_len=8, stride=4, frame_size=(24, 24), channels=1)
    ds = UCSDPed2Dataset(video_tree, "Train", cfg)
    clip, label = ds[0]
    assert clip.shape == (8, 24, 24, 1)
    assert clip.dtype == np.float32
    assert 0.0 <= clip.min() and clip.max() <= 1.0
    assert clip.std() > 0.01  # actually decoded, not zero-fallback


def test_native_decoder_matches_written_pixels(tmp_path):
    from cvad_tpu.data.native_decoder import decode_clip, load_library
    from cvad_tpu.data.synthetic import _write_pgm, _write_ppm

    lib = load_library()
    if lib is None:
        pytest.skip("native decoder unavailable (no toolchain)")
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (16, 16), np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3), np.uint8)
    _write_pgm(tmp_path / "a.pgm", gray)
    _write_ppm(tmp_path / "b.ppm", rgb)
    out = decode_clip([str(tmp_path / "a.pgm")], (16, 16), 1)
    np.testing.assert_allclose(out[0, ..., 0], gray / 255.0, atol=1e-6)
    out3 = decode_clip([str(tmp_path / "b.ppm")], (16, 16), 3)
    np.testing.assert_allclose(out3[0], rgb / 255.0, atol=1e-6)
    # resize path agrees with the numpy bilinear reference
    from cvad_tpu.data.decode import resize_bilinear

    out_small = decode_clip([str(tmp_path / "b.ppm")], (8, 8), 3)
    expect = resize_bilinear(rgb.astype(np.float32), (8, 8)) / 255.0
    np.testing.assert_allclose(out_small[0], expect, atol=1e-5)


def test_native_decoder_zero_fallback(tmp_path):
    from cvad_tpu.data.native_decoder import decode_clip, load_library

    if load_library() is None:
        pytest.skip("native decoder unavailable")
    out = decode_clip([str(tmp_path / "missing.pgm")], (8, 8), 1)
    assert out is not None and np.all(out == 0)


def test_native_decoder_corrupt_inputs_fall_to_zero(tmp_path):
    """Corrupt/truncated/garbage files through every native format parser
    (hand-rolled TIFF/PNM/BMP + libjpeg/libpng) must hit the zero-frame
    fallback — never crash, hang, or return junk (the reference substituted
    zero frames on decode errors, minicausal_vad_complete3.py:205-207)."""
    import pytest
    from PIL import Image

    from cvad_tpu.data.native_decoder import decode_clip, load_library

    if load_library() is None:
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (24, 32)).astype(np.uint8)
    cases = []
    for fmt in ("tif", "png", "jpg", "bmp", "pgm"):
        ok = tmp_path / f"ok.{fmt}"
        arr = np.stack([img] * 3, -1) if fmt == "jpg" else img
        Image.fromarray(arr).save(ok)
        raw = ok.read_bytes()
        garbled = bytearray(raw)
        for i in range(8, min(len(garbled), 200), 7):
            garbled[i] = int(rng.integers(0, 256))
        for name, data in (("trunc8", raw[:8]), ("half", raw[:len(raw) // 2]),
                           ("garble", bytes(garbled)), ("empty", b""),
                           ("rand", rng.integers(0, 256, 512, dtype=np.uint8)
                            .tobytes())):
            p = tmp_path / f"{name}.{fmt}"
            p.write_bytes(data)
            cases.append(str(p))
    cases.append(str(tmp_path / "huge.tif"))
    (tmp_path / "huge.tif").write_bytes(raw[:4] + b"\xff" * 64)
    out = decode_clip(cases, (8, 8), 1)
    assert out is not None and out.shape == (len(cases), 8, 8, 1)
    np.testing.assert_array_equal(out, 0.0)


def test_normalize_clamp():
    cfg = DataConfig(normalize_clamp=(0.001, 0.999), channels=1,
                     frame_size=(16, 16))
    ds = SyntheticClipDataset(cfg, n=4)
    clip, _ = ds[0]
    assert clip.min() >= 0.001 and clip.max() <= 0.999


def test_batch_loader(video_tree):
    cfg = DataConfig(clip_len=8, stride=4, frame_size=(16, 16), channels=1)
    ds = UCSDPed2Dataset(video_tree, "Train", cfg)
    loader = BatchLoader(ds, batch_size=3)
    batches = list(loader)
    assert len(batches) == len(loader) == 3  # 8 clips -> 3,3,2
    assert batches[0]["clips"].shape == (3, 8, 16, 16, 1)
    assert batches[-1]["clips"].shape[0] == 2
    # deterministic order without shuffle
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["clips"], again[0]["clips"])


def test_avenue_dataloaders_contract(tmp_path):
    """The reconstructed missing-module contract: (videos, labels) with
    videos (B, 3, clip_len, H, W) (SURVEY.md §2.1 last row)."""
    root = tmp_path / "avenue"
    write_synthetic_video_tree(str(root), splits=("training", "testing"),
                               videos_per_split=1, frames_per_video=16,
                               hw=(32, 32), channels=1, fmt="pgm")
    train_loader, test_loader = create_avenue_dataloaders(
        str(root), batch_size=2, clip_length=8, frame_size=(32, 32))
    # the reference unpacks tuples: `for videos, labels in loader`
    # (avenue_training_script2.py:217)
    videos, labels = next(iter(train_loader))
    assert videos.shape == (2, 3, 8, 32, 32)
    assert labels.shape == (2,)
    assert len(train_loader) >= 1 and len(test_loader) >= 1


def test_synthetic_separation():
    clips, labels = make_synthetic_clips(32, 8, (32, 32), 1, 0.5, seed=1)
    # anomalous clips have higher temporal variance (learnable signal)
    tv = clips.std(axis=1).mean(axis=(1, 2, 3))
    assert tv[labels == 1].mean() > tv[labels == 0].mean()


def test_synthetic_hard_profile_no_trivial_cue():
    """The AUC-parity study's hardened task (round-2 verdict weak #3): the
    two classes must share appearance statistics — neither mean intensity
    (the easy profile's flash cue) nor frame-difference energy (the easy
    profile's 4x speed-burst cue) may separate them."""
    from sklearn.metrics import roc_auc_score

    clips, labels = make_synthetic_clips(96, 8, (32, 32), 1, 0.5, seed=3,
                                         profile="hard")
    assert 0.05 < labels.mean() < 0.95  # both classes present
    mean_int = clips.mean(axis=(1, 2, 3, 4))
    assert 0.3 < roc_auc_score(labels, mean_int) < 0.7
    diff_energy = np.abs(np.diff(clips, axis=1)).mean(axis=(1, 2, 3, 4))
    assert 0.3 < roc_auc_score(labels, diff_energy) < 0.7
    # DataConfig plumbing: profile reaches the generator
    cfg = DataConfig(clip_len=8, frame_size=(32, 32), channels=1,
                     synthetic_profile="hard", seed=3)
    ds = SyntheticClipDataset(cfg, n=8, split="Train")
    assert ds.data.shape == (8, 8, 32, 32, 1)


def test_tif_decode_via_pil(tmp_path):
    """UCSDped2SimpleDataset parity: .tif frames decode through PIL
    (minicausal_vad_complete3.py:199)."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    vdir = tmp_path / "Train" / "Train001"
    vdir.mkdir(parents=True)
    frames = rng.integers(0, 256, (10, 20, 24), np.uint8)
    for i, f in enumerate(frames):
        PIL.fromarray(f, mode="L").save(vdir / f"{i:03d}.tif")
    cfg = DataConfig(clip_len=8, stride=2, frame_size=(20, 24), channels=1)
    ds = UCSDPed2Dataset(str(tmp_path), "Train", cfg)
    clip, _ = ds[0]
    assert clip.shape == (8, 20, 24, 1)
    np.testing.assert_allclose(clip[0, ..., 0], frames[0] / 255.0, atol=1e-6)


def test_sample_table_format():
    from cvad_tpu.evaluation.metrics import format_sample_table

    table = format_sample_table(np.array([0.9, 0.1]), np.array([1, 1]))
    assert "0.9000" in table and table.count("\n") == 2


def test_uint8_transfer_and_cache(video_tree):
    cfg = DataConfig(clip_len=8, stride=4, frame_size=(16, 16), channels=1,
                     cache_decoded=True, transfer_dtype="uint8")
    ds = UCSDPed2Dataset(video_tree, "Train", cfg)
    clip8, _ = ds.get_uint8(0)
    assert clip8.dtype == np.uint8
    clipf, _ = ds[0]
    np.testing.assert_allclose(clipf, clip8.astype(np.float32) / 255.0,
                               atol=1e-7)
    # cached: repeated access identical
    again8, _ = ds.get_uint8(0)
    np.testing.assert_array_equal(clip8, again8)
    loader = BatchLoader(ds, 4, transfer_dtype="uint8")
    b = next(iter(loader))
    assert b["clips"].dtype == np.uint8


def test_abandoned_epoch_releases_producer(video_tree):
    """An abandoned epoch iterator (preemption, early break) must not strand
    its producer thread on the bounded queue forever."""
    import gc
    import threading
    import time

    cfg = DataConfig(clip_len=8, stride=4, frame_size=(16, 16), channels=1)
    ds = UCSDPed2Dataset(video_tree, "Train", cfg)
    loader = BatchLoader(ds, 2, num_threads=1, prefetch=1)
    # warm the decode pool so its worker threads don't skew the count
    loader.sample_batch()
    before = threading.active_count()
    it = iter(loader)
    next(it)  # producer alive, likely blocked on the full queue
    del it  # abandon: gen.close() -> cancel set -> producer exits
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_frame_cache_equals_uncached(video_tree):
    """The two-tier frame/clip cache (overlapping windows decode each frame
    once; batch-level warm_frames) must be byte-identical to the uncached
    decode path, through the BatchLoader with overlapping stride-4 windows."""
    batches = {}
    for cache in (False, True):
        cfg = DataConfig(clip_len=8, stride=4, frame_size=(16, 16), channels=1,
                         cache_decoded=cache, transfer_dtype="uint8")
        ds = UCSDPed2Dataset(video_tree, "Train", cfg)
        loader = BatchLoader(ds, 4, transfer_dtype="uint8")
        batches[cache] = [b for b in loader]
    for b0, b1 in zip(batches[False], batches[True]):
        np.testing.assert_array_equal(b0["clips"], b1["clips"])
        np.testing.assert_array_equal(b0["labels"], b1["labels"])
    # the warm path returns the SAME assembled clip object (single dict hit)
    ds_cached = UCSDPed2Dataset(
        video_tree, "Train",
        DataConfig(clip_len=8, stride=4, frame_size=(16, 16), channels=1,
                   cache_decoded=True))
    first, _ = ds_cached.get_uint8(0)
    again, _ = ds_cached.get_uint8(0)
    assert first is again


def test_prep_clips_device_normalize():
    import jax.numpy as jnp

    from cvad_tpu.train.tasks import prep_clips

    u8 = jnp.asarray(np.array([[0, 128, 255]], np.uint8))
    f = prep_clips(u8)
    np.testing.assert_allclose(np.asarray(f), [[0.0, 128 / 255, 1.0]],
                               rtol=1e-6)
    clamped = prep_clips(u8, clamp=(0.001, 0.999))
    assert float(clamped.min()) >= 0.001 - 1e-7 and float(clamped.max()) <= 0.999 + 1e-7


# ---- native decode of the real dataset formats (VERDICT r1 item 4) ---------


@pytest.mark.parametrize("fmt,arr_kind,save_kw", [
    ("raw.tif", "gray", {}),
    ("lzw.tif", "gray", {"compression": "tiff_lzw"}),
    ("pb.tif", "gray", {"compression": "packbits"}),
    ("rgb.tif", "rgb", {"compression": "tiff_lzw"}),
    ("a.png", "rgb", {}),
    ("g.png", "gray", {}),
    ("a.jpg", "smooth", {"quality": 95}),
])
def test_native_decode_bit_identical_to_pil(tmp_path, fmt, arr_kind, save_kw):
    """The C++ core decodes UCSD's .tif and Avenue's jpg/png bit-identically
    to PIL (the reference's decoder: minicausal_vad_complete3.py:141-143,
    avenue_training_script_bbox.py:391-411)."""
    import ctypes

    from PIL import Image

    from cvad_tpu.data.native_decoder import load_library

    lib = load_library()
    if lib is None:
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(0)
    if arr_kind == "gray":
        arr = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    elif arr_kind == "rgb":
        arr = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    else:  # smooth gradient: JPEG is lossy but decode must match PIL's
        arr = (np.outer(np.linspace(0, 255, 24), np.ones(31))
               + rng.normal(0, 3, (24, 31))).clip(0, 255).astype(np.uint8)
    p = tmp_path / fmt
    Image.fromarray(arr).save(p, **save_kw)
    pil = np.asarray(Image.open(p))
    c = 1 if pil.ndim == 2 else pil.shape[2]
    out = np.empty(pil.shape[:2] + (c,), np.float32)
    rc = lib.cvad_decode_frame(str(p).encode(),
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                               pil.shape[0], pil.shape[1], c)
    assert rc == 0
    got = np.round(out * 255).astype(np.uint8).reshape(pil.shape)
    np.testing.assert_array_equal(got, pil)


def test_tiff_big_endian_and_predictor(tmp_path):
    """Hand-rolled TIFF reader: big-endian (MM) file with LZW + horizontal
    predictor decodes exactly."""
    import ctypes

    from PIL import Image

    from cvad_tpu.data.native_decoder import load_library

    lib = load_library()
    if lib is None:
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (16, 17), dtype=np.uint8)
    p = tmp_path / "be.tif"
    Image.fromarray(arr).save(p, compression="tiff_lzw", big_tiff=False,
                              byteorder="big")  # PIL >= 9 supports byteorder
    pil = np.asarray(Image.open(p))
    out = np.empty(pil.shape + (1,), np.float32)
    rc = lib.cvad_decode_frame(str(p).encode(),
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                               pil.shape[0], pil.shape[1], 1)
    assert rc == 0
    np.testing.assert_array_equal(
        np.round(out[..., 0] * 255).astype(np.uint8), pil)


@pytest.mark.parametrize("fmt", ["tif", "tif_lzw", "jpg", "png"])
def test_dataset_native_path_real_formats(tmp_path, fmt, monkeypatch):
    """A UCSD-style tree of real-format frames decodes through the C path:
    the PIL/cv2 fallback is poisoned, so passing proves the native dispatch
    gate engages for .tif/.jpg/.png (round-1 gate only allowed pgm/ppm/bmp)."""
    from cvad_tpu.data import decode as decode_mod
    from cvad_tpu.data.native_decoder import load_library, supported_suffixes

    if load_library() is None:
        pytest.skip("native decoder unavailable")
    if fmt == "jpg" and ".jpg" not in supported_suffixes():
        pytest.skip("built without libjpeg")
    if fmt == "png" and ".png" not in supported_suffixes():
        pytest.skip("built without libpng")
    write_synthetic_video_tree(str(tmp_path), splits=("Train",),
                               videos_per_split=1, frames_per_video=12,
                               hw=(32, 32), fmt=fmt)

    def poisoned(*a, **k):
        raise AssertionError("fallback decoder used; native gate did not engage")

    monkeypatch.setattr(decode_mod, "decode_frame", poisoned)
    cfg = DataConfig(root=str(tmp_path), clip_len=8, stride=4,
                     frame_size=(32, 32), channels=1)
    ds = UCSDPed2Dataset(str(tmp_path), "Train", cfg)
    clip, label = ds[0]
    assert clip.shape == (8, 32, 32, 1)
    assert clip.std() > 0.01  # actually decoded, not zero-fallback


@pytest.mark.parametrize("fmt", ["tif", "jpg", "png"])
def test_decode_frame_native_backend_real_formats(tmp_path, fmt):
    """The PER-FRAME decode path (VideoScorer / StreamingScorer use
    decode_frame, not the clip batch call) routes tif/jpg/png through the
    C++ core too, matching the PIL backend exactly."""
    from PIL import Image

    from cvad_tpu.data import decode
    from cvad_tpu.data.native_decoder import load_library, supported_suffixes

    if load_library() is None:
        pytest.skip("native decoder unavailable")
    if f".{fmt}" not in supported_suffixes():
        pytest.skip(f"built without .{fmt} codec")
    rng = np.random.default_rng(5)
    arr = (np.outer(np.linspace(0, 255, 40), np.ones(48))
           + rng.normal(0, 2, (40, 48))).clip(0, 255).astype(np.uint8)
    p = tmp_path / f"frame.{fmt}"
    Image.fromarray(arr).save(p)
    native = decode.decode_frame(str(p), (32, 32), grayscale=True,
                                 backend="native")
    pil = decode.decode_frame(str(p), (32, 32), grayscale=True, backend="pil")
    assert native.std() > 0.01  # decoded, not the zero fallback
    np.testing.assert_allclose(native, pil, atol=1e-6)


def test_batch_loader_producer_error_surfaces():
    """Regression (self-review finding): a mid-epoch decode failure must
    raise to the caller, not end the epoch early with partial data."""
    from cvad_tpu.data.batcher import BatchLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise RuntimeError("decode exploded")
            return np.zeros((2, 4, 4, 1), np.float32), 0.0

    loader = BatchLoader(Bad(), 2, num_threads=1)
    with pytest.raises(RuntimeError, match="producer failed"):
        list(loader)


def test_batch_loader_sample_batch_no_epoch():
    """sample_batch returns the first batch without consuming an epoch or
    advancing the shuffle counter."""
    from cvad_tpu.data.batcher import BatchLoader

    class Toy:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return np.full((2, 4, 4, 1), i, np.float32), float(i)

    loader = BatchLoader(Toy(), 4, shuffle=True, seed=0, num_threads=1)
    sb = loader.sample_batch()
    assert sb["clips"].shape == (4, 2, 4, 4, 1)
    assert loader._epoch == 0  # no epoch consumed
    first_epoch = [b["labels"].tolist() for b in loader]
    loader2 = BatchLoader(Toy(), 4, shuffle=True, seed=0, num_threads=1)
    assert first_epoch == [b["labels"].tolist() for b in loader2]
