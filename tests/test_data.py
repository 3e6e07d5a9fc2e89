"""Data pipeline tests: memmap/npy loading, chunking, sampling, loader."""

import pickle

import numpy as np
import pytest

from maest_tpu.data import (
    BatchLoader,
    DatasetConfig,
    ExhaustiveMelDataset,
    MelChunkDataset,
    MelChunkDatasetTS,
    class_balanced_weights,
    weighted_epoch_indices,
)

CFG = DatasetConfig(clip_length=2)  # 2 s -> 125 frames


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mels")
    rng = np.random.default_rng(0)
    gt = {}
    # three mmap files of varying length: longer, exact, shorter than window
    for name, frames in [("a.mmap", 400), ("b.mmap", 125), ("c.mmap", 60)]:
        arr = rng.standard_normal((frames, 96)).astype("float16")
        arr.tofile(root / name)
        gt[name] = (rng.random(8) > 0.5).astype("float16")
    # one npy file (frames, bands)
    arr = rng.standard_normal((80, 96)).astype("float16")
    np.save(root / "d.npy", arr)
    gt["d.npy"] = (rng.random(8) > 0.5).astype("float16")
    gt_path = root / "gt.pk"
    with open(gt_path, "wb") as f:
        pickle.dump(gt, f)
    return root, gt_path


def test_random_crop_shapes(corpus):
    root, gt = corpus
    ds = MelChunkDataset(gt, root, CFG, rng=np.random.default_rng(1))
    for i in range(len(ds)):
        item = ds[i]
        assert item["x"].shape == (96, 125)
        assert item["x"].dtype == np.float16
        assert item["y"].shape == (8,)


def test_short_file_center_padded(corpus):
    root, gt = corpus
    ds = MelChunkDataset(gt, root, CFG, rng=np.random.default_rng(1))
    idx = ds.filenames.index("c.mmap")
    x = ds[idx]["x"]  # 60 real frames in a 125 window, centered
    pad = 125 - 60
    lead = pad // 2
    assert (x[:, :lead] == 0).all()
    assert (x[:, lead + 60 :] == 0).all()
    assert (x[:, lead : lead + 60] != 0).any()


def test_exhaustive_expansion(corpus):
    root, gt = corpus
    ds = ExhaustiveMelDataset(gt, root, CFG)
    names = [f for f, _ in ds.entries]
    # a.mmap: 400 frames * 1.1 // 125 = 3 windows
    assert names.count("a.mmap") == 3
    offsets = [o for f, o in ds.entries if f == "a.mmap"]
    assert offsets == [0, 125, 250]
    item = ds[0]
    assert item["x"].shape == (96, 125)


def test_exhaustive_half_overlap(corpus):
    root, gt = corpus
    ds = ExhaustiveMelDataset(gt, root, CFG, half_overlapped_inference=True)
    offsets = [o for f, o in ds.entries if f == "a.mmap"]
    assert offsets[:3] == [0, 62, 124]


def test_teacher_targets(corpus, tmp_path):
    root, gt = corpus
    rng = np.random.default_rng(2)
    for name in ["a.mmap", "b.mmap", "c.mmap", "d.npy"]:
        np.save(tmp_path / (name + ".logits.npy"),
                rng.standard_normal(8).astype("float32") * 3)
    ds = MelChunkDatasetTS(gt, root, CFG, teacher_target_base_dir=tmp_path,
                           rng=np.random.default_rng(1))
    item = ds[0]
    yt = item["y_teacher"]
    assert yt.shape == (8,)
    assert set(np.unique(yt)).issubset({0.0, 1.0})
    assert yt.sum() >= 1  # argmax fallback guarantees at least one positive


def test_targets_for_matches_getitem(corpus, tmp_path):
    """targets_for (rank-sharded eval metadata path) must agree with the
    targets __getitem__ would load, for every dataset variant."""
    from maest_tpu.data import ExhaustiveMelDatasetTS

    root, gt = corpus
    rng = np.random.default_rng(2)
    for name in ["a.mmap", "b.mmap", "c.mmap", "d.npy"]:
        np.save(tmp_path / (name + ".logits.npy"),
                rng.standard_normal(8).astype("float32") * 3)

    chunk = MelChunkDataset(gt, root, CFG, rng=np.random.default_rng(1))
    exh = ExhaustiveMelDataset(gt, root, CFG)
    chunk_ts = MelChunkDatasetTS(
        gt, root, CFG, teacher_target_base_dir=tmp_path,
        rng=np.random.default_rng(1))
    exh_ts = ExhaustiveMelDatasetTS(gt, root, CFG,
                                    teacher_target_base_dir=tmp_path)
    for ds in (chunk, exh, chunk_ts, exh_ts):
        idx = [0, len(ds) - 1, 0]  # incl. a repeated (pad-style) row
        out = ds.targets_for(idx)
        assert out["y"].shape == (3, 8)
        for row, i in zip(out["y"], idx):
            np.testing.assert_array_equal(row, ds[i]["y"])
        if ds in (chunk_ts, exh_ts):
            for row, i in zip(out["y_teacher"], idx):
                np.testing.assert_array_equal(row, ds[i]["y_teacher"])
        else:
            assert "y_teacher" not in out


def test_class_balanced_weights():
    y = np.array([[1, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
    w = class_balanced_weights(y, sample_weight_offset=0)
    # class freqs: 3, 2 -> weights 1000/3, 1000/2
    np.testing.assert_allclose(w, [1000 / 3, 1000 / 3, 1000 / 3 + 500, 500])


def test_class_balanced_weights_streaming_matches_dense():
    from maest_tpu.data import class_balanced_weights_streaming

    rng = np.random.default_rng(3)
    n, c = 1000, 17
    targets = (rng.random((n, c)) > 0.8).astype("float16")
    gt = {f"f{i}.mmap": targets[i] for i in range(n)}
    names = list(gt)
    for wsum in (True, False):
        dense = class_balanced_weights(targets, 100.0, wsum)
        stream = class_balanced_weights_streaming(
            gt, names, 100.0, wsum, chunk_size=64)
        np.testing.assert_array_equal(stream, dense)
    assert class_balanced_weights_streaming({}, []).shape == (0,)


def test_weighted_indices_sharded_and_deterministic():
    w = np.ones(100)
    a0 = weighted_epoch_indices(w, 40, seed=7, epoch=3, rank=0, num_replicas=2)
    a1 = weighted_epoch_indices(w, 40, seed=7, epoch=3, rank=1, num_replicas=2)
    b0 = weighted_epoch_indices(w, 40, seed=7, epoch=3, rank=0, num_replicas=2)
    assert len(a0) == len(a1) == 20
    assert not set(a0) & set(a1)  # disjoint shards
    np.testing.assert_array_equal(a0, b0)  # deterministic
    # without replacement: no duplicates
    full = weighted_epoch_indices(w, 40, seed=7, epoch=3)
    assert len(set(full.tolist())) == 40


def test_weighted_indices_respects_weights():
    w = np.zeros(50)
    w[:10] = 1.0
    idx = weighted_epoch_indices(w, 10, seed=0, epoch=0)
    assert set(idx.tolist()).issubset(set(range(10)))


def test_weighted_indices_all_zero_weights_raise():
    # 0/0 probabilities (with replacement) or a silent uniform degrade
    # (Gumbel) both mean the groundtruth has no positive labels — the
    # sampler must say so instead
    with pytest.raises(ValueError, match="zero"):
        weighted_epoch_indices(np.zeros(20), 10, seed=0, epoch=0)
    with pytest.raises(ValueError, match="zero"):
        weighted_epoch_indices(np.zeros(20), 10, seed=0, epoch=0,
                               replacement=True)


def test_weighted_indices_warns_when_draw_exceeds_positive(caplog):
    # torch's WeightedRandomSampler(replacement=False) raises when asked
    # for more draws than positively-weighted samples; the Gumbel scheme
    # fills from zero-weight tracks but must warn loudly
    import logging

    w = np.zeros(50)
    w[:10] = 1.0
    with caplog.at_level(logging.WARNING, logger="maest_tpu.data.sampler"):
        idx = weighted_epoch_indices(w, 30, seed=0, epoch=0)
    assert len(idx) == 30
    # the positives are all drawn before any zero-weight filler
    assert set(idx[:10].tolist()) == set(range(10))
    assert any("zero-weight" in r.message for r in caplog.records)


def test_batch_loader(corpus):
    root, gt = corpus
    ds = MelChunkDataset(gt, root, CFG, rng=np.random.default_rng(1))
    loader = BatchLoader(ds, batch_size=3, num_workers=2)
    batches = list(loader)
    assert batches[0]["x"].shape == (3, 96, 125)
    assert batches[1]["x"].shape == (1, 96, 125)
    assert len(batches[0]["filename"]) == 3


def test_exhaustive_long_file_windows_stay_within_eof(tmp_path):
    """Regression: the reference's raw margin formula
    (int(frames*1.1 // hop), discogs/dataset.py:236) accumulates the 10%
    margin over the WHOLE file — for anything longer than 10 clips it emits
    offsets past EOF, which crash the numpy reader (negative read) and make
    the native reader return phantom all-zero windows. Windows must start
    before EOF, and the window count must match the reference wherever the
    reference doesn't crash."""
    rng = np.random.default_rng(0)
    frames = 2500  # 20 windows of 125 frames (20 clips >> the 10-clip limit)
    arr = rng.standard_normal((frames, 96)).astype("float16")
    arr.tofile(tmp_path / "long.mmap")
    gt = {"long.mmap": (rng.random(8) > 0.5).astype("float16")}
    gt_path = tmp_path / "gt.pk"
    with open(gt_path, "wb") as f:
        pickle.dump(gt, f)

    ds = ExhaustiveMelDataset(gt_path, tmp_path, CFG)
    offsets = [o for _, o in ds.entries]
    assert len(offsets) == 20  # exact coverage, no phantom windows
    assert max(offsets) < frames
    # every window must be readable and non-degenerate on the python path
    for i in (0, len(ds) - 1):
        item = ds[i]
        assert item["x"].shape == (96, 125)
        assert np.abs(np.asarray(item["x"], np.float32)).sum() > 0


def test_device_prefetch_early_break_unwinds_producer(corpus):
    """Regression: breaking out of device_prefetch mid-iteration
    (limit_*_batches) used to leave the producer thread blocked forever on
    a full queue, pinning the BatchLoader's thread pool and device-resident
    batches. Closing the consumer must unwind the source generator."""
    import gc

    from maest_tpu.data.loader import device_prefetch

    root, gt = corpus
    ds = MelChunkDataset(gt, root, CFG, rng=np.random.default_rng(0))
    loader = BatchLoader(ds, 2, num_workers=2)
    closed = []

    def batches():
        try:
            for i, b in enumerate(loader.iter_indices(list(range(4)) * 8)):
                yield b
        finally:
            closed.append(True)

    gen = device_prefetch(batches(), None, size=1)
    next(gen)
    gen.close()  # consumer walks away after one batch
    gc.collect()
    assert closed == [True], "producer did not unwind the batch source"


def test_device_prefetch_propagates_producer_error(corpus):
    """Regression (found by the multi-process fit test): an exception in
    the producer thread (bad read, cross-process device_put mismatch) used
    to silently END the epoch — eval 'completed' with zero batches. It must
    re-raise in the consuming loop."""
    from maest_tpu.data.loader import device_prefetch

    root, gt = corpus
    ds = MelChunkDataset(gt, root, CFG, rng=np.random.default_rng(0))
    loader = BatchLoader(ds, 2, num_workers=2)

    def batches():
        yield from loader.iter_indices([0, 1])
        raise RuntimeError("boom mid-stream")

    gen = device_prefetch(batches(), None, size=1)
    with pytest.raises(RuntimeError, match="boom mid-stream"):
        list(gen)


def test_crop_seed_deterministic_per_item(corpus):
    """crop_seed pins the random-crop offset PER ITEM (keyed on filename),
    independent of draw order — required so every process of a multi-host
    run loads byte-identical eval batches (train/loop.py _val_dataset)."""
    root, gt = corpus
    a = MelChunkDataset(gt, root, CFG, crop_seed=3)
    b = MelChunkDataset(gt, root, CFG, crop_seed=3)
    # draw in different orders: offsets must still agree item-by-item
    items_a = [a[i]["x"] for i in range(len(a))]
    items_b = [b[i]["x"] for i in reversed(range(len(b)))][::-1]
    for xa, xb in zip(items_a, items_b):
        np.testing.assert_array_equal(xa, xb)
    # a different seed moves the long file's crop
    c = MelChunkDataset(gt, root, CFG, crop_seed=4)
    long_idx = a.filenames.index("a.mmap")
    assert not np.array_equal(a[long_idx]["x"], c[long_idx]["x"])
    # the native batch fast path and the python path agree on offsets
    spec = a.batch_spec([long_idx])
    spec2 = b.batch_spec([long_idx])
    assert spec[1] == spec2[1]


def test_macro_ap_roc_no_valid_classes():
    """All-constant labels (tiny smoke evals) must yield NaN metrics, not a
    sklearn crash that aborts the epoch loop."""
    from maest_tpu.train.metrics import macro_ap_roc

    y = np.ones((4, 3), np.float32)  # every class all-positive
    s = np.random.default_rng(0).random((4, 3)).astype(np.float32)
    ap, roc = macro_ap_roc(y, s)
    assert np.isnan(ap) and np.isnan(roc)


def test_compute_norm_stats_global_moments(tmp_path):
    """Regression: mean-of-batch-stds underestimates the dataset std when
    file means differ; the estimator must return the GLOBAL moments."""
    rng = np.random.default_rng(0)
    gt = {}
    vals = []
    for i, mu in enumerate((-3.0, 3.0)):
        arr = (mu + 0.1 * rng.standard_normal((125, 96))).astype("float16")
        arr.tofile(tmp_path / f"m{i}.mmap")
        gt[f"m{i}.mmap"] = np.ones(8, "float16")
        vals.append(arr.astype(np.float64))
    gt_path = tmp_path / "gt.pk"
    with open(gt_path, "wb") as f:
        pickle.dump(gt, f)

    from maest_tpu.train.loop import compute_norm_stats

    cfg = {
        "dataset": {"sample_rate": 16000, "hop_size": 256, "n_bands": 96},
        "datamodule": {
            "groundtruth_train": str(gt_path), "base_dir": str(tmp_path),
            "batch_size_test": 1, "num_workers": 1, "clip_length": 2,
        },
    }
    mean, std = compute_norm_stats(cfg)
    allv = np.concatenate([v.ravel() for v in vals])
    assert mean == pytest.approx(allv.mean(), abs=1e-6)
    assert std == pytest.approx(allv.std(), abs=1e-6)  # ~3.0, not ~0.1


def test_exhaustive_mixed_suffix_corpus(tmp_path):
    """Per-file dispatch: in a mixed .mmap/.npy corpus the .mmap files
    window-expand and the .npy files load whole — the reference keys on
    the FIRST file's suffix only (discogs/dataset.py:226), mismeasuring
    whichever kind comes second."""
    from maest_tpu.data.dataset import DatasetConfig, ExhaustiveMelDataset

    rng = np.random.default_rng(0)
    gt = {}
    rng.standard_normal((250, 96)).astype("float16").tofile(
        tmp_path / "long.mmap")
    gt["long.mmap"] = np.ones(4, "float16")
    np.save(tmp_path / "clip.npy",
            rng.standard_normal((300, 96)).astype("float16"))
    gt["clip.npy"] = np.ones(4, "float16")
    with open(tmp_path / "gt.pk", "wb") as f:
        pickle.dump(gt, f)

    cfg = DatasetConfig(clip_length=2)  # 125-frame window
    ds = ExhaustiveMelDataset(tmp_path / "gt.pk", tmp_path, cfg)
    by_file = {}
    for fname, off in ds.entries:
        by_file.setdefault(fname, []).append(off)
    assert by_file["long.mmap"] == [0, 125]  # 250-frame file: two windows
    assert by_file["clip.npy"] == [0]  # .npy: loaded whole, single window
