"""Native C++ loader tests: parity with the numpy memmap path."""

import numpy as np
import pytest

from maest_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build native loader"
)


@pytest.fixture()
def mel_file(tmp_path):
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((500, 96)).astype(np.float16)
    path = tmp_path / "clip.mmap"
    mel.tofile(path)
    return path, mel


def test_file_frames(mel_file):
    path, mel = mel_file
    assert native.file_frames(str(path)) == 500


def test_load_chunk_inside(mel_file):
    path, mel = mel_file
    out = native.load_chunk(str(path), 100, 200)
    np.testing.assert_array_equal(out, mel[100:300])


def test_load_chunk_tail_center_pads(mel_file):
    path, mel = mel_file
    out = native.load_chunk(str(path), 400, 200)  # only 100 frames available
    pad_front = (200 - 100) // 2
    np.testing.assert_array_equal(out[pad_front:pad_front + 100], mel[400:])
    assert not out[:pad_front].any()
    assert not out[pad_front + 100:].any()


def test_load_chunk_matches_python_path(mel_file, tmp_path):
    import pickle

    from maest_tpu.data import DatasetConfig, MelChunkDataset

    path, mel = mel_file
    gt = {path.name: np.array([1, 0], dtype=bool)}
    with open(tmp_path / "gt.pk", "wb") as f:
        pickle.dump(gt, f)
    cfg = DatasetConfig(clip_length=5)  # 312 frames
    ds = MelChunkDataset(tmp_path / "gt.pk", path.parent, cfg)
    # force both paths at a fixed offset
    got_native = native.load_chunk(str(path), 50, cfg.melspectrogram_size)
    frames = 500
    skip = max(50 + cfg.melspectrogram_size - frames, 0)
    fp = np.memmap(path, dtype=np.float16, mode="r",
                   shape=(cfg.melspectrogram_size - skip, 96), offset=50 * 96 * 2)
    ref = np.asarray(fp)
    np.testing.assert_array_equal(got_native[: len(ref)], ref)
    # and through the dataset API
    out = ds.load_melspectrogram(path, offset=50)
    assert out.shape == (96, cfg.melspectrogram_size)
    np.testing.assert_array_equal(out.T, got_native)


def test_load_batch_threads(mel_file, tmp_path):
    path, mel = mel_file
    paths = [str(path)] * 8
    offsets = [0, 10, 20, 30, 40, 400, 499, 0]
    out = native.load_batch(paths, offsets, 128, threads=4)
    assert out.shape == (8, 128, 96)
    np.testing.assert_array_equal(out[1], mel[10:138])


def test_batchloader_native_fast_path(tmp_path):
    """BatchLoader native batch path equals the per-item python path
    (fixed offsets via the exhaustive dataset)."""
    import pickle

    from maest_tpu.data import BatchLoader, DatasetConfig, ExhaustiveMelDataset

    rng = np.random.default_rng(0)
    for i in range(3):
        rng.standard_normal((700, 96)).astype(np.float16).tofile(
            tmp_path / f"f{i}.mmap"
        )
    gt = {f"f{i}.mmap": np.array([i % 2, 1], bool) for i in range(3)}
    with open(tmp_path / "gt.pk", "wb") as f:
        pickle.dump(gt, f)
    cfg = DatasetConfig(clip_length=5)
    ds = ExhaustiveMelDataset(tmp_path / "gt.pk", tmp_path, cfg)
    assert len(ds) >= 3

    fast = list(BatchLoader(ds, 4, use_native=True).iter_indices(range(len(ds))))
    slow = list(BatchLoader(ds, 4, use_native=False).iter_indices(range(len(ds))))
    assert len(fast) == len(slow)
    for fb, sb in zip(fast, slow):
        np.testing.assert_array_equal(fb["x"], sb["x"])
        np.testing.assert_array_equal(fb["y"], sb["y"])
        assert fb["filename"] == sb["filename"]


def test_load_batch_raises_on_missing_file(mel_file, tmp_path):
    """Regression: the C failure counter was discarded, so a missing mel
    file fed a silent all-zero spectrogram with a real label into training
    (reference raises, discogs/dataset.py:112-117)."""
    import pytest

    from maest_tpu import native

    if not native.available():
        pytest.skip("no compiler")
    path, _ = mel_file
    with pytest.raises(RuntimeError, match="failed to read 1 of 2"):
        native.load_batch([str(path), str(tmp_path / "missing.mmap")],
                          [0, 0], 50, 96)


def test_load_batch_raises_on_empty_file(mel_file, tmp_path):
    """An empty (0-byte) mel file must FAIL, matching the numpy-memmap
    fallback (np.memmap raises on an empty file) — not feed a silent
    all-zeros spectrogram with a real label into training."""
    path, _ = mel_file
    empty = tmp_path / "empty.mmap"
    empty.write_bytes(b"")
    with pytest.raises(RuntimeError, match="failed to read 1 of 2"):
        native.load_batch([str(path), str(empty)], [0, 0], 50, 96)


def test_load_batch_raises_on_offset_past_eof(mel_file):
    """An offset past EOF is corrupt metadata, not a valid zero row."""
    path, _ = mel_file
    with pytest.raises(RuntimeError, match="failed to read"):
        native.load_batch([str(path)], [10_000], 50, 96)
