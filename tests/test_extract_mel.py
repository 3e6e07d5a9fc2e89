"""Offline mel extraction + MTT groundtruth building tests."""

import pickle
import wave as wave_mod
from pathlib import Path

import numpy as np
import pytest

from maest_tpu.apps.extract_mel import extract_one, load_audio, melspectrogram_to_mmap
from maest_tpu.apps.mtt_prepare import MultiHotBinarizer, build_groundtruth, split_of
from maest_tpu.data import DatasetConfig, MelChunkDataset


def _write_wav(path: Path, seconds: float = 2.0, sr: int = 16000):
    t = np.arange(int(seconds * sr)) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data = (sig * 32767).astype(np.int16)
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return sig


def test_load_wav(tmp_path):
    sig = _write_wav(tmp_path / "a.wav")
    wave = load_audio(tmp_path / "a.wav")
    assert wave.shape == sig.shape
    np.testing.assert_allclose(wave, sig, atol=1e-3)


def test_extract_one_layout(tmp_path):
    _write_wav(tmp_path / "a.wav", seconds=3.0)
    out = extract_one(str(tmp_path / "a.wav"), str(tmp_path / "mels"))
    mel = np.memmap(out, dtype=np.float16, mode="r").reshape(-1, 96)
    # 3 s @16k, hop 256, centered -> 1 + 48000//256 = 188 frames
    assert mel.shape[0] == 188
    assert np.isfinite(np.asarray(mel, np.float32)).all()
    # un-normalized compressed log-mel is non-negative
    assert float(np.asarray(mel, np.float32).min()) >= 0.0


def test_center_trim(tmp_path):
    wave = np.zeros(16000 * 8, np.float32)
    melspectrogram_to_mmap(wave, tmp_path / "x.mmap", max_seconds=5.0)
    mel = np.memmap(tmp_path / "x.mmap", dtype=np.float16, mode="r")
    assert mel.size // 96 == int(5.0 * 16000 / 256)


def test_mmap_feeds_dataset(tmp_path):
    """The extractor's output is readable by the training dataset."""
    _write_wav(tmp_path / "clip.wav", seconds=6.0)
    extract_one(str(tmp_path / "clip.wav"), str(tmp_path / "mels"))
    gt = {"clip.mmap": np.array([1, 0, 1], dtype=bool)}
    with open(tmp_path / "gt.pk", "wb") as f:
        pickle.dump(gt, f)
    ds = MelChunkDataset(
        tmp_path / "gt.pk", tmp_path / "mels",
        DatasetConfig(clip_length=5), rng=np.random.default_rng(0),
    )
    item = ds[0]
    assert item["x"].shape == (96, 5 * 16000 // 256)


def test_binarizer_roundtrip():
    b = MultiHotBinarizer(["rock", "jazz", "piano"])
    m = b.transform([["jazz"], ["rock", "piano"], []])
    assert m.shape == (3, 3)
    assert b.inverse_transform(m) == [("jazz",), ("rock", "piano"), ()]


def test_split_of():
    assert split_of("0/x.mp3") == "train"
    assert split_of("c/x.mp3") == "validation"
    assert split_of("f/x.mp3") == "test"


def test_build_groundtruth(tmp_path):
    rows = [("0/a.mp3", ["rock"]), ("c/b.mp3", ["jazz"]), ("f/c.mp3", [])]
    build_groundtruth(rows, ["rock", "jazz"], tmp_path)
    with open(tmp_path / "groundtruth-train.pk", "rb") as f:
        train = pickle.load(f)
    assert list(train) == ["a.mmap"]
    np.testing.assert_array_equal(train["a.mmap"], [True, False])
    with open(tmp_path / "groundtruth-all.pk", "rb") as f:
        assert len(pickle.load(f)) == 2  # empty-label clip dropped
    assert (tmp_path / "ohe.pk").exists()


def test_output_names_collision_safe(tmp_path):
    """albumA/01.wav and albumB/01.wav must not map to the same .mmap (the
    pool would race-write it and training would pair one spectrogram with
    the other's label)."""
    from maest_tpu.apps.extract_mel import output_names

    a = tmp_path / "albumA" / "01.wav"
    b = tmp_path / "albumB" / "01.wav"
    for p in (a, b):
        p.parent.mkdir(parents=True, exist_ok=True)
        p.touch()
    names = output_names([str(a), str(b)])
    assert len(set(names)) == 2
    assert names == ["albumA/01", "albumB/01"]
    # unique basenames keep the flat layout
    c = tmp_path / "albumA" / "02.wav"
    c.touch()
    assert output_names([str(a), str(c)]) == ["01", "02"]
    # the same file passed twice (directly or via two resolving paths)
    # must raise, not race-write one .mmap under the process pool
    import pytest
    with pytest.raises(ValueError, match="duplicate output names"):
        output_names([str(a), str(a)])
