"""Full-chain integration: wav files -> offline mel extraction ->
groundtruth -> embedding extraction (CLI) -> transfer-learning probe (CLI).

This is the complete user journey of the reference repo (SURVEY §3.4-3.5:
extract_embeddings then ex_tl) on a tiny synthetic corpus.
"""

import pickle
import wave as wave_mod
from pathlib import Path

import numpy as np
import pytest

from maest_tpu.apps.ex_maest import run as ex_maest_run
from maest_tpu.apps.ex_tl import default_config, tl_pipeline
from maest_tpu.apps.extract_mel import extract_one


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    sr = 16000
    names = []
    for i in range(6):
        seconds = float(rng.uniform(1.5, 3.0))
        t = np.arange(int(seconds * sr)) / sr
        freq = 200.0 * (i + 1)
        sig = 0.4 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(
            t.shape
        )
        data = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
        p = root / f"clip{i}.wav"
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(data.tobytes())
        names.append(p)
    return root, names


def test_wav_to_probe(wav_corpus, tmp_path):
    root, wavs = wav_corpus
    mel_dir = tmp_path / "mels"

    # 1. offline mel extraction (Essentia-extractor equivalent)
    for w in wavs:
        extract_one(str(w), str(mel_dir))
    mels = sorted(mel_dir.glob("*.mmap"))
    assert len(mels) == 6

    # 2. groundtruth pickles (2 classes: low vs high tone)
    gt = {
        m.name: np.array([i < 3, i >= 3], dtype=bool)
        for i, m in enumerate(mels)
    }
    for split in ("train", "validation", "test", "all"):
        with open(tmp_path / f"groundtruth-{split}.pk", "wb") as f:
            pickle.dump(gt, f)

    # 3. embedding extraction through the ex_maest CLI (tiny random model)
    emb_dir = tmp_path / "embeddings"
    ex_maest_run([
        "extract_embeddings", "with",
        f"datamodule.base_dir={mel_dir}",
        f"datamodule.groundtruth_predict={tmp_path}/groundtruth-all.pk",
        "datamodule.clip_length=1",
        "datamodule.batch_size_test=3",
        "datamodule.num_workers=2",
        "maest.n_classes=2",
        "maest.input_t=62",
        "maest.embed_dim=64",
        "maest.depth=2",
        "maest.num_heads=4",
        "trainer.devices=1",
        "trainer.precision=fp32",
        f"predict.out_dir={emb_dir}",
        "predict.transformer_block=1",
    ])
    emb_files = list(emb_dir.rglob("*.embeddings.npy"))
    assert len(emb_files) == 6
    emb = np.load(emb_files[0])
    assert emb.ndim == 2 and emb.shape[1] == 3 * 64  # [cls|dist|mean]

    # 4. downstream probe on the extracted embeddings
    emb_base = emb_files[0].parent
    cfg = default_config()
    cfg["data"]["metadata_dir"] = str(tmp_path)
    cfg["data"]["base_dir"] = str(emb_base)
    cfg["data"]["n_classes"] = 2
    cfg["data"]["token_size"] = 64
    cfg["data"]["batch_size"] = 3
    cfg["data"]["types"] = "c"  # CLS part only
    cfg["model"]["hidden_units"] = 16
    cfg["trainer"]["max_epochs"] = 3
    result = tl_pipeline(cfg)
    assert np.isfinite(result["test_roc"])
    assert 0.0 <= result["test_ap"] <= 1.0
