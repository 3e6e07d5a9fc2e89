"""Tagging CLI: wav file in -> ranked labels / embeddings out."""

import json

import numpy as np
import pytest

from maest_tpu.apps.tag import main

TINY = ["--random-weights", "--embed-dim", "64", "--depth", "2",
        "--num-heads", "4", "--input-t", "62"]


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    from scipy.io import wavfile

    path = tmp_path_factory.mktemp("audio") / "clip.wav"
    rng = np.random.default_rng(0)
    wavfile.write(path, 16000,
                  (rng.standard_normal(2 * 16000) * 8000).astype(np.int16))
    return path


def test_tag_json_output(wav, capsys):
    assert main([str(wav), "--json", "--top-k", "3"] + TINY) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["file"] == str(wav)
    assert len(out["tags"]) == 3
    for label, p in out["tags"].items():
        assert isinstance(label, str) and 0.0 <= p <= 1.0


def test_tag_text_output(wav, capsys):
    assert main([str(wav), "--top-k", "2"] + TINY) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == str(wav) and len(lines) == 3


def test_tag_embeddings(wav, tmp_path, capsys):
    out_dir = tmp_path / "emb"
    assert main([str(wav), "--embeddings-dir", str(out_dir), "--block", "1"]
                + TINY) == 0
    emb = np.load(out_dir / "clip.embeddings.npy")
    # (n_chunks, 3 * embed_dim) block tap
    assert emb.ndim == 2 and emb.shape[1] == 3 * 64
