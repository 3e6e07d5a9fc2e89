"""Downstream probe (ex_tl equivalent) end-to-end on synthetic embeddings."""

import pickle

import numpy as np
import pytest

from maest_tpu.apps.ex_tl import (
    default_config,
    postprocess_embedding,
    tl_pipeline,
)


def test_postprocess_embedding_parts():
    emb = np.arange(4 * 3 * 8, dtype="float32").reshape(4, 24)  # 4 chunks, 3x8
    mean = emb.mean(axis=0).reshape(3, 8)
    out = postprocess_embedding(emb, types="c", reduce="mean", token_size=8)
    np.testing.assert_allclose(out, mean[0])
    out = postprocess_embedding(emb, types="cd", reduce="stack", token_size=8)
    np.testing.assert_allclose(out, np.hstack([mean[0], mean[1]]))
    out = postprocess_embedding(emb, types="cdt", reduce="mean", token_size=8)
    np.testing.assert_allclose(out, mean.mean(axis=0))
    # width neither token_size nor 3*token_size must raise, not silently
    # split into garbage c/d/t parts (e.g. a 2E block embedding)
    with pytest.raises(ValueError, match="neither token_size"):
        postprocess_embedding(
            np.zeros((4, 16), "float32"), types="c", reduce="mean",
            token_size=8)


@pytest.fixture(scope="module")
def embedding_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tl")
    emb_dir = root / "emb"
    emb_dir.mkdir()
    rng = np.random.default_rng(0)
    n_classes, token = 6, 16
    # two latent clusters so the probe has signal to learn
    protos = rng.standard_normal((2, 3 * token)).astype("float32") * 2
    gts = {"train": {}, "validation": {}, "test": {}}
    for split, n in [("train", 40), ("validation", 16), ("test", 16)]:
        for i in range(n):
            cls = i % 2
            name = f"{split}{i}.mp3"
            emb = protos[cls] + rng.standard_normal((3, 3 * token)).astype(
                "float32"
            ) * 0.3
            np.save(emb_dir / (name + ".embeddings.npy"), emb)
            y = np.zeros(n_classes, dtype="float32")
            y[cls::2] = 1.0
            gts[split][name] = y
    for split, gt in gts.items():
        with open(root / f"groundtruth-{split}.pk", "wb") as f:
            pickle.dump(gt, f)
    return root, emb_dir, n_classes, token


def test_tl_pipeline_learns(embedding_corpus):
    root, emb_dir, n_classes, token = embedding_corpus
    cfg = default_config()
    cfg["trainer"]["max_epochs"] = 8
    cfg["optimizer"]["max_epochs"] = 8
    cfg["optimizer"]["warmup_epochs"] = 1
    cfg["optimizer"]["max_lr"] = 1e-2
    cfg["optimizer"]["max_lr_epochs"] = 2
    cfg["model"]["hidden_units"] = 32
    cfg["data"].update(
        base_dir=str(emb_dir),
        metadata_dir=str(root),
        batch_size=8,
        types="c",
        reduce="mean",
        token_size=token,
        n_classes=n_classes,
    )
    cfg["exp_dir"] = str(root / "exp_logs")
    res = tl_pipeline(cfg)
    assert res["test_roc"] > 0.9  # separable synthetic task
    assert 0 <= res["test_ap"] <= 1

    # run records (reference Sacred observer, ex_tl.py:22)
    import json

    run_dir = sorted((root / "exp_logs").iterdir())[-1]
    run_json = json.loads((run_dir / "run.json").read_text())
    assert run_json["status"] == "COMPLETED"
    assert run_json["result"]["test_roc"] == res["test_roc"]
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 8 * 3  # 3 scalars per epoch


def test_max_epochs_override_recouples_derived_keys():
    """`max_epochs=N` on the CLI must re-derive trainer.max_epochs and the
    LR-table length like the reference's Sacred config scope (ex_tl.py:26-
    64); individually-overridden keys still win."""
    from maest_tpu.apps.ex_tl import _apply_overrides, default_config

    cfg = _apply_overrides(default_config(), ["max_epochs=120"])
    assert cfg["trainer"]["max_epochs"] == 120
    assert cfg["optimizer"]["max_epochs"] == 120

    cfg = _apply_overrides(default_config(),
                           ["max_epochs=120", "optimizer.max_epochs=80"])
    assert cfg["trainer"]["max_epochs"] == 120
    assert cfg["optimizer"]["max_epochs"] == 80
