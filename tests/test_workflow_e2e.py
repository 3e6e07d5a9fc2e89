"""The full reference workflow in ONE test: pretrain -> extract_embeddings
-> downstream probe.

The individual pieces are tested elsewhere; this pins the SEAM — the
predict out-dir layout ``<clip>sec/<patchout-tag>/<block>/`` written by
``extract_embeddings`` (reference: ex_maest.py:186-207) must be exactly
what ``ex_tl``'s EmbeddingDataset consumes (reference: ex_tl.py:226-274),
with no path surgery in between.
"""

import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from maest_tpu.apps.ex_maest import run as ex_maest_run
from maest_tpu.apps.ex_tl import default_config as tl_default_config
from maest_tpu.apps.ex_tl import tl_pipeline

EMBED = 64  # tap embedding is 3 * EMBED per chunk (cls | dist | token-mean)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("workflow")
    rng = np.random.default_rng(3)
    gt = {}
    for i in range(12):
        name = f"clip{i}.mmap"
        frames = int(rng.integers(80, 160))
        # two synthetic "genres" with distinct spectral statistics so the
        # probe has signal to learn
        base = 1.5 if i % 2 else -1.5
        mel = (rng.standard_normal((frames, 96)) + base).astype("float16")
        mel.tofile(root / name)
        y = np.zeros(4, dtype="float16")
        y[i % 2] = 1.0
        y[2 + (i % 4) // 2] = 1.0
        gt[name] = y
    with open(root / "gt.pk", "wb") as f:
        pickle.dump(gt, f)
    # ex_tl's EmbeddingDataset reads groundtruth-{split}.pk from metadata_dir
    for split in ("train", "validation", "test"):
        with open(root / f"groundtruth-{split}.pk", "wb") as f:
            pickle.dump(gt, f)
    return root


def test_pretrain_extract_probe_chain(corpus, tmp_path):
    common = [
        f"datamodule.base_dir={corpus}",
        f"datamodule.groundtruth_train={corpus}/gt.pk",
        f"datamodule.groundtruth_val={corpus}/gt.pk",
        f"datamodule.groundtruth_test={corpus}/gt.pk",
        f"datamodule.groundtruth_predict={corpus}/gt.pk",
        "datamodule.clip_length=1",
        "datamodule.batch_size_train=2",
        "datamodule.batch_size_test=3",
        "datamodule.num_workers=2",
        "datamodule.sampler.epoch_len=8",
        "maest.n_classes=4",
        "maest.input_t=62",
        f"maest.embed_dim={EMBED}",
        "maest.depth=2",
        "maest.num_heads=4",
        "trainer.max_epochs=1",
        "trainer.devices=2",
        "trainer.precision=fp32",
        "trainer.limit_val_batches=2",
        "module.optimizer.warm_up_len=1",
        f"trainer.default_root_dir={tmp_path}/exp_logs",
        f"predict.out_dir={tmp_path}/embeddings",
        "predict.transformer_block=1",
    ]

    # 1. pretrain (reference: ex_maest.py `main`)
    res = ex_maest_run(["main", "with"] + common)
    assert res == {"done": True}
    runs = sorted((tmp_path / "exp_logs").iterdir())
    ckpt = runs[-1] / "checkpoints" / "best"
    assert ckpt.exists()

    # 2. extract embeddings with the trained checkpoint
    res = ex_maest_run(["extract_embeddings", "with"] + common
                       + [f"ckpt_path={ckpt}"])
    assert res["n_files"] == 12
    # reference out-dir contract: <clip>sec/<patchout-tag>/<block>/
    # (ex_maest.py:186-207); no deterministic patchout -> empty tag segment
    expected_dir = tmp_path / "embeddings" / "1sec" / "" / "1"
    assert str(expected_dir.resolve()) == str(
        (tmp_path / "embeddings" / "1sec" / "1").resolve()
    )
    assert res["out_dir"] == str(tmp_path / "embeddings" / "1sec" / "1")
    emb_files = sorted(
        p.name for p in (tmp_path / "embeddings" / "1sec" / "1").iterdir()
    )
    assert emb_files == sorted(f"clip{i}.mmap.embeddings.npy"
                               for i in range(12))
    one = np.load(tmp_path / "embeddings" / "1sec" / "1"
                  / "clip0.mmap.embeddings.npy")
    assert one.ndim == 2 and one.shape[1] == 3 * EMBED  # (chunks, 2304-equiv)

    # 3. downstream probe consumes that directory verbatim
    #    (reference: ex_tl.py target config points base_dir at the predict
    #    out dir — config_updates.py:244-266)
    cfg = tl_default_config()
    cfg["trainer"]["max_epochs"] = 4
    cfg["optimizer"]["max_epochs"] = 4
    cfg["optimizer"]["warmup_epochs"] = 1
    cfg["optimizer"]["max_lr"] = 1e-2
    cfg["model"]["hidden_units"] = 16
    cfg["data"].update(
        base_dir=str(res["out_dir"]),
        metadata_dir=str(corpus),
        batch_size=4,
        types="c",
        reduce="mean",
        token_size=EMBED,
        n_classes=4,
    )
    probe = tl_pipeline(cfg)
    assert 0.0 <= probe["test_ap"] <= 1.0
    assert probe["test_roc"] > 0.5  # separable synthetic classes


def test_patchout_tag_in_out_dir(corpus, tmp_path):
    """Deterministic patchout settings are encoded into the out-dir name
    (reference: ex_maest.py:188-198), keeping ablation extractions apart."""
    from maest_tpu.configs import build_experiment_config
    from maest_tpu.train.loop import Trainer

    cfg = build_experiment_config(overrides=[
        f"datamodule.base_dir={corpus}",
        f"datamodule.groundtruth_train={corpus}/gt.pk",
        f"datamodule.groundtruth_val={corpus}/gt.pk",
        f"datamodule.groundtruth_test={corpus}/gt.pk",
        f"datamodule.groundtruth_predict={corpus}/gt.pk",
        "datamodule.clip_length=1",
        "maest.n_classes=4",
        "maest.input_t=62",
        f"maest.embed_dim={EMBED}",
        "maest.depth=2",
        "maest.num_heads=4",
        "maest.s_patchout_f_indices=(0,1)",
        "maest.s_patchout_t_interleaved=2",
        "trainer.precision=fp32",
        f"trainer.default_root_dir={tmp_path}/exp_logs",
        f"predict.out_dir={tmp_path}/embeddings",
        "predict.transformer_block=2",
    ])
    out = Trainer(cfg)._predict_out_dir()
    assert out.parts[-3:] == (
        "1sec", "_patchout_f_indices0_1_patchout_t_interleaved2", "2"
    )
