"""End-to-end CLI smoke tests on a tiny synthetic corpus (8-device CPU mesh).

Exercises the full ex_maest-equivalent pipeline: config presets + overrides,
weighted sampling, memmap loading, on-device augmentation, jitted DP train
step, SWA, eval metrics, orbax checkpointing, resume, and embedding
extraction — coverage the reference never had (SURVEY.md §4).
"""

import json
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from maest_tpu.apps.ex_maest import parse_argv, run
from maest_tpu.configs import build_experiment_config


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    gt = {}
    for i in range(10):
        name = f"clip{i}.mmap"
        frames = int(rng.integers(70, 200))
        rng.standard_normal((frames, 96)).astype("float16").tofile(root / name)
        y = (rng.random(8) > 0.6).astype("float16")
        y[i % 8] = 1.0  # every class has support
        gt[name] = y
    for split in ("train", "val", "test"):
        with open(root / f"gt_{split}.pk", "wb") as f:
            pickle.dump(gt, f)
    return root


def _overrides(corpus, tmp_path, extra=()):
    return [
        f"datamodule.base_dir={corpus}",
        f"datamodule.groundtruth_train={corpus}/gt_train.pk",
        f"datamodule.groundtruth_val={corpus}/gt_val.pk",
        f"datamodule.groundtruth_test={corpus}/gt_test.pk",
        f"datamodule.groundtruth_predict={corpus}/gt_val.pk",
        "datamodule.clip_length=1",
        "datamodule.batch_size_train=2",
        "datamodule.batch_size_test=3",
        "datamodule.num_workers=2",
        "datamodule.sampler.epoch_len=8",
        "maest.n_classes=8",
        "maest.input_t=62",
        "maest.embed_dim=64",
        "maest.depth=2",
        "maest.num_heads=4",
        "maest.s_patchout_t=1",
        "trainer.max_epochs=2",
        "trainer.devices=2",
        "trainer.precision=fp32",
        "trainer.limit_val_batches=2",
        "module.swa_epoch_start=0",
        "module.optimizer.warm_up_len=1",
        f"trainer.default_root_dir={tmp_path}/exp_logs",
        f"predict.out_dir={tmp_path}/exp_out",
        "predict.transformer_block=1",
    ] + list(extra)


def test_parse_argv():
    cmd, presets, ovs = parse_argv(
        ["main", "with", "mini_train", "trainer.max_epochs=1"]
    )
    assert cmd == "main"
    assert presets == ["mini_train"]
    assert ovs == ["trainer.max_epochs=1"]


def test_presets_match_reference():
    cfg = build_experiment_config(["maest_30s_from_passt_pretrain"])
    assert cfg["maest"]["input_t"] == 30 * 16000 // 256 == 1875
    assert cfg["maest"]["s_patchout_t"] == 90
    cfg = build_experiment_config(["maest_10s_from_passt_inference"])
    assert cfg["maest"]["arch"] == "discogs-maest-10s-pw-129e"
    assert cfg["predict"]["transformer_block"] == 7


def test_train_and_resume(corpus, tmp_path):
    res = run(["main", "with"] + _overrides(corpus, tmp_path))
    assert res == {"done": True}
    # a run dir with checkpoints and config exists
    runs = sorted((tmp_path / "exp_logs").iterdir())
    assert runs
    ckpts = runs[-1] / "checkpoints"
    assert (ckpts / "best").exists()
    assert (ckpts / "epoch-0").exists() and (ckpts / "epoch-1").exists()
    cfg_json = json.loads((runs[-1] / "config.json").read_text())
    assert cfg_json["maest"]["depth"] == 2

    # Sacred-style run records (reference: FileStorageObserver,
    # ex_maest.py:37): run.json captures the invocation, metrics.jsonl is
    # the append-only scalar history.
    run_json = json.loads((runs[-1] / "run.json").read_text())
    assert run_json["status"] == "COMPLETED"
    assert run_json["command"] == "main"
    assert run_json["overrides"]  # the CLI override list was captured
    assert len(run_json["config_sha256"]) == 64
    metric_lines = [
        json.loads(line)
        for line in (runs[-1] / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(m["name"] == "val_loss" for m in metric_lines)
    assert all({"name", "value", "step", "ts"} <= set(m) for m in metric_lines)

    # best_val persists in the meta marker: a resumed run must not reset
    # it to inf and let its first epoch clobber the true 'best' checkpoint
    meta = json.loads((ckpts / "epoch-1.meta.json").read_text())
    assert meta["best_val"] is not None and np.isfinite(meta["best_val"])

    # resume from epoch-0 and train one more epoch
    res = run(
        ["main", "with"]
        + _overrides(corpus, tmp_path, [f"ckpt_path={ckpts}/epoch-0"])
    )
    assert res == {"done": True}


def test_train_with_grad_accumulation(corpus, tmp_path):
    """trainer.accumulate_grad_batches=2 trains end-to-end (optax
    MultiSteps wrapping, schedule scaled to optimizer steps)."""
    res = run(["main", "with"] + _overrides(corpus, tmp_path, [
        "trainer.accumulate_grad_batches=2",
        "trainer.max_epochs=1",
    ]))
    assert res == {"done": True}


def test_train_pipeline_parallel(corpus, tmp_path):
    """trainer.pipeline_parallel=2 trains end-to-end on a (data=2, pipe=2)
    mesh: GPipe train step + m=1 pipelined eval, checkpoints written."""
    res = run(["main", "with"] + _overrides(corpus, tmp_path, [
        "trainer.devices=4",
        "trainer.pipeline_parallel=2",
        "trainer.num_microbatches=2",
        "trainer.max_epochs=1",
    ]))
    assert res == {"done": True}
    runs = sorted((tmp_path / "exp_logs").iterdir())
    assert (runs[-1] / "checkpoints" / "best").exists()


def test_train_pipeline_tensor_parallel(corpus, tmp_path):
    """trainer.pipeline_parallel=2 + model_parallel=2 trains end-to-end on
    a 3-D (data=2, pipe=2, model=2) mesh: Megatron TP inside each GPipe
    stage."""
    res = run(["main", "with"] + _overrides(corpus, tmp_path, [
        "trainer.devices=8",
        "trainer.pipeline_parallel=2",
        "trainer.model_parallel=2",
        "trainer.num_microbatches=2",
        "trainer.max_epochs=1",
    ]))
    assert res == {"done": True}


def test_train_pipeline_fsdp(corpus, tmp_path):
    """trainer.pipeline_parallel=2 + trainer.fsdp trains end-to-end on a
    (data=4, pipe=2) mesh: ZeRO-3-sharded storage (params + Adam moments
    over 'data') with stage-entry weight all-gather inside the GPipe
    trunk, checkpoints written from the sharded state."""
    res = run(["main", "with"] + _overrides(corpus, tmp_path, [
        "trainer.devices=8",
        "trainer.pipeline_parallel=2",
        "trainer.fsdp=True",
        "trainer.num_microbatches=2",
        "trainer.max_epochs=1",
    ]))
    assert res == {"done": True}
    runs = sorted((tmp_path / "exp_logs").iterdir())
    assert (runs[-1] / "checkpoints" / "best").exists()


def test_pipeline_parallel_guards(corpus, tmp_path):
    """PP rejects composing with SP. (Extraction under PP no longer
    raises — it degrades to the sequential tap path, covered by
    test_extract_embeddings_under_pipeline_parallel.)"""
    with pytest.raises(ValueError, match="pipeline_parallel does not"):
        run(["main", "with"] + _overrides(corpus, tmp_path, [
            "trainer.devices=4", "trainer.pipeline_parallel=2",
            "trainer.sequence_parallel=True",
        ]))


def test_extract_embeddings(corpus, tmp_path):
    res = run(["extract_embeddings", "with"] + _overrides(corpus, tmp_path))
    assert res["n_files"] == 10
    out_dir = tmp_path / "exp_out" / "1sec" / "" / "1"
    files = list(out_dir.glob("*.embeddings.npy"))
    assert len(files) == 10
    emb = np.load(files[0])
    # (n_windows, 3*embed_dim)
    assert emb.ndim == 2 and emb.shape[1] == 3 * 64


def test_extract_embeddings_under_pipeline_parallel(corpus, tmp_path):
    """A pp-configured trainer must degrade extraction to the sequential
    tap path (flat DP mesh) instead of dying at predict time, and produce
    the same embeddings as the plain DP run."""
    res = run(["extract_embeddings", "with"] + _overrides(corpus, tmp_path, [
        "trainer.devices=4",
        "trainer.pipeline_parallel=2",
        "trainer.num_microbatches=2",
        f"predict.out_dir={tmp_path}/exp_out_pp",
    ]))
    assert res["n_files"] == 10
    res_seq = run(["extract_embeddings", "with"] + _overrides(
        corpus, tmp_path, [f"predict.out_dir={tmp_path}/exp_out_seq"]))
    for f in (tmp_path / "exp_out_pp" / "1sec" / "1").glob("*.npy"):
        want = np.load(tmp_path / "exp_out_seq" / "1sec" / "1" / f.name)
        np.testing.assert_allclose(np.load(f), want, atol=1e-5, rtol=1e-5)


def test_test_command(corpus, tmp_path, capsys):
    res = run(["test", "with"] + _overrides(corpus, tmp_path))
    assert "test_loss" in res and "test_ap" in res
    assert 0.0 <= res["test_ap"] <= 1.0


def test_model_speed_test_command(corpus, tmp_path):
    res = run(["model_speed_test", "with"] + _overrides(corpus, tmp_path, [
        "speed_test.batch_size=4", "speed_test.test_length=2",
        "maest.pretrained=False",
    ]))
    assert res["specs_per_second"] > 0


def test_compute_norm_stats(corpus, tmp_path):
    res = run(["compute_norm_stats", "with"] + _overrides(corpus, tmp_path))
    assert np.isfinite(res["mean"]) and np.isfinite(res["std"])


def test_teacher_student_training(corpus, tmp_path):
    """TS pipeline: teacher logits on disk -> dual-loss training
    (reference: models/module.py:279-316, discogs/dataset.py:143-193)."""
    rng = np.random.default_rng(3)
    teacher_dir = tmp_path / "teacher"
    teacher_dir.mkdir()
    for i in range(10):
        np.save(teacher_dir / f"clip{i}.mmap.logits.npy",
                rng.standard_normal(8).astype("float32"))
    ts_overrides = [
        "datamodule.teacher_student.do=True",
        f"datamodule.teacher_student.teacher_target_base_dir={teacher_dir}",
        "maest.distilled_type=separated",
        "trainer.max_epochs=1",
    ]
    res = run(["main", "with"] + _overrides(corpus, tmp_path, ts_overrides))
    assert res == {"done": True}

    # TS eval must log standard/teacher/combined losses (reference:
    # models/module.py:318-349), with the combined loss = their mean
    res = run(["test", "with"]
              + _overrides(corpus, tmp_path, ts_overrides
                           + [f"datamodule.groundtruth_test={corpus}/gt_test.pk"]))
    assert "test_loss_standard" in res and "test_loss_teacher" in res
    assert res["test_loss"] == pytest.approx(
        (res["test_loss_standard"] + res["test_loss_teacher"]) / 2
    )
