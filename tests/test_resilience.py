"""Elastic recovery: restart-from-checkpoint on infrastructure failures.

The reference has no failure handling (SURVEY.md §5 — manual ckpt_path
resume only); maest_tpu restarts fit() from the newest epoch checkpoint
when the jitted step throws an infrastructure error.
"""

import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from maest_tpu.configs import build_experiment_config
from maest_tpu.train.resilience import (
    fit_with_recovery,
    is_recoverable,
    latest_checkpoint,
)


class XlaRuntimeError(Exception):
    """Stand-in matched by name, like jaxlib's real XlaRuntimeError."""


def test_is_recoverable_classification():
    assert is_recoverable(XlaRuntimeError("DATA_LOSS: chip reset"))
    assert is_recoverable(RuntimeError("UNAVAILABLE: socket closed"))
    assert is_recoverable(OSError("connection reset by peer"))
    # XLA runtime errors default restartable (relay wording varies) ...
    assert is_recoverable(XlaRuntimeError("FAILED_PRECONDITION: backend"))
    assert not is_recoverable(ValueError("bad config"))
    assert not is_recoverable(RuntimeError("shape mismatch"))
    assert not is_recoverable(KeyError("params"))
    # ... except deterministic statuses, which fail the same on every try
    assert not is_recoverable(XlaRuntimeError("INVALID_ARGUMENT: bad shape"))
    assert not is_recoverable(XlaRuntimeError("RESOURCE_EXHAUSTED: OOM"))
    # status codes match case-sensitively ('internal' prose must not trip)
    assert not is_recoverable(RuntimeError("internal logic error"))
    # programming-error types stay fatal even when the message quotes a
    # status word — only runtime/IO types get the status-substring check
    assert not is_recoverable(ValueError("job CANCELLED by scheduler"))
    assert not is_recoverable(KeyError("ABORTED"))
    assert is_recoverable(RuntimeError("job CANCELLED by scheduler"))


def test_latest_checkpoint_picks_newest_epoch(tmp_path):
    assert latest_checkpoint(tmp_path) is None
    ckpts = tmp_path / "checkpoints"
    for epoch in (0, 2, 1):
        d = ckpts / f"epoch-{epoch}"
        d.mkdir(parents=True)
        (ckpts / f"epoch-{epoch}.meta.json").write_text(
            '{"epoch": %d}' % epoch)
    # an interrupted save (no meta) must be skipped
    (ckpts / "epoch-3").mkdir()
    assert latest_checkpoint(tmp_path).endswith("epoch-2")
    # an in-flight async save: orbax materialises under a tmp name and
    # renames atomically on commit — the tmp dir must never be picked
    # even though its meta marker (written at save time) already exists
    (ckpts / "epoch-4.orbax-checkpoint-tmp").mkdir()
    (ckpts / "epoch-4.meta.json").write_text('{"epoch": 4}')
    assert latest_checkpoint(tmp_path).endswith("epoch-2")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    gt = {}
    for i in range(8):
        name = f"clip{i}.mmap"
        rng.standard_normal((100, 96)).astype("float16").tofile(root / name)
        y = (rng.random(8) > 0.6).astype("float16")
        y[i % 8] = 1.0
        gt[name] = y
    for split in ("train", "val"):
        with open(root / f"gt_{split}.pk", "wb") as f:
            pickle.dump(gt, f)
    return root


def _config(corpus, tmp_path):
    return build_experiment_config([], [
        f"datamodule.base_dir={corpus}",
        f"datamodule.groundtruth_train={corpus}/gt_train.pk",
        f"datamodule.groundtruth_val={corpus}/gt_val.pk",
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
        "trainer.limit_val_batches=1",
        "module.swa_epoch_start=0",
        "module.optimizer.warm_up_len=1",
        f"trainer.default_root_dir={tmp_path}/exp_logs",
    ])


def test_fit_recovers_from_mid_training_failure(corpus, tmp_path):
    """Kill the run during epoch 1 (after epoch 0 checkpointed); recovery
    must resume from epoch-0 and complete, reporting the restart."""
    from maest_tpu.train.loop import Trainer

    state = {"made": 0, "steps": 0, "resumed_from": None, "trainers": []}

    def factory(cfg):
        t = Trainer(cfg)
        state["trainers"].append(t)
        if state["made"] == 0:
            orig = t.train_step

            def flaky(s, batch, rng):
                state["steps"] += 1
                if state["steps"] > 2:  # 2 steps/epoch -> dies in epoch 1
                    raise XlaRuntimeError("UNAVAILABLE: worker preempted")
                return orig(s, batch, rng)

            t.train_step = flaky
        else:
            state["resumed_from"] = cfg.get("ckpt_path")
        state["made"] += 1
        return t

    res = fit_with_recovery(_config(corpus, tmp_path),
                            trainer_factory=factory, backoff_s=0.0)
    assert res["done"] and res["restarts"] == 1
    assert state["made"] == 2
    assert state["resumed_from"] and state["resumed_from"].endswith("epoch-0")
    # resume starts at the NEXT epoch (no double-trained epoch 0): the
    # recovered trainer runs exactly epoch 1 and stops at max_epochs=2
    assert state["trainers"][1].epoch == 2


def test_programming_errors_propagate(corpus, tmp_path):
    from maest_tpu.train.loop import Trainer

    def factory(cfg):
        t = Trainer(cfg)

        def broken(s, batch, rng):
            raise ValueError("bad shapes")

        t.train_step = broken
        return t

    with pytest.raises(ValueError, match="bad shapes"):
        fit_with_recovery(_config(corpus, tmp_path),
                          trainer_factory=factory, backoff_s=0.0)


def test_restart_budget_exhaustion(corpus, tmp_path):
    from maest_tpu.train.loop import Trainer

    def factory(cfg):
        t = Trainer(cfg)

        def always_down(s, batch, rng):
            raise XlaRuntimeError("UNAVAILABLE")

        t.train_step = always_down
        return t

    with pytest.raises(XlaRuntimeError):
        fit_with_recovery(_config(corpus, tmp_path),
                          trainer_factory=factory, backoff_s=0.0,
                          max_restarts=1)


def test_latest_checkpoint_skips_corrupt_meta(tmp_path):
    """Regression: a truncated meta.json (pre-atomic-write saves, disk
    truncation) crashed latest_checkpoint with JSONDecodeError inside the
    recovery handler, permanently aborting elastic recovery."""
    import json

    from maest_tpu.train.resilience import latest_checkpoint

    ckpts = tmp_path / "checkpoints"
    for tag, epoch in (("epoch-0", 0), ("epoch-1", 1)):
        (ckpts / tag).mkdir(parents=True)
        (ckpts / f"{tag}.meta.json").write_text(json.dumps({"epoch": epoch}))
    (ckpts / "epoch-2").mkdir()
    (ckpts / "epoch-2.meta.json").write_text("")  # truncated by a SIGKILL
    assert latest_checkpoint(tmp_path).endswith("epoch-1")
