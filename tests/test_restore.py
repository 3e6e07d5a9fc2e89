"""Checkpoint restore error-path semantics.

The SWA-structure retry in ``Trainer.restore_checkpoint`` (a no-SWA run
restoring an SWA checkpoint and vice versa — reference: ex_maest.py:99
forces do_swa=False for `test`) must trigger ONLY on a genuine SWA
mismatch, probed from the checkpoint's saved orbax metadata. For any other
restore failure (missing/corrupt checkpoint) the ORIGINAL error surfaces,
never a confusing secondary alt-target one.
"""

import pytest

from maest_tpu.configs import build_experiment_config
from maest_tpu.train.loop import Trainer


def _cfg(tmp_path, swa: bool):
    return build_experiment_config([], [
        "maest.n_classes=8",
        "maest.input_t=62",
        "maest.embed_dim=64",
        "maest.depth=2",
        "maest.num_heads=4",
        "maest.s_patchout_t=1",
        "trainer.devices=1",
        "trainer.precision=fp32",
        f"module.do_swa={swa}",
        f"trainer.default_root_dir={tmp_path}/exp_logs",
    ])


def test_swa_mismatch_restore_both_directions(tmp_path):
    # save WITH SWA, restore WITHOUT (the `test` command path) and back
    tr_swa = Trainer(_cfg(tmp_path, swa=True), run_info={})
    assert tr_swa.state.swa_params  # precondition: SWA buffer exists
    tr_swa.save_checkpoint("epoch-0")
    tr_swa.finalize_checkpoints()
    ckpt = tr_swa.run_dir / "checkpoints" / "epoch-0"

    tr_plain = Trainer(_cfg(tmp_path, swa=False), run_info={})
    tr_plain.restore_checkpoint(str(ckpt))
    assert tr_plain.state.swa_params == {}
    assert int(tr_plain.state.swa_n) == 0

    tr_plain.save_checkpoint("epoch-0")
    tr_plain.finalize_checkpoints()
    ckpt2 = tr_plain.run_dir / "checkpoints" / "epoch-0"
    tr_swa2 = Trainer(_cfg(tmp_path, swa=True), run_info={})
    tr_swa2.restore_checkpoint(str(ckpt2))
    assert tr_swa2.state.swa_params  # fresh window seeded from params


def test_missing_checkpoint_raises_original_error(tmp_path):
    tr = Trainer(_cfg(tmp_path, swa=True), run_info={})
    with pytest.raises(Exception) as ei:
        tr.restore_checkpoint(str(tmp_path / "does-not-exist"))
    # the original orbax error, not the alt-SWA-target retry's: the
    # metadata probe fails for a missing checkpoint and the original
    # restore error is re-raised as the top-level exception
    assert "does-not-exist" in str(ei.value)


def test_corrupt_checkpoint_raises_original_error(tmp_path):
    # a directory that exists but is not an orbax checkpoint
    bogus = tmp_path / "bogus"
    bogus.mkdir()
    (bogus / "junk").write_text("not a checkpoint")
    tr = Trainer(_cfg(tmp_path, swa=False), run_info={})
    with pytest.raises(Exception):
        tr.restore_checkpoint(str(bogus))
