"""LR schedule semantics, including the SWA-phase SWALR replacement.

The reference trains with Lightning's ``StochasticWeightAveraging``
(reference: models/module.py:268-273 passes ``swa_lrs=2e-5``;
helpers/swa_callback.py:9-44), which REPLACES the LambdaLR scheduler with
torch ``SWALR`` at the SWA swap epoch: the LR anneals from the current value
to ``swa_lrs`` (cosine, 10 epochs) and then holds — the exp_warmup_linear_down
rampdown stops. These tests pin our step-indexed schedule against a
torch-SWALR oracle that mimics Lightning's exact wiring.
"""

import numpy as np
import pytest

from maest_tpu.configs import apply_override, default_config
from maest_tpu.train.schedules import exp_warmup_linear_down, make_schedule

BASE_LR = 2e-5
STEPS_PER_EPOCH = 7  # deliberately not 1: schedule is step-indexed


def _lightning_swa_lr_trajectory(base_lr, swa_lr, *, max_epochs=131,
                                 swa_epoch_start=50, warm_up_len=5,
                                 ramp_down_start=50, ramp_down_len=50,
                                 last_lr_value=0.01, anneal_epochs=10):
    """LR during each 0-based epoch, computed with torch LambdaLR + SWALR
    stepping exactly as Lightning's fit loop does:

    - LambdaLR steps at every epoch end;
    - at the START of 0-based epoch ``swa_epoch_start - 1`` (Lightning's
      ``swa_start`` property) the scheduler is replaced by
      ``SWALR(optimizer, swa_lrs, anneal_epochs=10, anneal_strategy='cos',
      last_epoch=max_epochs)`` after setting ``group['initial_lr']=swa_lr``
      (Lightning's on_train_epoch_start, verbatim);
    - the active scheduler steps at every epoch end.
    """
    import torch

    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([param], lr=base_lr)
    lam = exp_warmup_linear_down(warm_up_len, ramp_down_len,
                                 ramp_down_start, last_lr_value)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lam)
    swa_swap = max(swa_epoch_start - 1, 0)

    lrs = []
    swa_sched = None
    for epoch in range(max_epochs):
        if swa_sched is None and epoch >= swa_swap:
            for group in opt.param_groups:
                group["initial_lr"] = swa_lr
            swa_sched = torch.optim.swa_utils.SWALR(
                opt, swa_lr=swa_lr, anneal_epochs=anneal_epochs,
                anneal_strategy="cos", last_epoch=max_epochs,
            )
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        (swa_sched if swa_sched is not None else sched).step()
    return np.array(lrs)


def _our_epoch_lrs(swa_lr, *, do_swa=True, max_epochs=131):
    schedule = make_schedule(
        "exp_lin", BASE_LR, STEPS_PER_EPOCH,
        do_swa=do_swa, swa_epoch_start=50, swa_lr=swa_lr,
    )
    # sample mid-epoch: the multiplier must hold constant within an epoch
    return np.array([
        float(schedule(e * STEPS_PER_EPOCH + STEPS_PER_EPOCH // 2))
        for e in range(max_epochs)
    ])


def test_swa_lr_matches_lightning_swalr_oracle():
    # distinct swa_lr so the cosine anneal is actually exercised
    swa_lr = 5e-6
    want = _lightning_swa_lr_trajectory(BASE_LR, swa_lr)
    got = _our_epoch_lrs(swa_lr)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # VERDICT pin epochs: 49 (swap, still base), 55 (mid-anneal), 60 (held),
    # 130 (held to the end)
    assert got[49] == pytest.approx(BASE_LR, rel=1e-5)
    assert swa_lr < got[55] < BASE_LR
    assert got[60] == pytest.approx(swa_lr, rel=1e-5)
    assert got[130] == pytest.approx(swa_lr, rel=1e-5)


def test_swa_default_recipe_holds_base_lr_flat():
    # Reference defaults: lr == swa_lrs == 2e-5 → the SWA phase holds the
    # base LR flat for epochs 49..130 instead of ramping down to 0.01x.
    got = _our_epoch_lrs(BASE_LR)
    np.testing.assert_allclose(got[49:], BASE_LR, rtol=1e-6)
    # and the pre-SWA part is untouched (warmup below base at epoch 1)
    assert got[1] < BASE_LR


def test_no_swa_keeps_rampdown():
    got = _our_epoch_lrs(BASE_LR, do_swa=False)
    assert got[130] == pytest.approx(BASE_LR * 0.01, rel=1e-5)


def test_swa_anneal_epochs_zero_jumps_immediately():
    want = _lightning_swa_lr_trajectory(BASE_LR, 5e-6, anneal_epochs=0)
    schedule = make_schedule("exp_lin", BASE_LR, STEPS_PER_EPOCH,
                             do_swa=True, swa_epoch_start=50, swa_lr=5e-6,
                             swa_anneal_epochs=0)
    got = np.array([float(schedule(e * STEPS_PER_EPOCH))
                    for e in range(131)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_constant_mode_with_swa_anneals():
    schedule = make_schedule("constant", BASE_LR, STEPS_PER_EPOCH,
                             do_swa=True, swa_epoch_start=50, swa_lr=5e-6)
    assert float(schedule(0)) == pytest.approx(BASE_LR)
    assert float(schedule(70 * STEPS_PER_EPOCH)) == pytest.approx(5e-6,
                                                                  rel=1e-5)


def test_swa_freq_override_rejected_with_pointer():
    cfg = default_config()
    assert "swa_freq" not in cfg["module"]
    with pytest.raises(KeyError, match="dead in the reference too"):
        apply_override(cfg, ["module", "swa_freq"], 5)


def test_swa_epoch_window_matches_lightning():
    """Weight-averaging window (end-of-epoch hook) must mirror Lightning's
    start-of-epoch updates over [swa_epoch_start-1, max_epochs-1]: the
    averaged snapshots are the weights after epochs
    swa_epoch_start-2 .. max_epochs-2 — aligned with the SWALR swap and
    never including the final epoch."""
    from maest_tpu.train.loop import swa_epoch_window

    # reference recipe: start=50, 130 epochs -> snapshots after 48..128
    hits = [e for e in range(130) if swa_epoch_window(50, 130, e)]
    assert hits == list(range(48, 129))
    # degenerate smoke-test shape: start=0, 1 epoch -> no update at all
    # (Lightning's average there is the initial weights; our SWA buffer
    # keeps its initial copy, which is the same thing)
    assert [e for e in range(1) if swa_epoch_window(0, 1, e)] == []
    # start=0, 2 epochs -> exactly one update, after epoch 0
    assert [e for e in range(2) if swa_epoch_window(0, 2, e)] == [0]
