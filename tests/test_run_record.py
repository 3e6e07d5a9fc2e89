"""Run-record lifecycle tests (reference capability: Sacred's
``FileStorageObserver``, ex_maest.py:37 — run.json status bookkeeping).

Pins the finalization semantics of ``utils/run_record.py`` and the
``Trainer.fit`` error paths: a run killed by ``SystemExit`` (the shape a
SIGTERM handler raises under preemption) must finalize as INTERRUPTED —
never stay RUNNING after the process is gone — and a user Ctrl-C must be
classified as INTERRUPTED, not FAILED, everywhere.
"""

import json

import pytest

from maest_tpu.configs import build_experiment_config
from maest_tpu.train.loop import Trainer
from maest_tpu.utils.run_record import finalize_run_json, write_run_json


def _tiny_cfg(tmp_path):
    return build_experiment_config([], [
        "maest.n_classes=8",
        "maest.input_t=62",
        "maest.embed_dim=64",
        "maest.depth=2",
        "maest.num_heads=4",
        "maest.s_patchout_t=1",
        "trainer.devices=1",
        "trainer.precision=fp32",
        f"trainer.default_root_dir={tmp_path}/exp_logs",
    ])


def _record(trainer):
    return json.loads((trainer.run_dir / "run.json").read_text())


def _raiser(exc):
    def f():
        raise exc
    return f


def test_run_json_written_at_init(tmp_path):
    tr = Trainer(_tiny_cfg(tmp_path), run_info={"command": "main"})
    rec = _record(tr)
    assert rec["status"] == "RUNNING"
    assert rec["command"] == "main"
    assert "config_sha256" in rec and "start_time" in rec


@pytest.mark.parametrize("exc,expected", [
    (SystemExit(0), "INTERRUPTED"),        # clean sys.exit()
    (SystemExit(None), "INTERRUPTED"),     # bare sys.exit()
    (SystemExit(143), "INTERRUPTED"),      # SIGTERM preemption wrapper
    (SystemExit(1), "FAILED"),             # library failure exit
    (KeyboardInterrupt(), "INTERRUPTED"),  # user cancel
    (RuntimeError("boom"), "FAILED"),      # crash
])
def test_fit_error_paths_finalize(tmp_path, monkeypatch, exc, expected):
    tr = Trainer(_tiny_cfg(tmp_path))
    monkeypatch.setattr(tr, "_fit", _raiser(exc))
    with pytest.raises(type(exc)):
        tr.fit()
    rec = _record(tr)
    assert rec["status"] == expected
    assert "stop_time" in rec


def test_fit_success_records_result_and_closes_metrics(tmp_path, monkeypatch):
    tr = Trainer(_tiny_cfg(tmp_path))

    def fake_fit():
        tr.metrics_log.log("train_loss", 0.5, 3)
        return {"best_val_loss": 0.5}

    monkeypatch.setattr(tr, "_fit", fake_fit)
    res = tr.fit()
    rec = _record(tr)
    assert rec["status"] == "COMPLETED"
    assert rec["result"] == {"best_val_loss": 0.5}
    # the metrics.jsonl handle must not leak (resilience retries construct
    # a fresh Trainer per restart attempt)
    assert tr.metrics_log._fh is None
    (line,) = (tr.run_dir / "metrics.jsonl").read_text().splitlines()
    entry = json.loads(line)
    assert entry["name"] == "train_loss" and entry["step"] == 3
    assert res == {"best_val_loss": 0.5}


def test_finalize_tolerates_missing_run_json(tmp_path):
    # a crash before write_run_json must not mask the original error
    finalize_run_json(tmp_path, "FAILED")
    rec = json.loads((tmp_path / "run.json").read_text())
    assert rec["status"] == "FAILED"


def test_write_then_finalize_roundtrip(tmp_path):
    write_run_json(tmp_path, {"a": 1}, {"command": "test"})
    finalize_run_json(tmp_path, "COMPLETED", {"ap": 0.5})
    rec = json.loads((tmp_path / "run.json").read_text())
    assert rec["status"] == "COMPLETED"
    assert rec["result"] == {"ap": 0.5}
    assert rec["command"] == "test"
