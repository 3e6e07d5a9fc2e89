"""On-device 30 s-recipe training soak + resilience drill (VERDICT r3 #2).

Runs the REAL CLI (`maest_tpu.apps.ex_maest main`) at the true 30 s recipe
geometry (s_patchout_t=90, B=32, bf16) on a synthetic corpus for 3 epochs
with async checkpointing, SWA (window starts epoch 1) and per-epoch eval;
SIGINTs it mid-epoch-1 (the preemption stand-in whose lifecycle the run
record documents); relaunches with ``trainer.resilient=True`` resuming the
committed checkpoint; then verifies:

- run 1 run.json status INTERRUPTED, run 2 COMPLETED
- resume-at-next-epoch (run 2 trains epochs 1..2 only)
- SWA window continuity (swa_n across the restart == uninterrupted count)
- metrics.jsonl continuity (epoch-indexed val metrics cover 0..2 across
  the two runs with no repeats)
- end-to-end specs/s vs the 189 compute-step record (the gap on THIS host
  is relay host->device bandwidth, ~50 MB/s; documented, not production)

Writes SOAK_r04.json next to the repo's other round artifacts.

Usage: nohup python -u scripts/soak_drill.py > /tmp/soak_drill.log 2>&1 &
(reference being drilled: ex_maest.py:45,90 manual resume;
helpers/swa_callback.py SWA; no failure handling exists in the reference)
"""

from __future__ import annotations

import json
import os
import pickle
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
ROOT = Path(os.environ.get("SOAK_ROOT", "/tmp/soak_r04"))
EPOCH_LEN = 3840  # 120 steps/epoch at global batch 32
MAX_EPOCHS = 3


def build_corpus(root: Path) -> Path:
    corpus = root / "corpus"
    corpus.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    gt = {}
    for i in range(64):
        name = f"clip{i}.mmap"
        frames = int(rng.integers(1950, 2400))  # > 1875-frame window
        mel = (rng.standard_normal((frames, 96)) * 1.2 + 2.07).astype("float16")
        mel.tofile(corpus / name)
        y = np.zeros(400, dtype="float16")
        y[rng.choice(400, size=3, replace=False)] = 1.0
        gt[name] = y
    with open(corpus / "gt.pk", "wb") as f:
        pickle.dump(gt, f)
    return corpus


def overrides(corpus: Path, extra: list[str]) -> list[str]:
    return [
        "main", "with", "maest_30s_from_passt_pretrain",
        "maest.pretrained=False",  # hermetic: no checkpoint fetch
        f"datamodule.base_dir={corpus}",
        f"datamodule.groundtruth_train={corpus}/gt.pk",
        f"datamodule.groundtruth_val={corpus}/gt.pk",
        "datamodule.batch_size_train=32",
        "datamodule.batch_size_test=8",
        "datamodule.num_workers=4",
        f"datamodule.sampler.epoch_len={EPOCH_LEN}",
        f"trainer.max_epochs={MAX_EPOCHS}",
        "trainer.limit_val_batches=4",
        "trainer.log_every_n_steps=20",
        f"trainer.default_root_dir={ROOT}/exp_logs",
        "module.swa_epoch_start=2",  # SWA window = end of epochs 0 and 1
        "module.optimizer.warm_up_len=1",
    ] + extra


def launch(corpus: Path, extra: list[str], log: Path) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-u", "-m", "maest_tpu.apps.ex_maest",
         *overrides(corpus, extra)],
        cwd=REPO, stdout=open(log, "w"), stderr=subprocess.STDOUT,
        start_new_session=True,  # its own pgroup: signals stay targeted
    )


def newest_run_dir(before: set, proc=None) -> Path:
    root = ROOT / "exp_logs"
    while True:
        now = {p for p in root.iterdir() if p.is_dir()} if root.is_dir() else set()
        fresh = now - before
        if fresh:
            return max(fresh, key=lambda p: p.name)
        # child died before creating its run dir (bad override, import
        # error, relay down in Trainer.__init__): fail, don't spin forever
        if proc is not None and proc.poll() is not None:
            raise RuntimeError(
                f"training process exited (rc={proc.returncode}) before "
                "creating a run dir — see its log")
        time.sleep(2)


def wait_for(pred, timeout_s: float, what: str, proc=None):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if pred():
            return
        if proc is not None and proc.poll() is not None:
            raise RuntimeError(f"process exited (rc={proc.returncode}) "
                               f"while waiting for {what}")
        time.sleep(5)
    raise TimeoutError(f"timed out waiting for {what}")


def read_metrics(run_dir: Path) -> list[dict]:
    p = run_dir / "metrics.jsonl"
    if not p.exists():
        return []
    return [json.loads(ln) for ln in p.read_text().splitlines() if ln.strip()]


def train_steps_logged(run_dir: Path) -> int:
    return max((m["step"] for m in read_metrics(run_dir)
                if m["name"] == "train_loss"), default=-1)


def main():
    ROOT.mkdir(parents=True, exist_ok=True)
    corpus = build_corpus(ROOT)
    exp_root = ROOT / "exp_logs"
    exp_root.mkdir(parents=True, exist_ok=True)
    report = {"geometry": {"clip": "30s", "batch": 32, "s_patchout_t": 90,
                           "steps_per_epoch": EPOCH_LEN // 32}}

    # ---- run 1: train into epoch 1, then SIGINT mid-epoch -----------------
    before = {p for p in exp_root.iterdir() if p.is_dir()}
    p1 = launch(corpus, [], ROOT / "run1.log")
    run1 = newest_run_dir(before, p1)
    print(f"run1 dir: {run1}", flush=True)

    steps_per_epoch = EPOCH_LEN // 32
    # epoch-0 checkpoint committed AND epoch-1 training visibly under way
    wait_for(lambda: (run1 / "checkpoints" / "epoch-0.meta.json").exists(),
             7200, "epoch-0 checkpoint", p1)
    wait_for(lambda: train_steps_logged(run1) >= steps_per_epoch + 40,
             3600, "mid-epoch-1 progress", p1)
    t_kill = time.time()
    os.killpg(p1.pid, signal.SIGINT)  # preemption stand-in
    p1.wait(timeout=300)
    report["run1"] = {
        "dir": str(run1),
        "rc": p1.returncode,
        "killed_at_step": train_steps_logged(run1),
        "status": json.loads((run1 / "run.json").read_text())["status"],
    }
    print(f"run1 interrupted: {report['run1']}", flush=True)
    assert report["run1"]["status"] == "INTERRUPTED", report["run1"]

    ckpt = run1 / "checkpoints" / "epoch-0"
    assert ckpt.is_dir()

    # ---- run 2: resilient resume ------------------------------------------
    before = {p for p in exp_root.iterdir() if p.is_dir()}
    p2 = launch(corpus, ["trainer.resilient=True", f"ckpt_path={ckpt}"],
                ROOT / "run2.log")
    run2 = newest_run_dir(before, p2)
    print(f"run2 dir: {run2}", flush=True)
    rc2 = p2.wait(timeout=7200)
    m2 = read_metrics(run2)
    report["run2"] = {
        "dir": str(run2), "rc": rc2,
        "status": json.loads((run2 / "run.json").read_text())["status"],
        "resumed_from": str(ckpt),
        "kill_to_run2_done_s": round(time.time() - t_kill, 1),
    }
    assert rc2 == 0 and report["run2"]["status"] == "COMPLETED", report["run2"]

    # ---- verification -------------------------------------------------------
    # resume-at-next-epoch: run2's val epochs are exactly 1 and 2
    val_epochs_r1 = sorted(m["step"] for m in read_metrics(run1)
                           if m["name"] == "val_loss")
    val_epochs_r2 = sorted(m["step"] for m in m2 if m["name"] == "val_loss")
    assert val_epochs_r1 == [0], val_epochs_r1
    assert val_epochs_r2 == [1, 2], val_epochs_r2
    # metrics continuity: train step counter carries across the restart
    # (optimizer step restored from the checkpoint)
    first_r2_step = min(m["step"] for m in m2 if m["name"] == "train_loss")
    assert steps_per_epoch <= first_r2_step <= steps_per_epoch + 20, first_r2_step

    # SWA continuity: window = end of epochs 0,1 -> swa_n == 2 in the final
    # checkpoint despite the restart (epoch-0 update from run1's checkpoint,
    # epoch-1 update from run2)
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(str((run2 / "checkpoints" / "epoch-2").absolute()))
    swa_n = int(np.asarray(restored["swa_n"]))
    assert swa_n == 2, f"SWA continuity broken: swa_n={swa_n}, want 2"
    report["swa_n_final"] = swa_n

    # end-to-end throughput from run2's uninterrupted epochs
    log2 = (ROOT / "run2.log").read_text()
    import re

    epoch_lines = re.findall(r"epoch (\d+): (\d+) steps in ([0-9.]+)s", log2)
    for ep, n, dt in epoch_lines:
        report.setdefault("epoch_times", {})[ep] = {
            "steps": int(n), "sec": float(dt),
            "specs_per_s": round(int(n) * 32 / float(dt), 1),
        }
    print(json.dumps(report, indent=2), flush=True)
    (REPO / "SOAK_r04.json").write_text(json.dumps(report, indent=2) + "\n")
    print("soak drill PASSED", flush=True)


if __name__ == "__main__":
    main()
