"""Worker process for tests/test_multiprocess.py.

Runs under N REAL processes connected through ``jax.distributed`` (gloo CPU
collectives), each with its own local device set — the execution mode the
reference reaches only via its hand-run multi-node launch script
(reference: ex_maest519.sh:1-23). Every prior multi-device test in this
repo constructs meshes inside ONE process; this worker is where
process-boundary semantics (per-host data shards, coordinator init,
cross-process gather, proc-0 host records, collective checkpointing)
actually execute.

Launched by the test as:
  python tests/multiproc_worker.py <scenario> <process_id> <num_processes> \
      <coordinator_port> <out_dir> [corpus_dir] [ckpt_path]
with env JAX_PLATFORMS=cpu, PALLAS_AXON_POOL_IPS="", XLA_FLAGS="" and
MP_LOCAL_DEVICES set (local devices per process).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

# running as a script puts tests/ (not the repo root) on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# env must be clean before jax import (the test sets these; keep defensive
# defaults so a by-hand launch behaves the same)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("MAEST_TPU_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", int(os.environ.get("MP_LOCAL_DEVICES", "2")))
# match tests/conftest.py so multi-process results are comparable with the
# single-process references computed inside the pytest process
jax.config.update("jax_default_matmul_precision", "highest")

from _mp_common import (  # noqa: E402 — script dir (tests/) is sys.path[0]
    BATCH_N,
    N_STEPS,
    STEP_KEY,
    build_step,
    fit_cfg,
    flatten_params,
    global_batch,
    replicate_host,
)


def check_gather(pid: int, nproc: int):
    """Cross-process eval gather: rank-ordered concatenation on EVERY
    process (the reference's Lightning all_gather, models/module.py:163-180).
    """
    from maest_tpu.train.metrics import gather_across_hosts

    local = np.full((3, 2), pid, np.float32) + np.arange(2, dtype=np.float32)
    out = gather_across_hosts(local)
    expect = np.concatenate(
        [np.full((3, 2), p, np.float32) + np.arange(2, dtype=np.float32)
         for p in range(nproc)]
    )
    np.testing.assert_array_equal(out, expect)


def scenario_steps(pid: int, nproc: int, out_dir: Path, fsdp: bool,
                   tp: bool = False):
    """DP / ZeRO-3 FSDP / Megatron-TP train steps across real processes.

    DP and FSDP: each process generates the SAME synthetic global batch
    (seeded numpy) and feeds only ITS row slice through
    device_prefetch(process_local=True) — exactly the production multi-host
    data path (train/loop.py _fit).

    TP: the ``model`` axis spans ALL devices of BOTH processes, so every
    qkv/fc1 psum is a CROSS-PROCESS gloo collective (DP/FSDP only cross
    the boundary at the gradient reduction); the data axis has size 1, so
    each process supplies the full batch for its addressable devices. The
    test compares against a single-process run over the same partitioning.
    """
    from maest_tpu.data.loader import device_prefetch
    from maest_tpu.parallel.mesh import batch_sharding, make_mesh

    if tp:
        mesh = make_mesh(model_parallel=jax.device_count())
    else:
        mesh = make_mesh()  # all global devices, data-parallel
    step_fn, state = build_step(mesh, fsdp)

    x, y = global_batch()
    if tp:
        local = {"x": x, "y": y}  # data axis = 1: replicated rows
    else:
        lo, hi = pid * BATCH_N // nproc, (pid + 1) * BATCH_N // nproc
        local = {"x": x[lo:hi], "y": y[lo:hi]}

    with mesh:
        shard = batch_sharding(mesh)
        key = jax.random.PRNGKey(STEP_KEY)
        losses = []
        first = True
        for batch in device_prefetch(iter([local] * N_STEPS), shard,
                                     process_local=True):
            if first:
                # the assembled global array must equal the reference batch
                # in row order (proc 0 rows first) — this IS the per-host
                # batch-assembly semantic the single-process tests can't see
                g = replicate_host(batch["x"], mesh)
                np.testing.assert_array_equal(g, x)
                first = False
            state, m = step_fn(state, batch, key)
            losses.append(float(m["train_loss"]))

        final = flatten_params(replicate_host(state.params, mesh))

    check_gather(pid, nproc)

    if pid == 0:
        tag = "tp" if tp else ("fsdp" if fsdp else "dp")
        np.savez(out_dir / f"steps_{tag}.npz",
                 losses=np.array(losses), **final)


def scenario_fit(pid: int, nproc: int, out_dir: Path, corpus: str,
                 ckpt_path: str | None):
    """Full Trainer.fit under multiple processes on a shared synthetic
    corpus: rank-sharded weighted sampling, per-host loading, collective
    orbax checkpointing, cross-process eval gather, proc-0 run records.
    With ``ckpt_path``: a FRESH process set resumes from a checkpoint the
    previous multi-process run committed.
    """
    from maest_tpu.train.loop import Trainer

    cfg = fit_cfg(corpus, str(out_dir / "exp_logs"), None)
    trainer = Trainer(cfg, run_info={"command": "main"})
    if ckpt_path:
        # normally _fit restores from cfg["ckpt_path"]; do it explicitly so
        # resume-at-next-epoch is assertable before training resumes
        trainer.restore_checkpoint(ckpt_path)
        assert trainer.epoch == 1, (
            f"proc {pid}: resume-at-next-epoch expected 1, got {trainer.epoch}"
        )
    res = trainer.fit()
    assert res == {"done": True}

    final = flatten_params(replicate_host(trainer.state.params, trainer.mesh))
    if pid == 0:
        tag = "resume" if ckpt_path else "fit"
        np.savez(out_dir / f"{tag}_params.npz", **final)
        (out_dir / f"{tag}_run_dir.txt").write_text(str(trainer.run_dir))
    # every process must have agreed on the run dir (broadcast timestamp)
    (out_dir / f"runarc_p{pid}.txt").write_text(str(trainer.run_dir))


def scenario_steps_pp(pid: int, nproc: int, out_dir: Path, fsdp: bool):
    """GPipe pipeline parallelism with the ``pipe`` axis spanning the REAL
    process boundary: every stage-to-stage ppermute is a cross-process
    gloo collective (the dryrun only ever runs the pipeline inside one
    process). The mesh grid is transposed so each pipe pair holds one
    device from EACH process; the data-axis rows are then addressable by
    both processes, so each host feeds the full batch (as in the TP
    scenario). Compared against a single-process run over the identical
    (data=2, pipe=2) partitioning."""
    from jax.sharding import Mesh

    from maest_tpu.data.loader import device_prefetch
    from maest_tpu.parallel.mesh import batch_sharding

    from _mp_common import build_step_pp

    devices = jax.devices()
    assert len(devices) == 4
    # reshape (pipe, data, model) then transpose: pipe pairs = (d0, d2) /
    # (d1, d3) — one device of each process per pipeline
    grid = np.array(devices).reshape(2, 2, 1).transpose(1, 0, 2)
    mesh = Mesh(grid, axis_names=("data", "pipe", "model"))
    pipe_procs = {d.process_index for d in grid[0, :, 0]}
    assert len(pipe_procs) == nproc, (
        f"pipe axis does not cross the process boundary: {pipe_procs}")

    step_fn, state = build_step_pp(mesh, fsdp)
    x, y = global_batch()
    local = {"x": x, "y": y}  # every data row is host-addressable: full batch

    with mesh:
        shard = batch_sharding(mesh)
        key = jax.random.PRNGKey(STEP_KEY)
        losses = []
        for batch in device_prefetch(iter([local] * N_STEPS), shard,
                                     process_local=True):
            state, m = step_fn(state, batch, key)
            losses.append(float(m["train_loss"]))
        final = flatten_params(replicate_host(state.params, mesh))

    if pid == 0:
        tag = "pp_fsdp" if fsdp else "pp"
        np.savez(out_dir / f"steps_{tag}.npz",
                 losses=np.array(losses), **final)


def scenario_eval(pid: int, nproc: int, out_dir: Path, corpus: str,
                  ts: bool = False):
    """Rank-sharded eval (reference: discogs/datamodule.py:79-97): each
    host loads only 1/P of the val windows, the replicated eval_step
    output is the on-device gather, and every host computes identical
    metrics. Counts per-host item loads to prove the IO split. ``ts``
    runs the teacher-student variant: y_teacher for the FULL window comes
    from targets_for metadata (small .logits.npy reads), exercising the
    dual-loss eval asymmetry under sharded loading."""
    from maest_tpu.train.loop import Trainer

    cfg = fit_cfg(corpus, str(out_dir / "exp_logs"), None)
    cfg["trainer"]["limit_val_batches"] = 0  # score the full val set
    if ts:
        cfg["datamodule"]["teacher_student"] = {
            "do": True, "teacher_target_base_dir": corpus,
            "teacher_target_threshold": 0.45,
        }
    trainer = Trainer(cfg, run_info={"command": "eval"})
    ds = trainer._val_dataset()

    # force the python item path and count loads on THIS host
    ds.batch_spec = lambda idxs: None
    n_loaded = [0]
    orig = type(ds).__getitem__

    def counting(i, _orig=orig, _ds=ds):
        n_loaded[0] += 1
        return _orig(_ds, i)

    ds.__getitem__ = counting
    metrics = trainer.validate()
    n_loaded_full = n_loaded[0]
    # truncated eval must score the same sample prefix as the replicated
    # path (the sharded generator mirrors batch_size_test-real-row windows)
    trainer.cfg["trainer"]["limit_val_batches"] = 2
    metrics_limited = trainer.validate()
    (out_dir / f"eval_p{pid}.json").write_text(json.dumps(
        {"metrics": metrics, "metrics_limited": metrics_limited,
         "n_loaded": n_loaded_full, "n_items": len(ds)}))


def scenario_predict(pid: int, nproc: int, out_dir: Path, corpus: str):
    """Multi-process extraction: per-FILE partition, each host runs an
    independent local-mesh program and writes only its own .npy files
    (beyond reference — its extract commands are single-GPU,
    ex_maest.py:162-207). Hosts process different window counts, which a
    global-mesh program could not do."""
    from maest_tpu.train.loop import Trainer

    cfg = fit_cfg(corpus, str(out_dir / "exp_logs"), None)
    cfg["datamodule"]["groundtruth_predict"] = f"{corpus}/gt.pk"
    cfg["predict"] = {"transformer_block": 1,
                      "out_dir": str(out_dir / "pred")}
    trainer = Trainer(cfg, run_info={"command": "predict"})
    res = trainer.predict(output_name="embeddings")
    (out_dir / f"predict_p{pid}.json").write_text(json.dumps(res))


def main():
    # a wedged collective hangs silently; dump every thread's stack first
    # so the spawning test's captured log shows WHERE (MP_DUMP_AFTER secs)
    import faulthandler

    faulthandler.dump_traceback_later(
        int(os.environ.get("MP_DUMP_AFTER", "600")), exit=True
    )
    scenario = sys.argv[1]
    pid, nproc = int(sys.argv[2]), int(sys.argv[3])
    port = sys.argv[4]
    out_dir = Path(sys.argv[5])

    from maest_tpu.parallel.mesh import init_distributed

    got_pid = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert got_pid == pid and jax.process_count() == nproc

    if scenario == "steps":
        scenario_steps(pid, nproc, out_dir, fsdp=False)
    elif scenario == "steps_fsdp":
        scenario_steps(pid, nproc, out_dir, fsdp=True)
    elif scenario == "steps_tp":
        scenario_steps(pid, nproc, out_dir, fsdp=False, tp=True)
    elif scenario == "steps_pp":
        scenario_steps_pp(pid, nproc, out_dir, fsdp=False)
    elif scenario == "steps_pp_fsdp":
        scenario_steps_pp(pid, nproc, out_dir, fsdp=True)
    elif scenario == "eval_sharded":
        scenario_eval(pid, nproc, out_dir, sys.argv[6])
    elif scenario == "eval_sharded_ts":
        scenario_eval(pid, nproc, out_dir, sys.argv[6], ts=True)
    elif scenario == "predict":
        scenario_predict(pid, nproc, out_dir, sys.argv[6])
    elif scenario == "fit":
        scenario_fit(pid, nproc, out_dir, sys.argv[6], None)
    elif scenario == "resume":
        scenario_fit(pid, nproc, out_dir, sys.argv[6], sys.argv[7])
    else:
        raise SystemExit(f"unknown scenario {scenario}")
    print(json.dumps({"ok": True, "pid": pid, "scenario": scenario}))


if __name__ == "__main__":
    main()
