"""Train-step throughput benchmark at the TRUE recipe shapes.

Prints ONE JSON line pinning both recipe geometries round-over-round, the
way bench.py pins inference:

  {"metric": "train-step throughput (full recipe step, bf16)",
   "shapes": {"30s_b32": {"ms_per_step": ..., "specs_per_s": ...,
                          "s_patchout_t": 90, "n_tokens": ..., "n_pad": ...},
              "10s_b100": {...}},
   "unit": "specs/sec/chip"}

Why a separate file: the driver parses bench.py's single JSON line; this
artifact is additional (checked in per round as BENCH_TRAIN_r0N.json).

Shapes are the reference training recipes (reference: config_updates.py
pretrain configs — 30 s: s_patchout_t=90 batch 32/4-GPU-equivalent; 10 s:
s_patchout_t=30 batch 100 matching model_speed_test's batch, reference:
ex_maest.py:108-159). The step is the FULL recipe step — AdamW + weight
decay, SWA buffer, SpecAugment+mixup (measured free vs the bare step,
docs/DESIGN.md trainstep_bisect) — so harness-geometry drift like the
round-3 spt=60-vs-90 bug fails loudly here instead of silently skewing
every future A/B.

Records to beat (round 3, v5e): 30 s-B32 169.3 ms -> 189 specs/s;
10 s-B100 199 ms -> 502 specs/s.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")

# (name, clip_seconds, batch, s_patchout_t) — the two recipe shapes the
# perf record is stated in. frames = clip_s * 16000 // 256.
SHAPES = (
    ("30s_b32", 30, 32, 90),
    ("10s_b100", 10, 100, 30),
)


def measure_shape(clip_s: int, batch: int, spt: int, iters: int = 30,
                  rounds: int = 3) -> dict:
    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.train.state import TrainState, make_optimizer
    from maest_tpu.train.steps import AugmentConfig, make_train_step

    frames = clip_s * 16000 // 256
    cfg = build_config("discogs-maest-30s-pw-129e", input_t=frames).replace(
        s_patchout_t=spt
    )
    net = MAESTNet(cfg, dtype=jnp.bfloat16)
    params = init_params(cfg, jax.random.PRNGKey(0))

    # geometry probe (no compile): the padded residual-stream width the
    # blocks actually run at — the round-3 harness bug was exactly this
    # number silently being 1152 instead of 896. n_tokens is the analytic
    # kept count (conv frames minus structured time patchout, + CLS/DIST);
    # n_pad comes from tracing the actual front, so a gate change shows up.
    t_conv = (frames - cfg.patch_size) // cfg.stride[1] + 1
    n_tokens = cfg.grid_size[0] * (t_conv - spt) + 2
    k = jax.random.PRNGKey(0)
    front = jax.eval_shape(
        lambda p, x: net.apply(
            {"params": p}, x, train=True, forward_mode="front",
            rngs={"patchout": k, "droppath": k, "dropout": k},
        ),
        params, jax.ShapeDtypeStruct((batch, 96, frames, 1), jnp.float32),
    )
    n_pad = int(front[0].shape[1])

    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    state = TrainState.create(params, tx, with_swa=True)
    step = make_train_step(net, tx, AugmentConfig())

    rng = np.random.default_rng(0)
    batch_d = {
        "x": jnp.asarray(
            rng.standard_normal((batch, 96, frames), dtype=np.float32)),
        "y": jnp.asarray((rng.random((batch, 400)) < 0.02), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    # warmup + sanity: loss finite, params actually moved
    state, m = step(state, batch_d, key)
    loss0 = float(m["train_loss"])
    assert np.isfinite(loss0), f"non-finite warmup loss {loss0}"

    best = float("inf")
    for _ in range(rounds):
        st = state
        t0 = time.perf_counter()
        for _i in range(iters):
            # steps chain through `st`; the scalar fetch below forces all
            # (the axon relay is lazy — block_until_ready does not execute)
            st, m = step(st, batch_d, key)
        _ = float(m["train_loss"])
        dt = (time.perf_counter() - t0) / iters
        state = st
        best = min(best, dt)

    # sanity: implied FLOP/s below silicon peak (fwd+bwd ~= 3x fwd FLOPs
    # on the kept+padded tokens)
    flop = 3 * (2 * 86.6e6 * n_pad + 12 * 4 * n_pad**2 * 768) * batch
    implied_tflops = flop / best / 1e12
    assert implied_tflops < 400, (
        f"implied {implied_tflops:.0f} TFLOP/s exceeds v5e peak — timing "
        "did not force execution"
    )

    return {
        "ms_per_step": round(best * 1e3, 1),
        "specs_per_s": round(batch / best, 1),
        "s_patchout_t": spt,
        "n_tokens": n_tokens,
        "n_pad": n_pad,
        "implied_tflops": round(implied_tflops, 1),
    }


def main():
    shapes = {}
    for name, clip_s, batch, spt in SHAPES:
        shapes[name] = measure_shape(clip_s, batch, spt)
        print(f"# {name}: {shapes[name]}", file=sys.stderr)
    print(json.dumps({
        "metric": "train-step throughput (full recipe step, bf16)",
        "shapes": shapes,
        "unit": "specs/sec/chip",
    }))


def main_with_retry(attempts: int = 3, backoff_s: float = 20.0):
    """In-process retry for quick transient relay errors (same contract as
    bench.main_with_retry: deterministic harness bugs fail fast)."""
    for i in range(attempts):
        try:
            return main()
        except (AssertionError, TypeError, ValueError, KeyError):
            raise
        except Exception as e:  # noqa: BLE001 — transient; retried
            if i == attempts - 1:
                raise
            print(f"# bench_train attempt {i + 1} failed "
                  f"({type(e).__name__}: {str(e)[:120]}); retrying",
                  file=sys.stderr)
            time.sleep(backoff_s)


if __name__ == "__main__":
    import os

    if os.environ.get("MAEST_BENCH_CHILD"):
        main_with_retry()
    else:
        import bench

        # two shapes => two remote compiles possible; give the child longer
        bench.run_supervised(timeout_s=2400.0, script=__file__)
