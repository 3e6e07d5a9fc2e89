"""Train-step remat-policy A/B on the real chip (VERDICT r2 #7).

Times the CANONICAL jitted train step (make_train_step: spec-augment,
mixup, BCE, AdamW, NaN guard) at the two production train shapes for:

  off       cfg.remat=False               (ship default: memory fits)
  full      remat=True, policy "full"     (save nothing)
  dots      remat=True, policy "dots"     (keep matmul outputs)
  attn_out  remat=True, policy "attn_out" (keep flash-attention outputs
                                           only — backward never re-runs
                                           the attention forward kernel)

Also reports device memory stats when the backend exposes them (the axon
relay may not). Interleaved rounds; lazy-relay-safe loss fetch per round.

Usage: python scripts/remat_ab.py [--iters 30] [--rounds 3]
       [--shapes 30s,10s]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SHAPES = {
    # (arch, batch, s_patchout_t, mel frames). spt follows the pretrain
    # presets (configs.py: 30s -> 90, 10s -> 30). An earlier revision ran
    # the 30s shape at spt=60 (pad 1152, the 20s patchout) — that is the
    # whole of the 231-vs-176 ms "harness gap" noted in docs/DESIGN.md;
    # scripts/trainstep_bisect.py showed adamw/SWA/augment are all free.
    "30s": ("discogs-maest-30s-pw-129e", 32, 90, 1875),
    "10s": ("discogs-maest-10s-pw-129e", 100, 30, 625),
}

VARIANTS = {
    "off": dict(remat=False),
    "full": dict(remat=True, remat_policy="full"),
    "dots": dict(remat=True, remat_policy="dots"),
    "attn_out": dict(remat=True, remat_policy="attn_out"),
}


def mem_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1e6
    except Exception:  # noqa: BLE001 — relay may not expose stats
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--shapes", default="30s,10s")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.train.state import TrainState, make_optimizer
    from maest_tpu.train.steps import AugmentConfig, make_train_step

    for shape in args.shapes.split(","):
        arch, batch, spt, frames = SHAPES[shape]
        rng = np.random.default_rng(0)
        batch_d = {
            "x": jnp.asarray(
                rng.standard_normal((batch, 96, frames), dtype=np.float32)),
            "y": jnp.asarray((rng.random((batch, 400)) < 0.02), jnp.float32),
        }
        key = jax.random.PRNGKey(1)

        steps, states = {}, {}
        for name in args.variants.split(","):
            cfg = build_config(arch).replace(
                s_patchout_t=spt, **VARIANTS[name])
            net = MAESTNet(cfg, dtype=jnp.bfloat16)
            params = init_params(cfg, jax.random.PRNGKey(0))
            tx = make_optimizer(lr_schedule=1e-4, adamw=True,
                                weight_decay=1e-4)
            state = TrainState.create(params, tx)
            step = make_train_step(net, tx, AugmentConfig())
            state, m = step(state, batch_d, key)  # compile + warm
            loss = float(m["train_loss"])
            assert np.isfinite(loss), (shape, name, loss)
            steps[name] = step
            states[name] = state
            print(f"# {shape} compiled {name} (loss {loss:.4f}, "
                  f"mem {mem_mb()} MB)", flush=True)

        times = {n: [] for n in steps}
        for r in range(args.rounds):
            for name, step in steps.items():
                st = states[name]
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, m = step(st, batch_d, key)
                _ = float(m["train_loss"])  # force the chain
                dt = (time.perf_counter() - t0) / args.iters * 1e3
                times[name].append(dt)
                # the step donates its state buffers: carry the live state
                # forward or the next round feeds deleted arrays
                states[name] = st
                print(f"{shape} round {r} {name:8s} {dt:7.2f} ms/step "
                      f"({batch / dt * 1e3:6.1f} specs/s)", flush=True)

        print(f"--- {shape} summary (best round) ---")
        for name, ts in times.items():
            print(f"{shape} {name:8s} {min(ts):7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
