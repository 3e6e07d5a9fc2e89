"""Full-train-step A/B of the int8 attention backward (attention_bwd_quant).

Same canonical-step harness as scripts/remat_ab.py (augment+mixup+BCE+
AdamW+NaN guard, donated state carried across rounds, interleaved rounds).
The rig (scripts/bwd_int8_probe.py) measured the isolated kernel at 2.5 vs
4.7 ms/call; this is the composition that decides accept/reject.

Usage: python scripts/bwd_quant_ab.py [--iters 30] [--rounds 3]
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
    # spt follows the pretrain presets (30s -> 90, 10s -> 30); see the
    # geometry note in scripts/remat_ab.py (an earlier revision ran 30s
    # at spt=60 / pad 1152)
    "30s": ("discogs-maest-30s-pw-129e", 32, 90, 1875),
    "10s": ("discogs-maest-10s-pw-129e", 100, 30, 625),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--shapes", default="30s,10s")
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

        steps, states, losses = {}, {}, {}
        for name, bq in (("bf16", "none"), ("int8", "int8")):
            cfg = build_config(arch).replace(
                s_patchout_t=spt, attention_bwd_quant=bq)
            net = MAESTNet(cfg, dtype=jnp.bfloat16)
            params = init_params(cfg, jax.random.PRNGKey(0))
            tx = make_optimizer(lr_schedule=1e-4, adamw=True,
                                weight_decay=1e-4)
            state = TrainState.create(params, tx)
            step = make_train_step(net, tx, AugmentConfig())
            state, m = step(state, batch_d, key)
            loss = float(m["train_loss"])
            assert np.isfinite(loss), (shape, name, loss)
            steps[name], states[name], losses[name] = step, state, loss
            print(f"# {shape} compiled {name} (loss {loss:.6f})", flush=True)
        print(f"{shape} first-step |dloss| = "
              f"{abs(losses['int8'] - losses['bf16']):.2e}", flush=True)

        times = {n: [] for n in steps}
        for r in range(args.rounds):
            for name, step in steps.items():
                st = states[name]
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, m = step(st, batch_d, key)
                _ = float(m["train_loss"])
                dt = (time.perf_counter() - t0) / args.iters * 1e3
                times[name].append(dt)
                states[name] = st
                print(f"{shape} round {r} {name:5s} {dt:7.2f} ms/step "
                      f"({batch / dt * 1e3:6.1f} specs/s)", flush=True)

        b_, i_ = min(times["bf16"]), min(times["int8"])
        print(f"--- {shape}: bf16 {b_:.2f} int8 {i_:.2f} ms/step "
              f"({(b_ - i_) / b_ * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
