"""Bisect the 30s-train-step harness gap: model_speed_test measures
~169 ms/step while the remat/bwd A/B harness measures ~231 ms at the same
batch/shape. Variants toggle the three construction differences:

  base      adamw+wd, with_swa=True, AugmentConfig()      (the 231 harness)
  adam      plain adam, no wd
  noswa     with_swa=False
  adam+noswa  both                                        (the CLI shape)

Usage: python scripts/trainstep_bisect.py [--iters 30]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--spt", type=int, default=60,
                    help="s_patchout_t (60 = the harness-gap shape, pad "
                         "1152; 90 = the actual 30s recipe, pad 896)")
    ap.add_argument("--only", default=None,
                    help="run a single variant by name")
    args = ap.parse_args()

    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.train.state import TrainState, make_optimizer
    from maest_tpu.train.steps import AugmentConfig, make_train_step

    arch, batch, spt, frames = "discogs-maest-30s-pw-129e", 32, args.spt, 1875
    rng = np.random.default_rng(0)
    batch_d = {
        "x": jnp.asarray(
            rng.standard_normal((batch, 96, frames), dtype=np.float32)),
        "y": jnp.asarray((rng.random((batch, 400)) < 0.02), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    cfg = build_config(arch).replace(s_patchout_t=spt)
    net = MAESTNet(cfg, dtype=jnp.bfloat16)
    params0 = init_params(cfg, jax.random.PRNGKey(0))

    variants = {
        "base": dict(adamw=True, with_swa=True),
        "adam": dict(adamw=False, with_swa=True),
        "noswa": dict(adamw=True, with_swa=False),
        "adam+noswa": dict(adamw=False, with_swa=False),
    }
    if args.only:
        variants = {args.only: variants[args.only]}
    for name, kw in variants.items():
        tx = make_optimizer(lr_schedule=1e-4, adamw=kw["adamw"],
                            weight_decay=1e-4 if kw["adamw"] else 0.0)
        # fresh device copy per variant: the step donates its state, so the
        # previous variant consumed the buffers backing params0
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params0)
        state = TrainState.create(params, tx, with_swa=kw["with_swa"])
        step = make_train_step(net, tx, AugmentConfig())
        state, m = step(state, batch_d, key)
        _ = float(m["train_loss"])
        for r in range(3):
            st = state
            t0 = time.perf_counter()
            for _i in range(args.iters):
                st, m = step(st, batch_d, key)
            _ = float(m["train_loss"])
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            state = st
            print(f"{name:10s} round {r} {dt:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
