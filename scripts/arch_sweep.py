"""Per-arch numerics + throughput sweep on the real chip.

For each of the eight released arch geometries (reference:
models/maest.py:64-153) this measures, with random reference-init weights:

  * max |sigmoid(logit_bf16) - sigmoid(logit_fp32)| — the bf16 production
    path (Pallas flash + tanh gelu) against the fp32 oracle (XLA attention
    + exact gelu), extending the 30 s spot check to every geometry;
  * bf16 batched inference throughput (audio-s/s/chip, lazy-relay-safe
    in-jit chaining).

Usage: python scripts/arch_sweep.py [--iters 15]
Prints one line per arch + a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# batch per arch keeps step FLOPs roughly constant across clip lengths
BATCH = {"5s": 128, "10s": 96, "20s": 48, "30s": 32}


def clip_secs(arch: str) -> int:
    return int(arch.split("-")[2].rstrip("s"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    from maest_tpu.models.registry import build_config, list_architectures
    from maest_tpu.models.vit import MAESTNet, init_params

    rng = np.random.default_rng(0)
    results = {}
    for arch in list_architectures():
        if not arch.startswith("discogs-maest-"):
            continue  # init-checkpoint archs (PaSST/DeiT) share geometries
        secs = clip_secs(arch)
        cfg = build_config(arch)
        params = init_params(cfg, jax.random.PRNGKey(0))
        params["head_linear"] = dict(
            params["head_linear"],
            kernel=0.02 * jax.random.normal(
                jax.random.PRNGKey(1), params["head_linear"]["kernel"].shape),
        )
        f, t = cfg.img_size

        # --- numerics: bf16 production vs fp32 oracle (batch 2) ---
        x = jnp.asarray(rng.standard_normal((2, f, t)), jnp.float32)[..., None]
        net32 = MAESTNet(
            cfg.replace(attention_impl="xla", gelu_approx="exact"),
            dtype=jnp.float32)
        netbf = MAESTNet(cfg, dtype=jnp.bfloat16)
        l32 = np.asarray(jax.jit(
            lambda p, x, n=net32: n.apply({"params": p}, x, train=False)[0]
        )(params, x), np.float32)
        lbf = np.asarray(jax.jit(
            lambda p, x, n=netbf: n.apply({"params": p}, x, train=False)[0]
        )(params, x), np.float32)
        act_err = float(np.abs(
            1 / (1 + np.exp(-l32)) - 1 / (1 + np.exp(-lbf))).max())

        # --- throughput: bf16, in-jit chained ---
        batch = BATCH[f"{secs}s"]
        pbf = jax.device_put(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), params))
        xb = jnp.asarray(rng.standard_normal((batch, f, t)), jnp.bfloat16)

        @jax.jit
        def fwd(p, x, x0, n=netbf):
            logits, _ = n.apply({"params": p}, x[..., None], train=False)
            return logits, x0 + (1e-6 * logits[0, 0]).astype(x0.dtype)

        logits, o = fwd(pbf, xb, xb)
        _ = float(logits[0, 0])
        t0 = time.perf_counter()
        o = xb
        for _i in range(args.iters):
            logits, o = fwd(pbf, o, xb)
        _ = float(logits[0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        tput = batch * secs / dt

        results[arch] = {
            "act_err_bf16": round(act_err, 5),
            "ms_per_step": round(dt * 1e3, 1),
            "batch": batch,
            "audio_s_per_s": round(tput, 0),
        }
        print(f"{arch}: act_err={act_err:.1e}  {dt*1e3:.0f} ms @ b{batch}"
              f"  -> {tput:.0f} audio-s/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
