"""Kernel-level A/B of the shipped int8 flash-attention path on the chip.

Times maest_tpu.ops.attention.flash_attention at the production inference
shape (B=32, N=1676 -> pad 1792, H=12, d=64) for quant in
(None, qk8, qk8pv8), including the XLA-side quantization (it is part of
the dispatched program, exactly as in the model). Lazy-relay-safe
chained timing. Also reports max|Δout| vs the bf16 kernel.

Usage: python scripts/int8_kernel_ab.py [--iters 50] [--rounds 3]
       [--n 1676] [--batch 32]
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

from maest_tpu.ops.attention import flash_attention  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n", type=int, default=1676)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--quants", default="none,qk8,qk8pv8")
    args = ap.parse_args()

    b, n, h, d = args.batch, args.n, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.3, jnp.bfloat16)

    fns, outs = {}, {}
    for qm in args.quants.split(","):
        quant = None if qm == "none" else qm

        @jax.jit
        def run(q, k, v, _quant=quant):
            def body(_, carry):
                q, k, v = carry
                out = flash_attention(q, k, v, quant=_quant)
                q = q + (out[0, 0, 0, 0] * 0).astype(q.dtype)
                return q, k, v
            q, k, v = jax.lax.fori_loop(0, args.iters, body, (q, k, v))
            return flash_attention(q, k, v, quant=_quant)

        out = run(q, k, v)
        _ = float(out[0, 0, 0, 0].astype(jnp.float32))  # compile + warm
        fns[qm] = run
        outs[qm] = np.asarray(out[:2].astype(jnp.float32))
        print(f"# compiled {qm}", flush=True)

    base = outs.get("none")
    if base is not None:
        for qm, o in outs.items():
            if qm != "none":
                print(f"numerics {qm:8s} max|dout| vs bf16 kernel = "
                      f"{np.max(np.abs(o - base)):.2e}", flush=True)

    flops = 2 * 2 * b * h * n * n * d
    times = {qm: [] for qm in fns}
    for r in range(args.rounds):
        for qm, run in fns.items():
            t0 = time.perf_counter()
            out = run(q, k, v)
            _ = float(out[0, 0, 0, 0].astype(jnp.float32))
            dt = (time.perf_counter() - t0) / (args.iters + 1)
            times[qm].append(dt * 1e3)
            print(f"round {r} {qm:8s} {dt * 1e3:7.3f} ms/call "
                  f"({flops / dt / 1e12:5.1f} T/s)", flush=True)

    print("--- best-round summary ---")
    for qm, ts in times.items():
        print(f"{qm:8s} {min(ts):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
