"""fp8 (e4m3) matmul rate probes at the MLP/projection shapes (v5e).

Round-2 rejected int8 MLP because dynamic activation quantization is pure
VPU cost (docs/DESIGN.md). fp8 is scale-free (float): activations cast in
one fusable pass, weights pre-cast once. If the fp8 MXU rate holds at the
big MLP shapes, the dense layers (~57 ms of the 131 ms inference step at
87% bf16 peak) are the last real lever.

Probes (per program; grid over batch of 32):
  fc1_bf16 / fc1_fp8   (1792, 768)  @ (768, 3072)
  fc2_bf16 / fc2_fp8   (1792, 3072) @ (3072, 768)
  qkv_bf16 / qkv_fp8   (1792, 768)  @ (768, 2304)
  xla_bf16 / xla_fp8   same fc1 shape through plain jnp.dot under jit
                       (does XLA emit fp8 MXU ops, or upcast?)

Usage: python scripts/fp8_mlp_probe.py [--iters 30] [--programs 32]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = 1792
PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

SHAPES = {
    "fc1": ((N, 768), (768, 3072)),
    "fc2": ((N, 3072), (3072, 768)),
    "qkv": ((N, 768), (768, 2304)),
}


def _mm_kernel(a_ref, b_ref, out_ref):
    out_ref[0] = jnp.dot(
        a_ref[0], b_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def time_pallas(shape: str, dtype, programs: int, iters: int):
    rng = np.random.default_rng(0)
    sa, sb = SHAPES[shape]
    so = (sa[0], sb[1])
    a = jnp.asarray(rng.standard_normal((programs,) + sa) * 0.1, dtype)
    # weights shared across programs (grid-resident, like the real layer)
    b = jnp.asarray(rng.standard_normal(sb) * 0.05, dtype)[None]

    def call(a, b):
        (out,) = pl.pallas_call(
            _mm_kernel,
            out_shape=[jax.ShapeDtypeStruct((programs,) + so, jnp.bfloat16)],
            grid=(programs,),
            in_specs=[
                pl.BlockSpec((1,) + sa, lambda i: (i, 0, 0)),
                pl.BlockSpec((1,) + sb, lambda i: (0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1,) + so, lambda i: (i, 0, 0))],
            compiler_params=PARAMS,
        )(a, b)
        return out

    return _time(call, a, b, 2 * sa[0] * sa[1] * sb[1] * programs, iters)


def time_xla(shape: str, dtype, programs: int, iters: int):
    rng = np.random.default_rng(0)
    sa, sb = SHAPES[shape]
    a = jnp.asarray(rng.standard_normal((programs,) + sa) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal(sb) * 0.05, dtype)

    def call(a, b):
        return jnp.einsum("bnk,km->bnm", a, b,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    return _time(call, a, b, 2 * sa[0] * sa[1] * sb[1] * programs, iters)


def _time(call, a, b, flops, iters):
    @jax.jit
    def run(a, b):
        def body(_, carry):
            a, b = carry
            out = call(a, b)
            return a + (out.ravel()[0] * 0).astype(a.dtype), b
        a, b = jax.lax.fori_loop(0, iters, body, (a, b))
        return call(a, b)

    o = run(a, b)
    _ = float(o.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    o = run(a, b)
    _ = float(o.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (iters + 1)
    return dt * 1e3, flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--programs", type=int, default=32)
    args = ap.parse_args()
    for shape in ("fc1", "fc2", "qkv"):
        for dname, dt in (("bf16", jnp.bfloat16), ("fp8", jnp.float8_e4m3fn)):
            try:
                ms, tf = time_pallas(shape, dt, args.programs, args.iters)
                print(f"{shape}_{dname:5s} pallas {ms:7.2f} ms {tf:6.1f} T/s "
                      f"({tf / 197 * 100:5.1f}% bf16 peak)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{shape}_{dname} pallas FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    for dname, dt in (("bf16", jnp.bfloat16), ("fp8", jnp.float8_e4m3fn)):
        try:
            ms, tf = time_xla("fc1", dt, args.programs, args.iters)
            print(f"xla_fc1_{dname:5s}  {ms:7.2f} ms {tf:6.1f} T/s "
                  f"({tf / 197 * 100:5.1f}% bf16 peak)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"xla_fc1_{dname} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
