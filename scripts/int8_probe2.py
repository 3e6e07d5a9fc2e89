"""Second-round int8/fp8 MXU rate probes: amortized-output variants.

scripts/int8_probe.py's single-dot probes turned out OUTPUT-BOUND (the
(N, N) score write dominates: k64_i8 at 1.32 ms = ~465 GB/s of int32
writes, nowhere near measuring the dot). These variants accumulate many
K=64 dots into one small (N, 256) output — the shape class round 2 used
to establish the bf16 52.9 TFLOP/s floor (scripts/mxu_probe.py k64big):

  k64big_bf16   (N,64) @ (64, 56*256) bf16, fp32 acc   — floor control
  k64big_i8     same, int8 -> int32 acc                — true int8 rate
  k64big_i8cvt  int8 dots, each 256-block converted to fp32 and
                rescaled by a row vector before accumulating — the
                actual qk8 kernel pattern (dot + astype + rescale)
  k64big_fp8    float8_e4m3fn operands, fp32 acc       — no convert pass
  pvbig_bf16    4x (N,N) @ (N,64) bf16                 — pv control
  pvbig_i8      same int8->int32                       — pv int8 rate

Usage: python scripts/int8_probe2.py [--iters 30] [--programs 8]
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
R = 56  # accumulated 256-col dot blocks per program
PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _probe_kernel(a_ref, b_ref, out_ref, *, kind: str):
    a = a_ref[0]
    b = b_ref[0]
    if kind == "k64big_bf16":
        acc = jnp.zeros((N, 256), jnp.float32)
        for j in range(R):
            acc = acc + jnp.dot(a, b[:, j * 256:(j + 1) * 256],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    elif kind == "k64big_i8":
        acc = jnp.zeros((N, 256), jnp.int32)
        for j in range(R):
            acc = acc + jnp.dot(a, b[:, j * 256:(j + 1) * 256],
                                preferred_element_type=jnp.int32)
        out_ref[0] = acc
    elif kind == "k64big_i8cvt":
        acc = jnp.zeros((N, 256), jnp.float32)
        row = a[:, :1].astype(jnp.float32) * 1e-4  # (N, 1) row scales
        for j in range(R):
            s = jnp.dot(a, b[:, j * 256:(j + 1) * 256],
                        preferred_element_type=jnp.int32)
            acc = acc + s.astype(jnp.float32) * row
        out_ref[0] = acc.astype(out_ref.dtype)
    elif kind == "k64big_fp8":
        acc = jnp.zeros((N, 256), jnp.float32)
        for j in range(R):
            acc = acc + jnp.dot(a, b[:, j * 256:(j + 1) * 256],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    elif kind in ("pvbig_bf16", "pvbig_i8"):
        pref = jnp.float32 if kind == "pvbig_bf16" else jnp.int32
        for h in range(a.shape[0]):
            out_ref[0, h] = jnp.dot(a[h], b[h], preferred_element_type=pref
                                    ).astype(out_ref.dtype)


SHAPES = {
    "k64big_bf16": ((N, 64), (64, R * 256), (N, 256), jnp.bfloat16,
                    2 * N * 64 * R * 256),
    "k64big_i8":   ((N, 64), (64, R * 256), (N, 256), jnp.int8,
                    2 * N * 64 * R * 256),
    "k64big_i8cvt": ((N, 64), (64, R * 256), (N, 256), jnp.int8,
                     2 * N * 64 * R * 256),
    "k64big_fp8":  ((N, 64), (64, R * 256), (N, 256), jnp.float8_e4m3fn,
                    2 * N * 64 * R * 256),
    "pvbig_bf16":  ((4, N, N), (4, N, 64), (4, N, 64), jnp.bfloat16,
                    4 * 2 * N * N * 64),
    "pvbig_i8":    ((4, N, N), (4, N, 64), (4, N, 64), jnp.int8,
                    4 * 2 * N * N * 64),
}


def time_probe(kind: str, programs: int, iters: int) -> tuple[float, float]:
    rng = np.random.default_rng(0)
    (sa, sb, so, dt_in, flops) = SHAPES[kind]
    if dt_in == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (programs,) + sa), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (programs,) + sb), jnp.int8)
        out_dtype = jnp.int32 if kind != "k64big_i8cvt" else jnp.bfloat16
    else:
        a = jnp.asarray(rng.standard_normal((programs,) + sa) * 0.1, dt_in)
        b = jnp.asarray(rng.standard_normal((programs,) + sb) * 0.1, dt_in)
        out_dtype = jnp.bfloat16

    def kernel_call(a, b):
        (out,) = pl.pallas_call(
            functools.partial(_probe_kernel, kind=kind),
            out_shape=[jax.ShapeDtypeStruct((programs,) + so, out_dtype)],
            grid=(programs,),
            in_specs=[
                pl.BlockSpec((1,) + sa,
                             lambda i, _r=len(sa): (i,) + (0,) * _r),
                pl.BlockSpec((1,) + sb,
                             lambda i, _r=len(sb): (i,) + (0,) * _r),
            ],
            out_specs=[pl.BlockSpec((1,) + so,
                                    lambda i, _r=len(so): (i,) + (0,) * _r)],
            compiler_params=PARAMS,
        )(a, b)
        return out

    @jax.jit
    def run(a, b):
        def body(_, carry):
            a, b = carry
            out = kernel_call(a, b)
            eps = (out[0].ravel()[0] * 0).astype(a.dtype)
            return a + eps, b
        a, b = jax.lax.fori_loop(0, iters, body, (a, b))
        return kernel_call(a, b)

    o = run(a, b)
    _ = float(o.ravel()[0].astype(jnp.float32))  # warmup + compile
    t0 = time.perf_counter()
    o = run(a, b)
    _ = float(o.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (iters + 1)
    return dt * 1e3, flops * programs / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--programs", type=int, default=8)
    ap.add_argument("--kinds", default=",".join(SHAPES))
    args = ap.parse_args()
    for kind in args.kinds.split(","):
        try:
            ms, tf = time_probe(kind, args.programs, args.iters)
            print(f"{kind:12s} {ms:7.2f} ms {tf:6.1f} T/s "
                  f"({tf / 197 * 100:5.1f}% of bf16 peak)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe script: report & go on
            print(f"{kind:12s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
