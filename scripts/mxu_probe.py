"""MXU rate probes for the attention-kernel dot shapes (v5e).

Measures the standalone Pallas rate of each matmul shape the flash kernel
issues, to separate "structural MXU rate of this shape" from "kernel
pipeline losses":

  k64    (1792, 64) @ (64, 256)    x7   — the scores dot (K = head_dim)
  k64w   (1792, 64) @ (64, 1792)   x1   — scores as one wide dot
  pv     (1792, 256) @ (256, 64)   x7   — the pv dot (N = head_dim)
  pvwide (1792, 1792) @ (1792, 64) x1   — pv as one full-K dot
  ctrl   (1792, 256) @ (256, 256)  x7   — full-tile control

Usage: python scripts/mxu_probe.py [--iters 30] [--programs 48]
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


def _probe_kernel(a_ref, b_ref, out_ref, *, kind: str):
    a = a_ref[0]
    b = b_ref[0]
    if kind == "k64":
        acc = jnp.zeros((N, 256), jnp.float32)
        for j in range(7):
            acc = acc + jnp.dot(a, b[:, j * 256:(j + 1) * 256],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    elif kind == "k64w":
        out_ref[0] = jnp.dot(a, b, preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)
    elif kind == "pv":
        acc = jnp.zeros((N, 64), jnp.float32)
        for j in range(7):
            acc = acc + jnp.dot(a[:, j * 256:(j + 1) * 256],
                                b[j * 256:(j + 1) * 256, :],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    elif kind == "pvwide":
        out_ref[0] = jnp.dot(a, b, preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)
    elif kind == "ctrl":
        acc = jnp.zeros((N, 256), jnp.float32)
        for j in range(7):
            acc = acc + jnp.dot(a[:, j % 2 * 0:][:, :256],
                                b[:, j * 256:(j + 1) * 256][:256],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    elif kind in ("ctrlbig", "k64big"):
        acc = jnp.zeros((N, 256), jnp.float32)
        for j in range(b.shape[-1] // 256):
            acc = acc + jnp.dot(a, b[:, j * 256:(j + 1) * 256],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    elif kind == "pvbig":
        for h in range(a.shape[0]):
            out_ref[0, h] = jnp.dot(
                a[h], b[h], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)


SHAPES = {
    #        a shape        b shape        out shape   flops/program  chained
    "k64":    ((N, 64),   (64, N),    (N, 256), 2 * N * 64 * N, "a"),
    "k64w":   ((N, 64),   (64, N),    (N, N),   2 * N * 64 * N, "a"),
    "pv":     ((N, N),    (N, 64),    (N, 64),  2 * N * N * 64, "b"),
    "pvwide": ((N, N),    (N, 64),    (N, 64),  2 * N * N * 64, "b"),
    "ctrl":   ((N, 256),  (256, 7 * 256), (N, 256), 2 * N * 256 * 7 * 256, "a"),
    # 8x the work per program: isolates per-program fixed overhead
    "ctrlbig": ((N, 256), (256, 56 * 256), (N, 256), 2 * N * 256 * 56 * 256, "a"),
    # the scores shape with 8 heads' worth of K columns in one program
    "k64big": ((N, 64),  (64, 56 * 256), (N, 256), 2 * N * 64 * 56 * 256, "a"),
    # full-K pv dots, 4 heads per program (phase-split kernel candidate)
    "pvbig":  ((4, N, N), (4, N, 64), (4, N, 64), 4 * 2 * N * N * 64, "b"),
}


def time_probe(kind: str, programs: int, iters: int) -> tuple[float, float]:
    """In-jit chained timing: `iters` kernel calls run inside ONE jitted
    fori_loop with a scalar data dependency threaded through the SMALL
    operand, so the lazy relay cannot dedupe or reorder them and host
    overhead is one dispatch."""
    rng = np.random.default_rng(0)
    (sa, sb, so, flops, chain) = SHAPES[kind]
    a = jnp.asarray(rng.standard_normal((programs,) + sa) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((programs,) + sb) * 0.1, jnp.bfloat16)

    def kernel_call(a, b):
        (out,) = pl.pallas_call(
            functools.partial(_probe_kernel, kind=kind),
            out_shape=[jax.ShapeDtypeStruct((programs,) + so, jnp.bfloat16)],
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
            eps = (out[0, 0, 0] * jnp.bfloat16(0.0))  # data dependency only
            if chain == "a":
                a = a + eps
            else:
                b = b + eps
            return a, b
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
    ap.add_argument("--programs", type=int, default=48)
    ap.add_argument("--kinds", default="k64,k64w,pv,pvwide,ctrl")
    args = ap.parse_args()
    for kind in args.kinds.split(","):
        ms, tf = time_probe(kind, args.programs, args.iters)
        print(f"{kind:7s} {ms:7.2f} ms {tf:6.1f} TFLOP/s "
              f"({tf / 197 * 100:4.1f}% of bf16 peak)", flush=True)


if __name__ == "__main__":
    main()
