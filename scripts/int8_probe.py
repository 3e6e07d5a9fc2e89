"""int8 MXU rate probes for the attention dot shapes (v5e).

Round-2 proved the bf16 attention floor is structural: d=64 dot shapes cap
~53 TFLOP/s (scripts/mxu_probe.py) because the K=64 contraction uses half
the 128-deep MXU. v5e advertises 394 int8 TOPS (2x bf16). Question this
probe answers: does an int8 dot at the SAME d=64 shapes actually run
faster, and by how much — including the VPU cost of quantizing inside the
kernel?

Probes (N=1792, the 30 s eval pad class):

  k64_bf16   (N, 64) @ (64, N)  bf16        — baseline scores dot
  k64_i8     (N, 64) @ (64, N)  int8->int32 — pre-quantized scores dot
  k64_i8q    same, but quantize q rows + kT inside the kernel (per-tensor
             scale passed in; measures dot + dequant-to-fp32 cost)
  pv_bf16    (N, N) @ (N, 64)   bf16        — baseline pv dot
  pv_i8      (N, N) @ (N, 64)   int8->int32 — pre-quantized pv dot
  mix_bf16 / mix_i8 — scores dot + softmax-ish exp2 + pv dot in one
             program (composition shape of the real kernel)

Usage: python scripts/int8_probe.py [--iters 30] [--programs 48]
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
    if kind in ("k64_bf16", "k64_i8"):
        pref = jnp.float32 if kind == "k64_bf16" else jnp.int32
        out = jnp.dot(a, b, preferred_element_type=pref)
        out_ref[0] = out.astype(out_ref.dtype)
    elif kind == "k64_i8q":
        # quantize bf16 inputs in-kernel: per-tensor scale (worst-case VPU
        # cost includes the abs-max reduction over the q block)
        sa = jnp.max(jnp.abs(a.astype(jnp.float32))) / 127.0
        sb = jnp.max(jnp.abs(b.astype(jnp.float32))) / 127.0
        qa = jnp.round(a.astype(jnp.float32) / sa).astype(jnp.int8)
        qb = jnp.round(b.astype(jnp.float32) / sb).astype(jnp.int8)
        out = jnp.dot(qa, qb, preferred_element_type=jnp.int32)
        out_ref[0] = (out.astype(jnp.float32) * (sa * sb)).astype(out_ref.dtype)
    elif kind in ("pv_bf16", "pv_i8"):
        pref = jnp.float32 if kind == "pv_bf16" else jnp.int32
        out = jnp.dot(a, b, preferred_element_type=pref)
        out_ref[0] = out.astype(out_ref.dtype)
    elif kind in ("mix_bf16", "mix_i8"):
        # composition: scores (N,64)@(64,N), exp2 elementwise, pv (N,N)@(N,64)
        if kind == "mix_i8":
            s = jnp.dot(a, b, preferred_element_type=jnp.int32)
            p = jnp.exp2(s.astype(jnp.float32) * 1e-4 - 1.0)
            pq = jnp.round(p * 127.0).astype(jnp.int8)
            vq = b.T[:, :64]  # (N, 64) int8 reuse as v
            out = jnp.dot(pq, vq, preferred_element_type=jnp.int32)
            out_ref[0, :, :64] = out.astype(out_ref.dtype)
        else:
            s = jnp.dot(a, b, preferred_element_type=jnp.float32)
            p = jnp.exp2(s * 1e-4 - 1.0)
            v = b.T[:, :64]
            out = jnp.dot(p.astype(jnp.bfloat16), v,
                          preferred_element_type=jnp.float32)
            out_ref[0, :, :64] = out.astype(out_ref.dtype)


SHAPES = {
    #            a shape    b shape   out shape  dtype         flops
    "k64_bf16": ((N, 64),  (64, N),  (N, N),  jnp.bfloat16, 2 * N * 64 * N),
    "k64_i8":   ((N, 64),  (64, N),  (N, N),  jnp.int8,     2 * N * 64 * N),
    "k64_i8q":  ((N, 64),  (64, N),  (N, N),  jnp.bfloat16, 2 * N * 64 * N),
    "pv_bf16":  ((N, N),   (N, 64),  (N, 64), jnp.bfloat16, 2 * N * N * 64),
    "pv_i8":    ((N, N),   (N, 64),  (N, 64), jnp.int8,     2 * N * N * 64),
    "mix_bf16": ((N, 64),  (64, N),  (N, N),  jnp.bfloat16, 2 * 2 * N * 64 * N),
    "mix_i8":   ((N, 64),  (64, N),  (N, N),  jnp.int8,     2 * 2 * N * 64 * N),
}


def time_probe(kind: str, programs: int, iters: int) -> tuple[float, float]:
    """In-jit chained timing (see scripts/mxu_probe.py for the rationale:
    the lazy relay needs a data dependency to serialize the calls)."""
    rng = np.random.default_rng(0)
    (sa, sb, so, dt_in, flops) = SHAPES[kind]
    if dt_in == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (programs,) + sa), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (programs,) + sb), jnp.int8)
        out_dtype = jnp.int32 if kind != "mix_i8" else jnp.float32
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
            eps = out[0, 0, 0].astype(a.dtype) * a.dtype.type(0) \
                if hasattr(a.dtype, "type") else out[0, 0, 0] * 0
            a = a + eps.astype(a.dtype)
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
    ap.add_argument("--kinds",
                    default="k64_bf16,k64_i8,k64_i8q,pv_bf16,pv_i8,"
                            "mix_bf16,mix_i8")
    args = ap.parse_args()
    for kind in args.kinds.split(","):
        try:
            ms, tf = time_probe(kind, args.programs, args.iters)
            print(f"{kind:9s} {ms:7.2f} ms {tf:6.1f} T{'OP' if 'i8' in kind else 'FLOP'}/s "
                  f"({tf / 197 * 100:5.1f}% of bf16 peak)", flush=True)
        except Exception as e:  # noqa: BLE001 — probe script: report & go on
            print(f"{kind:9s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
