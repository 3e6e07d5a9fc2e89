"""Attention VPU-floor probes: can cheaper softmax arithmetic beat the
bf16 kernel once fp8 shrinks the MXU time?

Round-3 finding (scripts/int8_kernel_ab.py): int8 (8.06 ms) and fp8
(7.43 ms) QK^T both LOSE to bf16 (6.50 ms) at the production 30 s shape —
the bf16 kernel's softmax VPU work (~6 ms) is fully hidden under ~6.5 ms
of MXU; faster dots expose it. These variants attack the VPU side:

  ctrl       production bf16 kernel (flash_attention)
  bf16sm     bf16 dots + softmax computed IN bf16 (v5e VPU packs bf16
             2/lane; fp32 accumulation only for l and acc)
  fp8sm      fp8 dots + bf16 softmax — both floors cut
  fp8noexp   fp8 dots + constant-shift exp2 (no running max) — bounds
             the max-tracking share
  fp8nomask  fp8 + bf16 softmax + no key mask (n_real == n_pad) — bounds
             the mask share

All variants are measurement rigs (numerics checked but NOT production
paths); a winner gets productionized behind the quant flag with proper
gates. Usage: python scripts/attn_vpu_probe.py [--iters 50] [--rounds 3]
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

from maest_tpu.ops.attention import (  # noqa: E402
    _LOG2E,
    _NEG_INF,
    attention_reference,
    flash_attention,
)

N_REAL = 1676
N_PAD = 1792
BK = 256
B, H, D = 32, 12, 64


def _variant_kernel(q_ref, kt_ref, v_ref, out_ref, *, scale: float,
                    kind: str):
    q = q_ref[0]
    bq, d = q.shape
    sl = scale * _LOG2E
    n_pad = kt_ref.shape[2]
    sm_dtype = jnp.bfloat16 if "sm" in kind or "nomask" in kind else jnp.float32

    pv_dtype = jnp.float8_e4m3fn if "pv8" in kind else jnp.bfloat16
    if "noexp" in kind:
        # constant shift: scores for unit-normal q,k with scale 1/8 stay
        # well under 32; exp2(s - 32) never overflows and loses only
        # far-tail precision
        m_const = jnp.float32(32.0)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc = jnp.zeros((bq, d), jnp.float32)
        for jb in range(n_pad // BK):
            base = jb * BK
            s = jnp.dot(q, kt_ref[0, :, base:base + BK],
                        preferred_element_type=jnp.float32) * sl
            if base + BK > N_REAL:
                pos = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1) + base
                s = jnp.where(pos < N_REAL, s, _NEG_INF)
            p = jnp.exp2(s - m_const)
            l = l + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jnp.dot(p.astype(pv_dtype),
                                v_ref[0, base:base + BK, :].astype(pv_dtype),
                                preferred_element_type=jnp.float32)
        out_ref[0] = (acc / l).astype(out_ref.dtype)
        return

    if kind == "fp8lean":
        # q arrives PRE-SCALED by scale*log2e (folded into the fp8 cast
        # outside — fp8 is a float, so pre-scaling is exact rescaling);
        # v arrives fp8; minimal per-element VPU passes: mask(tail only),
        # max-reduce, exp2(s-m), sum, cast-to-e4m3.
        m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc = jnp.zeros((bq, d), jnp.float32)
        for jb in range(n_pad // BK):
            base = jb * BK
            s = jnp.dot(q, kt_ref[0, :, base:base + BK],
                        preferred_element_type=jnp.float32)
            if base + BK > N_REAL:
                pos = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1) + base
                s = jnp.where(pos < N_REAL, s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            corr = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.dot(
                p.astype(jnp.float8_e4m3fn),
                v_ref[0, base:base + BK, :],
                preferred_element_type=jnp.float32)
            m = m_new
        out_ref[0] = (acc / l).astype(out_ref.dtype)
        return

    m = jnp.full((bq, 1), _NEG_INF, sm_dtype)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)
    for jb in range(n_pad // BK):
        base = jb * BK
        s = (jnp.dot(q, kt_ref[0, :, base:base + BK],
                     preferred_element_type=jnp.float32) * sl
             ).astype(sm_dtype)
        if "nomask" not in kind and base + BK > N_REAL:
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1) + base
            s = jnp.where(pos < N_REAL, s, sm_dtype(_NEG_INF))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2((m - m_new).astype(jnp.float32))
        p = jnp.exp2(s - m_new)  # sm_dtype
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True,
                               dtype=jnp.float32)
        acc = acc * corr + jnp.dot(p.astype(jnp.bfloat16),
                                   v_ref[0, base:base + BK, :],
                                   preferred_element_type=jnp.float32)
        m = m_new
    out_ref[0] = (acc / l).astype(out_ref.dtype)


def build_variant(kind: str, q, k, v):
    if kind == "ctrl":
        @jax.jit
        def runner(q, k, v):
            return flash_attention(q, k, v, n_real=N_REAL)
        return runner

    in_dtype = jnp.float8_e4m3fn if kind.startswith("fp8") else jnp.bfloat16
    scale = D**-0.5

    @jax.jit
    def runner(q, k, v):
        b, n, h, d = q.shape
        qf = jnp.swapaxes(q, 1, 2).reshape(b * h, n, d)
        kf = jnp.swapaxes(k, 1, 2).reshape(b * h, n, d)
        vf = jnp.swapaxes(v, 1, 2).reshape(b * h, n, d)
        pad = N_PAD - n
        qf, kf, vf = (jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                      for x in (qf, kf, vf))
        if kind == "fp8lean":
            qf = qf.astype(jnp.float32) * (scale * _LOG2E)
            vf = vf.astype(jnp.float8_e4m3fn)
        kt = jnp.swapaxes(kf.astype(in_dtype), 1, 2)
        (out,) = pl.pallas_call(
            functools.partial(_variant_kernel, scale=scale, kind=kind),
            out_shape=[jax.ShapeDtypeStruct((b * h, N_PAD, d), q.dtype)],
            grid=(b * h,),
            in_specs=[
                pl.BlockSpec((1, N_PAD, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, d, N_PAD), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, N_PAD, d), lambda i: (i, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, N_PAD, d), lambda i: (i, 0, 0))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qf.astype(in_dtype), kt, vf)
        return jnp.swapaxes(out[:, :n].reshape(b, h, n, d), 1, 2)

    return runner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--kinds",
                    default="ctrl,bf16sm,fp8sm,fp8noexp,fp8nomask")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N_REAL, H, D)) * 0.3,
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N_REAL, H, D)) * 0.3,
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N_REAL, H, D)) * 0.3,
                    jnp.bfloat16)

    runs, outs = {}, {}
    for kind in args.kinds.split(","):
        try:
            base_run = build_variant(kind, q, k, v)

            @jax.jit
            def chained(q, k, v, _r=base_run):
                def body(_, carry):
                    q, k, v = carry
                    out = _r(q, k, v)
                    return (q + (out[0, 0, 0, 0] * 0).astype(q.dtype), k, v)
                q, k, v = jax.lax.fori_loop(0, args.iters, body, (q, k, v))
                return _r(q, k, v)

            out = chained(q, k, v)
            _ = float(out[0, 0, 0, 0].astype(jnp.float32))
            runs[kind] = chained
            outs[kind] = np.asarray(out[:2].astype(jnp.float32))
            print(f"# compiled {kind}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    ref = outs.get("ctrl")
    if ref is not None:
        for kind, o in outs.items():
            if kind != "ctrl":
                print(f"numerics {kind:9s} max|dout| vs ctrl = "
                      f"{np.max(np.abs(o - ref)):.2e}", flush=True)

    for r in range(args.rounds):
        for kind, fn in runs.items():
            t0 = time.perf_counter()
            out = fn(q, k, v)
            _ = float(out[0, 0, 0, 0].astype(jnp.float32))
            dt = (time.perf_counter() - t0) / (args.iters + 1) * 1e3
            print(f"round {r} {kind:9s} {dt:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
