"""Backward-kernel int8 speed ceiling rig (30 s train shape, pad 896).

The flash backward runs 5 MXU dots per (head, q-block) against ~2.5 ms of
VPU work — MXU:VPU ~2.6:1 (vs the forward's ~1:1, where 8-bit lost).
int8 runs 2x native on the v5e MXU at BOTH dot classes the backward uses
(K=64 scores-class 3.5x, big-K pv-class 1.8x — scripts/int8_probe2.py),
so the backward is the one kernel where 8-bit could still win.

This rig measures the CEILING only: the int8 variant includes realistic
dequant/requant VPU work (converts, rescale multiplies, rounds) but does
not carry real scales — numerics here are garbage by design. If the rig
cannot beat the bf16 backward by a margin worth the quantized-gradient
risk (>20%), the production version is not built.

  ctrl      production backward pallas kernel (_attn_bwd_kernel path)
  int8      all 5 dots int8 (int32 acc) + dequant/requant passes
  fp8       s/dp dots in e4m3 (K=64 class), dv/dq/dk bf16 — scale-free
            subset (big-K fp8 shows no MXU gain)

Usage: python scripts/bwd_int8_probe.py [--iters 30] [--rounds 3]
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

from maest_tpu.ops import attention as A  # noqa: E402

N = 866          # 30 s train tokens after patchout
N_PAD = 896
B, H, D = 32, 12, 64
G = 6            # tuned bwd group for pad 896
SCALE = D**-0.5

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _bwd_rig_kernel(q_ref, kt_ref, v_ref, do_ref, o_ref, lse_ref,
                    dq_ref, dk_ref, dv_ref, *, kind: str):
    sl = SCALE * A._LOG2E
    for h in range(q_ref.shape[0]):
        q = q_ref[h]
        do = do_ref[h]
        kt = kt_ref[h]
        v = v_ref[h]
        lse = lse_ref[h, 0][:, None]
        delta = jnp.sum(
            do.astype(jnp.float32) * o_ref[h].astype(jnp.float32),
            axis=-1, keepdims=True)

        if kind == "int8":
            # rig: inputs arrive int8; dequants modeled with one convert +
            # one multiply per dot output (production would use row/col
            # scale vectors — same VPU pass count)
            s = jnp.dot(q, kt, preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * (sl * 1e-4)
            p = jnp.exp2(s - lse)
            p8 = jnp.round(p * 127.0).astype(jnp.int8)
            dv = jax.lax.dot_general(
                p8, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * 1e-2
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * 1e-4
            ds8 = jnp.round(
                p * (dp - delta) * (SCALE * 127.0)).astype(jnp.int8)
            dq = jax.lax.dot_general(
                ds8, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * 1e-2
            dk = jax.lax.dot_general(
                ds8, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * 1e-2
        else:  # fp8: K=64 dots in e4m3, big-K dots bf16 (scale-free)
            s = jnp.dot(q, kt, preferred_element_type=jnp.float32) * sl
            p = jnp.exp2(s - lse)
            p_lo = p.astype(jnp.bfloat16)
            dv = jax.lax.dot_general(
                p_lo, do.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p * (dp - delta) * SCALE).astype(jnp.bfloat16)
            dq = jax.lax.dot_general(
                ds, kt.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dq_ref[h] = dq.astype(dq_ref.dtype)
        dk_ref[h] = dk
        dv_ref[h] = dv


def build(kind: str):
    rng = np.random.default_rng(0)
    bh = B * H

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
        return jnp.asarray(rng.standard_normal(shape) * 0.3, dtype)

    if kind == "int8":
        q = mk((bh, N_PAD, D), jnp.int8)
        kt = mk((bh, D, N_PAD), jnp.int8)
        v = mk((bh, N_PAD, D), jnp.int8)
        do = mk((bh, N_PAD, D), jnp.int8)
    elif kind == "fp8":
        q = mk((bh, N_PAD, D), jnp.float8_e4m3fn)
        kt = mk((bh, D, N_PAD), jnp.float8_e4m3fn)
        v = mk((bh, N_PAD, D), jnp.float8_e4m3fn)
        do = mk((bh, N_PAD, D), jnp.float8_e4m3fn)
    else:
        q = mk((bh, N_PAD, D), jnp.bfloat16)
        kt = mk((bh, D, N_PAD), jnp.bfloat16)
        v = mk((bh, N_PAD, D), jnp.bfloat16)
        do = mk((bh, N_PAD, D), jnp.bfloat16)
    o = mk((bh, N_PAD, D), jnp.bfloat16)
    lse = jnp.asarray(rng.standard_normal((bh, 1, N_PAD)) + 8.0, jnp.float32)

    if kind == "ctrl":
        # production backward on (B, N, H, D) inputs — _flash_bwd pads and
        # flattens itself, exactly as the autodiff path calls it
        qb = mk((B, N, H, D), jnp.bfloat16)
        kb = mk((B, N, H, D), jnp.bfloat16)
        vb = mk((B, N, H, D), jnp.bfloat16)
        dob = mk((B, N, H, D), jnp.bfloat16)
        ob = mk((B, N, H, D), jnp.bfloat16)

        def call(qb, kb, vb, ob, lse, dob):
            dq, dk, dv = A._flash_bwd(qb, kb, vb, ob, lse, dob,
                                      block_q=896, block_k=1 << 30,
                                      interpret=False, n_real=N)
            return dq

        @jax.jit
        def run(qb, kb, vb, ob, lse, dob, iters):
            def body(_, carry):
                qb, kb, vb, ob, lse, dob = carry
                dq = call(qb, kb, vb, ob, lse, dob)
                qb = qb + (dq[0, 0, 0, 0] * 0).astype(qb.dtype)
                return qb, kb, vb, ob, lse, dob
            qb, kb, vb, ob, lse, dob = jax.lax.fori_loop(
                0, iters, body, (qb, kb, vb, ob, lse, dob))
            return call(qb, kb, vb, ob, lse, dob)

        return run, (qb, kb, vb, ob, lse, dob)

    def call(q, kt, v, do, o, lse):
        grid = (bh // G,)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_rig_kernel, kind=kind),
            out_shape=[
                jax.ShapeDtypeStruct((bh, N_PAD, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((bh, N_PAD, D), jnp.float32),
                jax.ShapeDtypeStruct((bh, N_PAD, D), jnp.float32),
            ],
            grid=grid,
            in_specs=[
                pl.BlockSpec((G, N_PAD, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, D, N_PAD), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, N_PAD, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, N_PAD, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, N_PAD, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, 1, N_PAD), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((G, N_PAD, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, N_PAD, D), lambda i: (i, 0, 0)),
                pl.BlockSpec((G, N_PAD, D), lambda i: (i, 0, 0)),
            ],
            compiler_params=_VMEM,
        )(q, kt, v, do, o, lse)
        return dq

    @jax.jit
    def run(q, kt, v, do, o, lse, iters):
        def body(_, carry):
            q, kt, v, do, o, lse = carry
            dq = call(q, kt, v, do, o, lse)
            lse = lse + (dq[0, 0, 0] * 0).astype(lse.dtype)
            return q, kt, v, do, o, lse
        q, kt, v, do, o, lse = jax.lax.fori_loop(
            0, iters, body, (q, kt, v, do, o, lse))
        return call(q, kt, v, do, o, lse)

    return run, (q, kt, v, do, o, lse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--kinds", default="ctrl,int8,fp8")
    args = ap.parse_args()

    runs = {}
    for kind in args.kinds.split(","):
        try:
            run, operands = build(kind)
            out = run(*operands, args.iters)
            _ = float(out.ravel()[0].astype(jnp.float32))
            runs[kind] = (run, operands)
            print(f"# compiled {kind}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kind} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for r in range(args.rounds):
        for kind, (run, operands) in runs.items():
            t0 = time.perf_counter()
            out = run(*operands, args.iters)
            _ = float(out.ravel()[0].astype(jnp.float32))
            dt = (time.perf_counter() - t0) / (args.iters + 1) * 1e3
            print(f"round {r} {kind:5s} {dt:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
