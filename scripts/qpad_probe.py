"""Sublane-only q-padding probe at the 10 s recipe shape (VERDICT r4 #6).

DECOMP10_r04 showed the 10 s train step's 39.4% MFU gap is dominated by
attention pad-class waste: the kernel computes 384x384 score tiles for
281x281 real tokens (1.87x on score FLOPs). The stream-level lever
(padding/slicing the residual) was measured-rejected (ratio 1.37
regresses); this probes the KERNEL-GEOMETRY lever the round-4 verdict
flagged as unmeasured: Mosaic only requires the LANE (key) dim at 128 —
q-block ROWS need sublane-8 alignment, so a 288-row q block (281 -> 288,
not 384) cuts 25% of the padded score rows while keys stay lane-padded
at 384.

Methodology (CLAUDE.md decompose-harness rules): in-jit lax.scan chains,
outputs folded into the carry, scalar fetch to force execution; for the
vjp probe a DENSE random cotangent with all grads folded into the carry.

Usage: python scripts/qpad_probe.py [--iters 30]
Appends results to QPAD_r05.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from maest_tpu.ops import attention as A  # noqa: E402

# TRUE 10 s B100 recipe shape (bench_train/DECOMP10): n_tokens = 281
B, N, H, D = 100, 281, 12, 64


def fwd_qpad(q, k, v, n_qpad: int, g: int, with_lse: bool = False):
    """Forward flash kernel with the q-row axis padded to ``n_qpad``
    (sublane-8 multiple) while keys/values stay at the lane-padded 384.
    Reuses the production kernel body (_attn_kernel) unchanged — only the
    BlockSpecs and array pads differ."""
    b, n, h, d = q.shape
    n_kpad = A._round_up(n, 128)
    assert n_qpad % 8 == 0 and n_qpad >= n

    def flat(x, npad):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        if npad != n:
            x = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
        return x

    qf, kf, vf = flat(q, n_qpad), flat(k, n_kpad), flat(v, n_kpad)
    kt = jnp.swapaxes(kf, 1, 2)
    grid = (b * h // g, 1)
    out_shape = [jax.ShapeDtypeStruct((b * h, n_qpad, d), q.dtype)]
    out_specs = [pl.BlockSpec((g, n_qpad, d), lambda i, j: (i, 0, 0))]
    if with_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b * h, 1, n_qpad), jnp.float32))
        out_specs.append(pl.BlockSpec((g, 1, n_qpad), lambda i, j: (i, 0, 0)))
    res = pl.pallas_call(
        functools.partial(A._attn_kernel, scale=d ** -0.5, n_real=n,
                          block_k=n_kpad),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, n_qpad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((g, d, n_kpad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((g, n_kpad, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=out_specs,
        compiler_params=A._GROUPED_VMEM if g > 1 else None,
    )(qf, kt, vf)
    out = res[0][:, :n, :].reshape(b, h, n, d).swapaxes(1, 2)
    return out


def time_chain(fn, x0, iters: int) -> float:
    """ms per call via an in-jit scan chain (relay-safe)."""

    @jax.jit
    def chain(x):
        def body(c, _):
            o = fn(c)
            return c + (1e-6 * o).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c[0, 0, 0, 0].astype(jnp.float32)

    _ = float(chain(x0))  # compile + warm
    t0 = time.perf_counter()
    r = float(chain(x0))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(r)
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.1, jnp.bfloat16)
        for _ in range(3)
    )

    # numerics first: the 288-row kernel must agree with the oracle
    ref = np.asarray(
        jax.jit(A.attention_reference)(q, k, v), np.float32)
    for g in (8, 12, 24):
        out = np.asarray(jax.jit(
            lambda q: fwd_qpad(q, k, v, 288, g))(q), np.float32)
        err = float(np.abs(out - ref).max())
        assert err < 5e-2, f"qpad g={g} diverged: {err}"

    results = {"shape": f"B{B} N{N} H{H} D{D} (10s recipe)"}

    # forward-only (inference primal)
    results["fwd_prod_ms"] = round(time_chain(
        lambda x: A.flash_attention(x, k, v), q, args.iters), 3)
    for g in (8, 12, 24):
        results[f"fwd_qpad288_g{g}_ms"] = round(time_chain(
            lambda x, g=g: fwd_qpad(x, k, v, 288, g), q, args.iters), 3)

    # forward emitting lse (the train primal's extra store)
    def prod_lse(x):
        out, _ = A._flash_fwd_lse(x, k, v, block_q=896, block_k=448,
                                  interpret=False)
        return out

    def qpad_lse(x, g):
        return fwd_qpad(x, k, v, 288, g, with_lse=True)

    results["fwdlse_prod_ms"] = round(
        time_chain(prod_lse, q, args.iters), 3)
    for g in (8, 12, 24):
        results[f"fwdlse_qpad288_g{g}_ms"] = round(time_chain(
            lambda x, g=g: qpad_lse(x, g), q, args.iters), 3)

    # full train-relevant cost: fwd + bwd through the production vjp
    # (the qpad backward is NOT implemented; this is the baseline the
    # forward saving must be weighed against)
    ct = jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.1, jnp.bfloat16)

    def prod_vjp(x):
        out, pull = jax.vjp(lambda xx: A.flash_attention(xx, k, v), x)
        (dq,) = pull(ct)
        return out + dq

    results["vjp_prod_ms"] = round(time_chain(prod_vjp, q, args.iters), 3)

    out_path = Path(__file__).resolve().parent.parent / "QPAD_r05.json"
    # read-merge-write: the committed file also carries the full-step A/B
    # records (full_step_ab_10s_b100 etc.) that CLAUDE.md and the
    # acceptance bands cite — a re-run must not destroy them
    merged = {}
    if out_path.exists():
        merged = json.loads(out_path.read_text())
    merged.update(results)
    out_path.write_text(json.dumps(merged, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
