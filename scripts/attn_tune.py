"""Attention block-size sweep on the real chip.

For each released arch's sequence length, times the flash kernel across
(n_pad, block_q, block_k) candidates — n_pad may exceed the minimal
128-multiple when a larger pad admits better block divisors (the kernel
masks padded keys, so correctness is unaffected; only the padded-FLOP /
blocking trade-off moves).

Timing is lazy-relay-safe: iterations chain q on the previous output
inside one jitted scan-free loop and the chain is forced with a scalar
fetch (CLAUDE.md: `block_until_ready` does not force on axon).

Usage: python scripts/attn_tune.py [--iters 20] [--batch 32]
Prints one line per config and a best-per-N summary.
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

from maest_tpu.ops import attention as A  # noqa: E402

# actual model sequence lengths (tokens incl. CLS/DIST; the patch conv
# emits floor((T-16)/10)+1 time frames): eval per clip length, plus
# pretrain-mode lengths after structured time patchout (30/60/90 cols).
ARCH_N = {
    "5s": 272, "10s": 551, "20s": 1118, "30s": 1676,
    "10s-train": 281, "20s-train": 578, "30s-train": 866,
}


def _divisor_blocks(n_pad: int, cap: int = 2048):
    return [128 * k for k in range(1, n_pad // 128 + 1)
            if n_pad % (128 * k) == 0 and 128 * k <= cap]


def candidates(n: int):
    """(n_pad, bq, bk) candidates: minimal pad plus up to 3 larger pads."""
    base = (n + 127) // 128 * 128
    seen = set()
    for extra in range(4):
        n_pad = base + extra * 128
        bqs = _divisor_blocks(n_pad)
        for bq in bqs:
            if bq < 256 and bq != n_pad:
                continue  # tiny q blocks never win (grid overhead)
            for bk in bqs:
                if bk > bq:
                    continue
                key = (n_pad, bq, bk)
                if key not in seen:
                    seen.add(key)
                    yield key


def time_config(n: int, n_pad: int, bq: int, bk: int, *, batch: int,
                heads: int, iters: int) -> float:
    """ms per flash_attention call at (batch, n, heads, 64)."""
    rng = np.random.default_rng(0)
    shape = (batch, n, heads, 64)
    q, k, v = (jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.bfloat16)
               for _ in range(3))

    def call(q, k, v):
        qf = jnp.pad(jnp.swapaxes(q, 1, 2).reshape(batch * heads, n, 64),
                     ((0, 0), (0, n_pad - n), (0, 0)))
        vf = jnp.pad(jnp.swapaxes(v, 1, 2).reshape(batch * heads, n, 64),
                     ((0, 0), (0, n_pad - n), (0, 0)))
        kt = jnp.swapaxes(
            jnp.pad(jnp.swapaxes(k, 1, 2).reshape(batch * heads, n, 64),
                    ((0, 0), (0, n_pad - n), (0, 0))), 1, 2)
        import functools

        from jax.experimental import pallas as pl
        (out,) = pl.pallas_call(
            functools.partial(A._attn_kernel, scale=64**-0.5, n_real=n,
                              block_k=bk),
            out_shape=[jax.ShapeDtypeStruct((batch * heads, n_pad, 64),
                                            q.dtype)],
            grid=(batch * heads, n_pad // bq),
            in_specs=[
                pl.BlockSpec((1, bq, 64), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, 64, n_pad), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, n_pad, 64), lambda i, j: (i, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, bq, 64), lambda i, j: (i, j, 0))],
        )(qf, kt, vf)
        return jnp.swapaxes(out[:, :n].reshape(batch, heads, n, 64), 1, 2)

    @jax.jit
    def chained(q, k, v):
        o = call(q, k, v)
        return o, o  # q_next = o

    o, _ = chained(q, k, v)
    _ = float(o[0, 0, 0, 0])  # force warmup
    t0 = time.perf_counter()
    x = q
    for _i in range(iters):
        o, x = chained(x, k, v)
    _ = float(o[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def time_bwd(n: int, bq_target: int, *, batch: int, heads: int,
             iters: int) -> float:
    """ms per combined full-K backward kernel at (batch, n, heads, 64),
    calling _flash_bwd directly with an explicit block_q so every divisor
    block can be measured (production picks via `_pick_bwd_block`)."""
    rng = np.random.default_rng(0)
    shape = (batch, n, heads, 64)
    q, k, v = (jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.bfloat16)
               for _ in range(3))
    g = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.bfloat16)

    @jax.jit
    def chained(q, k, v, g):
        o, lse = A._flash_fwd_lse(q, k, v, block_q=896, block_k=448,
                                  interpret=False)
        dq, dk, dv = A._flash_bwd(q, k, v, o, lse, g, block_q=bq_target,
                                  block_k=1 << 30, interpret=False)
        return dq, dq  # q_next = dq

    o, _ = chained(q, k, v, g)
    _ = float(o[0, 0, 0, 0])
    t0 = time.perf_counter()
    x = q
    for _i in range(iters):
        o, x = chained(x, k, v, g)
    _ = float(o[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--archs", default="30s,20s,10s,5s")
    ap.add_argument("--bwd", action="store_true",
                    help="sweep the combined backward's block_q instead")
    args = ap.parse_args()

    best = {}
    for name in args.archs.split(","):
        n = ARCH_N[name]
        print(f"== {name} (N={n}) ==", flush=True)
        if args.bwd:
            n_pad = (n + 127) // 128 * 128
            for bq in _divisor_blocks(n_pad):
                try:
                    ms = time_bwd(n, bq, batch=args.batch, heads=args.heads,
                                  iters=args.iters)
                except Exception as e:  # noqa: BLE001
                    print(f"  bwd bq={bq}: FAIL {type(e).__name__}: "
                          f"{str(e)[:90]}", flush=True)
                    continue
                print(f"  bwd bq={bq}: {ms:.2f} ms", flush=True)
                if name not in best or ms < best[name][0]:
                    best[name] = (ms, n_pad, bq, -1)
            continue
        for n_pad, bq, bk in candidates(n):
            try:
                ms = time_config(n, n_pad, bq, bk, batch=args.batch,
                                 heads=args.heads, iters=args.iters)
            except Exception as e:  # noqa: BLE001 - report and continue sweep
                print(f"  pad={n_pad} bq={bq} bk={bk}: FAIL "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(f"  pad={n_pad} bq={bq} bk={bk}: {ms:.2f} ms", flush=True)
            if name not in best or ms < best[name][0]:
                best[name] = (ms, n_pad, bq, bk)

    print("\n== best per arch ==")
    for name, (ms, n_pad, bq, bk) in best.items():
        print(f"{name}: {ms:.2f} ms  pad={n_pad} bq={bq} bk={bk}")


if __name__ == "__main__":
    main()
