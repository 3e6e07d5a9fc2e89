"""On-device smoke + timing for the single-forward extraction path.

Round-2 change: `make_predict_step` computes logits AND the block-k
2304-d embedding in ONE forward via ``tap_block`` (reference runs the
truncated forward separately per output, ex_maest.py:162-217 driving
models/maest.py:811-829). This script measures, on the attached chip:

  1. the shipped predict step (logits + embeddings, one forward),
  2. a logits-only forward (lower bound),
  3. the two-forward emulation (full forward + truncated block-k
     forward) that extraction would cost without the tap,

with the lazy-relay-safe methodology (in-jit chaining, scalar fetch).
Prints one JSON line. Usage: python scripts/extract_smoke.py [--iters N]
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


def timed(fn, p, xb, iters):
    out, o = fn(p, xb, xb)
    _ = float(out[0, 0])  # force (relay-safe)
    t0 = time.perf_counter()
    o = xb
    for _ in range(iters):
        out, o = fn(p, o, xb)
    _ = float(out[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params

    cfg = build_config("discogs-maest-30s-pw-129e")
    net = MAESTNet(cfg, dtype=jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        init_params(cfg, jax.random.PRNGKey(0)),
    )
    rng = np.random.default_rng(0)
    xb = jnp.asarray(
        rng.standard_normal((args.batch, 96, 1875)), jnp.bfloat16)

    def chain(x0, scalar_src):
        return x0 + (1e-6 * scalar_src).astype(x0.dtype)

    @jax.jit
    def predict_tap(p, x, x0):
        out = net.apply({"params": p}, x[..., None], train=False,
                        tap_block=7)
        logits, emb = out[0], out[-1]
        return logits, chain(x0, logits[0, 0] + emb[0, 0])

    @jax.jit
    def logits_only(p, x, x0):
        logits, _ = net.apply({"params": p}, x[..., None], train=False)
        return logits, chain(x0, logits[0, 0])

    @jax.jit
    def two_forward(p, x, x0):
        logits, _ = net.apply({"params": p}, x[..., None], train=False)
        _, emb = net.apply({"params": p}, x[..., None], train=False,
                           transformer_block=7)
        return logits, chain(x0, logits[0, 0] + emb[0, 0])

    res = {}
    for name, fn in [("predict_tap", predict_tap),
                     ("logits_only", logits_only),
                     ("two_forward", two_forward)]:
        dt = timed(fn, params, xb, args.iters)
        res[name + "_ms"] = round(dt * 1e3, 1)
        print(f"{name}: {dt*1e3:.1f} ms/step", flush=True)

    res["tap_speedup_vs_two_forward"] = round(
        res["two_forward_ms"] / res["predict_tap_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
