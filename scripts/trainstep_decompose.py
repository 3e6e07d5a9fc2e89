"""Component decomposition of the 30 s-recipe train step (VERDICT r3 #3).

The forward floor has a component-by-component proof (docs/DESIGN.md); the
169.3 ms/30 s-B32 train step only had a bisect (adamw/SWA/augment free).
This script accounts for the remaining time with the same rigor:

  stage programs (all chained on device; scalar fetch forces the chain):
    full      the production train step (adamw + SWA + augment)
    grad      value_and_grad of the exact step loss (no update)
    fwd       the step loss alone (augment + mixup + train-mode forward)
    aug       _prepare (norm+SpecAugment) + mixup alone
    update    apply_guarded_update on fixed grads (adamw + SWA + guard)
  derived:  backward = grad - fwd;  update ~= full - grad

  per-component programs at the exact call geometry (B=32, n_pad=896,
  H=12, d=64, E=768), each measured as an in-jit lax.scan chain (one
  dispatch per round — per-iteration eager chaining costs ~1-2 ms of
  relay dispatch per iter, which swamps 2-6 ms kernels; the first version
  of this script measured components that summed to 1.5x the step):
    attn_fwd / attn_grad    the Pallas flash kernel, 12 calls/step
    proj_fwd / proj_grad    qkv (768->2304) + out (768->768) matmuls, 12/step
    mlp_fwd / mlp_grad      fc1+gelu+fc2 at (32, 896, 768<->3072), 12/step
    conv_fwd / conv_grad    patch-embed conv 16x16 s10 on (32,96,1875,1)
  plus a depth-6 grad run: (T12 - T6)/6 = marginal per-block fwd+bwd cost,
  separating block cost from fixed overhead (conv, heads, augment). The
  grad chains consume EVERY grad output in the scan carry (an unused
  d-weight grad is DCE'd out of the compiled program and under-reports).

Writes one JSON line (checked into docs/DESIGN.md's round-4 table).
Usage: nohup python -u scripts/trainstep_decompose.py [--shape 10s] > /tmp/decomp.log 2>&1 &
Reference math being accelerated: models/maest.py:381-420 backward.

--shape picks the recipe geometry (the repo's composition rule: measure
at BOTH true shapes):
  30s: B=32,  frames=1875, spt=90 -> stream N=896 (pad-once, n_real=866)
  10s: B=100, frames=625,  spt=30 -> stream N=281 (pad-once gated OFF;
       the flash kernel pads 281->384 internally per call, everything
       else computes on 281 rows)
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

# shape -> (batch, frames, s_patchout_t, stream N, n_real for the kernel)
GEOMETRIES = {
    "30s": (32, 1875, 90, 896, 866),
    # round 5: the 10 s stream runs SUBLANE pad-once (281 -> 288 with
    # n_real=281); isolated components must match the shipped geometry
    "10s": (100, 625, 30, 288, 281),
}


def timed(fn, args, iters=30, rounds=3, chain=None):
    """Best-of-rounds ms/iter. ``chain(out, args) -> args`` threads each
    iteration's output into the next call so the final scalar fetch forces
    the whole chain (the axon relay executes lazily)."""
    if chain is None:
        chain = lambda out, a: a  # noqa: E731
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])  # force (relay is lazy)
    # thread the warmup output too: donating programs (the full train
    # step) consumed their input buffers during warmup
    args = chain(out, args)
    best = float("inf")
    for _r in range(rounds):
        # args rolls FORWARD across rounds: a donating program (the full
        # train step) consumed the previous round's input buffers, so
        # restarting a round from a stale `args` is a use-after-donate
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(*args)
            args = chain(out, args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return round(best, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--shape", default="30s", choices=sorted(GEOMETRIES))
    args = ap.parse_args()
    BATCH, FRAMES, SPT, N_STREAM, N_REAL = GEOMETRIES[args.shape]

    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.ops.augment import mixup
    from maest_tpu.train.state import TrainState, make_optimizer
    from maest_tpu.train.steps import (
        AugmentConfig,
        _prepare,
        apply_guarded_update,
        bce_with_logits,
        make_train_step,
    )

    res = {}
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((BATCH, 96, FRAMES), dtype=np.float32)
    y_host = (rng.random((BATCH, 400)) < 0.02).astype(np.float32)
    batch_d = {"x": jnp.asarray(x_host), "y": jnp.asarray(y_host)}
    key = jax.random.PRNGKey(1)
    aug = AugmentConfig()

    def build(depth):
        cfg = build_config("discogs-maest-30s-pw-129e", input_t=FRAMES).replace(
            s_patchout_t=SPT, depth=depth
        )
        net = MAESTNet(cfg, dtype=jnp.bfloat16)
        params = init_params(cfg, jax.random.PRNGKey(0))
        return cfg, net, params

    cfg, net, params = build(12)
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)

    def loss_fn(params, x_in, k):
        k = jax.random.fold_in(k, 0)
        k_mask, k_mix, k_patch, k_drop, k_dropout = jax.random.split(k, 5)
        x = _prepare(x_in, aug, k_mask, train=True)
        x, (y,) = mixup(k_mix, x, (batch_d["y"],), aug.mixup_alpha)
        out = net.apply({"params": params}, x, train=True, rngs={
            "patchout": k_patch, "droppath": k_drop, "dropout": k_dropout})
        return bce_with_logits(out[0], y)

    chain_x = lambda out, a: (a[0], a[1] + (1e-6 * out).astype(a[1].dtype), a[2])  # noqa: E731

    # --- stage programs ----------------------------------------------------
    state = TrainState.create(
        jax.tree.map(lambda p: jnp.array(p, copy=True), params), tx,
        with_swa=True)
    step = make_train_step(net, tx, aug)

    # full: chain through the step's own state donation
    full = timed(lambda s: step(s, batch_d, key), (state,),
                 iters=args.iters,
                 chain=lambda out, a: (out[0],))
    res["full"] = full

    fwd = timed(jax.jit(loss_fn), (params, batch_d["x"], key),
                iters=args.iters, chain=chain_x)
    res["fwd"] = fwd

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    grad = timed(lambda p, x, k: grad_fn(p, x, k)[0],
                 (params, batch_d["x"], key), iters=args.iters,
                 chain=chain_x)
    res["grad"] = grad

    def aug_fn(x_in, k):
        xp = _prepare(x_in, aug, jax.random.fold_in(k, 1), train=True)
        xp, (y,) = mixup(jax.random.fold_in(k, 2), xp, (batch_d["y"],),
                         aug.mixup_alpha)
        return xp.mean() + y.mean()

    res["aug"] = timed(jax.jit(aug_fn), (batch_d["x"], key),
                       iters=args.iters,
                       chain=lambda out, a: (a[0] + (1e-6 * out).astype(a[0].dtype), a[1]))

    # update-only: fixed grads, state chains
    _, grads = grad_fn(params, batch_d["x"], key)
    upd_state = TrainState.create(
        jax.tree.map(lambda p: jnp.array(p, copy=True), params), tx,
        with_swa=True)
    upd = jax.jit(lambda s, g: apply_guarded_update(s, tx, g, {"train_loss": jnp.float32(0)}))
    res["update"] = timed(upd, (upd_state, grads), iters=args.iters,
                          chain=lambda out, a: (out[0], a[1]))

    # --- depth scaling -------------------------------------------------------
    _, net6, params6 = build(6)

    def loss6(params, x_in, k):
        k = jax.random.fold_in(k, 0)
        k_mask, k_mix, k_patch, k_drop, k_dropout = jax.random.split(k, 5)
        x = _prepare(x_in, aug, k_mask, train=True)
        x, (y,) = mixup(k_mix, x, (batch_d["y"],), aug.mixup_alpha)
        out = net6.apply({"params": params}, x, train=True, rngs={
            "patchout": k_patch, "droppath": k_drop, "dropout": k_dropout})
        return bce_with_logits(out[0], y)

    g6 = jax.jit(jax.value_and_grad(loss6))
    res["grad_d6"] = timed(lambda p, x, k: g6(p, x, k)[0],
                           (params6, batch_d["x"], key), iters=args.iters,
                           chain=chain_x)

    # --- isolated components at the exact call geometry ---------------------
    # In-jit scan chains: fn's output folds into the carry so iteration i+1
    # depends on i (nothing DCEs, nothing overlaps) and the ONE final fetch
    # forces the whole chain — per-round cost is a single relay dispatch.
    from jax import lax

    from maest_tpu.ops.attention import flash_attention

    def scan_timed(body, init, iters=args.iters, rounds=3):
        @jax.jit
        def prog(c):
            c, _ = lax.scan(body, c, None, length=iters)
            return c

        out = prog(init)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])  # force warmup
        best = float("inf")
        for _r in range(rounds):
            t0 = time.perf_counter()
            out = prog(out)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    def fold(a, g):
        return a + (g * 1e-6).astype(a.dtype)

    B, H, N, D, E, HID = BATCH, 12, N_STREAM, 64, 768, 3072
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)

    def attn_fwd_body(c, _):
        q, k, v = c
        o = flash_attention(q, k, v, n_real=N_REAL)
        return (fold(q, o), k, v), ()

    res["attn_fwd_x12"] = round(scan_timed(attn_fwd_body, (q, kk, v)) * 12, 2)

    # Grad bodies use jax.vjp with a DENSE RANDOM cotangent — the real
    # model's incoming cotangent. A mean()-style loss hands XLA a constant
    # cotangent it algebraically simplifies (matmul-by-broadcast-constant
    # becomes a reduce): measured mlp fwd+bwd collapsed to 2.0x fwd instead
    # of the real ~3x before this fix.
    ct_attn = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)

    def attn_grad_body(c, _):
        q, k, v = c
        _, vjp = jax.vjp(
            lambda q, k, v: flash_attention(q, k, v, n_real=N_REAL), q, k, v)
        dq, dk, dv = vjp(ct_attn)
        return (fold(q, dq), fold(k, dk), fold(v, dv)), ()

    res["attn_grad_x12"] = round(scan_timed(attn_grad_body, (q, kk, v)) * 12, 2)

    # qkv + out projections (the block's other matmuls; attention core above)
    xr = jnp.asarray(rng.standard_normal((B, N, E)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((E, 3 * E)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((E, E)) * 0.02, jnp.bfloat16)

    def proj(x, wqkv, wo):
        # consume all 3E columns with a cheap add (a `*0` or unused slice
        # would let XLA narrow the matmul to E columns)
        h = x @ wqkv
        return (h[..., :E] + h[..., E:2 * E] + h[..., 2 * E:]) @ wo

    def proj_fwd_body(c, _):
        x, a, b = c
        return (fold(x, proj(x, a, b)), a, b), ()

    res["proj_fwd_x12"] = round(scan_timed(proj_fwd_body, (xr, wqkv, wo)) * 12, 2)

    ct_res = jnp.asarray(rng.standard_normal((B, N, E)), jnp.bfloat16)

    def proj_grad_body(c, _):
        x, a, b = c
        _, vjp = jax.vjp(proj, x, a, b)
        dx, da, db = vjp(ct_res)
        return (fold(x, dx), fold(a, da), fold(b, db)), ()

    res["proj_grad_x12"] = round(scan_timed(proj_grad_body, (xr, wqkv, wo)) * 12, 2)

    w1 = jnp.asarray(rng.standard_normal((E, HID)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HID, E)) * 0.02, jnp.bfloat16)

    def mlp(x, w1, w2):
        h = jax.nn.gelu(x @ w1, approximate=True)
        return h @ w2

    def mlp_fwd_body(c, _):
        x, a, b = c
        return (fold(x, mlp(x, a, b)), a, b), ()

    res["mlp_fwd_x12"] = round(scan_timed(mlp_fwd_body, (xr, w1, w2)) * 12, 2)

    def mlp_grad_body(c, _):
        x, a, b = c
        _, vjp = jax.vjp(mlp, x, a, b)
        dx, da, db = vjp(ct_res)
        return (fold(x, dx), fold(a, da), fold(b, db)), ()

    res["mlp_grad_x12"] = round(scan_timed(mlp_grad_body, (xr, w1, w2)) * 12, 2)

    # patch conv: (B, 96, frames, 1) -> (B, 9, t_conv, 768)
    import flax.linen as nn

    t_conv = (FRAMES - 16) // 10 + 1

    conv = nn.Conv(features=E, kernel_size=(16, 16), strides=(10, 10),
                   padding="VALID", dtype=jnp.bfloat16)
    xi = jnp.asarray(x_host[..., None], jnp.bfloat16)
    cp = conv.init(jax.random.PRNGKey(0), xi)

    def conv_fwd_body(c, _):
        p, x = c
        # full-output sum: a sliced dependency would let XLA narrow the conv
        out = conv.apply(p, x).astype(jnp.float32).sum()
        return (p, fold(x, out)), ()

    res["conv_fwd"] = round(scan_timed(conv_fwd_body, (cp, xi)), 2)

    # params-only grad: the real step never needs dx (x is the input mel),
    # and the stride-10 transposed-conv input grad is NOT free
    ct_conv = jnp.asarray(
        rng.standard_normal((B, 9, t_conv, E)), jnp.bfloat16)

    def conv_grad_body(c, _):
        p, x = c
        _, vjp = jax.vjp(lambda p: conv.apply(p, x), p)
        (dp,) = vjp(ct_conv)
        return (jax.tree.map(fold, p, dp), x), ()

    res["conv_grad"] = round(scan_timed(conv_grad_body, (cp, xi)), 2)

    # --- derived accounting ---------------------------------------------------
    res["derived"] = {
        "backward(grad-fwd)": round(res["grad"] - res["fwd"], 2),
        "update(full-grad)": round(res["full"] - res["grad"], 2),
        "per_block_fwd_bwd((d12-d6)/6)": round(
            (res["grad"] - res["grad_d6"]) / 6, 2),
        "fixed_overhead(d-extrapolated)": round(
            res["grad"] - 12 * (res["grad"] - res["grad_d6"]) / 6, 2),
    }
    res["shape"] = args.shape
    flop = 3 * (2 * 86.6e6 * N_STREAM
                + 12 * 4 * N_STREAM**2 * 768) * BATCH
    res["mfu"] = {
        "implied_tflops": round(flop / (res["full"] / 1e3) / 1e12, 1),
        "v5e_peak_bf16_tflops": 197,
        "mfu_pct": round(100 * flop / (res["full"] / 1e3) / 1e12 / 197, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
