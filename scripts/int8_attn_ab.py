"""Full-step A/B of int8 attention arithmetic on the real chip.

Round-2 proved the bf16 attention floor is structural (d=64 dots cap
~53 TFLOP/s; kernel at ~78% of the composite bound) and concluded the
remaining lever is arithmetic. This measures that lever IN COMPOSITION —
the repo's own rule: isolated-kernel wins have inverted end-to-end before
(g-heads-per-program, docs/DESIGN.md) — for quant in (none, qk8, qk8pv8):

  * 30 s b32 inference step (the headline bench workload), interleaved
    rounds so device-window noise (±10%) hits all variants equally;
  * optional --train: 30 s B32 and 10 s B100 train steps;
  * full-model numerics: max |Δsigmoid| of each quant mode vs the bf16
    baseline on one fixed batch (the quant-induced error must stay well
    inside the bf16-vs-fp32 band of ~5e-3, docs/DESIGN.md).

Usage: python scripts/int8_attn_ab.py [--iters 50] [--rounds 3] [--train]
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

QUANTS = ("none", "qk8", "qk8pv8")


def build(quant: str, arch: str = "discogs-maest-30s-pw-129e"):
    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params

    cfg = build_config(arch).replace(attention_quant=quant)
    net = MAESTNet(cfg, dtype=jnp.bfloat16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["head_linear"] = dict(
        params["head_linear"],
        kernel=0.02 * jax.random.normal(
            jax.random.PRNGKey(1), params["head_linear"]["kernel"].shape),
    )
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), params))
    return cfg, net, params


def make_fwd(net, params):
    @jax.jit
    def forward_chained(params, x, x0):
        logits, _ = net.apply({"params": params}, x[..., None], train=False)
        x_next = x0 + (1e-6 * logits[0, 0]).astype(x0.dtype)
        return logits, x_next

    return forward_chained


def time_fwd(fn, params, x, iters: int) -> float:
    o = x
    logits = None
    t0 = time.perf_counter()
    for _ in range(iters):
        logits, o = fn(params, o, x)
    _ = float(logits[0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--quants", default=",".join(QUANTS))
    args = ap.parse_args()
    quants = args.quants.split(",")

    rng = np.random.default_rng(0)
    batch = 32
    x = jnp.asarray(
        rng.standard_normal((batch, 96, 1875), dtype=np.float32), jnp.bfloat16)

    fns, sigs = {}, {}
    for qm in quants:
        cfg, net, params = build(qm)
        fn = make_fwd(net, params)
        logits = np.asarray(fn(params, x, x)[0], np.float32)  # warm + compile
        assert np.isfinite(logits).all(), qm
        sigs[qm] = 1.0 / (1.0 + np.exp(-logits))
        fns[qm] = (fn, params)
        print(f"# compiled {qm}", flush=True)

    if "none" in sigs:
        for qm in quants:
            if qm != "none":
                d = float(np.max(np.abs(sigs[qm] - sigs["none"])))
                print(f"numerics {qm:8s} max|dsigmoid| vs bf16 = {d:.2e}",
                      flush=True)

    times = {qm: [] for qm in quants}
    for r in range(args.rounds):
        for qm in quants:  # interleaved: same device window for all
            fn, params = fns[qm]
            ms = time_fwd(fn, params, x, args.iters)
            times[qm].append(ms)
            print(f"round {r} {qm:8s} {ms:7.2f} ms/step "
                  f"({batch * 30.0 / ms * 1e3:7.0f} audio-s/s)", flush=True)

    print("--- inference summary (best round) ---")
    for qm in quants:
        best = min(times[qm])
        print(f"{qm:8s} {best:7.2f} ms  {batch * 30.0 / best * 1e3:7.0f} "
              f"audio-s/s", flush=True)

    if args.train:
        train_ab(quants, args)


def train_ab(quants, args):
    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params
    import optax

    # spt follows the pretrain presets (30s -> 90, 10s -> 30); see the
    # geometry note in scripts/remat_ab.py
    for tag, arch, batch, spt in (
        ("30s-train", "discogs-maest-30s-pw-129e", 32, 90),
        ("10s-train", "discogs-maest-10s-pw-129e", 100, 30),
    ):
        rng = np.random.default_rng(1)
        frames = {"30s-train": 1875, "10s-train": 625}[tag]
        xb = jnp.asarray(rng.standard_normal(
            (batch, 96, frames), dtype=np.float32), jnp.bfloat16)
        yb = jnp.asarray(
            rng.random((batch, 400)) < 0.02, jnp.float32)

        results = {}
        for qm in quants:
            cfg = build_config(arch).replace(
                attention_quant=qm, s_patchout_t=spt)
            net = MAESTNet(cfg, dtype=jnp.bfloat16)
            params = init_params(cfg, jax.random.PRNGKey(0))
            tx = optax.adamw(1e-4)
            opt_state = tx.init(params)

            def loss_fn(p, x, y, key):
                logits, _ = net.apply(
                    {"params": p}, x[..., None], train=True,
                    rngs={"patchout": key, "dropout": key, "droppath": key})
                return optax.sigmoid_binary_cross_entropy(logits, y).mean()

            @jax.jit
            def step(params, opt_state, x, y, i):
                key = jax.random.fold_in(jax.random.PRNGKey(7), i)
                loss, grads = jax.value_and_grad(loss_fn)(params, x, y, key)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            p, s = params, opt_state
            p, s, loss = step(p, s, xb, yb, 0)
            _ = float(loss)  # compile + warm
            t0 = time.perf_counter()
            for i in range(args.iters):
                p, s, loss = step(p, s, xb, yb, i)
            _ = float(loss)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            results[qm] = ms
            print(f"{tag} {qm:8s} {ms:7.2f} ms/step "
                  f"({batch / ms * 1e3:6.1f} specs/s)", flush=True)
        base = results.get("none")
        if base:
            for qm, ms in results.items():
                print(f"{tag} {qm:8s} vs none: {(base - ms) / base * 100:+.1f}%",
                      flush=True)


if __name__ == "__main__":
    main()
