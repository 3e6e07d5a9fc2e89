"""TPU acceptance suite — run on real hardware; CI only covers CPU.

Validates, on the attached chip, everything the CPU tests cannot:

  1. flash-attention kernel vs the XLA oracle (fwd + grads, real Mosaic
     lowering, not interpret mode),
  2. fused mel kernel vs the XLA mel path,
  3. bf16 production path vs the fp32 oracle at ViT-B scale,
  4. inference + train-step throughput with the lazy-relay-safe
     methodology (in-jit chaining, scalar-fetch forcing).

Prints one PASS/FAIL line per check and a JSON summary. ~15 min cold,
a few minutes warm (persistent compilation cache).

Usage:  python scripts/tpu_acceptance.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RESULTS = {}


def check(name, ok, detail=""):
    RESULTS[name] = {"ok": bool(ok), "detail": detail}
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer timing iters (the fused program stays batch 32)")
    args = ap.parse_args()

    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.ops.attention import attention_reference, flash_attention

    rng = np.random.default_rng(0)

    # -- 1. flash kernel vs oracle on device --------------------------------
    b, n, h, d = 4, 875, 12, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.1, jnp.float32)
        for _ in range(3)
    )
    out = np.asarray(jax.jit(lambda q, k, v: flash_attention(q, k, v))(q, k, v))
    ref = np.asarray(jax.jit(attention_reference)(q, k, v))
    err = float(np.abs(out - ref).max())
    check("flash_fwd_vs_oracle", err < 5e-3, f"max|d|={err:.2e}")

    g = np.asarray(jax.jit(jax.grad(
        lambda q: jnp.sum(flash_attention(q, k, v) ** 2)))(q))
    g_ref = np.asarray(jax.jit(jax.grad(
        lambda q: jnp.sum(attention_reference(q, k, v) ** 2)))(q))
    gerr = float(np.abs(g - g_ref).max() / (np.abs(g_ref).max() + 1e-9))
    check("flash_bwd_vs_oracle", gerr < 2e-2, f"rel max|d|={gerr:.2e}")

    # -- 1a. int8 backward (attention_bwd_quant) on real Mosaic lowering ----
    # interpret mode does not catch Mosaic int8 issues; gate the gradient
    # cosine + magnitude on device (diffuse random-init attention is the
    # quantization worst case).
    g8 = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, bwd_quant="int8") ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    worst_cos, worst_rel = 1.0, 0.0
    gref3 = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(attention_reference(q, k, v) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    for a, r in zip(g8, gref3):
        a, r = np.asarray(a, np.float64), np.asarray(r, np.float64)
        worst_cos = min(worst_cos, float(
            (a * r).sum() / (np.linalg.norm(a) * np.linalg.norm(r) + 1e-30)))
        worst_rel = max(worst_rel, float(
            np.abs(a - r).max() / (np.abs(r).max() + 1e-30)))
    check("int8_bwd_grad_vs_oracle", worst_cos > 0.999 and worst_rel < 0.15,
          f"min cos={worst_cos:.5f} worst relmax={worst_rel:.3f}")

    # -- 1a2. quant FORWARD modes on real Mosaic lowering (grouped class) ----
    # The int8 backward's constant-scale round->int8->dot pattern once
    # miscompiled to zeros in grouped (g>1) kernels and was only caught on
    # device; the quant forwards share that pattern family and interpret
    # mode cannot catch it — validate all four at a GROUPED pad class
    # (n=875 -> 896, g from _TUNED_FWD_GROUP).
    for mode, tol in (("qk8", 0.05), ("qk8pv8", 0.08),
                      ("fp8", 0.15), ("fp8pv8", 0.2)):
        outq = np.asarray(jax.jit(
            lambda q, k, v, m=mode: flash_attention(q, k, v, quant=m)
        )(q, k, v))
        qerr = float(np.abs(outq - ref).max())
        nonzero = float(np.abs(outq).max()) > 0
        check(f"quant_fwd_{mode}_vs_oracle", nonzero and qerr < tol,
              f"max|d|={qerr:.2e} nonzero={nonzero}")

    # -- 1b. larger-than-VMEM split backward (n_pad > 4096 dispatch) ----------
    n_long = 4600  # pads to 4608 > _FULL_K_BWD_MAX_N_PAD -> split kernels
    ql, kl, vl = (
        jnp.asarray(rng.standard_normal((1, n_long, 2, 64)) * 0.1, jnp.float32)
        for _ in range(3)
    )
    gl = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(flash_attention(q, k, v) ** 2),
        argnums=(0, 1, 2)))(ql, kl, vl)
    gl_ref = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(attention_reference(q, k, v) ** 2),
        argnums=(0, 1, 2)))(ql, kl, vl)
    # dq and dk/dv come from two separate Pallas kernels — check all three
    slerr = max(
        float(np.abs(np.asarray(g) - np.asarray(r)).max()
              / (np.abs(np.asarray(r)).max() + 1e-9))
        for g, r in zip(gl, gl_ref)
    )
    check("flash_split_bwd_vs_oracle", slerr < 2e-2,
          f"rel max|d| over dq/dk/dv={slerr:.2e}")

    # -- 2. mel front-end vs the fp64 numpy oracle ----------------------------
    from maest_tpu.dsp.mel import log_mel_spectrogram, log_mel_spectrogram_np

    wave_np = (rng.standard_normal(5 * 16000) * 0.2).astype(np.float32)
    wave = jnp.asarray(wave_np)
    mel_64 = log_mel_spectrogram_np(wave_np)
    mel_p = np.asarray(log_mel_spectrogram(wave, impl="pallas"))
    mel_x = np.asarray(log_mel_spectrogram(wave, impl="xla"))
    perr = float(np.abs(mel_p - mel_64).max())
    xerr = float(np.abs(mel_x - mel_64).max())
    check("fused_mel_vs_fp64_oracle", perr < 1e-3, f"max|d|={perr:.2e}")
    check("xla_mel_vs_fp64_oracle", xerr < 1e-3, f"max|d|={xerr:.2e}")

    # -- 3. bf16 production vs fp32 oracle at ViT-B scale ---------------------
    cfg = build_config("discogs-maest-30s-pw-129e")
    params = init_params(cfg, jax.random.PRNGKey(0))
    params["head_linear"] = dict(
        params["head_linear"],
        kernel=0.02 * jax.random.normal(
            jax.random.PRNGKey(1), params["head_linear"]["kernel"].shape),
    )
    x = jnp.asarray(
        rng.standard_normal((2, 96, 1875)), jnp.float32)[..., None]
    net32 = MAESTNet(cfg.replace(attention_impl="xla", gelu_approx="exact"),
                     dtype=jnp.float32)
    netbf = MAESTNet(cfg, dtype=jnp.bfloat16)
    l32 = np.asarray(jax.jit(
        lambda p, x: net32.apply({"params": p}, x, train=False)[0])(params, x),
        np.float32)
    lbf = np.asarray(jax.jit(
        lambda p, x: netbf.apply({"params": p}, x, train=False)[0])(params, x),
        np.float32)
    act_err = float(np.abs(
        1 / (1 + np.exp(-l32)) - 1 / (1 + np.exp(-lbf))).max())
    check("bf16_vs_fp32_activations", act_err < 2e-2, f"max|d sigmoid|={act_err:.2e}")

    # -- 4. inference throughput + band (lazy-relay-safe) ---------------------
    # The EXACT headline program (bench.py fused wave->mel->ViT->sigmoid,
    # b32): a kernel regression in inference fails HERE instead of only
    # surfacing in the next round's driver BENCH (VERDICT r4 #5). Record
    # ~131 ms / 7201-7391 audio-s/s (BENCH_r03/r04); band = +15%, matching
    # the train-step bands' device-window noise allowance.
    import bench

    # measure_fused self-protects with an internal implied-TFLOP/s assert
    # (lazy-relay timing that fails to force execution); convert that to a
    # recorded FAIL so the remaining train-band checks still run
    try:
        f = bench.measure_fused(batch=32, iters=10 if args.quick else 30)
    except AssertionError as e:
        check("inference_throughput", False, str(e))
        f = None
    if f is not None:
        check("inference_throughput", f["implied_tflops"] < 400,
              f"{f['audio_s_per_s']:.0f} audio-s/s ({f['ms_per_step']} "
              f"ms/step, {f['implied_tflops']:.0f} TF/s)")
        check("inference_30s_band", f["ms_per_step"] <= 131.0 * 1.15,
              f"{f['ms_per_step']} ms/step (record ~131 ms, band 150.7)")

    # -- 5. train-step band at the TRUE 30 s recipe shape ----------------------
    # The round-3 harness-geometry bug (spt=60 instead of 90) skewed every
    # A/B for weeks; this check fails LOUDLY on (a) geometry drift — the
    # padded residual width must be 896 — and (b) a throughput regression
    # beyond the device-window noise band (record 169.1 ms, BENCH_TRAIN_r04;
    # band = +15%).
    import bench_train

    # --quick keeps the 30 s geometry+band guard (the one the round-3 bug
    # motivated) but halves its timing iters and skips the second shape —
    # each shape costs a full ViT-B train-step remote compile (1-10 min).
    t_iters, t_rounds = (10, 1) if args.quick else (20, 2)
    t30 = bench_train.measure_shape(30, 32, 90, iters=t_iters, rounds=t_rounds)
    check("train_step_geometry", t30["n_pad"] == 896 and t30["n_tokens"] == 866,
          f"n_tokens={t30['n_tokens']} n_pad={t30['n_pad']}")
    check("train_step_30s_band", t30["ms_per_step"] <= 169.1 * 1.15,
          f"{t30['ms_per_step']} ms/step ({t30['specs_per_s']} specs/s, "
          f"record 169.1)")

    if not args.quick:
        # Same guard at the OTHER recipe shape (the composition rule: every
        # train claim holds at both). 10 s stream runs the round-5 SUBLANE
        # pad-once (281 -> 288; lane pad-once stays gated off at ratio
        # 1.37) + sublane q-pad kernels. Record 180.6 ms (QPAD_r05.json;
        # was 199.5 in BENCH_TRAIN_r04 / DECOMP10_r04).
        t10 = bench_train.measure_shape(10, 100, 30, iters=20, rounds=2)
        check("train_step_10s_geometry",
              t10["n_pad"] == 288 and t10["n_tokens"] == 281,
              f"n_tokens={t10['n_tokens']} n_pad={t10['n_pad']}")
        check("train_step_10s_band", t10["ms_per_step"] <= 180.6 * 1.15,
              f"{t10['ms_per_step']} ms/step ({t10['specs_per_s']} specs/s, "
              f"record 180.6)")

    print(json.dumps({k: v for k, v in RESULTS.items()}))
    if not all(v["ok"] for v in RESULTS.values()):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
