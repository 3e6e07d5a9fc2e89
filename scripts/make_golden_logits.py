"""Generate the full-geometry golden-logit fixture (tests/golden/).

Runs the shipped ViT-B 30 s geometry (fp32, exact gelu, XLA attention —
the parity-oracle tier) on a fixed seeded input and stores logits + the
torch-oracle logits for the same state dict, so future rounds can
regression-test full-scale numerics without torch
(reference math: models/maest.py:634-933).

Usage: JAX_PLATFORMS=cpu python scripts/make_golden_logits.py
"""

import os
import sys
import time
from pathlib import Path

# Force the CPU backend: JAX_PLATFORMS alone is not enough — the axon TPU
# relay plugin grabs the backend unless its pool env is cleared too, and a
# TPU run would bake bf16-precision matmuls into the "fp32" fixture
# (measured: 1.2e-2 logit error vs the fp64 oracle on axon, 1e-6 on CPU).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np  # noqa: E402

SEED = 20260817
B = 2


def main():
    import jax
    import jax.numpy as jnp

    from maest_tpu.checkpoints import merge_params, torch_to_jax_params
    from maest_tpu.models.registry import build_config
    from maest_tpu.models.vit import MAESTNet, init_params
    from torch_oracle import make_state, torch_forward

    cfg = build_config("discogs-maest-30s-pw-129e")
    rng = np.random.default_rng(SEED)
    t0 = time.time()
    sd = make_state(rng, cfg)
    x = rng.standard_normal((B, 1, *cfg.img_size)).astype("float32") * 0.1
    print(f"state built {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    ref = torch_forward({k: v for k, v in sd.items()}, x, cfg)
    print(f"torch oracle {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    params = merge_params(
        init_params(cfg, jax.random.PRNGKey(0)),
        torch_to_jax_params({k: v.numpy() for k, v in sd.items()}, cfg),
    )
    net = MAESTNet(cfg)  # fp32 oracle tier
    xh = jnp.asarray(x).transpose(0, 2, 3, 1)
    ours = np.asarray(
        jax.jit(lambda p, x: net.apply({"params": p}, x, train=False)[0])(
            params, xh
        ),
        np.float32,
    )
    print(f"jax fp32 forward (incl. compile) {time.time()-t0:.1f}s", flush=True)

    sig = 1 / (1 + np.exp(-ours)) - 1 / (1 + np.exp(-ref))
    print(f"logit  max|diff| {np.abs(ours - ref).max():.3e}")
    print(f"sigmoid max|diff| {np.abs(sig).max():.3e}")

    out = Path(__file__).resolve().parent.parent / "tests" / "golden"
    out.mkdir(exist_ok=True)
    np.savez_compressed(
        out / "vitb_30s_logits.npz",
        seed=np.int64(SEED), logits=ours, torch_logits=ref.astype(np.float32),
    )
    print(f"wrote {out / 'vitb_30s_logits.npz'}")


if __name__ == "__main__":
    main()
