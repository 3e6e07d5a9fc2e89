"""MAEST ViT in Flax — PaSST-style spectrogram transformer, TPU-first.

Functionally equivalent to the reference model (reference: models/maest.py:423-939)
but designed around XLA's compilation model:

  * all shapes are static: patchout keep-counts come from the config, the
    time pos-embed cut uses static slices (eval) or ``lax.dynamic_slice``
    with a traced offset (train),
  * activations flow NHWC / (B, N, E) so matmuls tile directly onto the MXU,
  * attention softmax accumulates in float32 regardless of compute dtype,
  * randomness (patchout, mixup, droppath, time offset) comes from explicit
    PRNG keys so a train step is one pure jitted function.

Param-tree layout is chosen so the torch checkpoint mapping is 1:1
(see maest_tpu/checkpoints/convert.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from .config import MAESTConfig
from ..utils.shapes import round_up

# timm trunc_normal_(std=0.02): truncated at +-2 sigma then scaled — the same
# construction as flax truncated_normal (reference: models/maest.py:942-976,
# models/helpers/vit_helpers.py:110-166)
_DENSE_INIT = nn.initializers.truncated_normal(0.02)
# pos embeds / cls / dist use timm's std-corrected draw: flax divides by the
# truncation correction 0.8796..., timm does not — one shared initializer so
# the constant cannot desynchronize across the five param sites
_POS_INIT = nn.initializers.truncated_normal(0.02 / 0.87962566103423978)

# Pad-once residual stream is only a win while the extra LN/MLP row FLOPs
# stay below the per-layer pad/slice traffic it eliminates. Measured
# boundary (v5e): ratio 1.06 (30s inference) +14.4%, 1.02 (30s train)
# +4.2%, 1.32 (10s train) -4.9%. 1.15 keeps the 10s-inference class
# (640/560 = 1.14) on the padded path; see MAESTNet.__call__.
_PAD_ONCE_MAX_RATIO = 1.15


def _tier_precision(dtype):
    """Matmul/conv precision tied to the numerics tier.

    XLA's DEFAULT precision computes fp32 contractions with bf16 mantissas
    on TPU — and (measured) the CPU backend's convolution does the same
    (patch-conv error 3.9e-4 default vs 3.1e-8 HIGHEST against fp64).
    The fp32 parity-oracle tier therefore pins HIGHEST everywhere so it is
    a true fp32 program on every backend; the bf16 production tier keeps
    the fast default."""
    return None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST


def _layer_norm(*, epsilon, dtype, name):
    """LayerNorm with the variance algorithm tied to the numerics tier.

    flax's default fast variance (E[x^2] - E[x]^2) loses ~13x precision to
    cancellation on residual streams with large means (measured 1.7e-5 vs
    1.3e-6 per-LN error against fp64; through 26 norms this was the bulk of
    a 1.2e-2 full-scale logit gap vs the torch oracle). The fp32 parity
    tier therefore uses the two-pass variance — matching torch
    nn.LayerNorm — while the bf16 production path keeps the cheaper fast
    variance (its rounding floor dwarfs the cancellation term)."""
    return nn.LayerNorm(epsilon=epsilon, dtype=dtype, name=name,
                        use_fast_variance=dtype == jnp.bfloat16)


class Mlp(nn.Module):
    """Transformer MLP (reference: models/maest.py:183-208).

    ``gelu_approx``: exact erf matches torch ``nn.GELU()`` bit-for-bit and is
    the fp32 parity path; the tanh approximation fuses into the matmul
    epilogue on TPU (exact erf measured ~2x the whole MLP time) and is the
    bf16 fast path ("auto").
    """

    hidden_dim: int
    out_dim: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    gelu_approx: str = "auto"

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        mode = self.gelu_approx
        if mode == "auto":
            mode = "tanh" if self.dtype == jnp.bfloat16 else "exact"
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     precision=_tier_precision(self.dtype),
                     kernel_init=_DENSE_INIT, name="fc1")(x)
        x = nn.gelu(x, approximate=mode == "tanh")
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     precision=_tier_precision(self.dtype),
                     kernel_init=_DENSE_INIT, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (reference: models/maest.py:346-378).

    Fused qkv projection; fp32 softmax; no explicit attention-matrix
    materialization beyond what XLA chooses (a Pallas flash kernel can be
    swapped in via maest_tpu.ops.attention for long sequences).
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # "auto" | "flash" | "xla"
    quant: str = "none"  # "none" | "qk8" | "qk8pv8" | "fp8" | "fp8pv8"
    bwd_quant: str = "none"  # "none" | "int8" (flash path only)
    mesh: object = None  # jax.sharding.Mesh -> shard_map'd flash kernel
    # number of REAL tokens when the residual stream is padded once for
    # the whole network (pad-once; None = all tokens are real)
    n_real: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        from ..ops.attention import (
            flash_attention,
            flash_attention_sharded,
            use_flash,
        )

        b, n, c = x.shape
        if self.dim % self.num_heads:
            raise ValueError(
                f"embed_dim {self.dim} not divisible by num_heads "
                f"{self.num_heads}"
            )
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       precision=_tier_precision(self.dtype),
                       kernel_init=_DENSE_INIT, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)

        # attention-matrix dropout forces the materializing path (only used
        # when attn_drop_rate > 0 while training; all shipped configs use 0)
        needs_drop = self.attn_drop > 0.0 and not deterministic
        impl = self.impl
        if impl == "auto":
            impl = "flash" if (use_flash(n, head_dim) and not needs_drop) else "xla"
        elif impl == "flash" and needs_drop:
            # the flash kernel has no attention-matrix dropout; silently
            # skipping the configured regularization would train a
            # different model than the reference
            raise ValueError(
                "attention_impl='flash' cannot apply attn_drop_rate > 0 "
                "in train mode; use 'auto' or 'xla'"
            )

        n_real = self.n_real if self.n_real is not None else n
        quant = None if self.quant in ("none", None) else self.quant
        bwd_quant = (None if self.bwd_quant in ("none", None)
                     else self.bwd_quant)
        if impl == "flash":
            if self.mesh is not None and getattr(self.mesh, "size", 1) > 1:
                out = flash_attention_sharded(q, k, v, self.mesh,
                                              n_real=n_real, quant=quant,
                                              bwd_quant=bwd_quant)
            else:
                out = flash_attention(q, k, v, n_real=n_real, quant=quant,
                                      bwd_quant=bwd_quant)
            out = out.reshape(b, n, c)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32,
                              precision=_tier_precision(self.dtype))
            attn = attn * scale
            if n_real < n:  # padded keys must not receive probability mass
                pos = jnp.arange(n)
                attn = jnp.where(pos[None, None, None, :] < n_real,
                                 attn, -1e30)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            attn = attn.astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                             precision=_tier_precision(self.dtype)
                             ).reshape(b, n, c)

        # tag for remat_policy="attn_out": saving this one (B, N, E)
        # activation lets the backward skip re-running the attention
        # forward (flash kernel included) while the rest of the block
        # still rematerializes
        out = _checkpoint_name(out, "attn_out")
        out = nn.Dense(self.dim, dtype=self.dtype, kernel_init=_DENSE_INIT,
                       precision=_tier_precision(self.dtype),
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


def remat_policy(name: str):
    """Map ``cfg.remat_policy`` to a jax.checkpoint policy (None = save
    nothing). See MAESTConfig.remat_policy for the semantics; measured A/B
    numbers live in docs/DESIGN.md (round 3)."""
    if name in ("full", "none", None):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "attn_out":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    raise ValueError(f"unknown remat_policy {name!r}; "
                     "expected 'full' | 'dots' | 'attn_out'")


def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth (reference: models/helpers/vit_helpers.py:74-104)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Block(nn.Module):
    """Pre-LN transformer block (reference: models/maest.py:381-420)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    attn_quant: str = "none"
    attn_bwd_quant: str = "none"
    gelu_approx: str = "auto"
    mesh: object = None
    sequence_parallel: bool = False
    n_real: Optional[int] = None  # pad-once residual stream (see MAESTNet)

    def _seq_shard(self, x):
        """Megatron-SP: keep the residual stream token-sharded over the
        `model` axis between the matmul regions. GSPMD propagates this into
        sharded LayerNorm/residual math and reduce-scatter/all-gather pairs
        replacing the TP all-reduces."""
        if not self.sequence_parallel or self.mesh is None:
            return x
        if "model" not in self.mesh.axis_names or self.mesh.shape["model"] == 1:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P("data", "model", None))
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_self_attention: bool = False):
        # flags are positional (not kw-only) so nn.remat can mark them static
        norm1 = _layer_norm(epsilon=self.eps, dtype=self.dtype, name="norm1")
        attn = Attention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            impl=self.attn_impl, quant=self.attn_quant,
            bwd_quant=self.attn_bwd_quant, mesh=self.mesh,
            n_real=self.n_real, name="attn",
        )
        if return_self_attention:
            return attn(norm1(x), deterministic=deterministic)

        dp_rng1 = dp_rng2 = None
        if not deterministic and self.drop_path_rate > 0.0:
            dp_rng1 = self.make_rng("droppath")
            dp_rng2 = self.make_rng("droppath")

        x = self._seq_shard(x)
        y = attn(norm1(x), deterministic=deterministic)
        x = self._seq_shard(
            x + drop_path(y, self.drop_path_rate, deterministic, dp_rng1))
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                dtype=self.dtype, gelu_approx=self.gelu_approx, name="mlp")(
            _layer_norm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x),
            deterministic=deterministic,
        )
        x = x + drop_path(y, self.drop_path_rate, deterministic, dp_rng2)
        return x


def block_kwargs(cfg, dtype, *, drop_path_rate: float = 0.0, mesh=None,
                 sequence_parallel: Optional[bool] = None,
                 n_real: Optional[int] = None) -> dict:
    """Single source of truth for per-layer ``Block`` construction kwargs —
    shared by ``MAESTNet.__call__`` and the pipeline-parallel trunk
    (maest_tpu/parallel/pipeline.py), so a new cfg-driven Block argument
    cannot silently diverge between the two.

    CAUTION: the PP+TP path does NOT go through ``Block`` — it hand-shards
    the same math in ``parallel/pipeline.py::_make_tp_block`` (GSPMD cannot
    partition inside the pipeline's shard_map). Any change to the kwargs
    here, to ``Block``/``Mlp``/``Attention``, or to how cfg fields map to
    block behavior must be mirrored there (and is pinned by the PP+TP
    equivalence tests in tests/test_pipeline_parallel.py)."""
    return dict(
        dim=cfg.embed_dim,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias,
        drop=cfg.drop_rate,
        attn_drop=cfg.attn_drop_rate,
        drop_path_rate=drop_path_rate,
        eps=cfg.layer_norm_eps,
        dtype=dtype,
        attn_impl=cfg.attention_impl,
        attn_quant=cfg.attention_quant,
        attn_bwd_quant=cfg.attention_bwd_quant,
        gelu_approx=cfg.gelu_approx,
        mesh=mesh,
        sequence_parallel=(cfg.sequence_parallel if sequence_parallel is None
                           else sequence_parallel),
        n_real=n_real,
    )


def _static_keep_indices(dim: int, drop_indices, interleave: int) -> np.ndarray | None:
    """Deterministic patchout index sets (reference: models/maest.py:703-766)."""
    if drop_indices:
        drop = set(int(j) for j in drop_indices)
        bad = sorted(j for j in drop if not 0 <= j < dim)
        if bad:
            raise ValueError(
                f"patchout drop indices {bad} out of range for grid dim {dim}")
        kept = np.array([i for i in range(dim) if i not in drop])
        if kept.size == 0:
            # an empty axis would make the token mean NaN downstream —
            # mirror the random-patchout 'drops every patch' guard
            raise ValueError(
                f"patchout drop indices remove all {dim} rows of the grid")
        return kept
    if interleave:
        return np.arange(0, dim, interleave)
    return None


class MAESTNet(nn.Module):
    """The MAEST transformer body + heads.

    ``__call__`` returns, depending on ``transformer_block``:
      * -1: tuple per ``distilled_type`` — ("mean": (logits, features),
        "separated": (logits_cls, logits_dist, features), else (logits, x))
      * >=0: (None, 2304-d embeddings [cls | dist | mean(tokens)])
        (reference: models/maest.py:811-829)

    ``forward_mode`` exposes the pipeline-parallel seams (see
    maest_tpu/parallel/pipeline.py):
      * "full" (default): the whole network.
      * "front": patch embed → pos embeds → patchout → token assembly →
        pad-once; returns ``(tokens, n_tokens)`` where ``tokens`` is
        (B, n_res, E) and ``n_tokens`` the real-token count (n_res >
        n_tokens when the pad-once fast path padded the stream).
      * "tail": input is the post-trunk residual stream; runs the final
        norm + heads and returns the usual ``transformer_block == -1``
        tuple.
    """

    cfg: MAESTConfig
    dtype: jnp.dtype = jnp.float32
    # optional jax.sharding.Mesh: routes attention through a shard_map'd
    # Pallas kernel under multi-device meshes (GSPMD cannot partition a
    # pallas_call)
    mesh: object = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, F, T, C) NHWC spectrogram patches
        *,
        train: bool = False,
        transformer_block: int = -1,
        return_self_attention: bool = False,
        return_layer_tokens: bool = False,
        tap_block: Optional[int] = None,
        forward_mode: str = "full",
    ):
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        b = x.shape[0]

        if tap_block is not None and (transformer_block != -1
                                      or return_layer_tokens):
            raise ValueError(
                "tap_block rides the transformer_block == -1 forward and "
                "is exclusive with return_layer_tokens"
            )
        # out-of-range taps used to be silently ignored (full trunk ran,
        # return_self_attention dropped) — e.g. a lighten_model'd depth
        # below the preset's predict.transformer_block=11
        if not -1 <= transformer_block < cfg.depth:
            raise ValueError(
                f"transformer_block {transformer_block} out of range for "
                f"depth {cfg.depth}"
            )
        if tap_block is not None and not 0 <= tap_block < cfg.depth:
            raise ValueError(
                f"tap_block {tap_block} out of range for depth {cfg.depth}"
            )
        if forward_mode not in ("full", "front", "tail"):
            raise ValueError(f"unknown forward_mode {forward_mode!r}")
        if forward_mode != "full" and (
            transformer_block != -1 or return_self_attention
            or return_layer_tokens or tap_block is not None
        ):
            raise ValueError(
                "front/tail forward modes only support the plain "
                "transformer_block == -1 forward"
            )
        if forward_mode == "tail":
            # x is the (B, n_res, E) residual stream after the trunk
            return self._tail(x.astype(self.dtype))

        # --- patch embedding (reference: models/maest.py:214-256) ---
        x = x.astype(self.dtype)
        if cfg.per_freq_patch_embed:
            x = self._per_freq_patch_embed(x)
        else:
            x = nn.Conv(
                cfg.embed_dim,
                kernel_size=(cfg.patch_size, cfg.patch_size),
                strides=cfg.stride,
                padding="VALID",
                dtype=self.dtype,
                precision=_tier_precision(self.dtype),
                name="patch_embed_proj",
            )(x)  # (B, F', T', E)
        _, f_dim, t_dim, _ = x.shape

        # --- decoupled positional embeddings (reference: models/maest.py:522-530,
        # cut logic :645-669). Param layout (F,E)/(T,E) is JAX-native; the
        # checkpoint converter reshapes from torch's (1,E,F,1)/(1,E,1,T). ---
        grid_f, grid_t = cfg.grid_size
        freq_pos = self.param(
            "freq_new_pos_embed",
            _POS_INIT,
            (grid_f, cfg.embed_dim),
        )
        time_pos = self.param(
            "time_new_pos_embed",
            _POS_INIT,
            (grid_t, cfg.embed_dim),
        )
        token_pos = self.param(
            "new_pos_embed",
            _POS_INIT,
            (cfg.num_tokens, cfg.embed_dim),
        )

        if t_dim > grid_t:
            raise ValueError(
                f"input yields {t_dim} time patches but the time pos-embed table "
                f"has {grid_t}; reduce the input duration."
            )
        if train and t_dim < grid_t:
            # random temporal crop of the embed table (train only)
            off = jax.random.randint(
                self.make_rng("patchout"), (), 0, grid_t - t_dim + 1
            )
            time_pos_cut = jax.lax.dynamic_slice(
                time_pos, (off, 0), (t_dim, cfg.embed_dim)
            )
        else:
            time_pos_cut = time_pos[:t_dim]

        x = x + time_pos_cut[None, None, :, :].astype(self.dtype)
        x = x + freq_pos[:f_dim][None, :, None, :].astype(self.dtype)

        # --- structured patchout, train only (reference: models/maest.py:678-701).
        # Keep-counts are static so shapes stay compile-time constant. ---
        if train and cfg.s_patchout_t:
            keep_t = t_dim - cfg.s_patchout_t
            if keep_t <= 0:
                raise ValueError("s_patchout_t >= time patches")
            idx = jnp.sort(
                jax.random.permutation(self.make_rng("patchout"), t_dim)[:keep_t]
            )
            x = jnp.take(x, idx, axis=2)
            t_dim = keep_t
        if train and cfg.s_patchout_f:
            keep_f = f_dim - cfg.s_patchout_f
            if keep_f <= 0:
                raise ValueError("s_patchout_f >= freq patches")
            idx = jnp.sort(
                jax.random.permutation(self.make_rng("patchout"), f_dim)[:keep_f]
            )
            x = jnp.take(x, idx, axis=1)
            f_dim = keep_f

        # --- deterministic patchout for embedding ablations (any mode;
        # reference: models/maest.py:703-766) ---
        kept = _static_keep_indices(
            f_dim, cfg.s_patchout_f_indices, cfg.s_patchout_f_interleaved
        )
        if kept is not None:
            x = x[:, kept, :, :]
            f_dim = len(kept)
        kept = _static_keep_indices(
            t_dim, cfg.s_patchout_t_indices, cfg.s_patchout_t_interleaved
        )
        if kept is not None:
            x = x[:, :, kept, :]
            t_dim = len(kept)

        # --- flatten to tokens, f-major (reference flattens (B,E,F,T) over
        # (F,T); NHWC reshape gives the identical order) ---
        x = x.reshape(b, f_dim * t_dim, cfg.embed_dim)

        # --- unstructured patchout, train only (reference: models/maest.py:773-780) ---
        if train and cfg.u_patchout:
            seq_len = x.shape[1]
            keep = seq_len - cfg.u_patchout
            if keep <= 0:
                raise ValueError("u_patchout >= sequence length")
            idx = jnp.sort(
                jax.random.permutation(self.make_rng("patchout"), seq_len)[:keep]
            )
            x = jnp.take(x, idx, axis=1)

        # --- CLS / DIST token assembly (reference: models/maest.py:785-796) ---
        cls_token = self.param(
            "cls_token",
            _POS_INIT,
            (1, cfg.embed_dim),
        )
        cls = (cls_token + token_pos[:1]).astype(self.dtype)
        cls = jnp.broadcast_to(cls[None], (b, 1, cfg.embed_dim))
        if cfg.distilled:
            dist_token = self.param(
                "dist_token",
                _POS_INIT,
                (1, cfg.embed_dim),
            )
            dist = (dist_token + token_pos[1:2]).astype(self.dtype)
            dist = jnp.broadcast_to(dist[None], (b, 1, cfg.embed_dim))
            x = jnp.concatenate([cls, dist, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)

        x = nn.Dropout(cfg.drop_rate, deterministic=not train)(x)

        # --- pad-once residual stream (TPU fast path) ---
        # The flash kernel needs a 128-multiple sequence; padding inside
        # every layer made XLA materialize per-layer pad/slice/copy ops
        # around each custom call — a device trace showed ~49 ms of a
        # 148 ms 30 s/b32 step in that shuffling (docs/DESIGN.md). Pad the
        # token axis ONCE here instead: every layer then runs at n_pad
        # with zero data movement, the kernel masks keys >= n_real, and
        # padded rows (garbage after LN bias) never reach the heads/taps.
        #
        # Trade-off: once padded, every LN/MLP/projection also runs on the
        # pad rows, so the copy savings must beat the extra row FLOPs.
        # Measured: 30 s/b32 inference (1685->1792, +6%) +14.4%; 30 s/B32
        # train (875->896, +2%) +4.2%; 10 s/B100 train (290->384, +32%)
        # REGRESSED 502->477.5 specs/s. Gate on the pad ratio.
        from ..ops.attention import use_flash

        n_tokens = x.shape[1]
        head_dim = cfg.embed_dim // cfg.num_heads
        needs_drop = cfg.attn_drop_rate > 0.0 and train
        n_128 = round_up(n_tokens, 128)
        flash_ok = (cfg.attention_impl in ("auto", "flash")
                    and not needs_drop and use_flash(n_tokens, head_dim))
        if flash_ok and n_128 <= _PAD_ONCE_MAX_RATIO * n_tokens:
            n_res = n_128  # lane pad-once (20/30 s classes)
        elif flash_ok:
            # Sublane pad-once (round 5): when the lane pad fails the
            # ratio gate (10 s train: 384/281 = 1.37 REGRESSES), an
            # 8-multiple stream still aligns every LN/MLP/projection row
            # tile at ~zero extra FLOPs (288/281 = 1.025) and lets the
            # attention q side run pad-free — the kernel's sublane q-pad
            # (ops/attention.py::_sublane_q_pad) keeps q at these n rows
            # while lane-padding only the keys. Measured: 10 s B100 train
            # 186.0 -> 180.6 ms / 553.7 specs/s (QPAD_r05.json
            # sublane_pad_once row; cumulative round-5 at this shape:
            # 199.5 -> 180.6 ms, +10.5%).
            n_res = round_up(n_tokens, 8)
        else:
            n_res = n_tokens
        if n_res != n_tokens:
            x = jnp.pad(x, ((0, 0), (0, n_res - n_tokens), (0, 0)))
        n_real = n_tokens if n_res != n_tokens else None

        if forward_mode == "front":
            return x, n_tokens

        # --- transformer blocks ---
        dpr = [
            float(r) for r in np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        ]
        block_cls = Block
        if cfg.remat and train and not return_self_attention:
            # recompute each block on backward instead of storing activations.
            # static_argnums=(1, 2) is verified for the standard
            # ``blk(x, deterministic)`` call shape (deterministic stays a
            # static python bool); a THIRD positional arg would be traced
            # under this setting (TracerBoolConversionError on
            # ``return_self_attention`` — probed empirically), so the
            # attention-map tap path above opts out of remat instead of
            # ever making a 3-arg remat'd call.
            block_cls = nn.remat(Block, static_argnums=(1, 2),
                                 policy=remat_policy(cfg.remat_policy))
        blocks = [
            block_cls(
                **block_kwargs(cfg, self.dtype, drop_path_rate=dpr[i],
                               mesh=self.mesh, n_real=n_real),
                name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]

        if transformer_block == -1:
            # per-layer token taps feed the TF SavedModel export, which
            # exposes ``layer_{0..11}_tokens`` outputs (reference:
            # packaging/onnx_to_tf.sh graph surgery); ``tap_block`` instead
            # appends ONE block-k 2304-d embedding so predict gets logits +
            # embeddings from a single forward (eval is deterministic, so
            # this equals the truncated transformer_block == k forward)
            layer_tokens = []
            tap = None
            for i, blk in enumerate(blocks):
                x = blk(x, not train)
                if return_layer_tokens:
                    layer_tokens.append(x[:, :n_tokens])
                if tap_block is not None and i == tap_block:
                    tap = self._block_embedding(x, n_tokens)
            out = self._tail(x)
            if tap_block is not None:
                return out + (tap,)
            if return_layer_tokens:
                return out + (tuple(layer_tokens),)
            return out

        # embedding tap (reference: models/maest.py:811-829)
        for i, blk in enumerate(blocks):
            if i == transformer_block:
                x = blk(x, not train, return_self_attention)
                break
            x = blk(x, not train)
        return None, self._block_embedding(x, n_tokens)

    def _block_embedding(self, x: jnp.ndarray, n_tokens: int) -> jnp.ndarray:
        """Block-k embedding: [cls | dist | mean(patch tokens)] (2304-d for
        ViT-B; reference: models/maest.py:811-829). Without a dist token
        the patch tokens start at index 1 — indexing [1] as 'dist' would
        silently mislabel a patch token and drop it from the mean —
        so non-distilled configs get [cls | mean(tokens 1:)]."""
        if self.cfg.distilled:
            return jnp.concatenate(
                [x[:, 0, :], x[:, 1, :],
                 jnp.mean(x[:, 2:n_tokens, :], axis=1)], axis=1)
        return jnp.concatenate(
            [x[:, 0, :], jnp.mean(x[:, 1:n_tokens, :], axis=1)], axis=1)

    def _per_freq_patch_embed(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-frequency-row patch projection (reference: models/maest.py:259-343).

        The reference runs one Conv2d per patch row; the TPU formulation
        extracts all (P, P) patches once and contracts each row against its
        own (C*P*P, E) matrix in a single batched einsum — one MXU-shaped
        matmul instead of grid_f narrow convolutions.
        """
        cfg = self.cfg
        p = cfg.patch_size
        b, f_in, t_in, c = x.shape
        grid_f = (f_in - p) // cfg.stride[0] + 1
        patches = jax.lax.conv_general_dilated_patches(
            x,
            filter_shape=(p, p),
            window_strides=cfg.stride,
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, F', T', C*P*P), feature order (c, h, w)
        w = self.param(
            "patch_embed_freq_kernel",
            nn.initializers.lecun_normal(),
            (grid_f, c * p * p, cfg.embed_dim),
        )
        bias = self.param(
            "patch_embed_freq_bias", nn.initializers.zeros, (grid_f, cfg.embed_dim)
        )
        out = jnp.einsum(
            "bftk,fke->bfte", patches.astype(self.dtype), w.astype(self.dtype),
            preferred_element_type=self.dtype,
            precision=_tier_precision(self.dtype),
        )
        return out + bias[None, :, None, :].astype(self.dtype)

    def _tail(self, x):
        """Final norm + classifier heads on the post-trunk residual stream
        (padded rows, if any, never reach the heads — they only read tokens
        0/1)."""
        x = _layer_norm(
            epsilon=self.cfg.layer_norm_eps, dtype=self.dtype, name="norm"
        )(x)
        if self.cfg.distilled:
            feats = (x[:, 0], x[:, 1])
        else:
            feats = x[:, 0]
        return self._heads(feats)

    def _heads(self, feats):
        """Classifier heads (reference: models/maest.py:570-582, 905-933)."""
        cfg = self.cfg
        # torch nn.LayerNorm default eps (1e-5) — the head norm is constructed
        # without the 1e-6 override used by the blocks (reference:
        # models/maest.py:570-571 vs :499).
        head_norm = _layer_norm(
            epsilon=1e-5, dtype=self.dtype, name="head_norm"
        )
        # head weights start at zero (reference: models/maest.py:951-953)
        head_linear = nn.Dense(cfg.num_classes, dtype=self.dtype,
                               precision=_tier_precision(self.dtype),
                               kernel_init=nn.initializers.zeros,
                               name="head_linear")

        if not cfg.distilled:
            x = feats
            return head_linear(head_norm(x)), x

        cls, dist = feats
        if cfg.distilled_type == "mean":
            features = (cls + dist) / 2
            return head_linear(head_norm(features)), features
        if cfg.distilled_type == "separated":
            features = (cls + dist) / 2
            head_dist = nn.Dense(
                cfg.num_classes, dtype=self.dtype,
                precision=_tier_precision(self.dtype),
                kernel_init=nn.initializers.zeros, name="head_dist"
            )
            return head_linear(head_norm(cls)), head_dist(dist), features
        # The reference's fall-through (head(x) on the tuple) only works for
        # non-distilled models; a typo'd distilled_type would silently change
        # semantics, so reject it (reference: models/maest.py:905-933).
        raise ValueError(
            f"unknown distilled_type {cfg.distilled_type!r}; "
            "expected 'mean' or 'separated'"
        )


def init_params(cfg: MAESTConfig, rng: jax.Array, dtype=jnp.float32):
    """Initialize a parameter pytree for the given config."""
    model = MAESTNet(cfg, dtype=dtype)
    f, t = cfg.img_size
    dummy = jnp.zeros((1, f, t, cfg.in_chans), dtype)
    variables = model.init({"params": rng}, dummy, train=False)
    return variables["params"]
