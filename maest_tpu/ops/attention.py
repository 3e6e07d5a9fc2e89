"""Fused attention for TPU (Pallas).

The reference materializes the full (N, N) attention matrix in HBM
(reference: models/maest.py:371-375). At MAEST sequence lengths
(<= 1685 tokens + padding) the per-(batch, head) K/V tiles fit in VMEM, so
this kernel streams a query block against *all* keys on-chip: scores live
only in VMEM/registers, softmax runs in fp32 on the VPU, and the two matmuls
ride the MXU. HBM traffic drops from O(N^2) to O(N * d) per head, which is
the difference between HBM-bound and MXU-bound at batch-32/30 s shapes.

Gradients: ``flash_attention`` carries a custom VJP whose backward pass
recomputes attention with the XLA path (flash backward kernel is a future
optimization; recompute keeps training memory flat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float, n_real: int):
    """One (batch*head, q-block) program: softmax(q K^T * scale) V.

    q_ref: (block_q, d); k_ref/v_ref: (n_pad, d); out_ref: (block_q, d).
    Keys >= n_real are masked out (sequence padding).
    """
    # Matmul inputs stay in the input dtype (bf16) so the MXU runs at full
    # rate; accumulation and softmax run in fp32 (preferred_element_type).
    q = q_ref[0]
    k = k_ref[0]
    n_pad = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, n_pad) fp32

    if n_real < n_pad:
        key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos < n_real, s, _NEG_INF)

    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v_ref.dtype)

    out = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_fwd(q, k, v, *, block_q: int, interpret: bool):
    """q, k, v: (B, N, H, D) -> out (B, N, H, D)."""
    b, n, h, d = q.shape
    scale = d**-0.5
    n_pad = _round_up(n, 128)
    block_q = min(block_q, n_pad)

    def reshape_in(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    qf, kf, vf = reshape_in(q), reshape_in(k), reshape_in(v)

    grid = (b * h, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_real=n),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)


def attention_reference(q, k, v):
    """XLA attention (numerics oracle & backward path). (B, N, H, D)."""
    d = q.shape[-1]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * d**-0.5, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block_q: int = 256, interpret: bool = False):
    """Fused multi-head attention; inputs/outputs (B, N, H, D)."""
    return _flash_fwd(q, k, v, block_q=block_q, interpret=interpret)


def _fwd(q, k, v, block_q, interpret):
    return _flash_fwd(q, k, v, block_q=block_q, interpret=interpret), (q, k, v)


def _bwd(block_q, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


# Kernel blocks are (sublane, lane)-tiled; the smallest head_dim the MXU
# handles without degenerate tiles. MAEST uses d=64.
_MIN_HEAD_DIM = 64


def use_flash(n: int, d: int) -> bool:
    """Heuristic: pallas on TPU backends for long-enough sequences."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    if backend in ("cpu", "gpu"):
        return False
    return n >= 256 and d >= _MIN_HEAD_DIM and d % 64 == 0
