"""Fused attention for TPU (Pallas).

The reference materializes the full (N, N) attention matrix in HBM
(reference: models/maest.py:371-375). This kernel keeps scores in VMEM and
streams key/value blocks with an online softmax, tuned for MAEST shapes
(N <= 1685 + padding, head_dim 64):

  * K sits pre-transposed (d, N) so both matmuls contract along the
    hardware-preferred axes (lhs lanes, rhs sublanes) — no in-kernel
    relayouts.
  * softmax uses the exp2 trick (fold ``scale * log2(e)`` into the scores),
    a bias-row mask for sequence padding (only applied on tail key blocks),
    and deferred normalization (divide the (N, d) output, not the (N, N)
    score matrix).
  * key blocking (``block_k``) makes score matmul j+1 (MXU) independent of
    softmax j (VPU), so Mosaic overlaps the two units — measured ~6%
    end-to-end over the single-pass kernel, with softmax cost fully hidden.

Matmul inputs stay bf16 (full MXU rate) with fp32 accumulation.

Gradients: ``flash_attention`` carries a custom VJP with a Pallas backward
kernel: per (batch*head, q-block) program it recomputes the softmax from
(q, kT) and emits dq directly plus dk/dv accumulated across q blocks into
grid-resident output blocks (index_map pinned to block 0, init on j==0).
Only (q, k, v, o) are saved — training memory stays flat, no (N, N)
matrices ever reach HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634

# Grouped (g-heads-per-program) kernels exceed Mosaic's default 16 MB
# scoped-vmem guard (g=12 backward: 21.4 MB demand). 64 MB is validated
# for every TABULATED pad class (384/640/896); pads >= 1792 must NOT be
# tabulated — their per-head unrolled temporaries scale with g (measured
# 25.95 MB at g=2, 46.7 MB at g=4) and the large reservation then starves
# the rest of the program's VMEM (133/128 MB whole-program OOM observed).
_GROUPED_VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _attn_body(q, load_kt, load_v, v_dtype, *, scale: float, n_real: int,
               block_k: int, n_pad: int):
    """Online-softmax flash attention for one head's q block.

    ``load_kt(base)`` / ``load_v(base)`` return the (d, block_k) /
    (block_k, d) key/value slabs starting at key ``base``. Returns
    (out (bq, d) fp32-normalized, lse (bq,) log2-sum-exp).
    """
    bq, d = q.shape
    sl = scale * _LOG2E

    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    for jb in range(n_pad // block_k):
        base = jb * block_k
        s = jnp.dot(
            q, load_kt(base), preferred_element_type=jnp.float32
        ) * sl  # (bq, block_k)
        if base + block_k > n_real:
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + base
            s = jnp.where(pos < n_real, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.dot(
            p.astype(v_dtype), load_v(base),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    return acc / l, (m + jnp.log2(l))[:, 0]


def _attn_body_q8(qi8, qs, load_kt8, load_sk, load_v, v_dtype, *,
                  n_real: int, block_k: int, n_pad: int, pv8: bool,
                  sv=None):
    """int8-quantized online-softmax attention for one head's q block.

    Scores run on the MXU in int8 (int32 accumulation): the d=64
    contraction only fills half the 128-deep bf16 MXU, and int8 packs two
    operands per cell, so the same shape streams at ~2x (measured:
    scripts/int8_probe.py). Dequantization is exact rescaling — per-q-row
    scale ``qs`` (already folded with softmax scale * log2e) and per-key
    scale row ``load_sk(base)`` — two VPU broadcasts per score block.

    With ``pv8`` the P·V matmul is int8 too: probabilities are in (0, 1]
    after the exp2 (deferred normalization), so a static 127 scale
    quantizes them; ``sv`` is the per-v-column scale row (1, d) and the
    accumulated int32 products are rescaled ONCE at the end (sv is
    constant across key blocks, so it commutes with the online-softmax
    correction factors).
    """
    bq, d = qi8.shape

    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    for jb in range(n_pad // block_k):
        base = jb * block_k
        s_int = jnp.dot(
            qi8, load_kt8(base), preferred_element_type=jnp.int32
        )  # (bq, block_k) int32
        s = s_int.astype(jnp.float32) * qs * load_sk(base)
        if base + block_k > n_real:
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + base
            s = jnp.where(pos < n_real, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2(m - m_new)
        p = jnp.exp2(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if pv8:
            p8 = jnp.round(p * 127.0).astype(jnp.int8)
            pv = jnp.dot(p8, load_v(base), preferred_element_type=jnp.int32)
            acc = acc * corr + pv.astype(jnp.float32)
        else:
            acc = acc * corr + jnp.dot(
                p.astype(v_dtype), load_v(base),
                preferred_element_type=jnp.float32,
            )
        m = m_new

    if pv8:
        acc = acc * (sv / 127.0)
    return acc / l, (m + jnp.log2(l))[:, 0]


def _attn_kernel_q8(q_ref, kt_ref, sq_ref, sk_ref, v_ref, sv_ref, out_ref,
                    lse_ref=None, *, scale: float, n_real: int,
                    block_k: int, pv8: bool):
    """int8 forward program: layout mirrors ``_attn_kernel`` with scale
    rows added — sq_ref (g, 1, block_q) per-q-row, sk_ref (g, 1, n_pad)
    per-key, sv_ref (g, 1, d) per-v-column (all fp32; sv is all-ones when
    ``pv8`` is off). With ``pv8`` v_ref is int8."""
    n_pad = kt_ref.shape[2]
    sl = scale * _LOG2E
    for h in range(q_ref.shape[0]):
        out, lse = _attn_body_q8(
            q_ref[h],
            sq_ref[h, 0][:, None] * sl,
            lambda base, h=h: kt_ref[h, :, base:base + block_k],
            lambda base, h=h: sk_ref[h, :, base:base + block_k],
            lambda base, h=h: v_ref[h, base:base + block_k, :],
            v_ref.dtype, n_real=n_real, block_k=block_k, n_pad=n_pad,
            pv8=pv8, sv=sv_ref[h] if pv8 else None,
        )
        out_ref[h] = out.astype(out_ref.dtype)
        if lse_ref is not None:
            lse_ref[h, 0] = lse


def _quantize_rows(x, eps: float = 1e-30):
    """Symmetric per-row int8 quantization over the last axis.

    x (..., d) -> (int8 values, fp32 scales (...,)). The scale floor keeps
    all-zero rows (sequence padding) from dividing by zero."""
    scales = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), eps
    ) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scales[..., None])
    return q.astype(jnp.int8), scales


def _attn_kernel(q_ref, kt_ref, v_ref, out_ref, lse_ref=None, *, scale: float,
                 n_real: int, block_k: int):
    """One program of the flash forward.

    q_ref (g, block_q, d); kt_ref (g, d, n_pad); v_ref (g, n_pad, d) —
    one program handles ``g`` whole heads back to back (g == 1 is the
    plain one-program-per-(batch*head, q-block) layout). Grouping uses a
    flat (g, ...) BlockSpec over the unreshaped (B*H, ...) arrays, so no
    XLA-side relayout is ever inserted. Keys >= n_real are masked out
    (sequence padding). ``lse_ref`` (per-row log2-sum-exp) feeds the
    backward kernel's softmax reconstruction.
    """
    n_pad = kt_ref.shape[2]
    for h in range(q_ref.shape[0]):
        out, lse = _attn_body(
            q_ref[h],
            lambda base, h=h: kt_ref[h, :, base:base + block_k],
            lambda base, h=h: v_ref[h, base:base + block_k, :],
            v_ref.dtype, scale=scale, n_real=n_real, block_k=block_k,
            n_pad=n_pad,
        )
        out_ref[h] = out.astype(out_ref.dtype)
        if lse_ref is not None:  # only the autodiff path pays for the emit
            lse_ref[h, 0] = lse


from ..utils.shapes import round_up as _round_up  # shared tile math


def _pick_block(n_pad: int, target: int) -> int:
    """Largest 128-multiple divisor of n_pad that is <= target.

    128 is the FLOOR (Mosaic lane granularity): a target below 128 still
    returns 128 — an explicit block_q/block_k override smaller than that
    is silently clamped up, never honored."""
    best = 128
    for mult in range(1, n_pad // 128 + 1):
        cand = 128 * mult
        if cand <= target and n_pad % cand == 0:
            best = cand
    return best


# Heads-per-program for single-q-block pad classes, keyed by n_pad.
# Small sequences spawn many small programs (10s pretrain at B=100: 1200
# programs of 38 MFLOP); folding g heads into one program amortizes the
# per-program pipeline cost. CRITICAL implementation detail: grouping is
# expressed as a flat (g, ...) BlockSpec over the UNRESHAPED (B*H, ...)
# arrays — an earlier (bh) -> (bh/g, g) XLA reshape variant LOST its
# in-kernel win to relayouts (train 218 vs 215 ms). With flat blocks,
# interleaved 3-round A/Bs measured (ms/step, stable to +-0.2):
#   pad 384 (10s B100 train):  205.5 -> 199.5  (fwd 24 / bwd 12, -2.9%)
#   pad 640 (20s B48 train):   178.8 -> 176.1  (fwd 8  / bwd 8,  -1.5%)
#   pad 896 (30s B32 train):   181.0 -> 177.5  (fwd 12 / bwd 6,  -1.9%)
#   pad 384 (5s b32 inference): neutral (16.30 vs 16.30 ms/fwd)
# NOTE: never tabulate pads >= 1792 (see _GROUPED_VMEM).
_TUNED_FWD_GROUP: dict[int, int] = {384: 24, 640: 8, 896: 12}
_TUNED_BWD_GROUP: dict[int, int] = {384: 12, 640: 8, 896: 6}


_UNTUNED_LOGGED: set[tuple[int, str]] = set()


def _note_untuned(n_pad: int, path: str, fallback) -> None:
    """One trace-time log line per (pad class, picker) that misses its tuned
    table: the tables were measured on one v5e, and a new pad class or a
    different TPU generation silently degrading to generic targets is
    exactly what a future sweep needs to notice."""
    if (n_pad, path) not in _UNTUNED_LOGGED:
        _UNTUNED_LOGGED.add((n_pad, path))
        import logging

        logging.getLogger(__name__).info(
            "attention %s: pad class %d not in the tuned table; using "
            "generic fallback %r (consider a scripts/attn_tune.py sweep)",
            path, n_pad, fallback,
        )


def _pick_group(n_pad: int, bh: int, table=None) -> int:
    """Largest divisor of batch*heads at or below the tuned group target."""
    tab = _TUNED_FWD_GROUP if table is None else table
    target = tab.get(n_pad, 1)
    if n_pad not in tab and n_pad < 1792:
        # pads >= 1792 are deliberately ungroupable (VMEM, _GROUPED_VMEM).
        # NOTE: group-sweep coverage is separate from block-sweep coverage —
        # _FWD_MEASURED_GENERIC does NOT apply here. Every pad class group-
        # swept so far produced a table entry (384/640/896), so a miss here
        # really is an unswept-for-grouping class, not a known-neutral one;
        # if a future sweep measures a class neutral, add a
        # _GROUP_MEASURED_GENERIC exclusion like the blocks one.
        _note_untuned(n_pad,
                      "fwd group" if tab is _TUNED_FWD_GROUP else "bwd group",
                      1)
    for g in range(min(target, bh), 0, -1):
        if bh % g == 0:
            return g
    return 1


def _flatten_pad(n_pad: int, *tensors):
    """(B, N, H, D) -> (B*H, n_pad, D) with zero-padded tail rows — the
    shared kernel input layout (heads fold into the grid's batch dim)."""
    outs = []
    for x in tensors:
        b, n, h, d = x.shape
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        outs.append(x)
    return outs


def _unflatten(x, b: int, n: int, h: int, d: int):
    """Inverse of _flatten_pad: (B*H, n_pad, D) -> (B, N, H, D)."""
    return jnp.swapaxes(x[:, :n].reshape(b, h, n, d), 1, 2)


def _sublane_q_pad(n: int, n_pad: int, n_real: int | None,
                   quant: str | None, bwd_quant: str | None,
                   for_train: bool) -> int:
    """Sublane-only q-row padding (round-5 lever, QPAD_r05.json).

    Mosaic needs the LANE (key) dim at 128, but q-block ROWS only need
    sublane-8 alignment: when the caller did not pre-pad the stream
    (pad-once covers the 20/30 s classes; here n == n_pad already and
    this is a no-op), padding q to round_up(n, 8) instead of n_pad cuts
    the dead score-matrix rows — 25% at the 10 s train shape (281 -> 288
    vs 384; measured -8% fwd / -13% fwd+lse per call). Applies only to
    the bf16 single-q-block kernels; quantized paths and beyond-VMEM
    sequences keep the uniform pad (their kernels assume n_pad rows).
    ``for_train`` also requires the full-K bf16 backward to be the one
    that will consume the (b*h, 1, nq)-shaped lse.

    ``n_real`` does not gate this: q rows in [n_real, n) are live layout
    (sublane pad-once streams) and are kept — nq >= n always covers the
    caller's full stream; rows in [n, nq) are kernel-internal zero pads
    whose outputs _unflatten slices off and whose dk/dv contributions
    vanish (zero q AND zero do)."""
    if quant is not None:
        return n_pad
    nq = _round_up(n, 8)
    if nq >= n_pad:
        return n_pad
    if for_train and (bwd_quant is not None
                      or n_pad > _FULL_K_BWD_MAX_N_PAD
                      or nq * n_pad > _BWD_VMEM_ROWS):
        return n_pad
    return nq


def _resolve_nq(n: int, n_pad: int, block_q: int, n_real: int | None,
                quant: str | None, bwd_quant: str | None,
                for_train: bool) -> int:
    """Single source of truth for the sublane q-pad decision.

    The forward's saved lse shape and the backward that consumes it MUST
    resolve the same nq — both ``_flash_fwd_lse`` and ``_bwd`` call THIS
    (never ``_sublane_q_pad`` directly), so the single-q-block condition
    and the predicate can never desynchronize."""
    if _pick_block(n_pad, block_q) != n_pad:
        return n_pad  # multi-q-block forward: uniform pad, n_pad lse
    return _sublane_q_pad(n, n_pad, n_real, quant, bwd_quant, for_train)


def _flash_fwd_lse(q, k, v, *, block_q: int, block_k: int, interpret: bool,
                   with_lse: bool = True, n_real: int | None = None,
                   quant: str | None = None,
                   bwd_quant: str | None = None):
    """q, k, v: (B, N, H, D) -> (out (B, N, H, D), lse (B*H, 1, N_pad)).

    ``with_lse=False`` (the inference primal) emits only the output —
    the extra lse store measured ~5% of the whole model step.

    ``quant``: None (bf16 MXU), "qk8" (int8 QK^T, int32 accumulation,
    exact per-row/per-key rescale), "qk8pv8" (int8 P·V as well), "fp8"
    (e4m3 QK^T — scale-free, identical kernel structure), or "fp8pv8".
    Quantization runs in XLA outside the kernel — it fuses into the
    producing ops and HALVES the kernel's q/kT (and v) HBM bytes.
    NOTE: at MAEST's d=64 geometry every 8-bit mode measured SLOWER than
    bf16 (the softmax VPU floor binds once the MXU speeds up — see
    docs/DESIGN.md round-3); they are kept for d>=128 geometries where
    the MXU share dominates.
    """
    b, n, h, d = q.shape
    nr = n if n_real is None else n_real
    scale = d**-0.5
    n_pad = _round_up(n, 128)
    bq = _pick_block(n_pad, block_q)
    bk = _pick_block(n_pad, block_k)
    # sublane-only q padding: single-q-block programs may shrink the q-row
    # axis to round_up(n, 8) (keys stay lane-padded at n_pad); the lse (if
    # emitted) is then (b*h, 1, nq) and the matching backward resolves the
    # same nq through the shared _resolve_nq
    nq = _resolve_nq(n, n_pad, block_q, n_real, quant, bwd_quant,
                     for_train=with_lse)
    g = _pick_group(n_pad, b * h) if bq == n_pad else 1
    if nq != n_pad:
        bq = nq

    qf = _flatten_pad(nq, q)[0]
    kf, vf = _flatten_pad(n_pad, k, v)

    # g whole heads per program via a flat (g, ...) BlockSpec over the
    # unreshaped arrays — no XLA relayout; g == 1 is the classic layout.
    grid = (b * h // g, nq // bq)
    out_shape = [jax.ShapeDtypeStruct((b * h, nq, d), q.dtype)]
    out_specs = [pl.BlockSpec((g, bq, d), lambda i, j: (i, j, 0))]
    if with_lse:
        # (bh, 1, nq): the singleton sublane dim satisfies Mosaic's
        # block-shape divisibility rule for the (g, 1, bq) blocks
        out_shape.append(jax.ShapeDtypeStruct((b * h, 1, nq), jnp.float32))
        out_specs.append(pl.BlockSpec((g, 1, bq), lambda i, j: (i, 0, j)))

    if quant in (None, "fp8", "fp8pv8"):
        if quant is not None:
            # fp8 is a FLOAT: no scales are needed for correctness —
            # e4m3's ±448 range covers post-LN activations and precision
            # is relative (~2^-4) at any magnitude. The kernel is
            # byte-identical to the bf16 one (dot emits fp32 directly),
            # so unlike int8 there is ZERO extra VPU work; only the MXU
            # streams ~2.6x faster (scripts/int8_probe2.py).
            qf = qf.astype(jnp.float8_e4m3fn)
            kf = kf.astype(jnp.float8_e4m3fn)
            if quant == "fp8pv8":
                vf = vf.astype(jnp.float8_e4m3fn)
        kt = jnp.swapaxes(kf, 1, 2)  # (b*h, d, n_pad)
        # with one output pallas passes 4 refs and lse_ref defaults to None
        res = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale, n_real=nr,
                              block_k=bk),
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((g, bq, d), lambda i, j: (i, j, 0)),
                pl.BlockSpec((g, d, n_pad), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((g, n_pad, d), lambda i, j: (i, 0, 0)),
            ],
            out_specs=out_specs,
            interpret=interpret,
            compiler_params=_GROUPED_VMEM if g > 1 else None,
        )(qf, kt, vf)
    else:
        if quant not in ("qk8", "qk8pv8"):
            raise ValueError(f"unknown attention quant mode {quant!r}")
        pv8 = quant == "qk8pv8"
        qi8, sq = _quantize_rows(qf)          # (bh, n_pad, d) i8 / (bh, n_pad)
        ki8, sk = _quantize_rows(kf)
        kt8 = jnp.swapaxes(ki8, 1, 2)         # (bh, d, n_pad) int8
        sq_r = sq[:, None, :]                 # (bh, 1, n_pad) fp32
        sk_r = sk[:, None, :]
        if pv8:
            sv = jnp.maximum(
                jnp.max(jnp.abs(vf.astype(jnp.float32)), axis=1), 1e-30
            ) / 127.0                         # (bh, d)
            v_in = jnp.round(
                vf.astype(jnp.float32) / sv[:, None, :]).astype(jnp.int8)
            sv_r = sv[:, None, :]             # (bh, 1, d)
        else:
            v_in = vf
            sv_r = jnp.ones((b * h, 1, d), jnp.float32)
        res = pl.pallas_call(
            functools.partial(_attn_kernel_q8, scale=scale, n_real=nr,
                              block_k=bk, pv8=pv8),
            out_shape=out_shape,
            grid=grid,
            in_specs=[
                pl.BlockSpec((g, bq, d), lambda i, j: (i, j, 0)),      # qi8
                pl.BlockSpec((g, d, n_pad), lambda i, j: (i, 0, 0)),   # kt8
                pl.BlockSpec((g, 1, bq), lambda i, j: (i, 0, j)),      # sq
                pl.BlockSpec((g, 1, n_pad), lambda i, j: (i, 0, 0)),   # sk
                pl.BlockSpec((g, n_pad, d), lambda i, j: (i, 0, 0)),   # v
                pl.BlockSpec((g, 1, d), lambda i, j: (i, 0, 0)),       # sv
            ],
            out_specs=out_specs,
            interpret=interpret,
            compiler_params=_GROUPED_VMEM if g > 1 else None,
        )(qi8, kt8, sq_r, sk_r, v_in, sv_r)
    out, lse = (res[0], res[1]) if with_lse else (res[0], None)
    return _unflatten(out, b, n, h, d), lse


def _flash_fwd(q, k, v, *, block_q: int, block_k: int, interpret: bool,
               n_real: int | None = None, quant: str | None = None):
    return _flash_fwd_lse(q, k, v, block_q=block_q, block_k=block_k,
                          interpret=interpret, with_lse=False,
                          n_real=n_real, quant=quant)[0]


def attention_reference(q, k, v):
    """XLA attention numerics oracle. (B, N, H, D).

    Precision is PINNED to HIGHEST: on TPU the ambient default is
    bf16-mantissa fp32 matmuls (CLAUDE.md numerics trap), which would
    put ~bf16 noise in the oracle itself and let a real kernel
    regression up to that band pass the flash-vs-oracle gates. The
    production XLA attention path lives in models/vit.py (tier-pinned
    there); this function is tests/acceptance-only."""
    d = q.shape[-1]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    p = jax.nn.softmax(s * d**-0.5, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v,
                      precision=jax.lax.Precision.HIGHEST)


def _attn_bwd_kernel(q_ref, kt_ref, v_ref, do_ref, o_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, n_real: int,
                     block_k: int):
    """One (batch*head, q-block) program of the flash backward pass.

    Softmax probabilities are reconstructed from the forward-saved
    log2-sum-exp (``p = exp2(s' - lse)``) — no max/sum recompute passes.
    Key blocking keeps block j+1's score matmul independent of block j's
    elementwise work, overlapping MXU and VPU like the forward kernel.
    Padded q rows carry zero ``do`` so their dk/dv contributions vanish;
    padded key columns get masked scores.
    """
    j = pl.program_id(1)
    n_pad = kt_ref.shape[2]
    for h in range(q_ref.shape[0]):  # g heads per program (g == 1 classic)
        dq, kv_blocks = _bwd_body(
            q_ref[h], do_ref[h], o_ref[h], lse_ref[h, 0][:, None],
            lambda base, h=h: kt_ref[h, :, base:base + block_k],
            lambda base, h=h: v_ref[h, base:base + block_k, :],
            v_ref.dtype, scale=scale, n_real=n_real,
            block_k=block_k, n_pad=n_pad,
        )
        dq_ref[h] = dq.astype(dq_ref.dtype)
        for base, dk_blk, dv_blk in kv_blocks:
            @pl.when(j == 0)
            def _init():
                dk_ref[h, base:base + block_k, :] = dk_blk
                dv_ref[h, base:base + block_k, :] = dv_blk

            @pl.when(j > 0)
            def _acc():
                dk_ref[h, base:base + block_k, :] += dk_blk
                dv_ref[h, base:base + block_k, :] += dv_blk


def _q8_tensor(x):
    """In-kernel symmetric int8 quantization of a VMEM-resident tensor
    with ONE scale (per head-slice). Scalar scales factor exactly out of
    any contraction and fold into multiply passes the kernel already
    does; finer per-row/column scales measured net-slower (their
    broadcast dequants cost more VPU than the int8 MXU saves)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-30
                        ) * (1.0 / 127.0)
    return jnp.round(x.astype(jnp.float32) * (1.0 / scale)
                     ).astype(jnp.int8), scale


def _attn_bwd_kernel_q8(q_ref, kt_ref, v_ref, do_ref, o_ref, lse_ref,
                        dq_ref, dk_ref, dv_ref, *, scale: float,
                        n_real: int):
    """int8 full-K backward program (one q-block, g heads).

    All five matmuls run int8 on the MXU (int32 accumulation) — the
    backward is MXU-dominated (~2.6:1 vs the forward's ~1:1), so unlike
    the forward the 2x int8 rate survives the extra dequant VPU passes:
    rig-measured 2.5 vs 4.7 ms/call at the 30 s train shape
    (scripts/bwd_int8_probe.py). Inputs are the SAME bf16 tensors as the
    bf16 kernel; quantization happens HERE, in VMEM, on the (n, 64)-class
    operands — a first draft quantized in XLA outside and its HBM
    round-trips cost 3 ms/layer, inverting the win end-to-end
    (docs/DESIGN.md round-3). All scales are per-(head, q-block) SCALARS
    (finer granularity measured net-slower — its broadcast dequants cost
    more VPU than the int8 MXU saves), factoring exactly:

      s  = s_int · qs·ks·sl          p8 = round(p·127/pst)
      dp = dp_int · dos·vs           (pst: dynamic block-max p scale —
      dv = dv_int · dos·pst/127       ~100x finer for diffuse attention)
      dq = dq_int · dst·ks/127       (dst: dynamic ds scale)
      dk = dk_int · dst·qs/127

    Gradient quantization noise is the accuracy cost (p and ds requantize
    to 8 bits); measured bounds live in tests/test_flash_attention.py and
    docs/DESIGN.md. Padded q rows carry zero ``do``; padded keys get
    masked scores, so padding contributes nothing, as in the bf16 kernel.
    """
    j = pl.program_id(1)
    n_pad = kt_ref.shape[2]
    sl = scale * _LOG2E
    for h in range(q_ref.shape[0]):
        q = q_ref[h]          # (bq, d) bf16
        kt = kt_ref[h]        # (d, n_pad) bf16
        v = v_ref[h]          # (n_pad, d) bf16
        do = do_ref[h]        # (bq, d) bf16
        lse = lse_ref[h, 0][:, None]
        delta = jnp.sum(
            do.astype(jnp.float32) * o_ref[h].astype(jnp.float32),
            axis=-1, keepdims=True,
        )

        # per-(head, block)-tensor scales: scalars factor EXACTLY out of
        # every contraction AND fold into multiply passes the kernel does
        # anyway — the earlier per-row/per-column variant spent more VPU
        # on its broadcast dequants than the int8 MXU saved (A/B'd).
        q8, qs = _q8_tensor(q)
        kt8, ks = _q8_tensor(kt)
        v8, vs = _q8_tensor(v)
        do8, dos = _q8_tensor(do)

        s_int = jnp.dot(q8, kt8, preferred_element_type=jnp.int32)
        s = s_int.astype(jnp.float32) * (qs * ks * sl)
        if n_real < n_pad:
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
            s = jnp.where(pos < n_real, s, _NEG_INF)
        p = jnp.exp2(s - lse)
        # DYNAMIC p scale, two reasons: (1) diffuse attention rows have
        # max p << 1, so scaling by the block max instead of a static 127
        # buys up to ~100x finer resolution exactly when quantization
        # noise is worst; (2) a CONSTANT-scale round-to-int8 feeding a
        # dim-0-contracted dot miscompiles to zeros in the grouped kernel
        # (Mosaic const-fold bug, g>1 only — caught by the on-device
        # acceptance check; a traced scalar scale lowers correctly).
        pst = jnp.maximum(jnp.max(p), 1e-30)
        p8 = jnp.round(p * (127.0 / pst)).astype(jnp.int8)

        dv_int = jax.lax.dot_general(
            p8, do8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (n_pad, d)
        dv = dv_int.astype(jnp.float32) * (dos * pst * (1.0 / 127.0))

        dp_int = jax.lax.dot_general(
            do8, v8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (bq, n_pad)
        dp = dp_int.astype(jnp.float32) * (dos * vs)

        ds = p * (dp - delta) * scale
        dst = jnp.maximum(jnp.max(jnp.abs(ds)), 1e-30)
        ds8 = jnp.round(ds * (127.0 / dst)).astype(jnp.int8)

        # dq = ds @ k: contract over keys = the LANES of both ds8 and kt8
        dq_int = jax.lax.dot_general(
            ds8, kt8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (bq, d)
        dq = dq_int.astype(jnp.float32) * (dst * ks * (1.0 / 127.0))
        dk_int = jax.lax.dot_general(
            ds8, q8, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (n_pad, d)
        dk = dk_int.astype(jnp.float32) * (dst * qs * (1.0 / 127.0))

        dq_ref[h] = dq.astype(dq_ref.dtype)

        @pl.when(j == 0)
        def _init():
            dk_ref[h] = dk
            dv_ref[h] = dv

        @pl.when(j > 0)
        def _acc():
            dk_ref[h] += dk
            dv_ref[h] += dv


def _flash_bwd_q8(q, k, v, o, lse, g, *, block_q: int, interpret: bool,
                  n_real: int | None = None):
    """int8 backward driver. Operand layout and specs are IDENTICAL to the
    bf16 ``_flash_bwd`` (quantization lives inside the kernel); full-K
    only — the > _FULL_K_BWD_MAX_N_PAD split path stays bf16 (beyond
    every shipped training shape)."""
    b, n, h, d = q.shape
    scale = d**-0.5
    n_pad = _round_up(n, 128)
    bq = _pick_block(n_pad, block_q)

    qf, kf, vf, dof, of = _flatten_pad(n_pad, q, k, v, g, o)
    kt = jnp.swapaxes(kf, 1, 2)  # (b*h, d, n_pad)

    grp = (_pick_group(n_pad, b * h, _TUNED_BWD_GROUP)
           if bq == n_pad else 1)
    grid = (b * h // grp, n_pad // bq)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_q8, scale=scale,
                          n_real=n if n_real is None else n_real),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # q
            pl.BlockSpec((grp, d, n_pad), lambda i, j: (i, 0, 0)),  # kT
            pl.BlockSpec((grp, n_pad, d), lambda i, j: (i, 0, 0)),  # v
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # do
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # o
            pl.BlockSpec((grp, 1, bq), lambda i, j: (i, 0, j)),     # lse
        ],
        out_specs=[
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # dq
            pl.BlockSpec((grp, n_pad, d), lambda i, j: (i, 0, 0)),  # dk
            pl.BlockSpec((grp, n_pad, d), lambda i, j: (i, 0, 0)),  # dv
        ],
        interpret=interpret,
        compiler_params=_GROUPED_VMEM if grp > 1 else None,
    )(qf, kt, vf, dof, of, lse)

    return (
        _unflatten(dq, b, n, h, d),
        _unflatten(dk, b, n, h, d).astype(k.dtype),
        _unflatten(dv, b, n, h, d).astype(v.dtype),
    )


def _bwd_body(q, do, o, lse, load_kt, load_v, v_dtype, *, scale: float,
              n_real: int, block_k: int, n_pad: int):
    """Backward math for one head's q block. Returns (dq, [(base, dk_blk,
    dv_blk), ...]) — the caller stores/accumulates the dk/dv blocks into
    its grid-resident refs (no ref views: Mosaic cannot slice the 64-lane
    head dim out of a 128-tiled memref). In production ``block_k`` always
    equals ``n_pad`` (full-K backward), so the list has one element."""
    bq, d = q.shape
    sl = scale * _LOG2E

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (bq, 1)

    dq = jnp.zeros((bq, d), jnp.float32)
    kv_blocks = []
    for kb in range(n_pad // block_k):
        base = kb * block_k
        kt_j = load_kt(base)  # (d, bk)
        s = jnp.dot(q, kt_j, preferred_element_type=jnp.float32) * sl
        if base + block_k > n_real:
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + base
            s = jnp.where(pos < n_real, s, _NEG_INF)
        p = jnp.exp2(s - lse)  # normalized probabilities (bq, bk) fp32
        p_lo = p.astype(v_dtype)

        # dv_block += p^T @ do    (contract over q rows, no transpose op)
        dv_blk = jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, d)

        # dp = do @ v^T ; ds = p * (dp - delta) * scale
        dp = jax.lax.dot_general(
            do, load_v(base), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = (p * (dp - delta) * scale).astype(v_dtype)

        # dq += ds @ k_j          (contract ds lanes with kT lanes)
        dq += jax.lax.dot_general(
            ds, kt_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # dk_block += ds^T @ q
        dk_blk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, d)
        kv_blocks.append((base, dk_blk, dv_blk))

    return dq, kv_blocks


def _bwd_dq_kernel(q_ref, kt_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, scale: float, n_real: int):
    """One (batch*head, q-block, k-block) program: dq contribution of one
    key block, accumulated into a grid-resident dq block (index_map pinned
    to k-block 0). VMEM is bounded by (block_q, block_k) — no full-K
    residency, so sequence length is unbounded."""
    jk = pl.program_id(2)
    q = q_ref[0]
    bq, d = q.shape
    bk = kt_ref.shape[2]
    sl = scale * _LOG2E
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    base = jk * bk
    s = jnp.dot(q, kt_ref[0], preferred_element_type=jnp.float32) * sl
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + base
    s = jnp.where(pos < n_real, s, _NEG_INF)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta) * scale).astype(v_ref.dtype)
    dq_blk = jax.lax.dot_general(
        ds, kt_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jk == 0)
    def _init():
        dq_ref[0] = dq_blk

    @pl.when(jk > 0)
    def _acc():
        dq_ref[0] += dq_blk


def _bwd_dkv_kernel(q_ref, kt_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float, n_real: int):
    """One (batch*head, k-block, q-block) program: this key block's dk/dv
    contribution from one q block, accumulated into grid-resident dk/dv
    blocks (index_map pinned to q-block 0). Padded q rows carry zero ``do``
    so they contribute nothing; padded key columns get masked scores."""
    jq = pl.program_id(2)
    jk = pl.program_id(1)
    q = q_ref[0]
    do = do_ref[0]
    bk = kt_ref.shape[2]
    sl = scale * _LOG2E
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    base = jk * bk
    s = jnp.dot(q, kt_ref[0], preferred_element_type=jnp.float32) * sl
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + base
    s = jnp.where(pos < n_real, s, _NEG_INF)
    p = jnp.exp2(s - lse)
    p_lo = p.astype(v_ref.dtype)

    dv_blk = jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, d)
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta) * scale).astype(v_ref.dtype)
    dk_blk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, d)

    @pl.when(jq == 0)
    def _init():
        dk_ref[0] = dk_blk
        dv_ref[0] = dv_blk

    @pl.when(jq > 0)
    def _acc():
        dk_ref[0] += dk_blk
        dv_ref[0] += dv_blk


def _flash_bwd_split(q, k, v, o, lse, g, *, block_q: int, block_k: int,
                     interpret: bool, n_real: int | None = None):
    """Backward for sequences whose fp32 (block_q, N) intermediates exceed
    VMEM: two kernels with (block_q, block_k)-bounded working sets. The dq
    kernel streams key blocks through the grid; the dk/dv kernel streams q
    blocks. Scores are recomputed once per kernel (2x the recompute of the
    combined kernel), which is why the combined full-K kernel stays the
    default at MAEST scale (N <= 1792)."""
    b, n, h, d = q.shape
    scale = d**-0.5
    n_pad = _round_up(n, 128)
    bq = _pick_block(n_pad, block_q)
    bk = _pick_block(n_pad, block_k)

    qf, kf, vf, dof, of = _flatten_pad(n_pad, q, k, v, g, o)
    kt = jnp.swapaxes(kf, 1, 2)  # (b*h, d, n_pad)
    delta = jnp.sum(
        dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1
    )[:, None, :]  # (b*h, 1, n_pad)

    (dq,) = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale,
                          n_real=n if n_real is None else n_real),
        out_shape=[jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32)],
        grid=(b * h, n_pad // bq, n_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0)),   # q
            pl.BlockSpec((1, d, bk), lambda i, jq, jk: (i, 0, jk)),   # kT
            pl.BlockSpec((1, bk, d), lambda i, jq, jk: (i, jk, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0)),   # do
            pl.BlockSpec((1, 1, bq), lambda i, jq, jk: (i, 0, jq)),   # lse
            pl.BlockSpec((1, 1, bq), lambda i, jq, jk: (i, 0, jq)),   # delta
        ],
        out_specs=[pl.BlockSpec((1, bq, d), lambda i, jq, jk: (i, jq, 0))],
        interpret=interpret,
    )(qf, kt, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale,
                          n_real=n if n_real is None else n_real),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
        ],
        grid=(b * h, n_pad // bk, n_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, jk, jq: (i, jq, 0)),   # q
            pl.BlockSpec((1, d, bk), lambda i, jk, jq: (i, 0, jk)),   # kT
            pl.BlockSpec((1, bk, d), lambda i, jk, jq: (i, jk, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda i, jk, jq: (i, jq, 0)),   # do
            pl.BlockSpec((1, 1, bq), lambda i, jk, jq: (i, 0, jq)),   # lse
            pl.BlockSpec((1, 1, bq), lambda i, jk, jq: (i, 0, jq)),   # delta
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda i, jk, jq: (i, jk, 0)),
            pl.BlockSpec((1, bk, d), lambda i, jk, jq: (i, jk, 0)),
        ],
        interpret=interpret,
    )(qf, kt, vf, dof, lse, delta)

    return (
        _unflatten(dq, b, n, h, d).astype(q.dtype),
        _unflatten(dk, b, n, h, d).astype(k.dtype),
        _unflatten(dv, b, n, h, d).astype(v.dtype),
    )


def _flash_bwd(q, k, v, o, lse, g, *, block_q: int, block_k: int,
               interpret: bool, n_real: int | None = None,
               n_qpad: int | None = None):
    b, n, h, d = q.shape
    scale = d**-0.5
    n_pad = _round_up(n, 128)
    # sublane-only q padding (see _sublane_q_pad): q/do/o rows and the
    # saved lse run at nq < n_pad; keys/values stay lane-padded. The
    # single q block then covers all nq rows (VMEM bound pre-checked).
    nq = n_pad if n_qpad is None else n_qpad
    bq = _pick_block(n_pad, block_q) if nq == n_pad else nq
    bk = _pick_block(n_pad, block_k)

    qf, dof, of = _flatten_pad(nq, q, g, o)
    kf, vf = _flatten_pad(n_pad, k, v)
    kt = jnp.swapaxes(kf, 1, 2)  # (b*h, d, n_pad)

    grp = (_pick_group(n_pad, b * h, _TUNED_BWD_GROUP)
           if bq in (n_pad, nq) else 1)
    grid = (b * h // grp, nq // bq)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale,
                          n_real=n if n_real is None else n_real,
                          block_k=bk),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, n_pad, d), jnp.float32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # q
            pl.BlockSpec((grp, d, n_pad), lambda i, j: (i, 0, 0)),  # kT
            pl.BlockSpec((grp, n_pad, d), lambda i, j: (i, 0, 0)),  # v
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # do
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # o
            pl.BlockSpec((grp, 1, bq), lambda i, j: (i, 0, j)),     # lse
        ],
        out_specs=[
            pl.BlockSpec((grp, bq, d), lambda i, j: (i, j, 0)),     # dq
            pl.BlockSpec((grp, n_pad, d), lambda i, j: (i, 0, 0)),  # dk (acc)
            pl.BlockSpec((grp, n_pad, d), lambda i, j: (i, 0, 0)),  # dv (acc)
        ],
        interpret=interpret,
        compiler_params=_GROUPED_VMEM if grp > 1 else None,
    )(qf, kt, vf, dof, of, lse)

    return (
        _unflatten(dq, b, n, h, d),
        _unflatten(dk, b, n, h, d).astype(k.dtype),
        _unflatten(dv, b, n, h, d).astype(v.dtype),
    )


# Per-pad-class forward blocks measured on v5e (scripts/attn_tune.py,
# batch 32 x 12 heads, 50-iter back-to-back validation), keyed by n_pad
# (= N rounded up to 128, the quantity that determines the divisor set):
# the 20 s geometry (N=1118 -> 1152) runs 7% faster with a single q block
# per program; other lengths measured at parity with the generic
# (896, 448) targets and keep them.
_TUNED_FWD_BLOCKS = {
    896: (896, 896),    # 30s train (N=866): 2.6 vs 3.1 ms at (896, 128) —
                        # pad 896 only divides by 128/896, and the generic
                        # bk=448 target degraded to 7 tiny K iterations
    1152: (1152, 384),  # 20s eval: 3.41 vs 3.67 ms/call at (384, 384)
    1792: (1792, 256),  # 30s eval (N=1676): parity-to-better vs (896, 256)
}

# Pad classes that WERE swept (scripts/attn_tune.py) and measured at parity
# with the generic (896, 448) targets — excluded from the untuned-fallback
# log so it only flags genuinely unswept classes.
_FWD_MEASURED_GENERIC = {128, 256, 384, 512, 640}


def _validate_tuned_groups():
    """Pads >= 1792 must never be grouped: per-head unrolled temporaries
    scale with g past the VMEM guard (see _GROUPED_VMEM)."""
    for table in (_TUNED_FWD_GROUP, _TUNED_BWD_GROUP):
        for n_pad, g in table.items():
            if n_pad >= 1792 and g > 1:
                raise AssertionError(
                    f"group table entry {n_pad}: {g} — pads >= 1792 cannot "
                    "be grouped (VMEM; see _GROUPED_VMEM)"
                )


_validate_tuned_groups()


def _validate_tuned_blocks(table=None):
    """A tuned target that does not divide its pad class silently degrades
    to 128 in ``_pick_block`` (this bit us once: bwd target 448 at pad 896
    resolved to 128, docs/DESIGN.md) — reject such table entries at import."""
    for n_pad, targets in (table or _TUNED_FWD_BLOCKS).items():
        for t in targets:
            if t % 128 or n_pad % min(t, n_pad):
                raise AssertionError(
                    f"tuned block target {t} is not a 128-multiple divisor "
                    f"of pad class {n_pad}; _pick_block would silently "
                    "degrade it to 128"
                )


_validate_tuned_blocks()


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_vjp(q, k, v, block_q: int, block_k: int,
                         interpret: bool, n_real: int, quant: str | None,
                         bwd_quant: str | None):
    return _flash_fwd(q, k, v, block_q=block_q, block_k=block_k,
                      interpret=interpret, n_real=n_real, quant=quant)


def flash_attention(q, k, v, block_q: int | None = None,
                    block_k: int | None = None, interpret: bool = False,
                    n_real: int | None = None, quant: str | None = None,
                    bwd_quant: str | None = None):
    """Fused multi-head attention; inputs/outputs (B, N, H, D).

    ``n_real``: number of REAL tokens when the caller already padded the
    sequence axis (pad-once residual stream); keys/queries at positions
    >= n_real are treated as padding. Defaults to N.

    ``block_q``/``block_k`` default to measured per-N tuning
    (``_TUNED_FWD_BLOCKS``) with a generic fallback; pass explicit values
    to override (targets — the largest 128-multiple divisor of n_pad at or
    below the target is used). Explicit overrides apply to the FORWARD
    only: the backward always uses the VMEM-budget rule
    (``_pick_bwd_block`` / the split-kernel targets), which measured
    strictly better than forward-tuned blocks at every pad class.

    ``quant``: None | "qk8" | "qk8pv8" | "fp8" | "fp8pv8" — 8-bit MXU
    forward (see ``_flash_fwd_lse``). The backward stays bf16
    (straight-through);
    under autodiff the saved lse comes from the quantized forward, so
    reconstructed probabilities differ from the quantized ones by the
    quantization noise only.
    """
    n_pad = _round_up(q.shape[1], 128)
    if n_pad not in _TUNED_FWD_BLOCKS and n_pad not in _FWD_MEASURED_GENERIC:
        _note_untuned(n_pad, "fwd blocks", (896, 448))
    if quant == "none":  # config-file spelling of "off", like bwd_quant
        quant = None
    if quant not in (None, "qk8", "qk8pv8", "fp8", "fp8pv8"):
        raise ValueError(f"unknown attention quant mode {quant!r}; expected "
                         "None, 'qk8', 'qk8pv8', 'fp8' or 'fp8pv8'")
    if bwd_quant not in (None, "none", "int8"):
        raise ValueError(f"unknown attention bwd_quant mode {bwd_quant!r}; "
                         "expected None or 'int8'")
    if n_real is not None and n_real > q.shape[1]:
        # a caller bookkeeping bug: keys in [N, n_real) would be the
        # kernel's ZERO pads left unmasked, silently absorbing softmax
        # probability mass and diluting the output toward zero vectors
        raise ValueError(
            f"n_real={n_real} exceeds the sequence length {q.shape[1]}")
    tq, tk = _TUNED_FWD_BLOCKS.get(n_pad, (896, 448))
    return _flash_attention_vjp(q, k, v, block_q or tq, block_k or tk,
                                interpret,
                                q.shape[1] if n_real is None else n_real,
                                quant,
                                None if bwd_quant == "none" else bwd_quant)


def _fwd(q, k, v, block_q, block_k, interpret, n_real, quant, bwd_quant):
    out, lse = _flash_fwd_lse(q, k, v, block_q=block_q, block_k=block_k,
                              interpret=interpret, n_real=n_real,
                              quant=quant, bwd_quant=bwd_quant)
    return out, (q, k, v, out, lse)


# Combined full-K backward holds four fp32 (block_q, n_pad) intermediates
# per program plus full bf16 kT/v; past this n_pad the split kernels take
# over with (block_q, block_k)-bounded VMEM.
_FULL_K_BWD_MAX_N_PAD = 4096

# Largest block_q * n_pad whose four fp32 intermediates compile (~26 MB;
# 1792 * 1792 fails). Within the budget, BIGGER q blocks win: measured
# (batch 32 x 12 heads, scripts/attn_tune.py --bwd) pad 896: bq 896 6.89 ms
# vs bq 128 8.18; pad 640: 4.44 vs 5.34; pad 1792: bq 896 19.49 vs
# bq 256 20.08 — fewer program launches and kT/v stay grid-resident.
_BWD_VMEM_ROWS = 896 * 1792


def _pick_bwd_block(n_pad: int) -> int:
    """Largest 128-multiple divisor of n_pad within the VMEM budget."""
    best = 128
    for mult in range(1, n_pad // 128 + 1):
        cand = 128 * mult
        if n_pad % cand == 0 and cand * n_pad <= _BWD_VMEM_ROWS:
            best = cand
    return best


def _bwd(block_q, block_k, interpret, n_real, quant, bwd_quant, res, g):
    q, k, v, o, lse = res
    # Backward q blocks are picked by the VMEM rule above, independent of
    # the forward tuning; the kernel always sees the FULL key range per
    # program: K-blocking measured ~1.8x slower here because the per-block
    # slice-accumulate into the dk/dv output refs costs more than the
    # MXU/VPU overlap buys (the LSE reconstruction already removed the
    # softmax reduction passes). Sequences too long for full-K residency
    # (beyond reference scope, which caps at 1676 tokens) fall back to the
    # VMEM-bounded split kernels.
    n_pad = _round_up(q.shape[1], 128)
    if n_pad > _FULL_K_BWD_MAX_N_PAD:
        # block targets measured at n_pad 4608 (10-iter chained, repeated):
        # (1152, 1152) 7.0 ms vs (256, 256) 9.2 ms (-23%) — big square
        # blocks amortize the streamed-side refetch; 1536^2 regresses
        # (VMEM pressure) and 2304^2 fails to compile.
        # the int8 backward is full-K only; beyond-VMEM sequences (outside
        # every shipped training shape) stay on the bf16 split kernels
        return _flash_bwd_split(q, k, v, o, lse, g,
                                block_q=1152, block_k=1152,
                                interpret=interpret, n_real=n_real)
    if bwd_quant == "int8":
        return _flash_bwd_q8(q, k, v, o, lse, g,
                             block_q=_pick_bwd_block(n_pad),
                             interpret=interpret, n_real=n_real)
    # the shared resolver guarantees this matches the forward's lse shape
    # (bwd_quant was already normalized at the flash_attention boundary)
    nq = _resolve_nq(q.shape[1], n_pad, block_q, n_real, quant, bwd_quant,
                     for_train=True)
    return _flash_bwd(q, k, v, o, lse, g, block_q=_pick_bwd_block(n_pad),
                      block_k=1 << 30, interpret=interpret, n_real=n_real,
                      n_qpad=None if nq == n_pad else nq)


_flash_attention_vjp.defvjp(_fwd, _bwd)


def flash_attention_sharded(q, k, v, mesh, *, block_q: int | None = None,
                            block_k: int | None = None,
                            interpret: bool = False,
                            n_real: int | None = None,
                            quant: str | None = None,
                            bwd_quant: str | None = None):
    """flash_attention under a multi-device mesh via shard_map.

    Attention is embarrassingly parallel over (batch, heads): batch shards
    over the ``data`` axis and heads over ``model``, with no collectives in
    the region. This is how the Pallas kernel runs under pjit — GSPMD
    cannot partition a custom call, but a shard_map region partitions
    manually and composes with the surrounding jitted train step.

    q, k, v: (B, N, H, D). B must divide by mesh['data'] and H by
    mesh['model'].
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    b, _, h, _ = q.shape
    data_ax = "data" if "data" in mesh.axis_names and b % mesh.shape["data"] == 0 else None
    model_ax = "model" if "model" in mesh.axis_names and h % mesh.shape["model"] == 0 else None
    for ax, axis_name, size, what in ((data_ax, "data", b, "batch"),
                                      (model_ax, "model", h, "heads")):
        if (ax is None and axis_name in mesh.axis_names
                and mesh.shape[axis_name] > 1):
            # the un-sharded axis replicates the FULL computation on every
            # device of that mesh axis — correct but up to mesh-size slower
            # plus replicated memory; a misconfigured mesh must not look
            # like a working-but-slow run (same convention as
            # _note_untuned for block fallbacks)
            import logging

            logging.getLogger(__name__).warning(
                "flash_attention_sharded: %s=%d does not divide mesh axis "
                "'%s'=%d — computing replicated on that axis",
                what, size, axis_name, mesh.shape[axis_name],
            )
    spec = P(data_ax, None, model_ax, None)

    fn = shard_map(
        partial(flash_attention, block_q=block_q, block_k=block_k,
                interpret=interpret, n_real=n_real, quant=quant,
                bwd_quant=bwd_quant),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


# Kernel blocks are (sublane, lane)-tiled; the smallest head_dim the MXU
# handles without degenerate tiles. MAEST uses d=64.
_MIN_HEAD_DIM = 64


def use_flash(n: int, d: int) -> bool:
    """Heuristic: pallas on TPU backends for long-enough sequences."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend in ("tpu", "axon") and n >= 256 and d >= _MIN_HEAD_DIM
