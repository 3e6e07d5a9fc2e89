"""Pallas flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from maest_tpu.ops.attention import attention_reference, flash_attention


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


def test_flash_matches_reference():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    b, n, h, d = 2, 200, 4, 64  # n not a multiple of 128 -> exercises padding
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_tuned_single_block_dispatch_matches_reference():
    """N=866 (the 30 s train shape) resolves to the tuned single-block
    (896, 896) config; the kernel must stay correct when one program
    covers the whole padded sequence with a padded tail."""
    from maest_tpu.ops.attention import _TUNED_FWD_BLOCKS

    assert _TUNED_FWD_BLOCKS[896] == (896, 896)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    b, n, h, d = 1, 866, 2, 64
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))
    out = flash_attention(q, k, v, interpret=True)  # blocks from the table
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_sublane_q_pad_fwd_bwd_matches_reference():
    """The 10 s shape (N=281 -> q rows padded to 288, keys to 384): the
    sublane-only q-pad kernels (round-5 lever, QPAD_r05.json) must match
    the oracle in both fwd and grads, and the predicate must fire exactly
    where intended."""
    from maest_tpu.ops.attention import _sublane_q_pad

    # fires: plain 10 s-class call, bf16 single block
    assert _sublane_q_pad(281, 384, 281, None, None, True) == 288
    assert _sublane_q_pad(281, 384, None, None, None, False) == 288
    # no-op: pre-padded pad-once stream (n == n_pad)
    assert _sublane_q_pad(896, 896, 866, None, None, True) == 896
    # no-op: quantized forward; int8 backward under train
    assert _sublane_q_pad(281, 384, 281, "qk8", None, True) == 384
    assert _sublane_q_pad(281, 384, 281, None, "int8", True) == 384
    # int8 bwd does NOT block the inference primal (no lse consumer)
    assert _sublane_q_pad(281, 384, 281, None, "int8", False) == 288

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    b, n, h, d = 2, 281, 4, 64
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))
    out = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    g1 = jax.grad(lambda *a: jnp.sum(flash_attention(*a, interpret=True) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(attention_reference(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_split_backward_matches_reference():
    """The larger-than-VMEM backward path (dq / dkv split kernels, VMEM
    bounded by (block_q, block_k)) must produce the same gradients as the
    XLA reference. Exercised directly — the dispatch threshold (n_pad >
    4096) is too large to run in interpret mode."""
    from maest_tpu.ops.attention import _flash_bwd_split, _flash_fwd_lse

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    b, n, h, d = 1, 300, 2, 64  # n not a multiple of 128 -> padded rows/cols
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))
    g = _rand(k4, (b, n, h, d))

    o, lse = _flash_fwd_lse(q, k, v, block_q=128, block_k=128, interpret=True)
    dq, dk, dv = _flash_bwd_split(q, k, v, o, lse, g, block_q=128,
                                  block_k=128, interpret=True)

    _, vjp = jax.vjp(attention_reference, q, k, v)
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=1e-3, atol=1e-4)


def test_flash_grad_matches_reference():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    b, n, h, d = 1, 128, 2, 64
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


def test_grouped_heads_fwd_bwd_matches_reference(monkeypatch):
    """The g-heads-per-program mechanism (shipped ON for pads 384/640/896
    — see the _TUNED_FWD_GROUP measurement note): grouped forward,
    lse emission, and grouped backward must match the XLA reference
    exactly like the ungrouped path. n=281 (pad 384), bh=12, g=12."""
    from maest_tpu.ops import attention as A
    from maest_tpu.ops.attention import _pick_group

    monkeypatch.setattr(A, "_TUNED_FWD_GROUP", {384: 12})
    monkeypatch.setattr(A, "_TUNED_BWD_GROUP", {384: 12})
    assert _pick_group(384, 12, {384: 12}) == 12
    assert _pick_group(384, 10, {384: 12}) == 10  # divisor fallback
    assert _pick_group(256, 12) == 1   # untabulated pad stays ungrouped

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    b, n, h, d = 2, 281, 6, 64
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))

    out = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3,
                                   atol=1e-4)


def test_n_real_padded_inputs_match_reference():
    """Pad-once residual stream: the caller pre-pads the sequence axis and
    passes ``n_real``. Rows/keys >= n_real (deliberately filled with junk
    here) must not influence the real prefix, and must receive zero
    gradient (their upstream cotangent is zero after the model-side
    slicing, and masked keys get no probability mass)."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    b, nr, n, h, d = 2, 119, 128, 2, 64
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))
    junk = 37.0 * _rand(k4, (b, n - nr, h, d))
    q = q.at[:, nr:].set(junk)
    k = k.at[:, nr:].set(junk)
    v = v.at[:, nr:].set(junk)

    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                          n_real=nr)
    ref = attention_reference(q[:, :nr], k[:, :nr], v[:, :nr])
    np.testing.assert_allclose(np.asarray(out[:, :nr]), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, n_real=nr)
        return jnp.sum(o[:, :nr] ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q[:, :nr], k[:, :nr], v[:, :nr])
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a[:, :nr]), np.asarray(r),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a[:, nr:]), 0.0, atol=1e-6)


def test_pad_once_model_matches_xla_path(monkeypatch):
    """End-to-end pad-once: MAESTNet pads the token axis once (ratio gate
    permitting), runs every block at n_pad, and the sliced logits/tap must
    match the unpadded XLA attention path on the same params."""
    import dataclasses
    import functools

    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.ops import attention as A

    # t=13 patch cols -> 9*13+2 = 119 tokens -> pad 128, ratio 1.076 < 1.15
    cfg = MAESTConfig(img_size=(96, 136), embed_dim=64, depth=2, num_heads=4,
                      num_classes=5)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 96, 136, 1)), jnp.float32
    )

    def run(impl_cfg):
        net = MAESTNet(impl_cfg)
        logits, feats = net.apply({"params": params}, x, train=False)
        _, tap = net.apply({"params": params}, x, train=False,
                           transformer_block=1)
        return logits, feats, tap

    ref_logits, ref_feats, ref_tap = run(
        dataclasses.replace(cfg, attention_impl="xla")
    )

    orig_flash = A.flash_attention
    monkeypatch.setattr(A, "use_flash", lambda n, d: True)
    monkeypatch.setattr(
        A, "flash_attention", functools.partial(orig_flash, interpret=True)
    )
    pad_logits, pad_feats, pad_tap = run(cfg)

    np.testing.assert_allclose(np.asarray(pad_logits), np.asarray(ref_logits),
                               rtol=1e-3, atol=1e-4)
    for a, r in zip(pad_feats, ref_feats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pad_tap), np.asarray(ref_tap),
                               rtol=1e-3, atol=1e-4)


def test_sublane_pad_once_model_matches_xla_path(monkeypatch):
    """Round-5 sublane pad-once: a geometry whose lane pad FAILS the
    ratio gate (83 tokens -> 128 is 1.54 > 1.15) pads the stream to
    round_up(n, 8) = 88 instead; logits/taps must match the unpadded XLA
    path (pad rows masked as keys, dropped before heads/taps)."""
    import dataclasses
    import functools

    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.ops import attention as A

    # t=9 patch cols -> 9*9+2 = 83 tokens: lane ratio 128/83 = 1.54
    cfg = MAESTConfig(img_size=(96, 96), embed_dim=64, depth=2, num_heads=4,
                      num_classes=5)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 96, 96, 1)), jnp.float32
    )

    def run(impl_cfg):
        net = MAESTNet(impl_cfg)
        logits, feats = net.apply({"params": params}, x, train=False)
        _, tap = net.apply({"params": params}, x, train=False,
                           transformer_block=1)
        return logits, feats, tap

    ref_logits, ref_feats, ref_tap = run(
        dataclasses.replace(cfg, attention_impl="xla")
    )

    orig_flash = A.flash_attention
    monkeypatch.setattr(A, "use_flash", lambda n, d: True)
    monkeypatch.setattr(
        A, "flash_attention", functools.partial(orig_flash, interpret=True)
    )
    pad_logits, pad_feats, pad_tap = run(cfg)

    np.testing.assert_allclose(np.asarray(pad_logits), np.asarray(ref_logits),
                               rtol=1e-3, atol=1e-4)
    for a, r in zip(pad_feats, ref_feats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pad_tap), np.asarray(ref_tap),
                               rtol=1e-3, atol=1e-4)


def test_int8_quant_matches_reference():
    """qk8 / qk8pv8 forward: int8 MXU arithmetic with exact rescale must
    stay within the quantization-noise band of the fp32 reference (well
    inside the production bf16 band of ~5e-3)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    b, n, h, d = 2, 200, 4, 64  # padding exercised (200 -> 256)
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))
    ref = attention_reference(q, k, v)
    for quant, tol in (("qk8", 6e-4), ("qk8pv8", 2e-3),
                       ("fp8", 3e-3), ("fp8pv8", 2e-2)):
        out = flash_attention(q, k, v, block_q=128, block_k=128,
                              interpret=True, quant=quant)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=tol)


def test_int8_quant_grads_close():
    """The backward stays bf16 (straight-through); with the saved lse
    coming from the quantized forward, gradients must track the reference
    to quantization noise."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(6), 3)
    b, n, h, d = 1, 150, 2, 64
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))

    def f(fn, quant=None):
        if quant:
            return jax.grad(lambda q: fn(q, k, v, interpret=True,
                                         quant=quant).sum())(q)
        return jax.grad(lambda q: fn(q, k, v).sum())(q)

    ref = f(attention_reference)
    for quant in ("qk8", "qk8pv8"):
        g = f(flash_attention, quant)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   rtol=0, atol=5e-4)


def test_quant_rejects_unknown_mode():
    import pytest

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (_rand(k1, (1, 128, 2, 64)), _rand(k2, (1, 128, 2, 64)),
               _rand(k3, (1, 128, 2, 64)))
    with pytest.raises(ValueError, match="quant"):
        flash_attention(q, k, v, interpret=True, quant="int4")


def test_int8_backward_gradients_track_oracle():
    """bwd_quant='int8': all five backward matmuls in int8 with
    exact-factoring scales. Gradients carry quantization noise but must
    track the oracle's direction (cosine) and magnitude closely even in
    the diffuse-attention worst case (random init)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    b, n, h, d = 1, 150, 2, 64  # padding exercised (150 -> 256)
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))

    def grads(fn, **kw):
        def loss(q, k, v):
            return (fn(q, k, v, **kw) * jnp.cos(jnp.arange(d))).sum()
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    ref = grads(attention_reference)
    got = grads(flash_attention, interpret=True, bwd_quant="int8")
    for name, a, b_ in zip(("dq", "dk", "dv"), ref, got):
        a, b_ = np.asarray(a), np.asarray(b_)
        cos = float((a * b_).sum() / (np.linalg.norm(a) * np.linalg.norm(b_)))
        relmax = float(np.abs(b_ - a).max() / np.abs(a).max())
        assert cos > 0.999, (name, cos)
        assert relmax < 0.15, (name, relmax)


def test_int8_backward_forward_unchanged():
    """bwd_quant only affects the backward; the primal must be bit-equal
    to the plain flash forward."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(12), 3)
    b, n, h, d = 1, 140, 2, 64
    q, k, v = _rand(k1, (b, n, h, d)), _rand(k2, (b, n, h, d)), _rand(k3, (b, n, h, d))
    a = flash_attention(q, k, v, interpret=True)
    b_ = flash_attention(q, k, v, interpret=True, bwd_quant="int8")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_bwd_quant_rejects_unknown_mode():
    import pytest

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(13), 3)
    q, k, v = (_rand(k1, (1, 128, 2, 64)), _rand(k2, (1, 128, 2, 64)),
               _rand(k3, (1, 128, 2, 64)))
    with pytest.raises(ValueError, match="bwd_quant"):
        flash_attention(q, k, v, interpret=True, bwd_quant="fp8")
