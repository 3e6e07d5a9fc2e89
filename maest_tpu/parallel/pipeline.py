"""Inter-layer (GPipe-style) pipeline parallelism for the MAEST trunk.

Beyond the reference (whose only parallelism is DDP, reference:
ex_maest.py:57): the transformer blocks are split into ``num_stages``
contiguous groups laid out over a ``pipe`` mesh axis; microbatches stream
through the stages with ``jax.lax.ppermute`` moving activations across the
ICI ring. Everything runs inside one ``jax.shard_map`` region, so the
Pallas flash kernel stays usable per-device (GSPMD cannot partition a
``pallas_call``), and autodiff through the schedule gives the standard
GPipe backward for free — the transpose of ``ppermute`` is the reverse
permute, the transpose of the replicated-in parameters is the psum that
implements data-parallel gradient sync over the ``data`` axis.

With ``model_parallel > 1`` the mesh grows a third ``model`` axis and each
stage additionally runs Megatron tensor parallelism (3-D dp x pp x tp):
qkv / fc1 kernels are column-split (attention heads / MLP hidden units per
device), proj / fc2 kernels are row-split, and one ``psum`` over ``model``
per matmul pair restores the full activations — the manual-shard_map twin
of ``parallel.mesh.param_spec``'s GSPMD layout. Inside the region each
shard is a single device, so the block math is written out explicitly
(``_make_tp_block``) mirroring ``models.vit.Block`` term by term.

Design notes:
  * The schedule is the classic GPipe loop: ``T = M + S - 1`` steps; at
    step ``t`` stage 0 injects microbatch ``min(t, M-1)`` while every other
    stage consumes the activation ppermuted from its predecessor. All
    stages run the same program every step (SPMD); the warm-up/drain
    bubble therefore costs ``(S-1)/(M+S-1)`` of the schedule, the usual
    GPipe utilisation. Raise ``num_microbatches`` to amortise it.
  * Per-block parameters are stacked to a ``(depth, ...)`` leading axis
    inside the loss function (the torch-checkpoint-mappable per-block
    layout, checkpoints/convert.py, stays the storage format); the
    transpose of the stack is the split, so gradients flow back into the
    standard layout and the normal optimizer/NaN-guard path applies.
  * Stochastic depth is not supported under pipelining: per-layer
    drop-path rates are static module attributes, and all stages share one
    program. Every shipped MAEST config uses drop_path_rate = 0.
  * Block-internal dropout keys are folded from (data-shard index,
    global layer index, schedule step), so every batch row draws an
    independent mask (as in the sequential/DP step) while train-mode
    dropout differs bitwise from the sequential forward (identical
    distribution). With the shipped
    drop_rate = 0 configs the pipelined step is numerically identical to
    the sequential one (tests/test_pipeline_parallel.py asserts it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import MAESTConfig
from ..models.vit import Block, block_kwargs


def make_pipeline_mesh(n_devices: Optional[int] = None,
                       num_stages: int = 2,
                       model_parallel: int = 1) -> Mesh:
    """Build a (data, pipe, model) mesh: batch parallelism over ``data``,
    pipeline stages over ``pipe``, optional Megatron tensor parallelism
    over ``model`` within each stage (3-D dp x pp x tp). ``model`` is
    innermost so the per-layer TP all-reduces ride neighbouring ICI
    links; ``pipe`` next so stage-to-stage ppermutes stay one hop."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} visible "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
            "virtual CPU mesh)"
        )
    if n_devices % (num_stages * model_parallel):
        raise ValueError(
            f"{n_devices} devices not divisible by num_stages x "
            f"model_parallel = {num_stages} x {model_parallel}"
        )
    grid = np.array(devices[:n_devices]).reshape(
        n_devices // (num_stages * model_parallel), num_stages, model_parallel
    )
    return Mesh(grid, axis_names=("data", "pipe", "model"))


def stack_block_params(params, depth: int):
    """Stack the per-block param subtrees (``blocks_0..blocks_{depth-1}``,
    the checkpoint-mappable layout) into one pytree with a leading
    ``(depth, ...)`` axis for sharding over the ``pipe`` axis."""
    blocks = [params[f"blocks_{i}"] for i in range(depth)]
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *blocks)


def _tp_layout(stacked, cfg: MAESTConfig):
    """Reshape the stacked block params for head-sharded Megatron TP and
    return matching shard_map PartitionSpecs.

    The qkv kernel's output axis is ordered (3, heads, head_dim) (see
    models.vit.Attention's reshape), so splitting heads over ``model`` is
    NOT a contiguous slice of the last dim — expose the (3, H, d) structure
    as real axes first, then shard the head axis. proj's input axis gets
    the same treatment. fc1/fc2 split cleanly on the hidden dim.
    """
    import flax

    e, h = cfg.embed_dim, cfg.num_heads
    hd = e // h
    flat = flax.traverse_util.flatten_dict(stacked)
    out, specs = {}, {}
    for path, leaf in flat.items():
        name = "/".join(str(k) for k in path)
        d = leaf.shape[0]
        if name == "attn/qkv/kernel":
            leaf = leaf.reshape(d, e, 3, h, hd)
            spec = P("pipe", None, None, "model", None)
        elif name == "attn/qkv/bias":
            leaf = leaf.reshape(d, 3, h, hd)
            spec = P("pipe", None, "model", None)
        elif name == "attn/proj/kernel":
            leaf = leaf.reshape(d, h, hd, e)
            spec = P("pipe", "model", None, None)
        elif name == "mlp/fc1/kernel":
            spec = P("pipe", None, "model")
        elif name == "mlp/fc1/bias":
            spec = P("pipe", "model")
        elif name == "mlp/fc2/kernel":
            spec = P("pipe", "model", None)
        else:
            # norms, proj/fc2 biases: replicated over model (fc2/proj bias
            # is added once, after the psum)
            spec = P("pipe")
        out[path] = leaf
        specs[path] = spec
    return (flax.traverse_util.unflatten_dict(out),
            flax.traverse_util.unflatten_dict(specs))


def _fsdp_specs(stacked, specs, d_shards: int):
    """Augment the trunk's shard_map param specs with ZeRO-3 ``data``-axis
    sharding and return the matching all-gather dims.

    For each stacked leaf, the largest dim that is not already sharded
    (dim 0 carries ``pipe``; TP leaves carry ``model``) and is divisible by
    the data-axis size gets ``data`` added — the weights then enter the
    shard_map region sharded and are all-gathered at stage entry. The
    transpose of that gather is a reduce-scatter, so each gradient leaves
    the region DP-reduced and sharded, and the optimizer update keeps
    params + Adam moments at 1/DP footprint (the point of ZeRO-3).
    Returns (specs, dims) where dims maps each leaf to its gather axis
    (-1 = no shardable dim, leaf stays replicated over ``data``).

    Known FSDP x PP x TP limitation: the at-rest trainer layout
    (mesh.param_spec, tensor_parallel=False) shards each FLAT leaf's
    largest dim (e.g. qkv's 3E), while this spec picks the largest free
    dim of the TP-RESHAPED leaf (e.g. qkv's E after _tp_layout's
    (E, 3, h, hd)); when those are different physical bytes XLA inserts a
    reshard at region entry on top of the stage all-gather. A contiguous
    3E data-split does not map to any single reshaped dim, so aligning
    them would need the at-rest spec to know the pipeline reshape;
    unmeasurable on this 1-chip host — revisit with multi-chip profiling
    (tp=1 FSDP x PP layouts match and are unaffected).
    """
    import flax

    flat_p = flax.traverse_util.flatten_dict(stacked)
    flat_s = flax.traverse_util.flatten_dict(specs)
    out_specs, out_dims = {}, {}
    for path, leaf in flat_p.items():
        spec = list(flat_s[path])
        spec += [None] * (len(leaf.shape) - len(spec))
        free = [d for d in range(1, len(leaf.shape))
                if spec[d] is None and leaf.shape[d] % d_shards == 0]
        if free:
            d = max(free, key=lambda i: leaf.shape[i])
            spec[d] = "data"
            out_dims[path] = d
        else:
            out_dims[path] = -1
        out_specs[path] = P(*spec)
    return (flax.traverse_util.unflatten_dict(out_specs),
            flax.traverse_util.unflatten_dict(out_dims))


def _make_tp_block(cfg: MAESTConfig, dtype, n_real: Optional[int]):
    """Manual Megatron-TP transformer block for the 3-axis shard_map region.

    Mirrors ``models.vit.Block`` term by term (reference math:
    models/maest.py:346-420) on head/hidden-sharded params: the attention
    runs on the device's local heads, the MLP on its local hidden slice,
    and one ``psum`` over ``model`` after each row-parallel matmul (proj,
    fc2) restores the full activation before the replicated bias is added.
    The residual stream stays replicated over ``model`` throughout, so the
    result is numerically the sequential block up to fp32 partial-sum
    reassociation.
    """
    from ..models.vit import _layer_norm, _tier_precision
    from ..ops.attention import flash_attention, use_flash

    prec = _tier_precision(dtype)
    head_dim = cfg.embed_dim // cfg.num_heads
    scale = head_dim**-0.5
    gelu_mode = cfg.gelu_approx
    if gelu_mode == "auto":
        gelu_mode = "tanh" if dtype == jnp.bfloat16 else "exact"
    import flax.linen as nn

    ln = _layer_norm(epsilon=cfg.layer_norm_eps, dtype=dtype, name=None)

    def dropout(x, rate, key, deterministic):
        # nn.Dropout semantics: full-shape bernoulli mask, 1/keep scaling
        if deterministic or rate == 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    def apply(p, h, key, deterministic):
        n = h.shape[1]
        nr = n if n_real is None else n_real
        # keys acting on model-SHARDED values (attention matrix, MLP
        # hidden) fold in the device's model index so shards draw
        # independent masks; keys acting on the post-psum REPLICATED
        # values must stay identical across model devices or the
        # residual stream would diverge.
        local_key = None
        if not deterministic and (cfg.drop_rate > 0.0
                                  or cfg.attn_drop_rate > 0.0):
            local_key = jax.random.fold_in(key, jax.lax.axis_index("model"))

        y = ln.apply({"params": p["norm1"]}, h)
        wq = p["attn"]["qkv"]["kernel"].astype(dtype)  # (E, 3, Hloc, d)
        qkv = jnp.einsum("bne,eshd->bnshd", y, wq, precision=prec)
        if "bias" in p["attn"]["qkv"]:
            qkv = qkv + p["attn"]["qkv"]["bias"].astype(dtype)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, hloc, d)

        needs_drop = cfg.attn_drop_rate > 0.0 and not deterministic
        impl = cfg.attention_impl
        if impl == "auto":
            impl = ("flash" if use_flash(n, head_dim) and not needs_drop
                    else "xla")
        elif impl == "flash" and needs_drop:
            # mirror models.vit.Attention: silently skipping the attention
            # dropout would train a different model than the sequential path
            raise ValueError(
                "attention_impl='flash' cannot apply attn_drop_rate > 0 "
                "in train mode; use 'auto' or 'xla'"
            )
        if impl == "flash":
            quant = (None if cfg.attention_quant in ("none", None)
                     else cfg.attention_quant)
            bwd_quant = (None if cfg.attention_bwd_quant in ("none", None)
                         else cfg.attention_bwd_quant)
            out = flash_attention(q, k, v, n_real=nr, quant=quant,
                                  bwd_quant=bwd_quant)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32,
                              precision=prec)
            attn = attn * scale
            if nr < n:
                pos = jnp.arange(n)
                attn = jnp.where(pos[None, None, None, :] < nr, attn, -1e30)
            attn = jax.nn.softmax(attn, axis=-1)
            if needs_drop:
                attn = dropout(attn, cfg.attn_drop_rate,
                               jax.random.fold_in(local_key, 0),
                               deterministic)
            attn = attn.astype(dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, precision=prec)

        # mirror models.vit.Attention: remat_policy="attn_out" saves this
        # tensor — without the tag the policy would silently degrade to
        # full recompute on the TP pipeline path
        out = _checkpoint_name(out, "attn_out")
        o = jnp.einsum("bnhd,hde->bne", out,
                       p["attn"]["proj"]["kernel"].astype(dtype),
                       precision=prec)
        o = jax.lax.psum(o, "model") + p["attn"]["proj"]["bias"].astype(dtype)
        o = dropout(o, cfg.drop_rate, jax.random.fold_in(key, 1),
                    deterministic)
        h = h + o

        y = ln.apply({"params": p["norm2"]}, h)
        a = jnp.einsum("bne,ef->bnf", y,
                       p["mlp"]["fc1"]["kernel"].astype(dtype),
                       precision=prec) + p["mlp"]["fc1"]["bias"].astype(dtype)
        a = nn.gelu(a, approximate=gelu_mode == "tanh")
        if cfg.drop_rate > 0.0 and not deterministic:
            a = dropout(a, cfg.drop_rate, jax.random.fold_in(local_key, 2),
                        deterministic)
        o = jnp.einsum("bnf,fe->bne", a,
                       p["mlp"]["fc2"]["kernel"].astype(dtype),
                       precision=prec)
        o = jax.lax.psum(o, "model") + p["mlp"]["fc2"]["bias"].astype(dtype)
        o = dropout(o, cfg.drop_rate, jax.random.fold_in(key, 3),
                    deterministic)
        return h + o

    return apply


def _trunk_block(cfg: MAESTConfig, dtype, n_real: Optional[int]) -> Block:
    """The per-layer module the pipeline applies — identical math to the
    blocks MAESTNet builds (``block_kwargs`` is the shared source of truth;
    mesh=None: inside shard_map each shard is a single device, so the
    Pallas kernel is called directly, and SP never composes with PP)."""
    return Block(**block_kwargs(cfg, dtype, mesh=None,
                                sequence_parallel=False, n_real=n_real))


def pipeline_trunk(
    cfg: MAESTConfig,
    mesh: Mesh,
    stacked_params,
    tokens: jnp.ndarray,  # (B, n_res, E) from MAESTNet forward_mode="front"
    *,
    num_microbatches: int,
    n_real: Optional[int] = None,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    dtype=jnp.float32,
    fsdp: bool = False,
) -> jnp.ndarray:
    """Run the transformer blocks GPipe-pipelined over the mesh.

    ``stacked_params``: per-block params stacked to (depth, ...) leaves
    (``stack_block_params``); sharded over ``pipe``. ``tokens`` is sharded
    over ``data`` on the batch axis. Returns the post-trunk residual
    stream, replicated over ``pipe``.

    ``fsdp=True`` (ZeRO-3 x GPipe): block weights additionally enter the
    shard_map region sharded over ``data`` (``_fsdp_specs``) and are
    all-gathered once at stage entry; gradients reduce-scatter back, so
    stored params + Adam moments stay at 1/DP footprint while the stage
    compute sees full weights. Peak VMEM/HBM during the step includes the
    gathered stage weights (depth/n_stages of the model), as with any
    gather-at-use ZeRO-3.
    """
    n_stages = mesh.shape["pipe"]
    tp = dict(mesh.shape).get("model", 1)
    depth = cfg.depth
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    if train and cfg.drop_path_rate > 0.0:
        raise NotImplementedError(
            "stochastic depth (drop_path_rate > 0) is not supported under "
            "pipeline parallelism; all shipped MAEST configs use 0"
        )
    layers_per_stage = depth // n_stages
    m = num_microbatches
    b = tokens.shape[0]
    d_shards = mesh.shape["data"]
    if b % (d_shards * m):
        raise ValueError(
            f"batch {b} not divisible by data shards x microbatches "
            f"= {d_shards} x {m}"
        )
    needs_dropout = train and (cfg.drop_rate > 0.0 or cfg.attn_drop_rate > 0.0)
    if needs_dropout and dropout_key is None:
        raise ValueError(
            "train with drop_rate/attn_drop_rate > 0 requires dropout_key"
        )
    if dropout_key is None:
        dropout_key = jax.random.PRNGKey(0)  # unused

    if tp > 1:
        if cfg.num_heads % tp:
            raise ValueError(
                f"num_heads {cfg.num_heads} not divisible by model={tp}"
            )
        if int(cfg.embed_dim * cfg.mlp_ratio) % tp:
            raise ValueError(
                f"MLP hidden dim {int(cfg.embed_dim * cfg.mlp_ratio)} "
                f"not divisible by model={tp}"
            )
        stacked_params, spec_params = _tp_layout(stacked_params, cfg)
        apply_block = _make_tp_block(cfg, dtype, n_real)
    else:
        block = _trunk_block(cfg, dtype, n_real)
        spec_params = jax.tree.map(lambda _: P("pipe"), stacked_params)

        def apply_block(p, h, key, deterministic):
            rngs = {"dropout": key} if needs_dropout else None
            return block.apply({"params": p}, h, deterministic, rngs=rngs)

    if cfg.remat and train:
        from ..models.vit import remat_policy

        apply_block = jax.checkpoint(apply_block, static_argnums=(3,),
                                     policy=remat_policy(cfg.remat_policy))

    gather_dims = None
    if fsdp and d_shards > 1:
        spec_params, gather_dims = _fsdp_specs(
            stacked_params, spec_params, d_shards
        )

    def stage_program(stacked_local, xs, key):
        # stacked_local: (layers_per_stage, ...) leaves; xs: (b_local, n, e)
        stage = jax.lax.axis_index("pipe")
        if gather_dims is not None:
            # ZeRO-3: weights arrive data-sharded; gather the stage's full
            # weights once (transpose = reduce-scatter of the gradients)
            stacked_local = jax.tree.map(
                lambda x, d: x if d < 0 else jax.lax.all_gather(
                    x, "data", axis=d, tiled=True),
                stacked_local, gather_dims,
            )
        # the key arrives replicated (in_spec P()); fold in the data-shard
        # index so each shard's local rows draw independent dropout masks
        # (without this, row i of every data shard gets the same mask)
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        xs_mb = xs.reshape(m, -1, *xs.shape[1:])  # (m, mb, n, e)

        t_sched = np.arange(m + n_stages - 1)

        local_ids = stage * layers_per_stage + jnp.arange(layers_per_stage)

        def run_stage(h, t):
            def layer(h, xs_l):
                p, lid = xs_l
                k = jax.random.fold_in(jax.random.fold_in(key, lid), t)
                return apply_block(p, h, k, not train), None

            h, _ = jax.lax.scan(layer, h, (stacked_local, local_ids))
            return h

        def sched_step(carry, t):
            h_prev, acc = carry
            # index the microbatch inside the scan (steps t >= m feed the
            # last microbatch; stage 0 ignores it then) — materializing a
            # (T, mb, n, e) feed up front duplicated S-1 full microbatch
            # buffers per step purely for those discarded drain steps
            inp_t = jax.lax.dynamic_index_in_dim(
                xs_mb, jnp.minimum(t, m - 1), keepdims=False)
            h = jnp.where(stage == 0, inp_t, h_prev)
            h = run_stage(h, t)
            nxt = jax.lax.ppermute(
                h, "pipe", [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            # accumulate only the m REAL outputs into an (m, ...) carry
            # instead of stacking all m+S-1 scan steps (the warm-up steps'
            # outputs are dead on every stage; stacking them held S-1 extra
            # microbatch buffers live through fwd AND as bwd residuals).
            # Steps t < S-1 clamp to slot 0, which the genuine t = S-1
            # write then overwrites — overwritten writes get zero
            # cotangent, preserving the drain-step gradient isolation.
            idx = jnp.maximum(t - (n_stages - 1), 0)
            acc = jax.lax.dynamic_update_index_in_dim(acc, h, idx, 0)
            return (nxt, acc), None

        # the carry crosses stages, so it is varying over 'pipe' from step 1
        # on; pcast the zero inits to the same vma type
        init = jax.lax.pcast(jnp.zeros_like(xs_mb[0]), ("pipe",),
                             to="varying")
        # fresh zeros are unvarying on BOTH manual axes; h (the update) is
        # data-varying (from the data-sharded input) and pipe-varying
        acc0 = jax.lax.pcast(jnp.zeros((m,) + xs_mb.shape[1:], xs_mb.dtype),
                             ("pipe", "data"), to="varying")
        (_, out), _ = jax.lax.scan(sched_step, (init, acc0),
                                   jnp.asarray(t_sched))
        # (m, mb, n, e), valid on the last stage
        out = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
        out = jax.lax.psum(out, "pipe")  # broadcast result to every stage
        return out.reshape(-1, *out.shape[2:])

    fn = jax.shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(spec_params, P("data"), P()),
        out_specs=P("data"),
    )
    return fn(stacked_params, tokens, dropout_key)


def pipeline_apply(
    net,
    params,
    x: jnp.ndarray,  # (B, F, T, C) NHWC spectrogram
    mesh: Mesh,
    *,
    num_microbatches: int = 4,
    train: bool = False,
    rngs=None,
    fsdp: bool = False,
):
    """Full pipelined forward: front (GSPMD over ``data``) → pipelined
    trunk → tail. Returns MAESTNet's ``transformer_block == -1`` output.
    ``fsdp`` declares that block params are stored ZeRO-3-sharded over
    ``data`` (front/tail params are handled by GSPMD either way)."""
    tokens, n_tokens = net.apply(
        {"params": params}, x, train=train, forward_mode="front",
        rngs=rngs,
    )
    n_real = None if tokens.shape[1] == n_tokens else n_tokens
    stacked = stack_block_params(params, net.cfg.depth)
    h = pipeline_trunk(
        net.cfg, mesh, stacked, tokens,
        num_microbatches=num_microbatches, n_real=n_real, train=train,
        dropout_key=(rngs or {}).get("dropout"), dtype=net.dtype,
        fsdp=fsdp,
    )
    return net.apply({"params": params}, h, train=train, forward_mode="tail")


def make_pipeline_forward(net, mesh: Mesh, *, num_microbatches: int = 4,
                          fsdp: bool = False):
    """Jitted pipelined inference forward: fn(params, x) -> (logits, ...)."""

    @jax.jit
    def forward(params, x):
        return pipeline_apply(
            net, params, x, mesh, num_microbatches=num_microbatches,
            train=False, fsdp=fsdp,
        )

    return forward


def make_pipeline_train_step(
    net,
    tx,
    aug=None,
    *,
    mesh: Mesh,
    num_microbatches: int = 4,
    teacher_student: bool = False,
    donate: bool = True,
    fsdp: bool = False,
):
    """Pipeline-parallel twin of ``train.steps.make_train_step``: the same
    step body (augmentation, mixup, loss, optimizer, NaN guard) via its
    ``apply_fn`` hook, with the trunk GPipe-pipelined over the mesh's
    ``pipe`` axis while the batch is data-parallel over ``data``. With the
    shipped drop_rate = 0 configs the loss is numerically identical to the
    sequential step."""
    from ..train.steps import AugmentConfig, make_train_step

    aug = aug if aug is not None else AugmentConfig()
    cfg = net.cfg
    if cfg.depth % mesh.shape["pipe"]:
        raise ValueError(
            f"depth {cfg.depth} not divisible by pipe={mesh.shape['pipe']}"
        )
    if cfg.sequence_parallel:
        raise ValueError("sequence_parallel composes with TP, not PP")

    def apply_fn(params, x, rngs):
        return pipeline_apply(
            net, params, x, mesh,
            num_microbatches=num_microbatches, train=True, rngs=rngs,
            fsdp=fsdp,
        )

    return make_train_step(
        net, tx, aug, teacher_student=teacher_student, donate=donate,
        apply_fn=apply_fn,
    )
