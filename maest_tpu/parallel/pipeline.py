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
  * Block-internal dropout keys are folded from (global layer index,
    schedule step), so train-mode dropout differs bitwise from the
    sequential forward (identical distribution). With the shipped
    drop_rate = 0 configs the pipelined step is numerically identical to
    the sequential one (tests/test_pipeline_parallel.py asserts it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import MAESTConfig
from ..models.vit import Block, block_kwargs


def make_pipeline_mesh(n_devices: Optional[int] = None,
                       num_stages: int = 2) -> Mesh:
    """Build a (data, pipe) mesh: batch parallelism over ``data``, pipeline
    stages over ``pipe``. Put ``pipe`` innermost so stage-to-stage
    ppermutes ride neighbouring ICI links."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} visible"
        )
    if n_devices % num_stages:
        raise ValueError(
            f"{n_devices} devices not divisible by num_stages={num_stages}"
        )
    grid = np.array(devices[:n_devices]).reshape(
        n_devices // num_stages, num_stages
    )
    return Mesh(grid, axis_names=("data", "pipe"))


def stack_block_params(params, depth: int):
    """Stack the per-block param subtrees (``blocks_0..blocks_{depth-1}``,
    the checkpoint-mappable layout) into one pytree with a leading
    ``(depth, ...)`` axis for sharding over the ``pipe`` axis."""
    blocks = [params[f"blocks_{i}"] for i in range(depth)]
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *blocks)


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
) -> jnp.ndarray:
    """Run the transformer blocks GPipe-pipelined over the mesh.

    ``stacked_params``: per-block params stacked to (depth, ...) leaves
    (``stack_block_params``); sharded over ``pipe``. ``tokens`` is sharded
    over ``data`` on the batch axis. Returns the post-trunk residual
    stream, replicated over ``pipe``.
    """
    n_stages = mesh.shape["pipe"]
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
    block = _trunk_block(cfg, dtype, n_real)
    needs_dropout = train and (cfg.drop_rate > 0.0 or cfg.attn_drop_rate > 0.0)
    if needs_dropout and dropout_key is None:
        raise ValueError(
            "train with drop_rate/attn_drop_rate > 0 requires dropout_key"
        )
    if dropout_key is None:
        dropout_key = jax.random.PRNGKey(0)  # unused

    def apply_block(p, h, key, deterministic):
        rngs = {"dropout": key} if needs_dropout else None
        return block.apply({"params": p}, h, deterministic, rngs=rngs)

    if cfg.remat and train:
        apply_block = jax.checkpoint(apply_block, static_argnums=(3,))

    def stage_program(stacked_local, xs, key):
        # stacked_local: (layers_per_stage, ...) leaves; xs: (b_local, n, e)
        stage = jax.lax.axis_index("pipe")
        xs_mb = xs.reshape(m, -1, *xs.shape[1:])  # (m, mb, n, e)

        t_sched = np.arange(m + n_stages - 1)
        feed = xs_mb[np.minimum(t_sched, m - 1)]  # (T, mb, n, e)

        local_ids = stage * layers_per_stage + jnp.arange(layers_per_stage)

        def run_stage(h, t):
            def layer(h, xs_l):
                p, lid = xs_l
                k = jax.random.fold_in(jax.random.fold_in(key, lid), t)
                return apply_block(p, h, k, not train), None

            h, _ = jax.lax.scan(layer, h, (stacked_local, local_ids))
            return h

        def sched_step(carry, inp):
            inp_t, t = inp
            h = jnp.where(stage == 0, inp_t, carry)
            h = run_stage(h, t)
            nxt = jax.lax.ppermute(
                h, "pipe", [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return nxt, h

        # the carry crosses stages, so it is varying over 'pipe' from step 1
        # on; pcast the zero init to the same vma type
        init = jax.lax.pcast(jnp.zeros_like(xs_mb[0]), ("pipe",),
                             to="varying")
        _, hs = jax.lax.scan(sched_step, init, (feed, jnp.asarray(t_sched)))
        out = hs[n_stages - 1:]  # (m, mb, n, e), valid on the last stage
        out = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
        out = jax.lax.psum(out, "pipe")  # broadcast result to every stage
        return out.reshape(-1, *out.shape[2:])

    spec_params = jax.tree.map(lambda _: P("pipe"), stacked_params)
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
):
    """Full pipelined forward: front (GSPMD over ``data``) → pipelined
    trunk → tail. Returns MAESTNet's ``transformer_block == -1`` output."""
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
    )
    return net.apply({"params": params}, h, train=train, forward_mode="tail")


def make_pipeline_forward(net, mesh: Mesh, *, num_microbatches: int = 4):
    """Jitted pipelined inference forward: fn(params, x) -> (logits, ...)."""

    @jax.jit
    def forward(params, x):
        return pipeline_apply(
            net, params, x, mesh, num_microbatches=num_microbatches,
            train=False,
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
        )

    return make_train_step(
        net, tx, aug, teacher_student=teacher_student, donate=donate,
        apply_fn=apply_fn,
    )
