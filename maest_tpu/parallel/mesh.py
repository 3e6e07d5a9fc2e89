"""Device mesh + sharding rules.

The reference's only parallelism is DDP over NCCL (reference: ex_maest.py:57,
ex_maest519.sh:3-9). The TPU-native equivalent is a ``jax.sharding.Mesh``
with a ``data`` axis (gradient psum inserted by XLA) plus an optional
``model`` axis for Megatron-style tensor parallelism of the transformer
matmuls — useful when scaling batch-1 latency or very long inputs across a
pod slice. Collectives ride ICI; nothing here is hand-written.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host runtime init (the reference's NCCL env-var dance,
    ex_maest519.sh:3-9, becomes one jax.distributed call).

    No-ops on a single host. On TPU pods the arguments are inferred from the
    environment; on other platforms pass them explicitly (or set
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``).
    Returns the process index.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    # the guard must see the ENV configuration too: JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID set with the coordinator address forgotten would
    # otherwise silently skip initialize() and let every host train as an
    # independent single-process run — the exact failure this exists for
    wants_multiproc = (
        num_processes is not None or process_id is not None
        or os.environ.get("JAX_NUM_PROCESSES")
        or os.environ.get("JAX_PROCESS_ID")
    )
    if coordinator_address is None and wants_multiproc \
            and not os.environ.get("TPU_WORKER_HOSTNAMES"):
        raise ValueError(
            "init_distributed(num_processes/process_id — as arguments or "
            "JAX_NUM_PROCESSES/JAX_PROCESS_ID env vars) requires a "
            "coordinator_address (or JAX_COORDINATOR_ADDRESS)"
        )
    if coordinator_address or os.environ.get("TPU_WORKER_HOSTNAMES"):
        kw = {}
        if coordinator_address:
            kw["coordinator_address"] = coordinator_address
        if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
            kw["num_processes"] = int(
                num_processes or os.environ["JAX_NUM_PROCESSES"]
            )
        if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
            kw["process_id"] = int(
                process_id if process_id is not None
                else os.environ["JAX_PROCESS_ID"]
            )
        jax.distributed.initialize(**kw)
    return jax.process_index()


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} visible "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
            "virtual CPU mesh)"
        )
    if n_devices % model_parallel:
        raise ValueError(f"{n_devices} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path: tuple, shape: tuple, *, fsdp_shards: int = 1,
               tensor_parallel: bool = True) -> P:
    """Partition specs for MAEST params.

    Megatron-style TP over the ``model`` axis: qkv / fc1 kernels split the
    output dim; proj / fc2 kernels split the input dim, so each block needs
    one reduce-scatter-equivalent collective pair which XLA inserts
    automatically.

    Known GSPMD-path limitation: the fused qkv kernel's output dim (3E,
    torch-mappable layout) is split CONTIGUOUSLY, which is not the
    (3, heads, head_dim) factorization attention consumes — with model=2
    a device holds [all of q | half of k], so GSPMD inserts a reshard
    around the head-sharded attention region instead of the single psum
    pair (loss parity is unaffected and tested). The head-ALIGNED splits
    live in the manual paths: ``ops.attention.flash_attention_sharded``
    (shard_map) and the pipeline TP block's ``_tp_layout``, which
    reshapes to (E, 3, h, d) inside the region — see
    parallel/pipeline.py:102 for the same trap documented there. Fixing
    the GSPMD spec would require a (E, 3, h, d) at-rest layout, breaking
    the torch-checkpoint-mappable convention for a gain that cannot be
    measured on this 1-chip host; revisit with multi-chip profiling.

    ``fsdp_shards > 1`` additionally shards each param over the ``data``
    axis (ZeRO-3-style fully-sharded data parallelism — beyond the
    reference, whose DDP replicates the full model per rank,
    ex_maest.py:57): the largest dim not already taken by TP and divisible
    by the data-axis size gets ``data`` added to its spec. XLA then
    all-gathers each weight just-in-time at its use site and
    reduce-scatters its gradient, and the optimizer state stays sharded —
    params + Adam moments cost 1/DP of the replicated footprint.
    """
    keys = tuple(str(k) for k in path)
    name = "/".join(keys)
    spec = [None] * len(shape)
    if len(shape) >= 2 and tensor_parallel:
        if "attn" in name and "qkv" in name and name.endswith("kernel"):
            spec[1] = "model"
        elif "attn" in name and "proj" in name and name.endswith("kernel"):
            spec[0] = "model"
        elif "mlp" in name and "fc1" in name and name.endswith("kernel"):
            spec[1] = "model"
        elif "mlp" in name and "fc2" in name and name.endswith("kernel"):
            spec[0] = "model"
    if fsdp_shards > 1:
        free = [d for d in range(len(shape))
                if spec[d] is None and shape[d] % fsdp_shards == 0]
        if free:
            spec[max(free, key=lambda d: shape[d])] = "data"
    return P(*spec)


def shard_params(params, mesh: Mesh, *, fsdp: bool = False,
                 tensor_parallel: bool = True):
    """Place a param pytree on the mesh with model-parallel (and, with
    ``fsdp=True``, ZeRO-3 data-axis) specs. ``tensor_parallel=False``
    skips the Megatron ``model``-axis specs — used by the pipeline path,
    where TP sharding happens inside the trunk's shard_map region and the
    at-rest layout only carries the ZeRO data-axis shards."""
    import flax

    fsdp_shards = mesh.shape["data"] if fsdp else 1
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = param_spec(path, np.shape(leaf), fsdp_shards=fsdp_shards,
                          tensor_parallel=tensor_parallel)
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return flax.traverse_util.unflatten_dict(out)


def ensure_on_mesh(tree, mesh: Mesh):
    """Replicate any leaf that is not already laid out on this mesh
    (freshly-created scalars/optimizer counters default to one device)."""
    devset = set(mesh.devices.flat)
    rep = NamedSharding(mesh, P())

    def fix(x):
        if isinstance(x, jax.Array) and set(x.sharding.device_set) == devset:
            return x
        return jax.device_put(x, rep)

    return jax.tree.map(fix, tree)


def param_shardings(params, mesh: Mesh, *, fsdp: bool = False,
                    tensor_parallel: bool = True):
    """Matching pytree of NamedShardings (for jit in/out shardings).

    Pass the SAME flags as the ``shard_params`` call that placed the
    params — mixed flags silently reshard every step."""
    import flax

    fsdp_shards = mesh.shape["data"] if fsdp else 1
    flat = flax.traverse_util.flatten_dict(params)
    out = {
        path: NamedSharding(
            mesh, param_spec(path, np.shape(leaf), fsdp_shards=fsdp_shards,
                             tensor_parallel=tensor_parallel)
        )
        for path, leaf in flat.items()
    }
    return flax.traverse_util.unflatten_dict(out)
