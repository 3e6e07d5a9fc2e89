"""Export a training checkpoint as release artifacts.

Bridges the training side (orbax checkpoints written by the Trainer, with
``params`` and live-averaged ``swa_params``) to the packaging side — the
workflow the reference splits across manual scripts
(packaging/safetensors_to_pytorch.py, packaging/push_to_hub.py,
packaging/onnx_to_tf.sh):

    python -m maest_tpu.apps.export_release <run_dir/checkpoints/epoch-N> \
        --format torch|hf|tf|onnx [--swa/--no-swa] --out PATH \
        [--arch discogs-maest-30s-pw-129e] [config overrides ...]

Formats:
  torch  MAEST-layout ``.pt`` state dict loadable by the upstream repo
         (``--swa-prefix`` stores ``net_swa.*`` keys like released files)
  hf     HF AST model directory (config.json + model.safetensors +
         preprocessor_config.json)
  tf     TF SavedModel with the Essentia signature
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def load_training_checkpoint(path: str, *, with_opt_state: bool = False
                             ) -> dict:
    """Restore a Trainer orbax checkpoint without its original in-memory
    target (returns plain arrays).

    By default the optimizer state (~2x param bytes of Adam moments that
    ``select_params`` discards anyway) is NOT read from disk: the restore
    target is built from the checkpoint metadata with the ``opt_state``
    subtree omitted entirely, and ``PyTreeRestore(partial_restore=True)``
    skips those array reads.

    The target carries an explicit single-device sharding: checkpoints
    written by a sharded run (FSDP/TP storage) record shardings that do
    not exist in this process, and orbax refuses a sharding-less target
    for them — the release artifact wants plain host arrays either way."""
    import jax
    import orbax.checkpoint as ocp

    p = Path(path).absolute()
    dev_sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(p)
        tree = getattr(meta, "item_metadata", meta)
        tree = dict(getattr(tree, "tree", tree))
        if not with_opt_state:
            tree.pop("opt_state", None)  # omitted subtree is never read
        is_none = lambda x: x is None  # noqa: E731
        # None leaves (empty optax sub-states) have no value metadata;
        # PLACEHOLDER tells partial_restore to skip them outright
        target = jax.tree.map(
            lambda m: ocp.PLACEHOLDER if m is None
            else jax.ShapeDtypeStruct(m.shape, m.dtype,
                                      sharding=dev_sharding),
            tree, is_leaf=is_none,
        )
        # explicit restore_args carry the target shardings — without them
        # orbax falls back to the SAVED shardings, which reference devices
        # that do not exist in a single-chip export process
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        restored = ckptr.restore(
            p, ocp.args.PyTreeRestore(item=target,
                                      restore_args=restore_args,
                                      partial_restore=True)
        )
        return dict(jax.tree.map(
            lambda x: None if x is ocp.PLACEHOLDER else x, restored,
            is_leaf=lambda x: x is ocp.PLACEHOLDER,
        ))


def run_config_for(checkpoint: str) -> dict | None:
    """The training config recorded next to the checkpoints
    (<run_dir>/config.json, written by Trainer.__init__) — the source of
    truth for the model geometry of this run."""
    cfg_path = Path(checkpoint).parent.parent / "config.json"
    if not cfg_path.exists():
        return None
    import json

    return json.loads(cfg_path.read_text())


def select_params(state: dict, *, swa: bool) -> tuple[dict, str]:
    """Pick SWA or raw params from a restored training state; returns
    (params, which) where ``which`` labels what was actually chosen. Falls
    back to raw params when SWA never started (swa_n == 0)."""
    if swa:
        swa_n = int(np.asarray(state.get("swa_n", 0)))
        if swa_n > 0:
            return state["swa_params"], "swa"
        return state["params"], "raw (swa unavailable: swa_n == 0)"
    return state["params"], "raw"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="maest-export-release",
                                 description=__doc__.split("\n\n")[0])
    ap.add_argument("checkpoint", help="orbax checkpoint dir (run_dir/checkpoints/<tag>)")
    ap.add_argument("--format", choices=("torch", "hf", "tf", "onnx"),
                    default="torch")
    ap.add_argument("--out", required=True, help="output file (torch) or dir (hf/tf)")
    ap.add_argument("--arch", default=None,
                    help="defaults to the run's recorded config.json, then "
                         "discogs-maest-30s-pw-129e")
    ap.add_argument("--swa", dest="swa", action="store_true", default=True,
                    help="export the SWA average (default; released "
                         "checkpoints are -swa files)")
    ap.add_argument("--no-swa", dest="swa", action="store_false")
    ap.add_argument("--swa-prefix", action="store_true",
                    help="torch only: store net_swa.* keys")
    # geometry overrides matching get_maest / the training config
    ap.add_argument("--n-classes", type=int, default=None)
    ap.add_argument("--input-t", type=int, default=None)
    ap.add_argument("--embed-dim", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--num-heads", type=int, default=None)
    args = ap.parse_args(argv)

    from ..models.registry import build_config

    # geometry defaults come from the run's own config.json (one dir above
    # the checkpoints) — exporting with mismatched geometry would emit a
    # silently broken artifact (e.g. a 400-label config over a 519-row head)
    run_cfg = run_config_for(args.checkpoint) or {}
    maest_cfg = run_cfg.get("maest", {})
    arch = args.arch or maest_cfg.get("arch") or "discogs-maest-30s-pw-129e"
    over = {}
    for key, cli_val in (
        ("n_classes", args.n_classes), ("input_t", args.input_t),
        ("embed_dim", args.embed_dim), ("depth", args.depth),
        ("num_heads", args.num_heads),
    ):
        val = cli_val if cli_val is not None else maest_cfg.get(key)
        if val is not None:
            over[key] = val
    cfg = build_config(arch, **over)

    state = load_training_checkpoint(args.checkpoint)
    params, which = select_params(state, swa=args.swa)

    if args.format == "torch":
        from ..packaging.hf_ast import save_torch_checkpoint

        out = save_torch_checkpoint(params, cfg, args.out,
                                    swa_prefix=args.swa_prefix)
    elif args.format == "hf":
        from ..packaging.hf_ast import save_pretrained

        out = save_pretrained(params, cfg, args.out)
    elif args.format == "onnx":
        from ..packaging.export import export_onnx

        out = export_onnx(params, cfg, args.out)
    else:
        from ..packaging.export import export_tf_saved_model

        out = export_tf_saved_model(params, cfg, args.out)
    print(f"exported {args.format} ({which}) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
