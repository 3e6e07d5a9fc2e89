"""Export a training checkpoint as release artifacts.

Bridges the training side (orbax checkpoints written by the Trainer, with
``params`` and live-averaged ``swa_params``) to the packaging side — the
workflow the reference splits across manual scripts
(packaging/safetensors_to_pytorch.py, packaging/push_to_hub.py,
packaging/onnx_to_tf.sh):

    python -m maest_tpu.apps.export_release <run_dir/checkpoints/epoch-N> \
        --format torch|hf|tf [--swa/--no-swa] --out PATH \
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


def load_training_checkpoint(path: str) -> dict:
    """Restore a Trainer orbax checkpoint without its original in-memory
    target (returns plain arrays)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute())


def select_params(state: dict, *, swa: bool) -> dict:
    """Pick SWA or raw params from a restored training state. Falls back
    to raw params when SWA never started (swa_n == 0)."""
    if swa:
        swa_n = int(np.asarray(state.get("swa_n", 0)))
        if swa_n > 0:
            return state["swa_params"]
    return state["params"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="maest-export-release",
                                 description=__doc__.split("\n\n")[0])
    ap.add_argument("checkpoint", help="orbax checkpoint dir (run_dir/checkpoints/<tag>)")
    ap.add_argument("--format", choices=("torch", "hf", "tf"), default="torch")
    ap.add_argument("--out", required=True, help="output file (torch) or dir (hf/tf)")
    ap.add_argument("--arch", default="discogs-maest-30s-pw-129e")
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

    over = {k: v for k, v in (
        ("n_classes", args.n_classes), ("input_t", args.input_t),
        ("embed_dim", args.embed_dim), ("depth", args.depth),
        ("num_heads", args.num_heads),
    ) if v is not None}
    cfg = build_config(args.arch, **over)

    state = load_training_checkpoint(args.checkpoint)
    params = select_params(state, swa=args.swa)

    if args.format == "torch":
        from ..packaging.hf_ast import save_torch_checkpoint

        out = save_torch_checkpoint(params, cfg, args.out,
                                    swa_prefix=args.swa_prefix)
    elif args.format == "hf":
        from ..packaging.hf_ast import save_pretrained

        out = save_pretrained(params, cfg, args.out)
    else:
        from ..packaging.export import export_tf_saved_model

        out = export_tf_saved_model(params, cfg, args.out)
    print(f"exported {args.format} ({'swa' if args.swa else 'raw'}) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
