"""Tag audio files from the command line.

The reference exposes tagging only through the Python API
(reference: README.md usage, models/maest.py:935-939); this CLI wraps the
same ``get_maest`` -> ``predict_labels`` stack so a shell user can go from
an audio file to ranked style labels (or an embeddings ``.npy``) in one
command:

    python -m maest_tpu.apps.tag song.wav [song2.wav ...] \
        [--arch discogs-maest-30s-pw-129e] [--top-k 10] [--json] \
        [--checkpoint ckpt.pt] [--embeddings-dir out/ --block 7]

Accepts ``.wav`` / ``.npy`` waveforms (16 kHz mono after the built-in
resample); other formats decode through ffmpeg when available.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="maest-tag", description="MAEST music tagging (TPU-native)")
    ap.add_argument("audio", nargs="+", help=".wav/.npy (ffmpeg for others)")
    ap.add_argument("--arch", default="discogs-maest-30s-pw-129e")
    ap.add_argument("--checkpoint", default=None,
                    help="local .ckpt/.pt/safetensors (else cached release)")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--json", action="store_true",
                    help="one JSON object per file on stdout")
    ap.add_argument("--embeddings-dir", default=None,
                    help="write <name>.embeddings.npy instead of tagging")
    ap.add_argument("--block", type=int, default=7,
                    help="transformer block for --embeddings-dir taps")
    ap.add_argument("--random-weights", action="store_true",
                    help="skip weight loading (smoke tests)")
    ap.add_argument("--devices", type=int, default=1,
                    help="spread inference over N chips (data-parallel)")
    # dev/test overrides (tiny models compile fast on CPU)
    ap.add_argument("--embed-dim", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--depth", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--num-heads", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--input-t", type=int, default=None, help=argparse.SUPPRESS)
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..api import get_maest
    from .extract_mel import load_audio

    extra = {k: v for k, v in (
        ("embed_dim", args.embed_dim), ("depth", args.depth),
        ("num_heads", args.num_heads), ("input_t", args.input_t),
    ) if v is not None}
    if args.devices > 1:
        from ..parallel.mesh import make_mesh

        extra["mesh"] = make_mesh(args.devices)
    model = get_maest(
        arch=args.arch,
        pretrained=not (args.random_weights or args.checkpoint),
        checkpoint=args.checkpoint,
        **extra,
    )

    emb_dir = Path(args.embeddings_dir) if args.embeddings_dir else None
    if emb_dir:
        emb_dir.mkdir(parents=True, exist_ok=True)
    used_names: dict[str, int] = {}

    for path in args.audio:
        wave = load_audio(Path(path))
        if emb_dir is not None:
            # block tap returns (None, embeddings)
            emb = np.asarray(model(wave, transformer_block=args.block)[1])
            # same-basename inputs from different dirs must not overwrite
            stem = Path(path).stem
            n_seen = used_names.get(stem, 0)
            used_names[stem] = n_seen + 1
            if n_seen:
                stem = f"{stem}.{n_seen}"
            out = emb_dir / (stem + ".embeddings.npy")
            np.save(out, emb)
            print(f"{path}: {emb.shape} -> {out}")
            continue
        activations, labels = model.predict_labels(wave)
        order = np.argsort(activations)[::-1][: args.top_k]
        if args.json:
            print(json.dumps({
                "file": path,
                "tags": {labels[i]: round(float(activations[i]), 4)
                         for i in order},
            }))
        else:
            print(path)
            for i in order:
                print(f"  {activations[i]:.3f}  {labels[i]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
