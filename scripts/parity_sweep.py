"""Weights-arrival parity runbook.

Pointed at a cache of downloaded release checkpoints (the eight discogs
archs, reference: models/maest.py:82-146), this script loads every arch
through the public factory, runs fixed seeded inputs, and writes a JSON
parity report:

- per-arch logit fingerprints (mean/std/top-5 labels) for eyeballing,
- optional comparison against expected logits captured from the reference
  (``--expect expected.npz`` with one ``<arch>`` array per arch, produced
  by running the reference's predict on the same inputs), asserted to the
  BASELINE.md fidelity gate (<1e-3 sigmoid),
- cross-layout consistency when the same weights exist in several layouts
  (Lightning .ckpt / plain .pt / HF-AST safetensors must agree exactly).

Flips from "fingerprints only" to a real pass/fail parity gate the day the
weight files exist in the cache (no egress here). Smoke-tested with
synthetic checkpoints in all three layouts: tests/test_parity_sweep.py.

Usage:
  python scripts/parity_sweep.py --out parity_report.json \
      [--cache-dir ~/.cache/maest_tpu] [--expect expected.npz] \
      [--archs a,b,...] [--tol 1e-3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

DISCOGS_ARCHS = (
    "discogs-maest-5s-pw-129e",
    "discogs-maest-10s-fs-129e",
    "discogs-maest-10s-pw-129e",
    "discogs-maest-10s-dw-75e",
    "discogs-maest-20s-pw-129e",
    "discogs-maest-30s-pw-129e",
    "discogs-maest-30s-pw-73e-ts",
    "discogs-maest-30s-pw-129e-519l",
)

SEED = 20260401


def _candidate_files(cache: Path, arch: str) -> list[Path]:
    """Checkpoint files for an arch, newest layout conventions first."""
    from maest_tpu.models.registry import ARCHS, cached_checkpoint_path

    cands = []
    release = cached_checkpoint_path(ARCHS[arch])
    if release.exists():
        cands.append(release)
    for pat in (f"{arch}*.ckpt", f"{arch}*.pt", f"{arch}*.safetensors"):
        cands.extend(sorted(cache.glob(pat)))
    hf_dir = cache / arch  # HF snapshot dir
    if (hf_dir / "model.safetensors").exists():
        cands.append(hf_dir / "model.safetensors")
    seen, out = set(), []
    for p in cands:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def _forward(arch: str, ckpt: Path, x: np.ndarray, **overrides):
    """Sigmoid activations for a fixed mel batch through one checkpoint."""
    from maest_tpu.api import get_maest
    from maest_tpu.models.registry import ARCHS, cached_checkpoint_path

    if ckpt == cached_checkpoint_path(ARCHS[arch]):
        m = get_maest(arch=arch, pretrained=True, **overrides)
    else:
        m = get_maest(arch=arch, pretrained=False, checkpoint=str(ckpt),
                      **overrides)
    logits, _ = m(x)
    logits = np.asarray(logits, np.float32)
    return 1.0 / (1.0 + np.exp(-logits)), m.labels


def run_sweep(cache: Path, archs, tol: float, expect: dict | None,
              overrides: dict | None = None,
              expect_kind: str = "auto") -> dict:
    from maest_tpu.models.registry import ARCHS

    report = {"cache_dir": str(cache), "seed": SEED, "tol": tol, "archs": {}}
    any_fail = False
    for arch in archs:
        spec = ARCHS[arch]
        ov = dict(overrides or {})
        input_t = ov.pop("input_t", spec.default_input_t)
        files = _candidate_files(cache, arch)
        entry = {"files": [str(f) for f in files]}
        if not files:
            entry["status"] = "missing"
            report["archs"][arch] = entry
            continue

        rng = np.random.default_rng(SEED)
        x = rng.standard_normal((2, spec.input_f, input_t)).astype("f4")

        logits_by_file = {}
        try:
            for f in files:
                sig, labels = _forward(arch, f, x, input_t=input_t, **ov)
                logits_by_file[str(f)] = sig
        except Exception as e:  # keep sweeping the other archs
            entry["status"] = "error"
            entry["error"] = f"{type(e).__name__}: {e}"
            report["archs"][arch] = entry
            any_fail = True
            continue

        first = next(iter(logits_by_file.values()))
        top = np.argsort(-first.mean(axis=0))[:5]
        entry["fingerprint"] = {
            "mean": float(first.mean()),
            "std": float(first.std()),
            "top5": [labels[int(i)] for i in top],
        }

        # cross-layout agreement (same weights, different file formats)
        layout_max = 0.0
        for sig in logits_by_file.values():
            layout_max = max(layout_max, float(np.abs(sig - first).max()))
        entry["cross_layout_max_diff"] = layout_max
        ok = layout_max < 1e-5

        if expect is not None and arch in expect:
            want = np.asarray(expect[arch], np.float32)
            # expected arrays compare in sigmoid space; prefer an explicit
            # --expect-kind (the [0,1]-range heuristic misreads logits that
            # happen to lie in [0,1], e.g. from a near-zero-init head)
            kind = expect_kind
            if kind == "auto":
                kind = ("logits" if want.min() < 0.0 or want.max() > 1.0
                        else "activations")
                entry["expect_kind_inferred"] = kind
            if kind == "logits":
                want = 1.0 / (1.0 + np.exp(-want))
            diff = float(np.abs(first - want).max())
            entry["vs_reference_max_sigmoid_diff"] = diff
            ok = ok and diff < tol
        entry["status"] = "pass" if ok else "FAIL"
        any_fail = any_fail or not ok
        report["archs"][arch] = entry

    n_present = sum(1 for a in report["archs"].values()
                    if a["status"] not in ("missing",))
    report["summary"] = {
        "present": n_present,
        "missing": len(archs) - n_present,
        "ok": not any_fail,
    }
    return report


def main(argv=None) -> int:
    from maest_tpu.models.registry import cache_dir

    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--archs", default=",".join(DISCOGS_ARCHS))
    ap.add_argument("--expect", default=None,
                    help="npz of reference logits/activations, one array per arch")
    ap.add_argument("--expect-kind", choices=("auto", "logits", "activations"),
                    default="auto",
                    help="domain of the --expect arrays (auto infers from "
                         "value range, which misreads all-[0,1] logits)")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--out", default="parity_report.json")
    ap.add_argument("--fetch", action="store_true",
                    help="download missing release checkpoints into the "
                         "cache first (checkpoints/fetch.py; needs egress)")
    args = ap.parse_args(argv)

    cache = Path(args.cache_dir) if args.cache_dir else cache_dir()
    if args.fetch:
        from maest_tpu.checkpoints.fetch import FetchError, fetch_checkpoint
        from maest_tpu.models.registry import ARCHS, cached_checkpoint_path

        for arch in args.archs.split(","):
            dest = cached_checkpoint_path(ARCHS[arch])
            if args.cache_dir:
                dest = cache / dest.name
            try:
                fetch_checkpoint(ARCHS[arch], dest=dest)
            except FetchError as e:
                print(f"{arch}: fetch failed ({e}); will report as missing")
    expect = dict(np.load(args.expect)) if args.expect else None
    report = run_sweep(cache, args.archs.split(","), args.tol, expect,
                       expect_kind=args.expect_kind)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report["summary"]))
    for arch, entry in report["archs"].items():
        print(f"{arch}: {entry['status']}")
    return 0 if report["summary"]["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
