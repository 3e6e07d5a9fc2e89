"""Discogs-scale dress rehearsal of the data/training path (VERDICT r4 #1).

The reference's real recipe is 130 epochs x 200,000 weighted draws over a
corpus of ~2M `.mmap` files (reference: discogs/datamodule.py:69,154-181,
ex_maest519.sh); no test in this repo had ever exercised the sampler,
loader, or trainer at that N. This script builds a reference-scale
synthetic corpus (a small pool of physical files fanned out to N
groundtruth entries via hardlinks, so disk stays bounded) and measures
each stage with the TPU relay OUT of the loop:

  --stage build     corpus + groundtruth pickle creation (timed)
  --stage weights   class_balanced_weights dense vs streaming (time +
                    peak RSS, each in its own subprocess) + a full
                    weighted_epoch_indices draw of 200k from N
  --stage loader    one full 200k-draw epoch through BatchLoader + native
                    pread, loader-only specs/s (gate: >189 with headroom)
  --stage all       build + weights + loader
  --stage train     (TPU) ~300 real ViT-B 30s train steps fed by this
                    corpus through the production CLI path

Each stage appends its record to --out (default SCALE_r05.json at the
repo root). Results & analysis land in docs/DESIGN.md.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import resource
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CLASSES = 400
POOL_FILES = 256
N_BANDS = 96
EPOCH_LEN = 200_000  # reference: discogs/datamodule.py:69
BATCH = 32           # the 30 s recipe's per-host batch


def _maxrss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _append(out: Path, record: dict) -> None:
    data = json.loads(out.read_text()) if out.exists() else {}
    data.update(record)
    out.write_text(json.dumps(data, indent=2))
    print(json.dumps(record))


def stage_build(root: Path, n: int, out: Path) -> None:
    """Pool of physical files + N hardlinks + groundtruth pickle.

    File lengths are uniform in [2000, 18750] frames (~32-300 s at hop
    256, the reference's 300 s trim cap, datasets/discogs/preprocess);
    labels: 1-5 positives per sample over a zipf-skewed class histogram,
    stressing the class-balancing weight build the way a real tag
    distribution does."""
    t0 = time.time()
    rng = np.random.default_rng(0)
    pool_dir = root / "pool"
    pool_dir.mkdir(parents=True, exist_ok=True)
    pool = []
    for i in range(POOL_FILES):
        frames = int(rng.integers(2000, 18751))
        p = pool_dir / f"pool{i:03d}.mmap"
        if not p.exists():
            (rng.standard_normal((frames, N_BANDS)) * 0.5).astype(
                "float16").tofile(p)
        pool.append(p)
    t_pool = time.time() - t0

    # zipf-ish class popularity (heavy head, long tail)
    class_p = 1.0 / np.arange(1, N_CLASSES + 1) ** 1.1
    class_p /= class_p.sum()

    t0 = time.time()
    gt = {}
    per_dir = 1000
    linked = 0
    for d in range(-(-n // per_dir)):
        sub = root / f"d{d:05d}"
        sub.mkdir(exist_ok=True)
        for j in range(per_dir):
            i = d * per_dir + j
            if i >= n:
                break
            name = f"d{d:05d}/t{i:08d}.mmap"
            dst = root / name
            if not dst.exists():
                os.link(pool[i % POOL_FILES], dst)
                linked += 1
            k = int(rng.integers(1, 6))
            y = np.zeros(N_CLASSES, dtype="float16")
            y[rng.choice(N_CLASSES, size=k, replace=False, p=class_p)] = 1.0
            gt[name] = y
    t_link = time.time() - t0

    t0 = time.time()
    with open(root / "gt.pk", "wb") as f:
        pickle.dump(gt, f, protocol=4)
    t_pickle = time.time() - t0
    _append(out, {"build": {
        "n_entries": n, "pool_files": POOL_FILES, "links_created": linked,
        "pool_s": round(t_pool, 1), "link_and_labels_s": round(t_link, 1),
        "pickle_dump_s": round(t_pickle, 1),
        "gt_pickle_mb": round((root / "gt.pk").stat().st_size / 2**20, 1),
        "maxrss_mb": round(_maxrss_mb(), 1),
    }})


def _sub_weights(root: Path, mode: str) -> dict:
    """Run one weight build in a subprocess; report time + peak RSS."""
    code = f"""
import json, pickle, resource, sys, time
import numpy as np
sys.path.insert(0, {str(REPO)!r})
t0 = time.time()
with open({str(root / 'gt.pk')!r}, 'rb') as f:
    gt = pickle.load(f)
t_load = time.time() - t0
names = list(gt)
rss_loaded = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
t0 = time.time()
if {mode!r} == 'dense':
    from maest_tpu.data.sampler import class_balanced_weights
    targets = np.array([gt[k] for k in names])
    w = class_balanced_weights(targets, 100.0, True)
else:
    from maest_tpu.data.sampler import class_balanced_weights_streaming
    w = class_balanced_weights_streaming(gt, names, 100.0, True)
t_build = time.time() - t0
np.save({str(root)!r} + '/w_' + {mode!r} + '.npy', w)
rss_peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(json.dumps(dict(mode={mode!r}, gt_load_s=round(t_load, 1),
                      build_s=round(t_build, 1),
                      rss_after_load_mb=round(rss_loaded, 1),
                      rss_peak_mb=round(rss_peak, 1),
                      build_rss_delta_mb=round(rss_peak - rss_loaded, 1))))
"""
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PALLAS_AXON_POOL_IPS": "", "XLA_FLAGS": ""}
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    if res.returncode != 0:
        raise RuntimeError(f"weights[{mode}] failed:\n{res.stderr[-4000:]}")
    return json.loads(res.stdout.strip().splitlines()[-1])


def stage_weights(root: Path, out: Path) -> None:
    rec = {"dense": _sub_weights(root, "dense"),
           "stream": _sub_weights(root, "stream")}
    wd = np.load(root / "w_dense.npy")
    ws = np.load(root / "w_stream.npy")
    rec["stream_equals_dense"] = bool(np.array_equal(wd, ws))
    assert rec["stream_equals_dense"], "streaming weights diverged from dense"

    from maest_tpu.data.sampler import weighted_epoch_indices

    epoch_len = min(EPOCH_LEN, len(ws))  # smoke runs use tiny N
    t0 = time.time()
    idx = weighted_epoch_indices(ws, epoch_len, seed=0, epoch=0,
                                 replacement=False)
    rec["draw_200k_s"] = round(time.time() - t0, 2)
    rec["draw_unique"] = int(len(np.unique(idx)))
    assert len(idx) == epoch_len and rec["draw_unique"] == epoch_len
    np.save(root / "epoch_idx.npy", idx)
    _append(out, {"weights": rec})


def stage_loader(root: Path, out: Path, num_workers: int = 8,
                 limit: int | None = None) -> None:
    """One full weighted epoch through the production loader, relay out of
    the loop (no device transfers): host-side specs/s ceiling."""
    from maest_tpu import native
    from maest_tpu.data.dataset import DatasetConfig, MelChunkDataset
    from maest_tpu.data.loader import BatchLoader

    cfg = DatasetConfig(clip_length=30)
    t0 = time.time()
    ds = MelChunkDataset(root / "gt.pk", root, cfg)
    t_ds = time.time() - t0
    idx_path = root / "epoch_idx.npy"
    if idx_path.exists():
        idx = np.load(idx_path)
    else:
        rng = np.random.default_rng(0)
        idx = rng.integers(0, len(ds), size=EPOCH_LEN)
    if limit:
        idx = idx[: limit * BATCH]
    loader = BatchLoader(ds, BATCH, num_workers=num_workers, drop_last=True)
    n_samples = 0
    lat = []
    t0 = time.time()
    t_prev = t0
    for batch in loader.iter_indices(idx):
        now = time.time()
        lat.append(now - t_prev)
        t_prev = now
        n_samples += batch["x"].shape[0]
        assert batch["x"].shape[1:] == (N_BANDS, cfg.melspectrogram_size)
    dt = time.time() - t0
    lat = np.array(lat)
    _append(out, {"loader": {
        "native": native.available(), "num_workers": num_workers,
        "dataset_init_s": round(t_ds, 1),
        "n_samples": n_samples, "epoch_s": round(dt, 1),
        "specs_per_s": round(n_samples / dt, 1),
        "batch_ms_p50": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "batch_ms_p99": round(float(np.percentile(lat, 99)) * 1e3, 1),
        "train_step_budget_ms": 169.3,  # DECOMP_r04 30 s step
        "headroom_vs_189_specs": round(n_samples / dt / 189.0, 2),
        "maxrss_mb": round(_maxrss_mb(), 1),
    }})


def stage_train(root: Path, out: Path, steps: int = 300) -> None:
    """Real 30 s ViT-B train steps fed by the 2M-entry corpus through the
    production CLI path (TPU; relay-bound transfers expected — the point
    is that the host-side path keeps a pod fed without stalls/bugs)."""
    from maest_tpu.apps.ex_maest import run
    from maest_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    epoch_len = steps * BATCH
    overrides = [
        f"datamodule.base_dir={root}",
        f"datamodule.groundtruth_train={root}/gt.pk",
        f"datamodule.groundtruth_val={root}/gt.pk",
        "datamodule.clip_length=30",
        f"datamodule.batch_size_train={BATCH}",
        f"datamodule.batch_size_test={BATCH}",
        "datamodule.num_workers=8",
        f"datamodule.sampler.epoch_len={epoch_len}",
        "maest.n_classes=400",
        "maest.input_t=1876",
        "maest.s_patchout_t=90",
        "trainer.max_epochs=1",
        "trainer.devices=1",
        "trainer.precision=bf16",
        "trainer.limit_val_batches=1",
        "module.do_swa=False",
        "module.optimizer.warm_up_len=1",
        f"trainer.default_root_dir={root}/exp_logs",
    ]
    t0 = time.time()
    run(["main", "with"] + overrides)
    dt = time.time() - t0
    _append(out, {"train": {
        "steps": steps, "wall_s": round(dt, 1),
        "specs_per_s_incl_compile": round(steps * BATCH / dt, 1),
        "note": "relay transfer-bound on this host (CLAUDE.md); "
                "see exp_logs metrics.jsonl for per-step detail",
    }})


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", default="/tmp/scale_corpus")
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--stage", required=True,
                    choices=["build", "weights", "loader", "train", "all"])
    ap.add_argument("--out", default=str(REPO / "SCALE_r05.json"))
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0,
                    help="loader: cap at N batches (0 = full epoch)")
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()
    root, out = Path(args.root), Path(args.out)
    root.mkdir(parents=True, exist_ok=True)
    if args.stage in ("build", "all"):
        stage_build(root, args.n, out)
    if args.stage in ("weights", "all"):
        stage_weights(root, out)
    if args.stage in ("loader", "all"):
        stage_loader(root, out, num_workers=args.workers,
                     limit=args.limit or None)
    if args.stage == "train":
        stage_train(root, out, steps=args.steps)


if __name__ == "__main__":
    main()
