"""Serving-stack load benchmark: concurrent clients vs sequential requests.

Measures what the dynamic batcher buys on real hardware: N client threads
each tag 30 s clips (one chunk per request at the 30 s geometry); the
dispatcher packs concurrent chunks into shared device batches, so served
throughput should approach the offline batch-32 optimum while sequential
single requests pay full per-dispatch latency.

Usage (real TPU, ~5 min warm):
    python scripts/serve_bench.py [--clients 32] [--requests-per-client 8]
        [--no-pretrained]   # random weights; throughput is weight-agnostic

Prints one JSON line per phase: sequential baseline, then concurrent load.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from maest_tpu.utils.cache import enable_compilation_cache  # noqa: E402

SR = 16000
CLIP_S = 30


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests-per-client", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--no-pretrained", dest="pretrained",
                    action="store_false", default=True)
    args = ap.parse_args()

    enable_compilation_cache()
    import jax.numpy as jnp

    from maest_tpu.api import get_maest
    from maest_tpu.serve import TagService

    model = get_maest(arch="discogs-maest-30s-pw-129e",
                      pretrained=args.pretrained, dtype=jnp.bfloat16)
    svc = TagService(model, buckets=(1, 2, 4, 8, 16, 32),
                     max_wait_ms=args.max_wait_ms, warmup=True,
                     warmup_pcm16=True)

    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(CLIP_S * SR).astype(np.float32)
             for _ in range(8)]

    # -- sequential baseline (single in-flight request, bucket-1 program) --
    for w in waves[:2]:
        svc.tag(w)  # warm mel program + steady-state
    t0 = time.monotonic()
    n_seq = 16
    for i in range(n_seq):
        svc.tag(waves[i % len(waves)])
    dt = time.monotonic() - t0
    print(json.dumps({
        "phase": "sequential", "requests": n_seq,
        "audio_s_per_s": round(n_seq * CLIP_S / dt, 1),
        "latency_ms_mean": round(dt / n_seq * 1e3, 1),
    }), flush=True)

    # -- concurrent load: clients share device batches -----------------------
    svc.batcher.stats.batches = 0
    svc.batcher.stats.batched_chunks = 0
    svc.batcher.stats.reset_window()  # drop sequential-phase latencies
    total = args.clients * args.requests_per_client
    errs = []
    barrier = threading.Barrier(args.clients + 1)

    def client(ci):
        barrier.wait()
        for r in range(args.requests_per_client):
            try:
                svc.tag(waves[(ci + r) % len(waves)], timeout=600)
            except Exception as e:  # pragma: no cover
                errs.append(e)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    if errs:
        print(f"errors: {errs[:3]}", file=sys.stderr)
        return 1
    st = svc.stats()
    print(json.dumps({
        "phase": "concurrent", "clients": args.clients,
        "requests": total,
        "audio_s_per_s": round(total * CLIP_S / dt, 1),
        "mean_batch_fill": round(st["mean_batch_fill"], 2),
        "latency_ms_p50": round(st["latency_ms_p50"], 1),
        "latency_ms_p99": round(st["latency_ms_p99"], 1),
    }), flush=True)

    # -- concurrent s16le PCM: half the wire bytes over the device link -----
    pcm = [(np.clip(w, -1, 1) * 32767).astype(np.int16) for w in waves]
    svc.batcher.stats.reset_window()
    errs.clear()

    def client16(ci):
        barrier16.wait()
        for r in range(args.requests_per_client):
            try:
                svc.tag(pcm[(ci + r) % len(pcm)], timeout=600)
            except Exception as e:  # pragma: no cover
                errs.append(e)

    barrier16 = threading.Barrier(args.clients + 1)
    threads = [threading.Thread(target=client16, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    barrier16.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    if errs:
        print(f"errors: {errs[:3]}", file=sys.stderr)
        return 1
    st = svc.stats()
    print(json.dumps({
        "phase": "concurrent_pcm16", "clients": args.clients,
        "requests": total,
        "audio_s_per_s": round(total * CLIP_S / dt, 1),
        "latency_ms_p50": round(st["latency_ms_p50"], 1),
        "latency_ms_p99": round(st["latency_ms_p99"], 1),
    }), flush=True)
    svc.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
