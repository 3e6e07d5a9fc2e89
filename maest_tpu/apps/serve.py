"""HTTP tagging server on the TPU-native serving stack.

The reference has no serving story (its inference is an in-process Python
call, reference: models/maest.py:935-939); this stdlib-only front-end puts
``maest_tpu.serve.TagService`` — static-shape bucket programs + dynamic
cross-request batching — behind three endpoints:

    POST /tag      raw little-endian float32 16 kHz mono PCM
                   (Content-Type: application/octet-stream); 16-bit PCM —
                   half the wire bytes, decoded on-device, native-length
                   clips only — as Content-Type: audio/l16 (BIG-endian
                   per RFC 2586/3555) or audio/pcm (little-endian s16le);
                   or JSON {"waveform": [...]}
                   -> {"labels": [[name, score]...]}
    GET  /healthz  liveness probe
    GET  /stats    batching / latency counters (JSON)

Run:
    python -m maest_tpu.apps.serve [--arch ...] [--port 8321]
        [--pretrained/--no-pretrained] [--max-wait-ms 5] [--top-k 10]
        [--buckets 1,2,4,8,16,32]
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="maest-serve", description="MAEST tagging server (TPU-native)")
    ap.add_argument("--arch", default="discogs-maest-30s-pw-129e")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="co-batching linger before dispatch")
    ap.add_argument("--buckets", default="1,2,4,8,16,32",
                    help="comma-separated batch buckets to precompile")
    ap.add_argument("--no-pretrained", dest="pretrained",
                    action="store_false", default=True)
    ap.add_argument("--devices", type=int, default=None,
                    help="serve over an N-chip mesh (chunk-DP + head-TP)")
    ap.add_argument("--host-mel", action="store_true",
                    help="host-side numpy mel for non-native-length clips "
                         "(compile-free front-end; ~1e-6 mel deltas vs the "
                         "bit-exact jitted path)")
    ap.add_argument("--no-warmup", dest="warmup", action="store_false",
                    default=True, help="skip bucket precompilation")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="compute dtype (bf16 is the production path)")
    # tiny-geometry overrides (tests / CPU smoke)
    ap.add_argument("--embed-dim", type=int, default=768)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--num-heads", type=int, default=12)
    ap.add_argument("--input-t", type=int, default=None)
    ap.add_argument("--n-classes", type=int, default=None)
    return ap


def make_service(args):
    import jax.numpy as jnp

    from ..api import get_maest
    from ..serve import TagService

    mesh = None
    if args.devices and args.devices > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.devices)
    model = get_maest(
        arch=args.arch, pretrained=args.pretrained,
        checkpoint=args.checkpoint,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        embed_dim=args.embed_dim, depth=args.depth,
        num_heads=args.num_heads, input_t=args.input_t,
        n_classes=args.n_classes, mesh=mesh,
    )
    buckets = tuple(int(b) for b in args.buckets.split(","))
    return TagService(model, buckets=buckets, max_wait_ms=args.max_wait_ms,
                      warmup=args.warmup, warmup_pcm16=args.warmup,
                      host_mel=args.host_mel)


def make_handler(service, top_k: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, service.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/tag":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                ct = self.headers.get("Content-Type", "")
                if ct.startswith("application/json"):
                    wave = np.asarray(
                        json.loads(raw)["waveform"], np.float32)
                elif ct.startswith("audio/l16"):
                    # registered audio/L16 is BIG-endian (RFC 2586/3555)
                    wave = np.frombuffer(raw, ">i2").astype(np.int16)
                elif ct.startswith("audio/pcm"):
                    # custom little-endian s16 PCM: half the wire bytes
                    # of float32, decoded on-device (native-length only)
                    wave = np.frombuffer(raw, "<i2").astype(np.int16)
                else:
                    wave = np.frombuffer(raw, np.float32)
                if wave.size == 0:
                    self._json(400, {"error": "empty waveform"})
                    return
                acts, labels = service.tag(wave)
                order = np.argsort(acts)[::-1][:top_k]
                # custom head sizes have no vocabulary (labels_for returns
                # None outside 400/519) — fall back to class indices
                name = (lambda i: labels[i]) if labels is not None else str
                self._json(200, {
                    "labels": [[name(int(i)), float(acts[i])] for i in order],
                })
            except Exception as e:  # surface, don't crash the worker
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve_forever(service, host: str, port: int, top_k: int):
    """Start the HTTP server; returns (server, thread) for embedding/tests
    (call ``server.shutdown()`` + ``service.close()`` to stop)."""
    server = ThreadingHTTPServer((host, port), make_handler(service, top_k))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache

    args = build_argparser().parse_args(argv)
    enable_compilation_cache()  # warmup compiles many bucket programs
    service = make_service(args)
    server, thread = serve_forever(service, args.host, args.port, args.top_k)
    print(f"maest-serve: listening on http://{args.host}:{server.server_port}"
          f" (arch={args.arch}, buckets={args.buckets})", flush=True)
    try:
        thread.join()
    except KeyboardInterrupt:
        server.shutdown()
        service.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
