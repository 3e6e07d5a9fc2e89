"""Serving stack: bucket programs, dynamic cross-request batching, HTTP.

The reference has no serving subsystem (inference is an in-process call,
reference: models/maest.py:935-939); these tests pin the TPU-native
batcher's core contract — served results are IDENTICAL to the direct
``predict_labels`` math — plus the batching/splitting mechanics.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from maest_tpu.api import get_maest
from maest_tpu.serve import (
    BucketPrograms,
    DynamicBatcher,
    TagService,
    pick_bucket,
)

SR = 16000


@pytest.fixture(scope="module")
def model():
    # tiny geometry: 1 s windows, 2 layers (full ViT-B compiles for minutes
    # on the single-core CPU host)
    m = get_maest(
        arch="discogs-maest-30s-pw-129e", pretrained=False,
        embed_dim=64, depth=2, num_heads=4, input_t=62, n_classes=16,
    )
    # the head is zero-init (reference weight init) so every activation is
    # exactly 0.5 — perturb it so rankings are distinguishable
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    m.params["head_linear"]["kernel"] = jnp.asarray(
        rng.standard_normal((64, 16)) * 0.1, jnp.float32)
    return m


def _wave(seconds, seed=0):
    return np.random.default_rng(seed).standard_normal(
        int(seconds * SR)).astype(np.float32)


def test_pick_bucket():
    assert pick_bucket(1, (1, 2, 4)) == 1
    assert pick_bucket(3, (1, 2, 4)) == 4
    assert pick_bucket(4, (1, 2, 4)) == 4
    assert pick_bucket(9, (1, 2, 4)) == 4  # capped; callers split first


def test_bucket_padding_matches_direct(model):
    """Zero-pad rows up to the bucket must not change the real rows."""
    import jax

    progs = BucketPrograms(model, buckets=(1, 4, 8))
    rng = np.random.default_rng(1)
    chunks = rng.standard_normal((3, 96, 62)).astype(np.float32)
    got = progs.run(chunks)

    logits = model(chunks[:, None, :, :])[0]  # rank-4 NCHW dispatch
    direct = np.asarray(jax.nn.sigmoid(np.asarray(logits, np.float32)))
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-6)


def test_service_matches_predict_labels(model):
    """Multi-chunk request through the batcher == predict_labels."""
    svc = TagService(model, buckets=(1, 2, 4, 8), max_wait_ms=0.0)
    try:
        wave = _wave(3.0)  # 3 chunks at the 1 s test geometry
        acts, labels = svc.tag(wave)
        ref_acts, ref_labels = model.predict_labels(wave)
        assert labels == ref_labels
        np.testing.assert_allclose(acts, ref_acts, rtol=1e-5, atol=1e-6)
        assert svc.stats()["requests"] == 1
    finally:
        svc.close()


def test_concurrent_requests_cobatch(model):
    """Concurrent clients' chunks share device batches, and every client
    still gets exactly its own answer."""
    svc = TagService(model, buckets=(1, 2, 4, 8, 16), max_wait_ms=50.0)
    try:
        waves = [_wave(1.0, seed=i) for i in range(8)]
        refs = [model.predict_labels(w)[0] for w in waves]
        outs = [None] * len(waves)

        def worker(i):
            outs[i], _ = svc.tag(waves[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(waves))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for got, ref in zip(outs, refs):
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        st = svc.stats()
        assert st["requests"] == 8 and st["chunks"] == 8
        # co-batching must have packed multiple requests per device call
        assert st["batches"] < 8
        assert st["mean_batch_fill"] > 1.0
    finally:
        svc.close()


def test_oversized_request_splits(model):
    """A request larger than the biggest bucket is split across device
    batches transparently."""
    svc = TagService(model, buckets=(1, 2, 4), max_wait_ms=0.0)
    try:
        wave = _wave(6.0)  # 6 chunks > max bucket 4
        acts, _ = svc.tag(wave)
        ref_acts, _ = model.predict_labels(wave)
        np.testing.assert_allclose(acts, ref_acts, rtol=1e-5, atol=1e-6)
        assert svc.stats()["batches"] >= 2
    finally:
        svc.close()


def test_fused_wave_path_matches_predict_labels(model):
    """Native-length clips take the one-dispatch fused mel+ViT program;
    results must equal the chunked predict_labels math exactly."""
    svc = TagService(model, buckets=(1, 2, 4), max_wait_ms=0.0)
    try:
        n_native = svc.wave_programs.native_len
        assert n_native == 62 * 256
        wave = _wave(n_native / SR)
        assert wave.shape[0] == n_native
        acts, _ = svc.tag(wave)
        ref_acts, _ = model.predict_labels(wave)
        np.testing.assert_allclose(acts, ref_acts, rtol=1e-5, atol=1e-6)
        # the request must have gone through the wave batcher (one chunk,
        # no separate mel dispatch): chunk-batcher queue was never used
        assert svc.stats()["requests"] == 1

        # concurrent native-length requests co-batch on the fused program
        waves = [_wave(n_native / SR, seed=i) for i in range(6)]
        refs = [model.predict_labels(w)[0] for w in waves]
        svc.batcher.stats.batches = 0
        svc2 = TagService(model, buckets=(1, 2, 4, 8), max_wait_ms=50.0)
        try:
            outs = [None] * 6

            def worker(i):
                outs[i], _ = svc2.tag(waves[i])

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            for got, ref in zip(outs, refs):
                np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
            st = svc2.stats()
            assert st["batches"] < 6 and st["mean_batch_fill"] > 1.0
        finally:
            svc2.close()
    finally:
        svc.close()


def test_batcher_stress_random_sizes(model):
    """Randomized stress: many threads, request sizes from 0 to beyond the
    max bucket, random pauses — every Future must resolve with exactly its
    own rows (values checked against a direct program run)."""
    import time as _time

    from maest_tpu.serve import BucketPrograms, DynamicBatcher

    progs = BucketPrograms(model, buckets=(1, 2, 4))
    batcher = DynamicBatcher(progs, max_wait_ms=2.0)
    rng = np.random.default_rng(11)
    reqs = [rng.standard_normal(
        (int(n), 96, 62)).astype(np.float32)
        for n in rng.integers(0, 7, size=24)]
    def direct(r):
        if not r.shape[0]:
            return None
        return np.concatenate([progs.run(r[i:i + 4])
                               for i in range(0, r.shape[0], 4)])

    expect = [direct(r) for r in reqs]
    outs = [None] * len(reqs)
    errs = []
    pauses = rng.integers(0, 5, size=len(reqs))  # Generator isn't thread-safe

    def worker(i):
        try:
            _time.sleep(float(pauses[i]) / 1e3)
            outs[i] = batcher.submit(reqs[i]).result(timeout=60)
        except Exception as e:
            errs.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    hung = [i for i, t in enumerate(threads) if t.is_alive()]
    batcher.close()
    assert not hung, f"requests still blocked after join timeout: {hung}"
    assert not errs, errs[:3]
    missing = [i for i, o in enumerate(outs) if o is None]
    assert not missing, f"requests returned no result: {missing}"
    for i, (got, ref) in enumerate(zip(outs, expect)):
        if reqs[i].shape[0] == 0:
            assert got.shape == (0, 16)
        else:
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                       err_msg=f"request {i}")


def test_empty_submission_resolves_immediately(model):
    """A 0-row submit must not strand its Future (the dispatcher keys on
    chunk counts)."""
    svc = TagService(model, buckets=(1, 2), max_wait_ms=0.0)
    try:
        out = svc.batcher.submit(
            np.empty((0, 96, 62), np.float32)).result(timeout=5)
        assert out.shape == (0, 16)
        # ...but the averaging entry point must raise: a mean over zero
        # rows would return silent all-NaN activations
        with pytest.raises(ValueError, match="at least one"):
            svc.tag_mel_chunks(np.empty((0, 96, 62), np.float32))
    finally:
        svc.close()


def test_pcm16_path_matches_float(model):
    """int16 native-length input decodes on-device as pcm/32768 and must
    match the float path on the equivalent waveform."""
    svc = TagService(model, buckets=(1, 2), max_wait_ms=0.0)
    try:
        n_native = svc.wave_programs.native_len
        pcm = (np.clip(_wave(n_native / SR), -1, 1) * 32767).astype(np.int16)
        acts16, _ = svc.tag(pcm)
        acts_f, _ = svc.tag(pcm.astype(np.float32) / 32768.0)
        np.testing.assert_allclose(acts16, acts_f, rtol=1e-5, atol=1e-6)
        # non-native-length int16 is rejected with a clear error
        with pytest.raises(ValueError, match="native length"):
            svc.tag(pcm[:100])
    finally:
        svc.close()


def test_mesh_serving_matches_single_device(model):
    """TagService over a (data=4, model=2) mesh: buckets round up to the
    data-axis size and served results match the single-device service."""
    from maest_tpu.api import get_maest
    from maest_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, model_parallel=2)
    sharded = get_maest(
        arch="discogs-maest-30s-pw-129e", pretrained=False,
        embed_dim=64, depth=2, num_heads=4, input_t=62, n_classes=16,
        mesh=mesh,
    )
    # reuse the perturbed head so rankings are meaningful
    from maest_tpu.parallel.mesh import shard_params

    p = dict(sharded.params)
    p["head_linear"] = dict(p["head_linear"])
    p["head_linear"]["kernel"] = model.params["head_linear"]["kernel"]
    sharded.params = shard_params(p, mesh)

    svc = TagService(sharded, buckets=(1, 2, 8), max_wait_ms=0.0)
    try:
        assert svc.programs.buckets == (4, 8)  # rounded to data-axis size
        wave = _wave(3.0)
        acts, _ = svc.tag(wave)
        ref_acts, _ = model.predict_labels(wave)
        np.testing.assert_allclose(acts, ref_acts, rtol=2e-5, atol=2e-5)
    finally:
        svc.close()


def test_http_roundtrip(model):
    """POST raw PCM -> ranked labels; /healthz and /stats respond."""
    from maest_tpu.apps.serve import serve_forever

    svc = TagService(model, buckets=(1, 2, 4), max_wait_ms=0.0)
    server, _ = serve_forever(svc, "127.0.0.1", 0, top_k=5)
    port = server.server_port
    try:
        wave = _wave(1.5)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tag", data=wave.tobytes(),
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            res = json.loads(r.read())
        assert len(res["labels"]) == 5
        ref_acts, labels = model.predict_labels(wave)
        assert labels is None  # tiny 16-class head has no vocabulary
        assert res["labels"][0][0] == str(int(np.argmax(ref_acts)))
        np.testing.assert_allclose(
            res["labels"][0][1], float(ref_acts.max()), rtol=1e-4)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            assert json.loads(r.read())["requests"] == 1

        # JSON body path + error paths
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tag",
            data=json.dumps({"waveform": wave[:SR].tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert len(json.loads(r.read())["labels"]) == 5

        # 16-bit PCM: audio/l16 is BIG-endian (RFC 2586), audio/pcm is
        # s16le; both must agree with the in-process int16 path
        n_native = svc.wave_programs.native_len
        pcm = (np.clip(_wave(n_native / SR, seed=3), -1, 1)
               * 32767).astype(np.int16)
        ref16, _ = svc.tag(pcm)
        for ct, payload in (
            ("audio/l16", pcm.astype(">i2").tobytes()),
            ("audio/pcm", pcm.astype("<i2").tobytes()),
        ):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/tag", data=payload,
                headers={"Content-Type": ct},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                res16 = json.loads(r.read())
            top_i = int(np.argmax(ref16))
            assert res16["labels"][0][0] == str(top_i), ct
            np.testing.assert_allclose(
                res16["labels"][0][1], float(ref16[top_i]), rtol=1e-4)
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=30)
    finally:
        server.shutdown()
        svc.close()


def test_short_clip_matches_predict_labels(model):
    """Regression: clips shorter than the model window used to 500 with a
    shape error from the batcher; the model itself supports them (time
    pos-embed slices to the input). Served result must be bit-identical to
    predict_labels."""
    svc = TagService(model, buckets=(1, 2), max_wait_ms=0.0)
    try:
        wave = _wave(0.5, seed=11)  # half the 1 s window
        acts, labels = svc.tag(wave)
        ref_acts, ref_labels = model.predict_labels(wave)
        np.testing.assert_array_equal(acts, ref_acts)
        assert labels == ref_labels
    finally:
        svc.close()


def test_host_mel_close_to_predict_labels(model):
    """--host-mel: numpy front-end for non-native lengths must track the
    jitted path within float tolerance (compile-free trade-off)."""
    svc = TagService(model, buckets=(1, 2, 4), max_wait_ms=0.0,
                     host_mel=True)
    try:
        wave = _wave(2.5, seed=12)
        acts, _ = svc.tag(wave)
        ref_acts, _ = model.predict_labels(wave)
        np.testing.assert_allclose(acts, ref_acts, rtol=1e-4, atol=1e-5)
    finally:
        svc.close()


def test_cancelled_future_does_not_kill_dispatcher(model):
    """Regression: set_result on a client-cancelled future raised
    InvalidStateError and killed the dispatcher thread — every later
    request then hung forever."""
    programs = BucketPrograms(model, buckets=(1, 2))
    batcher = DynamicBatcher(programs, max_wait_ms=0.0)
    try:
        mel_chunk = np.zeros((1, 96, 62), np.float32)
        fut = batcher.submit(mel_chunk)
        fut.cancel()  # may or may not win the race with the dispatcher
        # the batcher must still serve subsequent requests either way
        out = batcher.submit(mel_chunk).result(timeout=60)
        assert out.shape == (1, 16)
    finally:
        batcher.close()
