"""Checkpoint auto-download (maest_tpu/checkpoints/fetch.py).

The reference fetches release weights on first use (timm load_pretrained,
models/helpers/vit_helpers.py:261; URL table models/maest.py:64-153).
These tests exercise the same behavior hermetically via file:// URLs.
"""

import dataclasses
from pathlib import Path

import numpy as np
import pytest
import torch

import jax

from maest_tpu.checkpoints.fetch import FetchError, fetch_checkpoint
from maest_tpu.models.registry import (
    ARCHS,
    ArchSpec,
    build_config,
    cached_checkpoint_path,
)
from maest_tpu.models.vit import init_params
from maest_tpu.packaging.hf_ast import jax_to_torch_state

ARCH = "discogs-maest-5s-pw-129e"
GEOM = dict(embed_dim=64, depth=2, num_heads=4, input_t=62)


def _source_checkpoint(tmp_path: Path) -> Path:
    """A release-layout (net_swa.-prefixed Lightning) checkpoint file."""
    cfg = build_config(ARCH, **GEOM)
    params = init_params(cfg, jax.random.PRNGKey(5))
    state = jax_to_torch_state(params, cfg)
    src = tmp_path / "release.ckpt"
    torch.save(
        {"state_dict": {
            "net_swa." + k: torch.from_numpy(np.array(v))
            for k, v in state.items()
        }},
        src,
    )
    return src


@pytest.fixture()
def file_spec(tmp_path, monkeypatch):
    monkeypatch.setenv("MAEST_TPU_CACHE", str(tmp_path / "cache"))
    monkeypatch.delenv("MAEST_TPU_OFFLINE", raising=False)
    src = _source_checkpoint(tmp_path)
    spec = dataclasses.replace(ARCHS[ARCH], url=src.as_uri())
    monkeypatch.setitem(ARCHS, ARCH, spec)
    return spec


def test_fetch_downloads_into_cache(file_spec):
    dest = fetch_checkpoint(file_spec)
    assert dest == cached_checkpoint_path(file_spec)
    assert dest.exists()
    # No stray temp files left behind.
    assert list(dest.parent.glob("*.tmp.*")) == []


def test_fetch_short_circuits_on_existing_file(file_spec, monkeypatch):
    dest = fetch_checkpoint(file_spec)
    # Even offline (and with a dead URL) an existing file is returned as-is.
    monkeypatch.setenv("MAEST_TPU_OFFLINE", "1")
    broken = dataclasses.replace(file_spec, url="file:///nonexistent/x.ckpt")
    assert fetch_checkpoint(broken, dest=dest) == dest


def test_offline_mode_raises_fetch_error(file_spec, monkeypatch):
    monkeypatch.setenv("MAEST_TPU_OFFLINE", "1")
    with pytest.raises(FetchError, match="MAEST_TPU_OFFLINE"):
        fetch_checkpoint(file_spec)


def test_failed_download_leaves_no_partial_file(file_spec):
    broken = dataclasses.replace(file_spec, url="file:///nonexistent/x.ckpt")
    with pytest.raises(FetchError):
        fetch_checkpoint(broken)
    dest = cached_checkpoint_path(broken)
    assert not dest.exists()
    assert list(dest.parent.glob("*")) == []


def test_get_maest_auto_fetches(file_spec):
    from maest_tpu.api import get_maest

    model = get_maest(arch=ARCH, pretrained=True, **GEOM)
    assert cached_checkpoint_path(file_spec).exists()
    # Loaded (not random-init) weights: get_maest seeds init with seed=0,
    # the release file was built from PRNGKey(5) — a non-head param (heads
    # are zero-initialized in both) only matches if loading happened.
    key = "blocks.0.attn.qkv.weight"
    cfg = build_config(ARCH, **GEOM)
    want = jax_to_torch_state(init_params(cfg, jax.random.PRNGKey(5)), cfg)[key]
    got = jax_to_torch_state(model.params, cfg)[key]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_get_maest_offline_error_mentions_url(file_spec, monkeypatch):
    monkeypatch.setenv("MAEST_TPU_OFFLINE", "1")
    from maest_tpu.api import get_maest

    with pytest.raises(FileNotFoundError, match="MAEST_TPU_CACHE"):
        get_maest(arch=ARCH, pretrained=True, **GEOM)


def test_parity_sweep_fetch_flag_tolerates_failures(tmp_path, monkeypatch,
                                                    capsys):
    # `parity_sweep --fetch` must keep sweeping when a download fails
    # (reports the arch as missing, rc 0 — absent weights are not a failure).
    import sys as _sys
    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from parity_sweep import main

    monkeypatch.delenv("MAEST_TPU_OFFLINE", raising=False)
    arch = "discogs-maest-10s-pw-129e"
    monkeypatch.setitem(
        ARCHS, arch,
        dataclasses.replace(ARCHS[arch], url="file:///nonexistent/x.ckpt"))
    out = tmp_path / "report.json"
    rc = main(["--cache-dir", str(tmp_path), "--archs", arch,
               "--out", str(out), "--fetch"])
    assert rc == 0
    assert "fetch failed" in capsys.readouterr().out
    import json
    assert json.loads(out.read_text())["archs"][arch]["status"] == "missing"


def test_digest_mismatch_refuses_commit(file_spec):
    # An integrity pin that doesn't match the downloaded bytes must abort
    # the fetch BEFORE the file is committed (it feeds torch.load later).
    pinned = dataclasses.replace(file_spec, sha256="0" * 64)
    with pytest.raises(FetchError, match="digest mismatch"):
        fetch_checkpoint(pinned)
    dest = cached_checkpoint_path(pinned)
    assert not dest.exists()
    assert list(dest.parent.glob("*")) == []


def test_digest_match_commits(file_spec):
    import hashlib
    from urllib.request import url2pathname
    from urllib.parse import urlparse

    src = Path(url2pathname(urlparse(file_spec.url).path))
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    pinned = dataclasses.replace(file_spec, sha256=digest.upper())
    assert fetch_checkpoint(pinned).exists()


def test_truncated_download_raises_fetch_error(file_spec, monkeypatch):
    # http.client.IncompleteRead is an HTTPException, not an OSError; it must
    # still surface as FetchError so get_maest's friendly wrapper applies.
    import http.client
    import urllib.request

    class _TruncatedResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self, n=-1):
            raise http.client.IncompleteRead(b"partial")

    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda *a, **k: _TruncatedResp())
    with pytest.raises(FetchError, match="failed to download"):
        fetch_checkpoint(file_spec)
    dest = cached_checkpoint_path(file_spec)
    assert not dest.exists()
    assert list(dest.parent.glob("*")) == []


def test_real_specs_keep_release_urls():
    # The registry must keep pointing at the published release files
    # (reference URL table models/maest.py:64-153).
    for name, spec in ARCHS.items():
        if name.startswith("discogs-maest-"):
            assert spec.url.startswith("https://github.com/palonso/MAEST/")
            assert spec.url.endswith(f"{name}-swa.ckpt")
