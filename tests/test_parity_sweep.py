"""Smoke test for the weights-arrival parity runbook (scripts/parity_sweep.py)
with synthetic checkpoints in all three supported layouts: release-style
Lightning .ckpt (net_swa. prefix), plain torch .pt, and HF-AST safetensors.
The sweep must flip from fingerprints to a real parity gate the day the
release weights land in the cache (reference loader: models/maest.py:1554-1567).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from maest_tpu.models.registry import ARCHS, build_config, cached_checkpoint_path
from maest_tpu.models.vit import init_params
from maest_tpu.packaging.hf_ast import jax_to_torch_state, save_pretrained

from parity_sweep import DISCOGS_ARCHS, main, run_sweep

ARCH = "discogs-maest-5s-pw-129e"
GEOM = dict(embed_dim=64, depth=2, num_heads=4, input_t=62)


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("MAEST_TPU_CACHE", str(tmp_path))
    cfg = build_config(ARCH, **GEOM)
    params = init_params(cfg, jax.random.PRNGKey(3))
    state = jax_to_torch_state(params, cfg)

    # layout 1: release-style Lightning checkpoint (net_swa. prefixes)
    torch.save(
        {"state_dict": {
            "net_swa." + k: torch.from_numpy(np.array(v))
            for k, v in state.items()
        }},
        cached_checkpoint_path(ARCHS[ARCH]),
    )
    # layout 2: plain torch state dict
    torch.save(
        {k: torch.from_numpy(np.array(v)) for k, v in state.items()},
        tmp_path / f"{ARCH}_plain.pt",
    )
    # layout 3: HF-AST safetensors snapshot dir
    save_pretrained(params, cfg, str(tmp_path / ARCH))
    return tmp_path


def test_three_layouts_agree_and_pass(cache):
    report = run_sweep(cache, [ARCH], tol=1e-3, expect=None, overrides=GEOM)
    entry = report["archs"][ARCH]
    assert len(entry["files"]) == 3
    assert entry["status"] == "pass"
    assert entry["cross_layout_max_diff"] < 1e-5
    assert len(entry["fingerprint"]["top5"]) == 5
    assert report["summary"]["ok"]


def test_expected_logits_gate(cache):
    # capture activations once, then use them as the 'reference expectation'
    first = run_sweep(cache, [ARCH], tol=1e-3, expect=None, overrides=GEOM)
    assert first["summary"]["ok"]

    from parity_sweep import SEED, _candidate_files, _forward

    spec = ARCHS[ARCH]
    rng = np.random.default_rng(SEED)
    x = rng.standard_normal((2, spec.input_f, GEOM["input_t"])).astype("f4")
    sig, _ = _forward(ARCH, _candidate_files(cache, ARCH)[0], x,
                      input_t=GEOM["input_t"],
                      **{k: v for k, v in GEOM.items() if k != "input_t"})

    ok = run_sweep(cache, [ARCH], tol=1e-3, expect={ARCH: sig},
                   overrides=GEOM)
    assert ok["archs"][ARCH]["vs_reference_max_sigmoid_diff"] < 1e-6
    assert ok["summary"]["ok"]

    # a deliberately-wrong expectation must FAIL the gate
    bad = run_sweep(cache, [ARCH], tol=1e-3,
                    expect={ARCH: np.clip(sig + 0.1, 0, 1)}, overrides=GEOM)
    assert bad["archs"][ARCH]["status"] == "FAIL"
    assert not bad["summary"]["ok"]


def test_missing_archs_reported(cache):
    report = run_sweep(cache, list(DISCOGS_ARCHS), tol=1e-3, expect=None,
                       overrides=GEOM)
    assert report["archs"][ARCH]["status"] == "pass"
    missing = [a for a, e in report["archs"].items() if e["status"] == "missing"]
    assert len(missing) == len(DISCOGS_ARCHS) - 1
    assert report["summary"]["missing"] == len(missing)


def test_cli_writes_report(cache, tmp_path_factory):
    out = tmp_path_factory.mktemp("rep") / "report.json"
    # CLI runs at full arch geometry only for present files; restrict to a
    # weight-less arch to keep it cheap and verify the report shape + rc
    absent = "discogs-maest-10s-pw-129e"
    rc = main(["--cache-dir", str(cache), "--archs", absent,
               "--out", str(out)])
    report = json.loads(out.read_text())
    assert report["archs"][absent]["status"] == "missing"
    assert rc == 0  # missing weights are not a failure, just absent
