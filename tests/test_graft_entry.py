"""Driver entry-point coverage on the virtual 8-device CPU mesh.

``dryrun_multichip`` is the driver's only multi-chip correctness probe
(the TPU answer to the reference's DDP launch, reference: ex_maest.py:57);
round 1 recorded it red purely from an env-bootstrap gap, so every mesh
combination it can reach is exercised here.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,
]


@pytest.mark.parametrize("n", [5, 6, 8])
def test_dryrun_matrix(n, capsys):
    """Odd (pure-DP), even (DP x TP), and full-width device counts all
    compile and execute one real train step."""
    graft.dryrun_multichip(n)
    out = capsys.readouterr().out
    assert f"dryrun_multichip: n={n}" in out


def test_make_mesh_shapes():
    from maest_tpu.parallel.mesh import make_mesh

    assert dict(make_mesh(6, model_parallel=1).shape) == {"data": 6, "model": 1}
    assert dict(make_mesh(8, model_parallel=1).shape) == {"data": 8, "model": 1}
    assert dict(make_mesh(8, model_parallel=2).shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)
    with pytest.raises(ValueError):
        make_mesh(9)


def test_entry_traces():
    """entry() returns a traceable fn on the flagship geometry (full compile
    of ViT-B is minutes on this 1-core CPU host; the driver compile-checks it
    on TPU, so CI only verifies the abstract trace)."""
    fn, (params, x) = graft.entry()
    out = jax.eval_shape(fn, params, x)
    assert out.shape == (x.shape[0], 400)
