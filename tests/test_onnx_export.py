"""ONNX artifact export (reference: packaging/convert_to_onnx.sh +
onnx_to_tf.sh interface surgery — here produced directly).

No onnx/onnxruntime in this image, so validation is three-legged:
the torch mirror must match the jax model exactly (same fp32 math),
the serialized file must parse as ONNX protobuf with the deployment
interface names, and the op histogram must contain the expected compute
nodes (Conv/MatMul/LayerNormalization/Softmax/Sigmoid)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.packaging.onnx_export import (
    _build_torch_model,
    export_onnx,
    read_onnx_io,
)

CFG = MAESTConfig(img_size=(96, 312), embed_dim=64, depth=2, num_heads=4,
                  num_classes=40)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def test_torch_mirror_matches_jax(params):
    m = _build_torch_model(params, CFG)
    x = np.random.default_rng(0).standard_normal((2, 312, 96)).astype("f4")
    with torch.no_grad():
        out = m(torch.from_numpy(x))
    jx = jnp.transpose(jnp.asarray(x), (0, 2, 1))[..., None]
    j_logits = MAESTNet(CFG).apply({"params": params}, jx, train=False)[0]
    np.testing.assert_allclose(
        out[0].numpy(), np.asarray(j_logits), rtol=1e-5, atol=1e-5
    )
    # activations output is sigmoid(logits); layer tokens have (B, N, E)
    np.testing.assert_allclose(
        out[1].numpy(), 1 / (1 + np.exp(-out[0].numpy())), rtol=1e-6
    )
    # conv time frames: floor((T - k)/s) + 1 (grid_size's table dim may be
    # one larger; the model slices the pos table to the conv output)
    n_tokens = 2 + CFG.grid_size[0] * ((312 - 16) // 10 + 1)
    assert out[2].shape == (2, n_tokens, 64)
    assert len(out) == 2 + CFG.depth


def test_onnx_file_interface(params, tmp_path):
    path = str(tmp_path / "model.onnx")
    assert export_onnx(params, CFG, path) == path
    io = read_onnx_io(path)
    assert io["inputs"] == ["melspectrogram"]
    assert io["outputs"][:2] == ["logits", "activations"]
    assert io["outputs"][2:] == [f"layer_{i}_tokens" for i in range(CFG.depth)]
    assert io["opset"] == 17
    for op in ("Conv", "MatMul", "LayerNormalization", "Softmax", "Sigmoid",
               "Gemm", "Erf"):
        assert io["ops"].get(op, 0) >= 1, f"missing {op} in exported graph"
    # all fp32 weights made it into the file (initializers or Constants)
    import os

    n_params = sum(
        int(np.prod(np.shape(v))) for v in jax.tree.leaves(params)
    )
    assert os.path.getsize(path) > 4 * n_params


def test_unsupported_head_rejected(params):
    cfg = CFG.replace(distilled_type="separated")
    with pytest.raises(NotImplementedError):
        export_onnx(params, cfg, "/dev/null")


def test_read_onnx_io_truncated_file(tmp_path):
    """A truncated/corrupt file must raise the scanner's ValueError, not an
    IndexError from the varint reader."""
    import pytest

    bad = tmp_path / "trunc.onnx"
    bad.write_bytes(b"\x80\x80\x80")  # unterminated varint
    with pytest.raises(ValueError, match="varint|ONNX"):
        read_onnx_io(str(bad))


def test_read_onnx_io_custom_domain_does_not_shadow_opset(tmp_path):
    """opset_import entries for custom domains (e.g. com.microsoft after ORT
    processing) must not shadow the default ai.onnx opset version."""
    import pytest

    def varint(v):
        out = b""
        while True:
            b7, v = v & 0x7F, v >> 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def field(num, wire, payload):
        tag = varint(num << 3 | wire)
        if wire == 2:
            return tag + varint(len(payload)) + payload
        return tag + varint(payload)

    # GraphProto with one input/output name
    graph = field(11, 2, field(1, 2, b"in")) + field(12, 2, field(1, 2, b"out"))
    model = (
        field(1, 0, 8)                                 # ir_version
        + field(8, 2, field(2, 0, 17))                 # opset: default domain
        + field(8, 2, field(1, 2, b"com.microsoft") + field(2, 0, 1))
        + field(7, 2, graph)                           # ModelProto.graph
    )
    p = tmp_path / "mixed.onnx"
    p.write_bytes(model)
    io = read_onnx_io(str(p))
    assert io["opset"] == 17, io
    del pytest
