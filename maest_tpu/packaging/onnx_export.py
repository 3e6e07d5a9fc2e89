"""Native ONNX export of a converted MAEST model.

The reference builds its deployment ONNX with optimum-cli and then
graph-surgers the interface (reference: packaging/convert_to_onnx.sh,
packaging/onnx_to_tf.sh) into:

  input  ``melspectrogram`` (B, T, 96)
  output ``logits``, ``activations`` (sigmoid), ``layer_{i}_tokens``

This module produces the same artifact in one step, offline: a torch
eval-mode mirror of the network (weights via ``jax_to_torch_state``) is
exported with the TorchScript ONNX exporter. The serialized ModelProto is
produced entirely by torch's C++ serializer; the ``onnx`` python package
is only consulted by torch for onnx-script custom functions, which this
graph never contains — so the (missing-in-image) import is bypassed with
an identity hook and the resulting bytes are a complete, valid ONNX file.

``read_onnx_io`` is a dependency-free protobuf wire-format scanner used to
verify the exported interface names without the onnx package.
"""

from __future__ import annotations

import contextlib
from typing import List, Tuple

import numpy as np

from ..models.config import MAESTConfig


def _build_torch_model(params, cfg: MAESTConfig):
    import torch
    import torch.nn as nn

    from .hf_ast import jax_to_torch_state

    if not cfg.distilled or cfg.distilled_type != "mean":
        # check BEFORE materializing the state: jax_to_torch_state pulls the
        # full ~330 MB ViT-B tree host-side (seconds over the relay) and the
        # head guard below would throw it away
        raise NotImplementedError(
            "ONNX export implements the deployed head (distilled 'mean', "
            "all released discogs archs); reference deploys the same "
            "(packaging/onnx_to_tf.sh sigmoid-on-Gemm surgery)."
        )
    sd = jax_to_torch_state(params, cfg)
    E, H = cfg.embed_dim, cfg.num_heads
    hidden = int(E * cfg.mlp_ratio)
    eps = cfg.layer_norm_eps

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(E, eps=eps)
            self.qkv = nn.Linear(E, 3 * E, bias=cfg.qkv_bias)
            self.proj = nn.Linear(E, E)
            self.norm2 = nn.LayerNorm(E, eps=eps)
            self.fc1 = nn.Linear(E, hidden)
            self.fc2 = nn.Linear(hidden, E)

        def forward(self, x):
            b, n, _ = x.shape
            h = self.norm1(x)
            qkv = self.qkv(h).reshape(b, n, 3, H, E // H).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (E // H) ** -0.5
            attn = attn.softmax(dim=-1)
            h = (attn @ v).transpose(1, 2).reshape(b, n, E)
            x = x + self.proj(h)
            h = self.norm2(x)
            h = torch.nn.functional.gelu(self.fc1(h))
            return x + self.fc2(h)

    class TorchMAEST(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(cfg.in_chans, E, cfg.patch_size,
                                  stride=cfg.stride)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, E))
            self.dist_token = nn.Parameter(torch.zeros(1, 1, E))
            self.new_pos_embed = nn.Parameter(torch.zeros(1, 2, E))
            gf, gt = cfg.grid_size
            self.freq_pos = nn.Parameter(torch.zeros(1, E, gf, 1))
            self.time_pos = nn.Parameter(torch.zeros(1, E, 1, gt))
            self.blocks = nn.ModuleList(Block() for _ in range(cfg.depth))
            self.norm = nn.LayerNorm(E, eps=eps)
            self.head_norm = nn.LayerNorm(E, eps=1e-5)
            self.head_linear = nn.Linear(E, cfg.num_classes)

        def forward(self, melspectrogram):
            # Essentia feeds (B, T, 96); conv runs (B, 1, F, T)
            x = melspectrogram.transpose(1, 2).unsqueeze(1)
            x = self.conv(x)
            t_dim = x.shape[-1]
            x = x + self.time_pos[:, :, :, :t_dim]
            x = x + self.freq_pos
            x = x.flatten(2).transpose(1, 2)
            b = x.shape[0]
            cls = self.cls_token.expand(b, -1, -1) + self.new_pos_embed[:, :1]
            dist = self.dist_token.expand(b, -1, -1) + self.new_pos_embed[:, 1:]
            x = torch.cat([cls, dist, x], dim=1)
            layer_tokens = []
            for blk in self.blocks:
                x = blk(x)
                layer_tokens.append(x)
            x = self.norm(x)
            feats = (x[:, 0] + x[:, 1]) / 2
            logits = self.head_linear(self.head_norm(feats))
            return (logits, torch.sigmoid(logits), *layer_tokens)

    m = TorchMAEST().eval()
    with torch.no_grad():
        m.conv.weight.copy_(torch.from_numpy(
            np.array(sd["patch_embed.proj.weight"], np.float32)))
        m.conv.bias.copy_(torch.from_numpy(
            np.array(sd["patch_embed.proj.bias"], np.float32)))
        m.cls_token.copy_(torch.from_numpy(np.array(sd["cls_token"], np.float32)))
        m.dist_token.copy_(torch.from_numpy(np.array(sd["dist_token"], np.float32)))
        m.new_pos_embed.copy_(torch.from_numpy(
            np.array(sd["new_pos_embed"], np.float32)))
        m.freq_pos.copy_(torch.from_numpy(
            np.array(sd["freq_new_pos_embed"], np.float32)))
        m.time_pos.copy_(torch.from_numpy(
            np.array(sd["time_new_pos_embed"], np.float32)))
        for i, blk in enumerate(m.blocks):
            p = f"blocks.{i}"

            def cp(dst, key):
                dst.copy_(torch.from_numpy(
                    np.array(sd[key], np.float32)))

            cp(blk.norm1.weight, f"{p}.norm1.weight")
            cp(blk.norm1.bias, f"{p}.norm1.bias")
            cp(blk.qkv.weight, f"{p}.attn.qkv.weight")
            if cfg.qkv_bias:
                cp(blk.qkv.bias, f"{p}.attn.qkv.bias")
            cp(blk.proj.weight, f"{p}.attn.proj.weight")
            cp(blk.proj.bias, f"{p}.attn.proj.bias")
            cp(blk.norm2.weight, f"{p}.norm2.weight")
            cp(blk.norm2.bias, f"{p}.norm2.bias")
            cp(blk.fc1.weight, f"{p}.mlp.fc1.weight")
            cp(blk.fc1.bias, f"{p}.mlp.fc1.bias")
            cp(blk.fc2.weight, f"{p}.mlp.fc2.weight")
            cp(blk.fc2.bias, f"{p}.mlp.fc2.bias")
        m.norm.weight.copy_(torch.from_numpy(np.array(sd["norm.weight"], np.float32)))
        m.norm.bias.copy_(torch.from_numpy(np.array(sd["norm.bias"], np.float32)))
        m.head_norm.weight.copy_(torch.from_numpy(
            np.array(sd["head.0.weight"], np.float32)))
        m.head_norm.bias.copy_(torch.from_numpy(
            np.array(sd["head.0.bias"], np.float32)))
        m.head_linear.weight.copy_(torch.from_numpy(
            np.array(sd["head.1.weight"], np.float32)))
        m.head_linear.bias.copy_(torch.from_numpy(
            np.array(sd["head.1.bias"], np.float32)))
    return m


@contextlib.contextmanager
def _passthrough_onnxscript_hook():
    """The exporter's final step re-parses the model bytes with the onnx
    package purely to append onnx-script custom functions; this graph has
    none, so the step is the identity. Replace it so export works without
    the package (absent from this image)."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        yield
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def export_onnx(params, cfg: MAESTConfig, path: str, *,
                opset: int = 17) -> str:
    """Write ``<path>`` as an ONNX model with the Essentia deployment
    signature (dynamic batch axis). Returns the path."""
    import torch
    import warnings

    model = _build_torch_model(params, cfg)
    f_bands, t_frames = cfg.img_size
    example = torch.zeros(2, t_frames, f_bands)
    out_names = ["logits", "activations"] + [
        f"layer_{i}_tokens" for i in range(cfg.depth)
    ]
    dyn = {"melspectrogram": {0: "batch_size"}}
    for n in out_names:
        dyn[n] = {0: "batch_size"}
    with _passthrough_onnxscript_hook(), warnings.catch_warnings():
        warnings.simplefilter("ignore")
        torch.onnx.export(
            model, (example,), path,
            input_names=["melspectrogram"],
            output_names=out_names,
            dynamic_axes=dyn,
            opset_version=opset,
            dynamo=False,
        )
    return path


# ---------------------------------------------------------------------------
# Dependency-free ONNX inspection (protobuf wire format)

def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = val = 0
    while True:
        if i >= len(buf) or shift > 63:
            # truncated file (interrupted export) or corrupt continuation
            # bytes: a parse error, not an IndexError / unbounded shift
            raise ValueError("truncated or corrupt varint — not an ONNX file?")
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value_bytes_or_int) top-level fields."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
            yield field, wire, val
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            yield field, wire, buf[i:i + ln]
            i += ln
        elif wire == 5:
            yield field, wire, buf[i:i + 4]
            i += 4
        elif wire == 1:
            yield field, wire, buf[i:i + 8]
            i += 8
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")


def read_onnx_io(path: str) -> dict:
    """Graph input/output names + op-type histogram of an ONNX file, parsed
    straight off the protobuf wire format (no onnx package needed)."""
    buf = open(path, "rb").read()
    graph = None
    ir_version = opset = None
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            ir_version = val
        elif field == 7 and wire == 2:  # ModelProto.graph
            graph = val
        elif field == 8 and wire == 2:  # ModelProto.opset_import
            dom, ver = b"", None
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 2:  # OperatorSetIdProto.domain
                    dom = v2
                elif f2 == 2 and w2 == 0:  # OperatorSetIdProto.version
                    ver = v2
            # only the default ai.onnx opset: a custom-domain import (e.g.
            # com.microsoft after ORT processing) must not shadow it
            if dom in (b"", b"ai.onnx") and ver is not None:
                opset = ver
    if graph is None:
        raise ValueError("no GraphProto found — not an ONNX file?")

    def names(field_no: int) -> List[str]:
        out = []
        for f, w, v in _fields(graph):
            if f == field_no and w == 2:  # ValueInfoProto
                for f2, w2, v2 in _fields(v):
                    if f2 == 1 and w2 == 2:  # name
                        out.append(v2.decode("utf-8"))
        return out

    ops: dict = {}
    initializers = set()
    for f, w, v in _fields(graph):
        if f == 1 and w == 2:  # NodeProto
            for f2, w2, v2 in _fields(v):
                if f2 == 4 and w2 == 2:  # op_type
                    op = v2.decode("utf-8")
                    ops[op] = ops.get(op, 0) + 1
        elif f == 5 and w == 2:  # TensorProto initializer
            for f2, w2, v2 in _fields(v):
                if f2 == 8 and w2 == 2:  # name
                    initializers.add(v2.decode("utf-8"))

    # graph inputs include initializers in some exporters; drop them
    inputs = [n for n in names(11) if n not in initializers]
    return {
        "ir_version": ir_version,
        "opset": opset,
        "inputs": inputs,
        "outputs": names(12),
        "ops": ops,
        "n_initializers": len(initializers),
    }
