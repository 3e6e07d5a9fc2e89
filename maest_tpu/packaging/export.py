"""Deployment exports of the jitted inference program.

The reference exports via HF -> ONNX -> TF graph surgery
(reference: packaging/convert_to_onnx.sh, packaging/onnx_to_tf.sh),
producing a TF SavedModel / frozen PB whose signature is:

  input  ``melspectrogram`` (B, T, 96)
  output ``logits``        raw classifier logits
  output ``activations``   sigmoid(logits)
  output ``layer_{i}_tokens`` for every transformer block i

The TPU-native build has no ONNX hop for TF: ``jax2tf`` stages the *same*
XLA program (mel-normalized input -> ViT -> heads) into a TF function, so
the exported graph is numerically identical to the JAX one. The ONNX
artifact itself is produced by ``export_onnx`` (torch-mirror export, see
``onnx_export.py``) with the same interface names.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import MAESTConfig
from ..models.vit import MAESTNet


def export_tf_saved_model(
    params,
    cfg: MAESTConfig,
    out_dir: str,
    *,
    with_layer_tokens: bool = True,
    batch_size=None,
) -> str:
    """Write a TF SavedModel with the Essentia-style signature.

    ``batch_size=None`` exports with a polymorphic batch dimension.
    """
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "TF SavedModel export requires tensorflow + jax2tf; neither is "
            "bundled in minimal images. The pure-JAX model is unaffected."
        ) from e

    net = MAESTNet(cfg, dtype=jnp.float32)
    f_bands, t_frames = cfg.img_size

    def fwd(melspectrogram):
        # Essentia feeds (B, T, 96); model runs (B, F, T, 1)
        x = jnp.transpose(melspectrogram, (0, 2, 1))[..., None]
        out = net.apply(
            {"params": params}, x, train=False,
            return_layer_tokens=with_layer_tokens,
        )
        if with_layer_tokens:
            *head_out, layers = out
        else:
            head_out, layers = out, ()
        logits = head_out[0]
        result = {
            "logits": logits,
            "activations": jax.nn.sigmoid(logits),
        }
        for i, tokens in enumerate(layers):
            result[f"layer_{i}_tokens"] = tokens
        return result

    poly = f"{'b' if batch_size is None else batch_size}, {t_frames}, {f_bands}"
    tf_fn = jax2tf.convert(
        fwd,
        polymorphic_shapes=[f"({poly})"] if batch_size is None else None,
        with_gradient=False,
    )

    module = tf.Module()
    module.fwd = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[
            tf.TensorSpec(
                (batch_size, t_frames, f_bands), tf.float32, name="melspectrogram"
            )
        ],
    )
    os.makedirs(out_dir, exist_ok=True)
    tf.saved_model.save(
        module, out_dir,
        signatures={"serving_default": module.fwd},
    )
    return out_dir


def export_onnx(params, cfg: MAESTConfig, path: str, *, opset: int = 17) -> str:
    """ONNX artifact with the Essentia deployment signature — one offline
    step instead of the reference's optimum-cli + graph-surgery pipeline
    (reference: packaging/convert_to_onnx.sh, packaging/onnx_to_tf.sh).
    See ``maest_tpu.packaging.onnx_export`` for how the export works
    without the ``onnx`` package."""
    from .onnx_export import export_onnx as _export

    return _export(params, cfg, path, opset=opset)


def load_tf_and_check(saved_dir: str, mel: np.ndarray) -> dict:
    """Round-trip helper: run the exported SavedModel on a batch."""
    import tensorflow as tf

    loaded = tf.saved_model.load(saved_dir)
    out = loaded.signatures["serving_default"](
        melspectrogram=tf.constant(mel, tf.float32)
    )
    return {k: v.numpy() for k, v in out.items()}
