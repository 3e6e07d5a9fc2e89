"""Public inference API.

``get_maest`` / ``MAEST.__call__`` / ``MAEST.predict_labels`` mirror the
reference surface (reference: models/maest.py:831-939, 1467-1569) with the
same input dispatch:

  rank 1            waveform -> log-mel -> chunked into a batch of windows
  rank 2 (wave)     batch of waveforms -> log-mel per row
  rank 2 (melspec)  (96, T) mel -> chunked into a batch of windows
  rank 3            (B, 96, T) mel -> channel dim added
  rank 4            (B, 1, 96, T) passthrough

Everything from the log-mel front-end through the sigmoid runs inside one
jitted XLA program per input shape; chunking uses static reshapes so compiled
programs are cached per chunk count.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dsp import log_mel_spectrogram
from .labels import labels_for
from .models.config import MAESTConfig
from .models.registry import ARCHS, build_config, cached_checkpoint_path
from .models.vit import MAESTNet, init_params


class MAEST:
    """Inference-oriented wrapper holding a config + param pytree.

    ``mesh``: a ``jax.sharding.Mesh`` spreads inference over multiple
    chips — batch/chunk axis over ``data``, optional Megatron-style tensor
    parallelism over ``model`` (beyond reference scope, which is
    single-GPU at inference). Params are placed with the mesh's partition
    specs; input chunk batches are padded (repeating the last chunk) up to
    a multiple of the ``data`` axis, sharded, and sliced back after the
    forward — every batch size shards.
    """

    def __init__(self, cfg: MAESTConfig, params, dtype=jnp.float32,
                 mesh=None):
        self.cfg = cfg
        self.dtype = dtype
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            missing = {"data", "model"} - set(self.mesh.axis_names)
            if missing:
                raise ValueError(
                    f"mesh must have ('data', 'model') axes (missing "
                    f"{sorted(missing)}); build it with "
                    "maest_tpu.parallel.mesh.make_mesh()"
                )
            from .parallel.mesh import shard_params

            # flash attention runs inside a shard_map region under a mesh
            # (GSPMD cannot partition a pallas_call)
            self.net = MAESTNet(cfg, dtype=dtype, mesh=self.mesh)
            params = shard_params(params, self.mesh)
        else:
            self.net = MAESTNet(cfg, dtype=dtype)
            # single placement here: get_maest hands over host arrays
            params = jax.device_put(params)
        self.params = params
        self.labels = labels_for(cfg.num_classes)

        @functools.partial(
            jax.jit, static_argnames=("transformer_block", "return_self_attention")
        )
        def _apply(params, x, transformer_block, return_self_attention):
            return self.net.apply(
                {"params": params},
                x,
                train=False,
                transformer_block=transformer_block,
                return_self_attention=return_self_attention,
            )

        self._apply = _apply

        @jax.jit
        def _melspec(wave):
            return log_mel_spectrogram(wave)

        self._melspec = _melspec

    # ------------------------------------------------------------------
    @property
    def img_size(self) -> tuple[int, int]:
        return self.cfg.img_size

    def melspectrogram(self, waveform) -> jnp.ndarray:
        """Log-mel front-end (reference: models/helpers/melspectrogram.py:47-60)."""
        return self._melspec(jnp.asarray(waveform))

    def _chunk_melspec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Cut a (96, T) mel into a batch of (1, 96, img_t) windows
        (reference: models/maest.py:868-888)."""
        img_f, img_t = self.cfg.img_size
        if x.shape[1] >= img_t:
            trim = x.shape[1] % img_t
            if trim:
                x = x[:, :-trim]
            n = x.shape[1] // img_t
            x = x.reshape(img_f, n, img_t).transpose(1, 0, 2)[:, None, :, :]
        else:
            x = x[None, None, :, :]
        return x

    def __call__(
        self,
        x,
        transformer_block: int = -1,
        return_self_attention: bool = False,
        melspectrogram_input: bool = False,
    ):
        """Forward pass; returns (logits, features) / (None, embeddings) /
        (logits_cls, logits_dist, features) per ``distilled_type`` and
        ``transformer_block`` (reference: models/maest.py:831-933)."""
        if isinstance(x, (list, tuple)) or not hasattr(x, "shape"):
            raise TypeError("Input must be an array (numpy or jax)")
        x = jnp.asarray(x)
        if x.size == 0:
            raise ValueError("Input tensor must not be empty")
        if not jnp.issubdtype(x.dtype, jnp.floating):
            # int16 is s16 PCM — decode to [-1, 1) exactly like the serving
            # path (serve.py pcm16 programs); a bare float cast would feed
            # ±32767-range samples into the log-mel front-end and return
            # confidently wrong activations. Other integer dtypes are
            # ambiguous (int32 PCM? indices?) — reject instead of guessing.
            if x.dtype == jnp.int16:
                x = x.astype(jnp.float32) / 32768.0
            else:
                raise TypeError(
                    f"integer input dtype {x.dtype} is ambiguous — pass a "
                    "float waveform in [-1, 1] (or int16 s16 PCM)")

        img_f, img_t = self.cfg.img_size

        if x.ndim == 1:
            if melspectrogram_input:
                raise ValueError(
                    "Input is 1D, but melspectrogram_input is True; not supported."
                )
            mel = self.melspectrogram(x)  # (96, T)
            x = self._chunk_melspec(mel)
        elif x.ndim == 2 and melspectrogram_input:
            x = self._chunk_melspec(x)
        elif x.ndim == 2:
            mel = self.melspectrogram(x)  # (B, 96, T)
            x = mel[:, None, :, :]
        elif x.ndim == 3:
            x = x[:, None, :, :]
        elif x.ndim != 4:
            raise ValueError(f"unsupported input rank {x.ndim}")

        # NCHW -> NHWC for the TPU-native layout
        x = x.transpose(0, 2, 3, 1)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # pad the batch/chunk axis up to a multiple of the data axis so
            # every chip does real work (an arbitrary-length track rarely
            # chunks into an exact multiple; replicating instead would give
            # single-chip latency), then slice the padded rows back off
            n_data = self.mesh.shape["data"]
            b_true = x.shape[0]
            pad = (-b_true) % n_data
            if pad:
                x = jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            x = jax.device_put(
                x, NamedSharding(self.mesh, PartitionSpec("data")))
            with self.mesh:
                out = self._apply(
                    self.params, x, transformer_block, return_self_attention
                )
            if pad:
                out = jax.tree.map(
                    lambda a: a[:b_true]
                    if hasattr(a, "shape") and a.ndim >= 1
                    and a.shape[0] == b_true + pad else a,
                    out,
                )
            return out
        return self._apply(
            self.params, x, transformer_block, return_self_attention
        )

    def forward(self, *args, **kwargs):
        """torch-idiom alias for ``__call__`` — reference user code calls
        ``model.forward(x, ...)`` directly (models/maest.py:831)."""
        return self(*args, **kwargs)

    def predict_labels(self, x):
        """Sigmoid activations averaged over the chunk axis + label list
        (reference: models/maest.py:935-939)."""
        logits = self(x)[0]
        activations = jax.nn.sigmoid(logits)
        activations = jnp.mean(activations, axis=0)
        return np.asarray(activations), self.labels


def get_maest(
    arch: str = "discogs-maest-30s-pw-129e",
    pretrained: bool = True,
    n_classes: Optional[int] = None,
    in_channels: int = 1,
    stride_f: int = 10,
    stride_t: int = 10,
    input_f: int = 96,
    input_t: Optional[int] = None,
    u_patchout: int = 0,
    s_patchout_t: int = 0,
    s_patchout_f: int = 0,
    s_patchout_f_indices: tuple = (),
    s_patchout_f_interleaved: int = 0,
    s_patchout_t_indices: tuple = (),
    s_patchout_t_interleaved: int = 0,
    distilled_type: str = "mean",
    checkpoint: Optional[str] = None,
    checkpoint_swa_weights: bool = True,
    checkpoint_discard_head: bool = False,
    dtype=jnp.float32,
    seed: int = 0,
    embed_dim: int = 768,
    depth: int = 12,
    num_heads: int = 12,
    remat: bool = False,
    remat_policy: str = "full",
    attention_quant: str = "none",
    attention_bwd_quant: str = "none",
    mesh=None,
) -> MAEST:
    """Build a MAEST model, optionally loading released weights.

    Equivalent of the reference factory (reference: models/maest.py:1467-1569).
    With ``pretrained=True`` the released checkpoint is read from the local
    cache directory, auto-downloading it on first use like the reference
    (timm load_pretrained, vit_helpers.py:261; set ``MAEST_TPU_OFFLINE=1``
    to disable); ``checkpoint=`` loads an explicit
    ``.ckpt``/``.pt``/``.safetensors`` file.
    """
    from .checkpoints.convert import merge_params, torch_to_jax_params

    cfg = build_config(
        arch,
        n_classes=n_classes,
        in_channels=in_channels,
        stride_f=stride_f,
        stride_t=stride_t,
        input_f=input_f,
        input_t=input_t,
        u_patchout=u_patchout,
        s_patchout_t=s_patchout_t,
        s_patchout_f=s_patchout_f,
        s_patchout_f_indices=s_patchout_f_indices,
        s_patchout_f_interleaved=s_patchout_f_interleaved,
        s_patchout_t_indices=s_patchout_t_indices,
        s_patchout_t_interleaved=s_patchout_t_interleaved,
        distilled_type=distilled_type,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        remat=remat,
        remat_policy=remat_policy,
        attention_quant=attention_quant,
        attention_bwd_quant=attention_bwd_quant,
    )

    params = init_params(cfg, jax.random.PRNGKey(seed))

    if pretrained:
        path = cached_checkpoint_path(ARCHS[arch])
        if not path.exists():
            # Reference behavior: weights are fetched on first use (timm
            # load_pretrained, vit_helpers.py:261). MAEST_TPU_OFFLINE=1
            # skips the attempt.
            from .checkpoints.fetch import FetchError, fetch_checkpoint

            try:
                fetch_checkpoint(ARCHS[arch])
            except FetchError as err:
                raise FileNotFoundError(
                    f"pretrained weights for {arch} not found at {path} and "
                    f"auto-download did not succeed ({err}). Download "
                    f"{ARCHS[arch].url} into the cache dir (or set "
                    f"MAEST_TPU_CACHE)."
                ) from err
        state = _normalize_state(_load_any(str(path)), cfg, swa_weights=True)
        loaded = torch_to_jax_params(state, cfg)
        params = merge_params(params, loaded)

    if checkpoint:
        state = _normalize_state(
            _load_any(checkpoint), cfg, swa_weights=checkpoint_swa_weights
        )
        loaded = torch_to_jax_params(
            state, cfg, discard_head=checkpoint_discard_head
        )
        params = merge_params(params, loaded)

    # cast on HOST: MAEST.__init__ does the one device placement (under a
    # mesh, shard_params). Uploading to device 0 here first would double
    # the ~330 MB ViT-B transfer on multi-chip loads.
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    return MAEST(cfg, params, dtype=dtype, mesh=mesh)


def _load_any(path: str):
    from .checkpoints.convert import load_safetensors, load_torch_checkpoint

    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_torch_checkpoint(path)


def _normalize_state(state, cfg, *, swa_weights: bool):
    """Route a raw state dict into MAEST-torch layout.

    Accepts Lightning checkpoints (``net.``/``net_swa.`` prefixes), plain
    MAEST state dicts, and HF AST exports (the ``mtg-upf/discogs-maest-*``
    hub layout) which are detected by key prefix and inverted through
    ``packaging.hf_ast.from_hf_ast_state``.
    """
    from .checkpoints.convert import strip_prefix

    if any(str(k).startswith("audio_spectrogram_transformer.") for k in state):
        from .packaging.hf_ast import from_hf_ast_state

        return from_hf_ast_state(state, cfg)
    return strip_prefix(state, swa_weights=swa_weights)
