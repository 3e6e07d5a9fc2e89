"""HF packaging parity: the exported dir is a working `transformers` model.

The reference pushes a custom ``MAESTFeatureExtractor`` with its hub models
(reference: packaging/push_to_hub.py:7,150-158); the class itself lives
hub-side. Ours ships inside every ``save_pretrained`` export so the dir
loads via ``AutoFeatureExtractor`` + ``ASTForAudioClassification`` exactly
like the released ``mtg-upf/discogs-maest-*`` repos — and its features must
match our ``dsp.mel`` front-end.
"""

import os

import numpy as np
import pytest

import jax

from maest_tpu.dsp.mel import MelConfig, log_mel_spectrogram_np
from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.packaging.feature_extraction_maest import MAESTFeatureExtractor
from maest_tpu.packaging.hf_ast import save_pretrained

os.environ.setdefault("HF_HUB_OFFLINE", "1")


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(7)
    return (rng.standard_normal(2 * 16000) * 0.2).astype("float32")


def test_feature_extractor_matches_dsp_mel(wave):
    fx = MAESTFeatureExtractor(max_length=500)
    feats = fx(wave)["input_values"]  # (1, 500, 96)
    ours = log_mel_spectrogram_np(wave, MelConfig())  # (96, T)
    t = ours.shape[1]
    assert feats.shape == (1, 500, 96)
    np.testing.assert_allclose(feats[0, :t], ours.T, atol=1e-4, rtol=1e-4)
    # padded tail is exactly padding_value
    assert np.all(feats[0, t:] == 0.0)


def test_feature_extractor_batched_and_guards(wave):
    fx = MAESTFeatureExtractor(max_length=100)
    out = fx([wave, wave[: 16000]])["input_values"]
    assert out.shape == (2, 100, 96)  # truncated to max_length
    with pytest.raises(ValueError, match="16000"):
        fx(wave, sampling_rate=44100)
    with pytest.raises(ValueError, match="too short"):
        fx(np.zeros(100, "float32"))


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    # img_t=126 = AST max_length for grid_t=12 (patch 16 + stride 10 * 11):
    # both our model and the AST export see the identical 126-frame input
    # and emit 12 time patches, so logits are directly comparable.
    cfg = MAESTConfig(img_size=(96, 126), embed_dim=64, depth=2, num_heads=4,
                      num_classes=7)
    params = init_params(cfg, jax.random.PRNGKey(0))
    out = tmp_path_factory.mktemp("hf_export") / "model"
    save_pretrained(params, cfg, str(out),
                    labels=[f"l{i}" for i in range(7)])
    return out, cfg, params


def test_auto_feature_extractor_loads_export_dir(export_dir, wave):
    from transformers import AutoFeatureExtractor

    out, cfg, _ = export_dir
    assert (out / "feature_extraction_maest.py").exists()
    fx = AutoFeatureExtractor.from_pretrained(str(out),
                                              trust_remote_code=True)
    assert type(fx).__name__ == "MAESTFeatureExtractor"
    assert fx.max_length == 126  # patch + stride * (grid_t - 1)
    assert fx.num_mel_bins == 96
    got = fx(wave)["input_values"]
    want = MAESTFeatureExtractor(max_length=126)(wave)["input_values"]
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


def test_export_runs_end_to_end_in_transformers(export_dir, wave):
    """wave -> AutoFeatureExtractor -> ASTForAudioClassification from the
    export dir must match our MAESTNet logits on the same features."""
    import torch
    from transformers import ASTForAudioClassification, AutoFeatureExtractor

    out, cfg, params = export_dir
    fx = AutoFeatureExtractor.from_pretrained(str(out),
                                              trust_remote_code=True)
    # 2 s at 16 kHz -> 1 + 32000//256 = 126 frames: exactly max_length,
    # no padding — every AST patch sees real data
    feats = fx(wave)["input_values"]
    assert feats.shape == (1, 126, 96)

    model = ASTForAudioClassification.from_pretrained(str(out)).eval()
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(feats)).logits.numpy()
    assert model.config.id2label[0] == "l0"

    x = feats[0].T[None, :, :, None]  # (1, 96, 126, 1) NHWC
    ours, _ = MAESTNet(cfg).apply(
        {"params": params}, np.asarray(x, "float32"), train=False
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits,
                               atol=5e-4, rtol=5e-4)


def test_list_of_floats_is_one_waveform():
    """HF convention (ASTFeatureExtractor): a bare List[float] is ONE
    waveform, not a batch of 0-d scalars."""
    fe = MAESTFeatureExtractor()
    wave = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    out_list = fe(wave.tolist())
    out_arr = fe(wave)
    assert out_list["input_values"].shape == out_arr["input_values"].shape
    np.testing.assert_allclose(out_list["input_values"],
                               out_arr["input_values"], atol=1e-6)
    # and a list of arrays is still a batch
    out_batch = fe([wave, wave])
    assert out_batch["input_values"].shape[0] == 2
