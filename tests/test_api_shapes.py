"""Public-API shape-contract tests.

Mirror of the reference unit tests (reference: tests/test_maest.py:13-77),
adapted to array inputs instead of torch tensors.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from maest_tpu import get_maest


@pytest.fixture(scope="module")
def model():
    return get_maest(arch="discogs-maest-30s-pw-129e", pretrained=False)


def test_bad_input_type(model):
    with pytest.raises(Exception):
        model([1.0, 2.0, 3.0])


def test_empty_input(model):
    with pytest.raises(Exception):
        model(np.empty([0]))


def test_long_2d_input(model):
    # batch of 2 audio samples of 40 s each: longer than the 30 s pos-embed
    # table -> must raise (reference: models/maest.py:664-668)
    input_data = np.random.rand(2, 40 * 16000).astype("float32")
    with pytest.raises(Exception):
        model(input_data)


def test_1d_input(model):
    input_data = np.random.rand(10 * 16000).astype("float32")
    logits, _ = model(input_data)
    assert logits.shape == (1, 400)


def test_2d_audio_logits(model):
    input_data = np.random.rand(2, 10 * 16000).astype("float32")
    logits, _ = model(input_data, melspectrogram_input=False)
    assert logits.shape == (2, 400)


def test_2d_melspec_logits(model):
    input_data = np.random.rand(96, 1875).astype("float32")
    logits, _ = model(input_data, melspectrogram_input=True)
    assert logits.shape == (1, 400)


def test_2d_melspec_embeddings(model):
    input_data = np.random.rand(96, 1875).astype("float32")
    _, embeddings = model(input_data, melspectrogram_input=True, transformer_block=6)
    assert embeddings.shape == (1, 2304)


def test_3d_melspec_embeddings(model):
    input_data = np.random.rand(2, 96, 1875).astype("float32")
    _, embeddings = model(input_data, melspectrogram_input=True, transformer_block=6)
    assert embeddings.shape == (2, 2304)


def test_4d_melspec_embeddings(model):
    input_data = np.random.rand(2, 1, 96, 1875).astype("float32")
    _, embeddings = model(input_data, melspectrogram_input=True, transformer_block=6)
    assert embeddings.shape == (2, 2304)


def test_predict_labels(model):
    input_data = np.random.rand(10 * 16000).astype("float32")
    activations, labels = model.predict_labels(input_data)
    assert activations.shape == (400,)
    assert len(labels) == 400
    assert activations.min() >= 0.0 and activations.max() <= 1.0


def test_long_1d_input_chunks(model):
    # 1-D inputs longer than the window are chunked, not rejected
    # (reference: models/maest.py:868-877)
    input_data = np.random.rand(65 * 16000).astype("float32")
    logits, _ = model(input_data)
    assert logits.shape == (2, 400)


def test_int16_input_decodes_as_pcm(model):
    # int16 waveforms are s16 PCM: the API must scale by 1/32768 exactly
    # like the serving path (serve.py pcm16 programs) — a bare float cast
    # feeds +-32767-range samples into the mel front-end and returns
    # confidently wrong activations
    rng = np.random.default_rng(0)
    wave = np.clip(rng.standard_normal(10 * 16000) * 0.2, -1, 1)
    pcm = (wave * 32767).astype(np.int16)
    logits16, _ = model(pcm)
    logitsf, _ = model(pcm.astype(np.float32) / 32768.0)
    np.testing.assert_allclose(
        np.asarray(logits16), np.asarray(logitsf), rtol=1e-5, atol=1e-5)


def test_other_integer_dtypes_rejected(model):
    # int32/int64 waveforms are ambiguous (PCM scale? indices?) — reject
    # instead of guessing a scale
    with pytest.raises(TypeError, match="ambiguous"):
        model(np.zeros(16000, dtype=np.int32))
