"""Reference-import compatibility: `from maest import get_maest` works."""


def test_reference_import_path():
    from maest import MAEST, get_maest

    m = get_maest(arch="discogs-maest-30s-pw-129e", pretrained=False,
                  embed_dim=64, depth=2, num_heads=4, input_t=62)
    assert isinstance(m, MAEST)


def test_forward_alias_matches_call():
    """Reference user code calls model.forward(x) (torch idiom,
    models/maest.py:831) — it must behave exactly like model(x)."""
    import numpy as np

    from maest import get_maest

    m = get_maest(arch="discogs-maest-30s-pw-129e", pretrained=False,
                  embed_dim=64, depth=2, num_heads=4, input_t=62)
    x = np.random.default_rng(0).standard_normal((96, 62)).astype("float32")
    a = m(x, melspectrogram_input=True)
    b = m.forward(x, melspectrogram_input=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
