"""Reference-import compatibility: `from maest import get_maest` works."""


def test_reference_import_path():
    from maest import MAEST, get_maest

    m = get_maest(arch="discogs-maest-30s-pw-129e", pretrained=False,
                  embed_dim=64, depth=2, num_heads=4, input_t=62)
    assert isinstance(m, MAEST)
