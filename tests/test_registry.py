"""Architecture registry: all 10 reference arch strings build correct configs
(reference: models/maest.py:64-153, 1151-1388)."""

import pytest

from maest_tpu.models.registry import ARCHS, build_config, list_architectures


def test_all_archs_present():
    assert len(ARCHS) == 10
    expected = {
        "passt_deit_bd_p16_384",
        "passt_s_swa_p16_128_ap476",
        "discogs-maest-5s-pw-129e",
        "discogs-maest-10s-fs-129e",
        "discogs-maest-10s-pw-129e",
        "discogs-maest-10s-dw-75e",
        "discogs-maest-20s-pw-129e",
        "discogs-maest-30s-pw-129e",
        "discogs-maest-30s-pw-73e-ts",
        "discogs-maest-30s-pw-129e-519l",
    }
    assert set(list_architectures()) == expected


@pytest.mark.parametrize("arch,input_t,n_classes", [
    ("discogs-maest-5s-pw-129e", 312, 400),
    ("discogs-maest-10s-fs-129e", 625, 400),
    ("discogs-maest-10s-pw-129e", 625, 400),
    ("discogs-maest-10s-dw-75e", 625, 400),
    ("discogs-maest-20s-pw-129e", 1250, 400),
    ("discogs-maest-30s-pw-129e", 1875, 400),
    ("discogs-maest-30s-pw-73e-ts", 1875, 400),
    ("discogs-maest-30s-pw-129e-519l", 1875, 519),
])
def test_discogs_arch_geometry(arch, input_t, n_classes):
    cfg = build_config(arch)
    assert cfg.img_size == (96, input_t)
    assert cfg.num_classes == n_classes
    assert cfg.stride == (10, 10)
    assert (cfg.embed_dim, cfg.depth, cfg.num_heads) == (768, 12, 12)
    assert cfg.distilled
    # token counts from SURVEY §2.1 (grid = img // stride, +2 tokens)
    grid_f, grid_t = cfg.grid_size
    assert grid_f == 9


def test_519_forced():
    cfg = build_config("discogs-maest-30s-pw-129e-519l", n_classes=400)
    assert cfg.num_classes == 519  # forced (reference: models/maest.py:1377-1379)


def test_unknown_arch_raises():
    with pytest.raises(NotImplementedError):
        build_config("no-such-model")


def test_sequence_lengths():
    # SURVEY §2.1: 5s: (9,31); 10s: (9,62); 20s: (9,125); 30s: (9,187)
    for arch, gt in [("discogs-maest-5s-pw-129e", 31),
                     ("discogs-maest-10s-pw-129e", 62),
                     ("discogs-maest-20s-pw-129e", 125),
                     ("discogs-maest-30s-pw-129e", 187)]:
        assert build_config(arch).grid_size == (9, gt)
