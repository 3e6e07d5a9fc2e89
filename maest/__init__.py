"""Drop-in import alias for code written against the reference package.

The reference installs its model code as the ``maest`` package
(reference: pyproject.toml:34-38 maps ``maest`` -> models/), so existing
user code does ``from maest import get_maest``. That line works unchanged
against the TPU-native build through this alias; new code should import
``maest_tpu`` directly.
"""

from maest_tpu import (  # noqa: F401
    ARCHS,
    DISCOGS_400_LABELS,
    DISCOGS_519_LABELS,
    MAEST,
    MAESTConfig,
    build_config,
    get_maest,
    labels_for,
    list_architectures,
)

__all__ = [
    "ARCHS",
    "DISCOGS_400_LABELS",
    "DISCOGS_519_LABELS",
    "MAEST",
    "MAESTConfig",
    "build_config",
    "get_maest",
    "labels_for",
    "list_architectures",
]
