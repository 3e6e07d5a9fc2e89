"""maest_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities
of palonso/MAEST: audio spectrogram transformers for music tagging and
representation learning.

Public surface mirrors the reference package (``from maest import get_maest``,
reference: models/__init__.py:1) under the new name::

    from maest_tpu import get_maest
    model = get_maest(arch="discogs-maest-30s-pw-129e")
    activations, labels = model.predict_labels(waveform)
"""

from .api import MAEST, get_maest
from .labels import DISCOGS_400_LABELS, DISCOGS_519_LABELS, labels_for
from .models.config import MAESTConfig
from .models.registry import ARCHS, build_config, list_architectures

__version__ = "0.1.0"

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
    "__version__",
]
