"""Utilities: profiling, parameter counting, compilation cache."""

from .cache import enable_compilation_cache  # noqa: F401
from .params import count_non_zero_params, count_params  # noqa: F401
from .profiling import StepTimer, force, trace  # noqa: F401
from .shapes import round_up  # noqa: F401
