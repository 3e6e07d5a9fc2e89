from .config import MAESTConfig
from .registry import ARCHS, build_config, list_architectures
from .vit import MAESTNet, init_params

__all__ = ["ARCHS", "MAESTConfig", "MAESTNet", "build_config", "init_params",
           "list_architectures"]
