"""Trainer-model registry (parity with basicsr/models/__init__.py:19-30)."""

from copy import deepcopy

from ..utils.registry import MODEL_REGISTRY
from ..utils.logger import get_root_logger


def register_all_models():
    """Import every trainer module so MODEL_REGISTRY is fully populated
    (deferred to avoid import cycles at package-import time)."""
    from . import sr_model  # noqa: F401
    from . import distill_model  # noqa: F401
    from . import srgan_model  # noqa: F401
    from . import esrgan_model  # noqa: F401
    from . import gfpgan_model  # noqa: F401
    from . import stylegan2_model  # noqa: F401
    from . import video_models  # noqa: F401
    from . import hifacegan_model  # noqa: F401


def build_model(opt):
    register_all_models()
    opt = deepcopy(opt)
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    get_root_logger().info(
        f"Model [{model.__class__.__name__}] is created.")
    return model
