"""Trainer-model registry (parity with basicsr/models/__init__.py:19-30)."""

from copy import deepcopy

from ..utils.registry import MODEL_REGISTRY
from ..utils.logger import get_root_logger


def build_model(opt):
    from . import sr_model  # noqa: F401
    from . import srgan_model  # noqa: F401
    from . import esrgan_model  # noqa: F401
    from . import gfpgan_model  # noqa: F401
    from . import stylegan2_model  # noqa: F401
    from . import video_models  # noqa: F401
    from . import hifacegan_model  # noqa: F401
    opt = deepcopy(opt)
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    get_root_logger().info(
        f"Model [{model.__class__.__name__}] is created.")
    return model
