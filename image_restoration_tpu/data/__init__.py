"""Data layer: on-device degradation synthesis + host-side loading."""

from copy import deepcopy

from ..utils.registry import DATASET_REGISTRY
from .loader import build_dataloader, DataLoader, EnlargedSampler  # noqa: F401


def build_dataset(opt):
    """Instantiate a dataset from a config dict (ref data/__init__.py:26-40)."""
    from . import datasets  # noqa: F401  (registration)
    from . import video_datasets  # noqa: F401
    opt = deepcopy(opt)
    dataset_type = opt.pop("type")
    return DATASET_REGISTRY.get(dataset_type)(opt)
