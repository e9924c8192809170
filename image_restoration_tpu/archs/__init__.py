"""Architecture registry + builder.

Parity with reference archs/__init__.py:19-25 (`build_network`): networks are
registered into ARCH_REGISTRY by decorator and instantiated from the `type:`
key of a config dict. All *_arch modules are imported here so registration is
complete after `import image_restoration_tpu.archs`.
"""

from copy import deepcopy

import jax.numpy as jnp

from ..utils.registry import ARCH_REGISTRY

from . import arch_util  # noqa: F401
from . import rrdbnet_arch  # noqa: F401
from . import srresnet_arch  # noqa: F401
from . import srvgg_arch  # noqa: F401
from . import edsr_arch  # noqa: F401
from . import rcan_arch  # noqa: F401
from . import stylegan2_arch  # noqa: F401
from . import gfpgan_ocr_arch  # noqa: F401
from . import gfpganv1_arch  # noqa: F401
from . import ridnet_arch  # noqa: F401
from . import discriminator_arch  # noqa: F401
from . import vgg_arch  # noqa: F401
from . import retinaface_arch  # noqa: F401
from . import spynet_arch  # noqa: F401
from . import edvr_arch  # noqa: F401
from . import basicvsr_arch  # noqa: F401
from . import duf_arch  # noqa: F401
from . import hifacegan_arch  # noqa: F401
from . import dfdnet_arch  # noqa: F401
from . import inception_arch  # noqa: F401
from . import tof_arch  # noqa: F401
from . import iresnet_arch  # noqa: F401


def build_network(opt):
    """Instantiate a flax module from a config dict with a `type:` key.

    Accepts the reference's square `out_size` spelling for the rectangle-
    aware StyleGAN archs (mapped to input_width == input_height), and list
    values for tuple-typed fields.
    """
    opt = deepcopy(opt)
    network_type = opt.pop("type")
    cls = ARCH_REGISTRY.get(network_type)
    fields = getattr(cls, "__dataclass_fields__", {})
    if ("out_size" in opt and "out_size" not in fields
            and "input_width" in fields):
        size = opt.pop("out_size")
        opt.setdefault("input_width", size)
        opt.setdefault("input_height", size)
    if "syncbn" in opt and "syncbn" not in fields:
        # Under pjit the whole (sharded) batch feeds one traced BatchNorm,
        # so batch stats are already global — SyncBN is inherent. The
        # axis_name field only matters for shard_map/pmap trainers.
        opt.pop("syncbn")
    if isinstance(opt.get("dtype"), str):
        # YAML spells dtypes as strings ("bf16", "float32"); flax modules
        # want jnp dtypes.
        try:
            opt["dtype"] = _DTYPE_ALIASES[opt["dtype"]]
        except KeyError:
            raise ValueError(
                f"unknown dtype {opt['dtype']!r} for network type "
                f"{network_type!r}; valid spellings: "
                f"{sorted(_DTYPE_ALIASES)}") from None
    opt = {k: tuple(v) if isinstance(v, list) else v
           for k, v in opt.items()}
    return cls(**opt)


_DTYPE_ALIASES = {
    "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
    "f32": jnp.float32, "float32": jnp.float32, "fp32": jnp.float32,
    "f16": jnp.float16, "float16": jnp.float16, "fp16": jnp.float16,
}
