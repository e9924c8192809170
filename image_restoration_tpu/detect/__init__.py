"""License-plate detector (RetinaFace-style, 5 landmarks) — TPU-native.

Replaces the entire Plate_Detect stack (SURVEY §2.8): the PyTorch training
code, the ONNX→TensorRT export chain, and the C++/CUDA batched-NMS plugin.
On TPU the "engine" is an AOT-jitted function: backbone → FPN → SSH → heads
→ prior decode → score filter → NMS, all inside one compiled graph
(detect/engine.py).
"""

from .config import cfg_mnet, cfg_re50, cfg_re18, get_cfg
from .priors import prior_box
from .box_utils import decode, decode_landm, encode, encode_landm, nms_jax

__all__ = ["cfg_mnet", "cfg_re50", "cfg_re18", "get_cfg", "prior_box",
           "decode", "decode_landm", "encode", "encode_landm", "nms_jax"]
