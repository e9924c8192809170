"""Plate detection engine — the TensorRT-engine equivalent.

One jitted graph: preprocess(−mean) → RetinaFace → prior decode → score
filter → batched NMS with landmark gather. Replaces the reference's
ONNX→TRT chain (convert_onnx.py, create_post_process.py, add_nms_plugin.py,
rlp/create_plugin C++/CUDA plugin, api_plate_oto.py TrtModel :196-330).

Defaults mirror the plugin attributes (add_nms_plugin.py:23-80):
scoreThreshold 0.4, iouThreshold 0.6, topK 200, keepTopK 20 and the
(104,117,123) BGR mean of the reference preprocess (api_plate_oto.py:98-105).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..archs import build_network
from .box_utils import decode, decode_landm, nms_jax
from .config import get_cfg
from .priors import prior_box

BGR_MEAN = (104.0, 117.0, 123.0)


class PlateDetector:
    """Callable detector over fixed-size (image_size²) BGR inputs."""

    def __init__(self, backbone: str = "Resnet18", image_size: int = 224,
                 ckpt_path: Optional[str] = None,
                 score_threshold: float = 0.4, iou_threshold: float = 0.6,
                 top_k: int = 200, keep_top_k: int = 20, dtype=None):
        self.cfg = get_cfg(backbone)
        self.image_size = image_size
        self.score_threshold = score_threshold
        self.net = build_network(dict(type="RetinaFace", backbone=backbone,
                                      out_channel=self.cfg["out_channel"],
                                      phase="test", dtype=dtype))
        dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        self.variables = jax.jit(
            lambda k, x: self.net.init(k, x, train=False))(
            jax.random.PRNGKey(0), dummy)
        if ckpt_path:
            self.load(ckpt_path)
        self.priors = jnp.asarray(prior_box(self.cfg,
                                            (image_size, image_size)))
        variances = jnp.asarray(self.cfg["variance"])

        def detect(variables, images):
            """images: (N,H,W,3) float BGR in [0,255]."""
            x = images - jnp.asarray(BGR_MEAN, images.dtype)
            loc, conf, landm = self.net.apply(variables, x, train=False)
            scores = conf[..., 1]

            def one(loc_i, score_i, landm_i):
                boxes = decode(loc_i, self.priors, variances)
                landms = decode_landm(landm_i, self.priors, variances)
                kb, ks, valid, order = nms_jax(
                    boxes, score_i, iou_threshold, top_k, score_threshold)
                kl = landm_i.shape[-1]
                klm = landms[order]
                kb = kb[:keep_top_k]
                ks = ks[:keep_top_k]
                klm = klm[:keep_top_k]
                valid = valid[:keep_top_k]
                return kb, ks, klm, valid

            return jax.vmap(one)(loc, scores, landm)

        self._detect = jax.jit(detect)

    # -------------------------------------------------------------- io

    def load(self, ckpt_path: str):
        if ckpt_path.endswith((".pth", ".pt", ".tar")):
            # strict importer with the FPN/SSH/head/MobileNet key rules
            from ..convert.retinaface_import import load_torch_retinaface
            self.variables = load_torch_retinaface(ckpt_path,
                                                   self.variables)
        else:
            import orbax.checkpoint as ocp
            import os.path as osp
            ckptr = ocp.StandardCheckpointer()
            self.variables = ckptr.restore(
                osp.abspath(ckpt_path),
                jax.tree.map(np.asarray, self.variables))

    # ------------------------------------------------------------ calls

    def __call__(self, images_bgr255: np.ndarray):
        """Batch detect. Returns (boxes[0..1], scores, landms[0..1], valid)."""
        out = self._detect(self.variables,
                           jnp.asarray(images_bgr255, jnp.float32))
        return tuple(np.asarray(o) for o in out)

    def detect_image(self, img_bgr: np.ndarray):
        """Full-size BGR uint8 image → detections in pixel coords.

        Mirrors api_plate_oto.py:220-245: resize to image_size², detect,
        scale boxes/landmarks back to the ORIGINAL image size.
        """
        import cv2
        h, w = img_bgr.shape[:2]
        inp = cv2.resize(img_bgr, (self.image_size, self.image_size),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32)
        boxes, scores, landms, valid = self(inp[None])
        boxes = boxes[0] * np.asarray([w, h, w, h], np.float32)
        landms = landms[0] * np.tile([w, h], 5).astype(np.float32)
        return boxes, scores[0], landms, valid[0]
