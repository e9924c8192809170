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
        # frame-windowed nets (EDVR) fix num_frame in the arch; recurrent
        # nets take any T, so fall back to the train-dataset window
        self._num_frame = (opt.get("network_g", {}).get("num_frame")
                           or (opt.get("datasets", {}).get("train", {})
                               or {}).get("num_frame", 5))
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
            gt_arr = np.asarray(batch["gt"])
            if out.ndim == 5:  # recurrent whole-clip output
                if gt_arr.ndim == 5:  # clip gt: score the center frame
                    gt_arr = gt_arr[:, gt_arr.shape[1] // 2]
                out = out[:, out.shape[1] // 2]
            sr = tensor2img(out)
            gt = tensor2img(gt_arr)
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


def _path_mask(tree, pred):
    """Bool pytree: pred(path tuple) per leaf (the requires_grad analog)."""
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return pred(path)
    return walk(tree, ())


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):
    """EDVR trainer — TSA warmup + dcn_lr_mul (ref edvr_model.py:9-67).

    Warmup (:50-60): iters 1..tsa_iter-1 train ONLY the `fusion` subtree
    (the reference flips requires_grad; here a static grad mask selects one
    of two compiled step graphs — the warmup graph has no backward work
    for frozen subtrees at all). dcn_lr_mul (:21-44): updates of params
    whose path contains 'dcn' are scaled via an optax mask.
    """

    def __init__(self, opt: dict):
        self.train_tsa_iter = (opt.get("train", {}) or {}).get(
            "tsa_iter", 0) or 0
        self._tsa_phase = False
        super().__init__(opt)

    def make_optimizer(self, key, params, frozen_prefix=None, lr_scale=1.0,
                       betas=(0.9, 0.999)):
        tx = super().make_optimizer(key, params, frozen_prefix, lr_scale,
                                    betas)
        dcn_lr_mul = (self.opt.get("train", {}) or {}).get("dcn_lr_mul", 1)
        if dcn_lr_mul == 1:
            return tx
        mask = _path_mask(params,
                          lambda p: any("dcn" in seg for seg in p))
        return optax.chain(tx, optax.masked(optax.scale(dcn_lr_mul), mask))

    def optimize_parameters(self, current_iter: int, batch, rng):
        warm = bool(self.train_tsa_iter) and \
            current_iter < self.train_tsa_iter
        if warm != self._tsa_phase:
            self._tsa_phase = warm
            if warm:
                self.logger.info("Only train TSA module for "
                                 f"{self.train_tsa_iter} iters.")
                params = jax.device_get(self.state["params_g"])
                self._grad_mask_tree = _path_mask(
                    params, lambda p: any("fusion" in seg for seg in p))
            else:
                self.logger.warning("Train all the parameters.")
                self._grad_mask_tree = None
            self._train_step = None  # retrace with the new mask
        return super().optimize_parameters(current_iter, batch, rng)


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
