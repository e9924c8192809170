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
        # nets take any T, so fall back to any dataset's window — train
        # first, then test phases (test-only configs have no train block).
        # num_frame -1 = "whole clip" for recurrent datasets — init the
        # params with a 7-frame example, the step retraces per real T.
        self._num_frame = opt.get("network_g", {}).get("num_frame")
        if not self._num_frame:
            dsets = opt.get("datasets", {}) or {}
            for phase in [dsets.get("train", {})] + [
                    v for k, v in sorted(dsets.items()) if k != "train"]:
                if (phase or {}).get("num_frame"):
                    self._num_frame = phase["num_frame"]
                    break
        if not self._num_frame or self._num_frame < 1:
            self._num_frame = 7
        super().__init__(opt)

    _min_init_hw = 1  # SpyNet-based subclasses need a deeper pyramid

    def init_params(self, net, example, **kw):
        # video nets take (N,T,h,w,3); params are shape-independent, so the
        # example only needs to satisfy the arch's minimum spatial extent
        t = self._num_frame
        h = max(example.shape[1], self._min_init_hw)
        w = max(example.shape[2], self._min_init_hw)
        example = jnp.zeros((1, t, h, w) + example.shape[3:],
                            example.dtype)
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
    the flow network (spynet) trains at `flow_lr_mul` × base lr, is frozen
    for the first `fix_flow` iters (:53-62), and eval supports sequence
    flip-averaging + center-frame-only scoring (:175-190)."""

    _min_init_hw = 64  # SpyNet's 5-level pyramid needs ≥2px at the top

    def __init__(self, opt: dict):
        self.fix_flow_iter = (opt.get("train", {}) or {}).get("fix_flow") \
            or 0
        self._flow_frozen = False
        super().__init__(opt)

    def optimize_parameters(self, current_iter: int, batch, rng):
        frozen = bool(self.fix_flow_iter) and \
            current_iter < self.fix_flow_iter
        if frozen != self._flow_frozen:
            self._flow_frozen = frozen
            if frozen:
                self.logger.info("Fix flow network and feature extractor "
                                 f"for {self.fix_flow_iter} iters.")
                params = jax.device_get(self.state["params_g"])
                # train everything EXCEPT spynet/edvr subtrees (ref :57-59)
                self._grad_mask_tree = _path_mask(
                    params, lambda p: not any(
                        "spynet" in seg or "edvr" in seg for seg in p))
            else:
                self.logger.warning("Train all the parameters.")
                self._grad_mask_tree = None
            self._train_step = None  # retrace with the new mask
        return super().optimize_parameters(current_iter, batch, rng)

    def test(self, lq):
        val_opt = self.opt.get("val", {}) or {}
        flip_seq = val_opt.get("flip_seq", False)
        center_frame_only = val_opt.get("center_frame_only", False)
        n = lq.shape[1]
        if flip_seq:  # mirror-extend the clip, average both passes
            lq = jnp.concatenate([lq, lq[:, ::-1]], axis=1)
        out = super().test(lq)
        if flip_seq:
            out = 0.5 * (out[:, :n] + out[:, n:][:, ::-1])
        if center_frame_only:
            out = out[:, n // 2]
        return out

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
