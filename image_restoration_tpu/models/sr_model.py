"""SRModel — L1/perceptual SR trainer.

Parity with basicsr/models/sr_model.py:15-209: pixel + perceptual losses,
EMA (:38-52), optimize_parameters (:91-118), validation with PSNR/SSIM
(:135-184). The optimization step is ONE jitted function over the data mesh;
when the dataset provides a device degradation pipeline, the LQ synthesis
runs inside the same jit (gt → degrade → forward → loss).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..metrics import calculate_metric
from ..utils.registry import MODEL_REGISTRY
from ..utils.img_util import tensor2img, imwrite
from .base_model import BaseModel


@MODEL_REGISTRY.register()
class SRModel(BaseModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_g = self.build_net("network_g")
        train_opt = opt.get("train", {})

        gt_size = opt.get("gt_size") or \
            (opt.get("datasets", {}).get("train", {}) or {}).get("gt_size",
                                                                 64)
        scale = opt.get("scale", 4)
        hw = getattr(self, "_hw", (gt_size, gt_size))  # rect-aware subclass
        example = jnp.zeros((1, hw[0] // scale, hw[1] // scale, 3),
                            jnp.float32)
        params = self.init_params(self.net_g, example)
        self.stats_g = self._init_stats  # BN running stats (e.g. DUF)

        # load pretrain (torch .pth import or orbax resume handled upstream)
        pre = opt["path"].get("pretrain_network_g")
        if pre and pre.endswith((".pth", ".pt")):
            params = self.load_pretrain_torch(
                self.net_g, opt["network_g"]["type"], params, pre,
                opt["path"].get("param_key_g", "params"))

        self.state = {"params_g": params, "ema_g": params, "iter": 0}
        self.ema_decay = (train_opt or {}).get("ema_decay", 0.999)

        if self.is_train:
            self.cri_pix = build_loss(train_opt["pixel_opt"]) if \
                train_opt.get("pixel_opt") else None
            self.cri_perceptual = build_loss(train_opt["perceptual_opt"]) \
                if train_opt.get("perceptual_opt") else None
            self.tx_g = self.make_optimizer("optim_g", params)
            self.state["opt_g"] = self.tx_g.init(params)
            self._init_qat(train_opt)
            self.state = self.replicate(self.state)
            self.degrade_fn = None  # set by set_degradation_pipeline
            self._train_step = None

    def _init_qat(self, train_opt):
        """Optional quantization-aware training (train.quant_opt) — the
        generator forward becomes the fake-quant twin of the int8 serving
        graph (ops/qat.py) and EMA activation scales ride the state."""
        raw = train_opt.get("quant_opt", None)
        if raw is None:
            self.quant_opt = None
            return
        # presence of the key enables QAT; store with defaults filled so
        # the flag stays truthy even for an empty `quant_opt:` mapping
        self.quant_opt = {"ema_decay": 0.99, **(raw or {})}
        if type(self)._build_train_step is not SRModel._build_train_step:
            # subclasses with their own step (SRGAN/ESRGAN/...) don't
            # thread the QAT scale state; reject rather than silently
            # training float
            raise ValueError(
                f"quant_opt is not supported by {type(self).__name__} "
                "(its train step does not thread the QAT scale state)")
        net_opt = self.opt["network_g"]
        if net_opt["type"] != "SRVGGNetCompact" or \
                net_opt.get("act_type", "prelu") != "prelu":
            raise ValueError(
                "quant_opt requires network_g: SRVGGNetCompact with "
                "act_type prelu (the int8 serving arch); got "
                f"type={net_opt['type']} "
                f"act_type={net_opt.get('act_type', 'prelu')}")
        self._qat_num_conv = net_opt.get("num_conv", 16)
        self._qat_upscale = net_opt.get("upscale", 4)
        self.state["qscale"] = jnp.zeros(self._qat_num_conv + 3,
                                         jnp.float32)

    def _g_forward(self):
        """The generator forward the train step differentiates: either the
        plain flax apply, or (under quant_opt) the fake-quant serving twin.
        Returns fn(params, lq, qscale) -> (out, batch_max-or-None)."""
        net_g = self.net_g
        if getattr(self, "quant_opt", None):
            from ..ops.qat import qat_srvgg_forward
            num_conv, upscale = self._qat_num_conv, self._qat_upscale
            # quant_opt.weight_bits: 8 = the int8 serving twin (default);
            # 4 trains w4a8 — the sub-8-bit regime where PTQ collapses
            bits = int(self.quant_opt.get("weight_bits", 8))
            if not 2 <= bits <= 8:
                raise ValueError(f"quant_opt.weight_bits={bits} — the "
                                 "fake-quant twin supports 2..8")
            qmax = 2 ** (bits - 1) - 1

            def fwd(params, lq, qscale):
                return qat_srvgg_forward(params, lq, qscale, num_conv,
                                         upscale, weight_qmax=qmax)
            return fwd

        def fwd(params, lq, qscale):
            out = net_g.apply({"params": params}, lq)
            if isinstance(out, tuple):
                out = out[0]
            return out, None
        return fwd

    def export_quantized(self, pack: int = 2, use_ema: bool = True):
        """QAT state -> the int8 serving pytree (ops/quantized_inference).
        Call after training with quant_opt enabled."""
        if not getattr(self, "quant_opt", None):
            raise RuntimeError(
                "export_quantized requires training with train.quant_opt "
                "(there are no learned activation scales to export); for "
                "a float model use the PTQ path "
                "(ops/quantized_inference.calibrate_srvgg_act_scales)")
        from ..ops.qat import export_int8
        params = self.state["ema_g" if use_ema else "params_g"]
        return export_int8(params, self.state["qscale"], self._qat_num_conv,
                           pack=pack)

    def _extra_loss(self):
        """Hook for subclass loss terms needing extra non-optimized state:
        return (state_key, fn(out, lq, extra_params) -> loss_dict), or
        None. Used by DistillModel (frozen-teacher loss) so one train-step
        implementation serves both trainers."""
        return None

    def set_degradation_pipeline(self, degrade_fn):
        self.degrade_fn = degrade_fn
        self._train_step = None

    # ------------------------------------------------------------- train

    def _build_train_step(self):
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        tx = self.tx_g
        ema_decay = self.ema_decay
        degrade = self.degrade_fn
        fwd = self._g_forward()
        qat = getattr(self, "quant_opt", None)
        qat_decay = (qat or {}).get("ema_decay", 0.99)
        extra = self._extra_loss()
        extra_key, extra_fn = extra if extra else (None, None)

        def loss_fn(params, extra_params, lq, gt, qscale):
            out, batch_max = fwd(params, lq, qscale)
            total = 0.0
            losses = {}
            if extra_fn is not None:
                for name, val in extra_fn(out, lq, extra_params).items():
                    total += val
                    losses[name] = val
            if cri_pix is not None:
                l_pix = cri_pix(out, gt)
                total += l_pix
                losses["l_pix"] = l_pix
            if cri_perceptual is not None:
                l_p, l_s = cri_perceptual(out, gt)
                if l_p is not None:
                    total += l_p
                    losses["l_percep"] = l_p
                if l_s is not None:
                    total += l_s
                    losses["l_style"] = l_s
            return total, (losses, batch_max)

        # optional static train-mask (EDVR TSA warmup): False leaves get
        # zero grads — trace-time constant, so the masked variant compiles
        # a graph with no backward work for frozen subtrees
        grad_mask = getattr(self, "_grad_mask_tree", None)

        @jax.jit
        def step(state, batch, rng):
            if degrade is not None:
                lq, gt = degrade(rng, batch["gt"])
            else:
                lq, gt = batch["lq"], batch["gt"]
            qscale = state.get("qscale")
            extra_params = state[extra_key] if extra_key else None
            (_, (losses, batch_max)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params_g"], extra_params,
                                       lq, gt, qscale)
            if grad_mask is not None:
                grads = jax.tree.map(
                    lambda g, m: g if m else jnp.zeros_like(g),
                    grads, grad_mask)
            updates, opt_g = tx.update(grads, state["opt_g"],
                                       state["params_g"])
            params = optax.apply_updates(state["params_g"], updates)
            ema = self.ema_update(state["ema_g"], params, ema_decay)
            new_state = dict(state, params_g=params, ema_g=ema,
                             opt_g=opt_g, iter=state["iter"] + 1)
            if qat:
                from ..ops.qat import update_qscale
                new_state["qscale"] = update_qscale(qscale, batch_max,
                                                    qat_decay)
            return new_state, losses

        return step

    def optimize_parameters(self, current_iter: int, batch, rng):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        batch = self.shard_batch(batch)
        self.state, losses = self._train_step(self.state, batch, rng)
        self.log_dict = self.reduce_loss_dict(losses)
        return self.log_dict

    # -------------------------------------------------------------- test

    def test(self, lq):
        if not hasattr(self, "_test_fn") or self._test_fn is None:
            self._test_uses_qat = bool(getattr(self, "quant_opt", None))
            if self._test_uses_qat:
                # validate what will be DEPLOYED: the fake-quant twin of
                # the int8 serving graph with the learned scales, so
                # checkpoint selection tracks the exported model, not the
                # drifting float net
                from ..ops.qat import qat_srvgg_forward
                nc, up = self._qat_num_conv, self._qat_upscale

                def _apply(p, x, qs):
                    return qat_srvgg_forward(p, x, qs, nc, up)[0]
            else:
                stats = getattr(self, "stats_g", None)

                def _apply(p, x):
                    variables = {"params": p}
                    if stats is not None:
                        variables["batch_stats"] = stats
                    return self.net_g.apply(variables, x)

            self._test_fn = jax.jit(_apply)
        ema = self.state.get("ema_g", self.state["params_g"])
        if getattr(self, "_test_uses_qat", False):
            out = self._test_fn(ema, jnp.asarray(lq), self.state["qscale"])
        else:
            out = self._test_fn(ema, jnp.asarray(lq))
        if isinstance(out, tuple):
            out = out[0]
        return out

    def validation(self, dataloader, current_iter: int, tb_logger=None,
                   save_img: bool = False):
        """Validation loop (ref sr_model.py:135-184).

        Multi-host: batches are rank-strided so each host evaluates a
        disjoint shard (the reference's video-model dist_validation policy,
        SURVEY §2.9); per-host means are psum-averaged at the end.
        """
        rank, world = jax.process_index(), jax.process_count()
        metrics_opt = (self.opt.get("val", {}) or {}).get("metrics", {})
        results = {name: [] for name in metrics_opt}
        min_max = self.opt.get("val", {}).get("min_max", (0, 1))
        for bi, batch in enumerate(dataloader):
            if world > 1 and bi % world != rank:
                continue
            if "lq" in batch:
                lq = batch["lq"]
            else:
                # degrade on device with a fixed key for determinism
                lq, _ = self.degrade_fn(jax.random.PRNGKey(0),
                                        jnp.asarray(batch["gt"]))
            out = np.asarray(self.test(lq))
            sr_img = tensor2img(out, min_max=min_max)
            if "gt" in batch:
                gt_img = tensor2img(batch["gt"], min_max=min_max)
                for name, m_opt in metrics_opt.items():
                    results[name].append(calculate_metric(
                        {"img": sr_img, "img2": gt_img}, m_opt))
            if save_img:
                path = batch.get("gt_path", batch.get("lq_path", ["img"]))[0]
                import os.path as osp
                name = osp.splitext(osp.basename(path))[0]
                dst = osp.join(self.opt["path"]["visualization"],
                               f"{name}_{current_iter}.png")
                imwrite(sr_img, dst)
        avg = {k: float(np.mean(v)) for k, v in results.items() if v}
        if world > 1:
            # average per-host shard means across processes
            from jax.experimental import multihost_utils
            vals = jnp.asarray([avg.get(k, 0.0) for k in metrics_opt])
            counts = jnp.asarray([float(bool(results.get(k)))
                                  for k in metrics_opt])
            summed = multihost_utils.process_allgather(
                jnp.stack([vals, counts]))
            tot = summed[:, 0].sum(0)
            cnt = jnp.maximum(summed[:, 1].sum(0), 1.0)
            avg = {k: float(tot[i] / cnt[i])
                   for i, k in enumerate(metrics_opt)}
        for name, val in avg.items():
            self.logger.info(f"Validation {name}: {val:.4f}")
            if tb_logger is not None:
                tb_logger.add_scalar(f"metrics/{name}", val, current_iter)
        return avg
