"""DistillModel — frozen-teacher knowledge distillation trainer.

Framework extension (no reference analog): the measured RRDB serving
study (docs/PERFORMANCE.md "RRDB kernel study") concluded that the
dense-block growth widths cap RRDBNet-23 at ~3.1 tiles/s on the MXU and
that the remaining headroom is "a fundamentally different serving
strategy (e.g. distillation to a wide-channel student like SRVGG)".
This trainer implements that strategy: a frozen teacher (e.g. RRDBNet,
ref basicsr/archs/rrdbnet_arch.py:66-119) supervises a student (e.g.
SRVGGNetCompact, the 222 tiles/s serving arch) through the same
on-device degradation pipeline the SR trainers use.

Losses (all optional except distill_opt):
  * ``distill_opt``      — student output vs stop_gradient(teacher(lq))
  * ``pixel_opt``        — student output vs GT (inherited semantics,
                           ref basicsr/models/sr_model.py:91-118)
  * ``perceptual_opt``   — VGG perceptual/style vs GT (inherited)

The teacher's params ride in ``state['params_t']`` so they enter the
jitted step as an ARGUMENT (never a closure constant — see
docs/TRAINING.md on the axon constant-embedding miscompile) but are
excluded from the optimizer and the EMA; they are bit-frozen across
steps. ``network_t`` may set ``dtype: bf16`` independently of the
student for a cheaper teacher forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..utils.registry import MODEL_REGISTRY
from .sr_model import SRModel


@MODEL_REGISTRY.register()
class DistillModel(SRModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_t = self.build_net("network_t")

        gt_size = opt.get("gt_size") or \
            (opt.get("datasets", {}).get("train", {}) or {}).get("gt_size",
                                                                 64)
        scale = opt.get("scale", 4)
        example = jnp.zeros((1, gt_size // scale, gt_size // scale, 3),
                            jnp.float32)
        params_t = self.init_params(self.net_t, example)

        pre_t = opt["path"].get("pretrain_network_t")
        if pre_t and pre_t.endswith((".pth", ".pt")):
            params_t = self.load_pretrain_torch(
                self.net_t, opt["network_t"]["type"], params_t, pre_t,
                opt["path"].get("param_key_t", "params"))

        self.state["params_t"] = params_t
        self.state = self.replicate(self.state)

        if self.is_train:
            train_opt = opt.get("train", {})
            self.cri_distill = build_loss(train_opt["distill_opt"])

    def set_teacher_params(self, params_t):
        """Install teacher weights programmatically (e.g. the live
        ``state['ema_g']`` of a just-trained SRModel)."""
        self.state["params_t"] = params_t
        self.state = self.replicate(self.state)
        self._train_step = None

    # ------------------------------------------------------------- train

    def _build_train_step(self):
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        cri_distill = self.cri_distill
        tx = self.tx_g
        ema_decay = self.ema_decay
        degrade = self.degrade_fn
        net_t = self.net_t
        fwd = self._g_forward()  # plain apply, or fake-quant under quant_opt
        qat = getattr(self, "quant_opt", None)
        qat_decay = (qat or {}).get("ema_decay", 0.99)

        def loss_fn(params, params_t, lq, gt, qscale):
            out, batch_max = fwd(params, lq, qscale)
            t_out = net_t.apply({"params": params_t}, lq)
            if isinstance(t_out, tuple):
                t_out = t_out[0]
            t_out = jax.lax.stop_gradient(t_out.astype(out.dtype))
            total = 0.0
            losses = {}
            l_distill = cri_distill(out, t_out)
            total += l_distill
            losses["l_distill"] = l_distill
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

        @jax.jit
        def step(state, batch, rng):
            if degrade is not None:
                lq, gt = degrade(rng, batch["gt"])
            else:
                lq, gt = batch["lq"], batch["gt"]
            qscale = state.get("qscale")
            (_, (losses, batch_max)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params_g"],
                                       state["params_t"], lq, gt, qscale)
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
