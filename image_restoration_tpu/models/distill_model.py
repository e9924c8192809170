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
        if pre_t:
            import os
            if pre_t.endswith((".pth", ".pt")):
                params_t = self.load_pretrain_torch(
                    self.net_t, opt["network_t"]["type"], params_t, pre_t,
                    opt["path"].get("param_key_t", "params"))
            elif os.path.isdir(pre_t):
                # orbax checkpoint dir of an in-framework teacher run
                import os.path as osp
                import orbax.checkpoint as ocp
                restored = ocp.StandardCheckpointer().restore(
                    osp.abspath(pre_t))
                key = opt["path"].get("param_key_t", "params")
                params_t = restored.get(
                    "ema_g" if key in ("params_ema", "ema_g") else
                    "params_g") or restored["params_g"]
            else:
                raise ValueError(
                    f"pretrain_network_t={pre_t!r} is neither a torch "
                    ".pth/.pt file nor an orbax checkpoint dir — refusing "
                    "to distill from a random-init teacher")

        # a falsy path (None / ~ / "") means no teacher was configured;
        # _extra_loss refuses to build a train step until one is
        # installed (set_teacher_params), so a 200k-iter run can never
        # silently distill toward a random-init teacher's noise.
        # train.allow_random_teacher opts out explicitly (smoke tests).
        self._teacher_loaded = bool(pre_t)
        if not self._teacher_loaded and \
                opt.get("train", {}).get("allow_random_teacher"):
            self.logger.warning(
                "DistillModel: allow_random_teacher is set — training "
                "against a RANDOM-INIT teacher (smoke-test mode)")
            self._teacher_loaded = True

        self.state["params_t"] = params_t
        self.state = self.replicate(self.state)

        if self.is_train:
            train_opt = opt.get("train", {})
            if "distill_opt" not in train_opt:
                raise ValueError(
                    "DistillModel requires train.distill_opt (the "
                    "teacher-supervision loss)")
            self.cri_distill = build_loss(train_opt["distill_opt"])

    def _transient_state_keys(self):
        # the frozen teacher is reconstructed by __init__ from
        # pretrain_network_t; re-serializing its bit-identical tree on
        # every save would add ~67 MB (RRDB-23) per checkpoint
        return ("params_t",)

    def set_teacher_params(self, params_t):
        """Install teacher weights programmatically (e.g. the live
        ``state['ema_g']`` of a just-trained SRModel)."""
        self.state["params_t"] = params_t
        self.state = self.replicate(self.state)
        self._teacher_loaded = True
        self._train_step = None

    # ------------------------------------------------------------- train

    def _extra_loss(self):
        """SRModel train-step hook: the teacher term. The teacher params
        live in state['params_t'] and enter the jitted step as an
        ARGUMENT; stop_gradient keeps them bit-frozen."""
        if not self._teacher_loaded:
            raise ValueError(
                "DistillModel has no teacher weights: set "
                "path.pretrain_network_t (a torch .pth/.pt or an orbax "
                "checkpoint dir) or call set_teacher_params() before "
                "training — refusing to distill from a random-init "
                "teacher")
        cri_distill, net_t = self.cri_distill, self.net_t

        def fn(out, lq, params_t):
            t_out = net_t.apply({"params": params_t}, lq)
            if isinstance(t_out, tuple):
                t_out = t_out[0]
            t_out = jax.lax.stop_gradient(t_out.astype(out.dtype))
            return {"l_distill": cri_distill(out, t_out)}

        return "params_t", fn
