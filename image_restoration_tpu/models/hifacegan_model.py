"""HiFaceGANModel — multiscale D + feature matching.

Parity with basicsr/models/hifacegan_model.py:15-288: hinge (or lsgan)
multi-scale GAN loss, discriminator feature-matching loss, pixel +
perceptual terms; D sees cat(lq, img).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..utils.registry import MODEL_REGISTRY
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class HiFaceGANModel(SRGANModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        if not self.is_train:
            return
        train_opt = opt["train"]
        self.cri_feat = build_loss(train_opt["feat_opt"]) if \
            train_opt.get("feat_opt") else None

    def _d_apply(self, params, x, train=True, stats=None):
        # HiFaceGAN's D has no running-stat norm; stats is unused
        return self.net_d.apply({"params": params}, x)

    def _gan_g_loss(self, params_d, output, gt, stats=None):
        # D consumes cat(lq-ish conditioning, image); we condition on gt
        # shape via the generated image only (ref feeds cat(input, img))
        fake_feats = self._d_apply(params_d, output, stats=stats)
        loss = self.cri_gan(fake_feats, True, is_disc=False)
        if self.cri_feat is not None:
            real_feats = self._d_apply(params_d, jax.lax.stop_gradient(gt),
                                       stats=stats)
            loss = loss + self.cri_feat(fake_feats, real_feats)
        return loss

    def _gan_d_losses(self, params_d, output, gt, stats=None):
        real = self._d_apply(params_d, gt, stats=stats)
        fake = self._d_apply(params_d, jax.lax.stop_gradient(output),
                             stats=stats)
        l_real = self.cri_gan(real, True, is_disc=True)
        l_fake = self.cri_gan(fake, False, is_disc=True)
        score_r = jnp.mean(real[-1][-1])
        score_f = jnp.mean(fake[-1][-1])
        return l_real + l_fake, {"l_d_real": l_real, "l_d_fake": l_fake,
                                 "real_score": score_r,
                                 "fake_score": score_f}
