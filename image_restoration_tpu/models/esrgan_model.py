"""ESRGANModel — relativistic average GAN.

Parity with basicsr/models/esrgan_model.py:9-83: G loss uses
(real − E[fake]) / (fake − E[real]) relativistic logits (:37-48); D updates
real and fake halves separately (:64-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.registry import MODEL_REGISTRY
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class ESRGANModel(SRGANModel):
    def _gan_g_loss(self, params_d, output, gt, stats=None):
        real_pred = jax.lax.stop_gradient(self._d_apply(params_d, gt, stats=stats))
        fake_pred = self._d_apply(params_d, output, stats=stats)
        l_real = self.cri_gan(real_pred - jnp.mean(fake_pred), False,
                              is_disc=False)
        l_fake = self.cri_gan(fake_pred - jnp.mean(real_pred), True,
                              is_disc=False)
        return (l_real + l_fake) / 2

    def _gan_d_losses(self, params_d, output, gt, stats=None):
        fake_detached = jax.lax.stop_gradient(output)
        real_pred = self._d_apply(params_d, gt, stats=stats)
        fake_pred = self._d_apply(params_d, fake_detached, stats=stats)
        l_real = self.cri_gan(
            real_pred - jnp.mean(jax.lax.stop_gradient(fake_pred)), True,
            is_disc=True) * 0.5
        l_fake = self.cri_gan(
            fake_pred - jnp.mean(jax.lax.stop_gradient(real_pred)), False,
            is_disc=True) * 0.5
        return l_real + l_fake, {"l_d_real": l_real, "l_d_fake": l_fake,
                                 "real_score": jnp.mean(real_pred),
                                 "fake_score": jnp.mean(fake_pred)}
