"""SRGANModel — SR + adversarial training.

Parity with basicsr/models/srgan_model.py:12-143: pixel + perceptual + GAN
losses, alternating G/D with net_d_iters / net_d_init_iters. G and D updates
are two jitted functions sharing the synthesized batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..utils.registry import MODEL_REGISTRY
from .sr_model import SRModel


@MODEL_REGISTRY.register()
class SRGANModel(SRModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        if not self.is_train:
            return
        train_opt = opt["train"]
        self.net_d = self.build_net("network_d")
        gt_size = opt.get("gt_size") or \
            (opt.get("datasets", {}).get("train", {}) or {}).get("gt_size",
                                                                 128)
        example = jnp.zeros((1, gt_size, gt_size, 3), jnp.float32)
        params_d = self.init_params(self.net_d, example)
        self.cri_gan = build_loss(train_opt["gan_opt"])
        self.net_d_iters = train_opt.get("net_d_iters", 1)
        self.net_d_init_iters = train_opt.get("net_d_init_iters", 0)
        self.tx_d = self.make_optimizer("optim_d", params_d)
        extra = {"params_d": params_d, "opt_d": self.tx_d.init(params_d)}
        self.state = dict(self.state, **self.replicate(extra))

    def _d_apply(self, params, x, train=True):
        out = self.net_d.apply({"params": params}, x)
        if isinstance(out, tuple):
            out = out[0]
        return out

    def _gan_g_loss(self, params_d, output, gt):
        fake_pred = self._d_apply(params_d, output)
        return self.cri_gan(fake_pred, True, is_disc=False)

    def _gan_d_losses(self, params_d, output, gt):
        real = self._d_apply(params_d, gt)
        fake = self._d_apply(params_d, jax.lax.stop_gradient(output))
        l_real = self.cri_gan(real, True, is_disc=True)
        l_fake = self.cri_gan(fake, False, is_disc=True)
        return l_real + l_fake, {"l_d_real": l_real, "l_d_fake": l_fake,
                                 "real_score": jnp.mean(real),
                                 "fake_score": jnp.mean(fake)}

    def _build_train_step(self):
        tx_g, tx_d = self.tx_g, self.tx_d
        degrade = self.degrade_fn
        cri_pix, cri_perceptual = self.cri_pix, self.cri_perceptual

        def g_loss(params_g, params_d, lq, gt):
            out = self.net_g.apply({"params": params_g}, lq)
            if isinstance(out, tuple):
                out = out[0]
            total = 0.0
            losses = {}
            if cri_pix is not None:
                l_pix = cri_pix(out, gt)
                total += l_pix
                losses["l_g_pix"] = l_pix
            if cri_perceptual is not None:
                l_p, l_s = cri_perceptual(out, gt)
                if l_p is not None:
                    total += l_p
                    losses["l_g_percep"] = l_p
                if l_s is not None:
                    total += l_s
                    losses["l_g_style"] = l_s
            l_gan = self._gan_g_loss(params_d, out, gt)
            total += l_gan
            losses["l_g_gan"] = l_gan
            return total, (losses, out)

        @jax.jit
        def step(state, batch, rng, update_g):
            if degrade is not None:
                lq, gt = degrade(rng, batch["gt"])
            else:
                lq, gt = batch["lq"], batch["gt"]
            (_, (losses, out)), grads = jax.value_and_grad(
                g_loss, has_aux=True)(state["params_g"], state["params_d"],
                                      lq, gt)
            # gate the G update on net_d_iters / net_d_init_iters
            grads = jax.tree.map(lambda g: g * update_g, grads)
            updates, opt_g = tx_g.update(grads, state["opt_g"],
                                         state["params_g"])
            params_g = optax.apply_updates(state["params_g"], updates)
            ema = self.ema_update(state["ema_g"], params_g, self.ema_decay)

            (l_d, d_losses), d_grads = jax.value_and_grad(
                lambda pd: self._gan_d_losses(pd, out, gt),
                has_aux=True)(state["params_d"])
            d_updates, opt_d = tx_d.update(d_grads, state["opt_d"],
                                           state["params_d"])
            params_d = optax.apply_updates(state["params_d"], d_updates)
            losses.update(d_losses)
            losses["l_d"] = l_d
            new_state = dict(state, params_g=params_g, ema_g=ema,
                             opt_g=opt_g, params_d=params_d, opt_d=opt_d,
                             iter=state["iter"] + 1)
            return new_state, losses

        def stepper(state, batch, rng):
            it = int(state["iter"])
            update_g = float(it % self.net_d_iters == 0
                             and it > self.net_d_init_iters)
            return step(state, batch, rng, jnp.float32(update_g))

        return stepper
