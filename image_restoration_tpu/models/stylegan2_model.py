"""StyleGAN2Model — pure generative pretraining of the decoder.

Parity with basicsr/models/stylegan2_model.py:18-282: non-saturating
logistic GAN, R1 every `net_d_reg_every`, path-length regularization every
`net_g_reg_every`, style mixing prob 0.9, EMA.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..losses.losses import r1_penalty, g_path_regularize
from ..utils.registry import MODEL_REGISTRY
from .base_model import BaseModel


@MODEL_REGISTRY.register()
class StyleGAN2Model(BaseModel):
    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_g = self.build_net("network_g")
        self.num_style_feat = opt["network_g"].get("num_style_feat", 512)
        h = opt["network_g"].get("input_height",
                                 opt["network_g"].get("out_size", 256))
        w = opt["network_g"].get("input_width", h)
        self._hw = (h, w)
        z = jnp.zeros((1, self.num_style_feat), jnp.float32)
        params_g = jax.jit(lambda k, s: self.net_g.init(k, [s]))(
            jax.random.PRNGKey(0), z)["params"]
        self.state = {"params_g": params_g, "ema_g": params_g, "iter": 0,
                      "mean_path_length": jnp.zeros(())}
        if not self.is_train:
            return
        train_opt = opt["train"]
        self.net_d = self.build_net("network_d")
        params_d = self.init_params(self.net_d,
                                    jnp.zeros((1, h, w, 3), jnp.float32))
        self.cri_gan = build_loss(train_opt["gan_opt"])
        self.r1_reg_weight = train_opt.get("r1_reg_weight", 10.0)
        self.path_reg_weight = train_opt.get("path_reg_weight", 2.0)
        self.net_g_reg_every = train_opt.get("net_g_reg_every", 4)
        self.net_d_reg_every = train_opt.get("net_d_reg_every", 16)
        self.mixing_prob = train_opt.get("mixing_prob", 0.9)
        self.ema_decay = 0.5 ** (32 / (10 * 1000))

        rg = self.net_g_reg_every / (self.net_g_reg_every + 1)
        rd = self.net_d_reg_every / (self.net_d_reg_every + 1)
        self.tx_g = self.make_optimizer("optim_g", params_g, lr_scale=rg,
                                        betas=(0.0 ** rg, 0.99 ** rg))
        self.tx_d = self.make_optimizer("optim_d", params_d, lr_scale=rd,
                                        betas=(0.0 ** rd, 0.99 ** rd))
        self.state = self.replicate(dict(
            self.state, opt_g=self.tx_g.init(params_g),
            params_d=self.replicate(params_d),
            opt_d=self.tx_d.init(params_d)))
        self._step = None

    def _noise(self, rng, batch):
        k1, k2, k3 = jax.random.split(rng, 3)
        z1 = jax.random.normal(k1, (batch, self.num_style_feat))
        z2 = jax.random.normal(k2, (batch, self.num_style_feat))
        mix = jax.random.bernoulli(k3, self.mixing_prob)
        return z1, z2, mix

    def _g_apply(self, pg, styles, noise_rng):
        img, _ = self.net_g.apply({"params": pg}, styles,
                                  rngs={"noise": noise_rng})
        return img

    def _build_step(self):
        tx_g, tx_d = self.tx_g, self.tx_d
        net_d = self.net_d

        @jax.jit
        def step(state, real, rng):
            batch = real.shape[0]
            kz, kn, kz2, kn2 = jax.random.split(rng, 4)
            z1, z2, mix = self._noise(kz, batch)

            # ---- D step
            def d_loss(pd):
                fake = self._g_apply(state["params_g"], [z1], kn)
                fake_pred = net_d.apply({"params": pd},
                                        jax.lax.stop_gradient(fake))
                real_pred = net_d.apply({"params": pd}, real)
                l_d = self.cri_gan(real_pred, True, is_disc=True) + \
                    self.cri_gan(fake_pred, False, is_disc=True)
                return l_d, (jnp.mean(real_pred), jnp.mean(fake_pred))

            (l_d, (rs, fs)), d_grads = jax.value_and_grad(
                d_loss, has_aux=True)(state["params_d"])
            d_up, opt_d = tx_d.update(d_grads, state["opt_d"],
                                      state["params_d"])
            params_d = optax.apply_updates(state["params_d"], d_up)

            # ---- G step
            def g_loss(pg):
                fake = self._g_apply(pg, [z2], kn2)
                fake_pred = net_d.apply({"params": params_d}, fake)
                return self.cri_gan(fake_pred, True, is_disc=False)

            l_g, g_grads = jax.value_and_grad(g_loss)(state["params_g"])
            g_up, opt_g = tx_g.update(g_grads, state["opt_g"],
                                      state["params_g"])
            params_g = optax.apply_updates(state["params_g"], g_up)
            ema = self.ema_update(state["ema_g"], params_g, self.ema_decay)

            losses = {"l_g": l_g, "l_d": l_d, "real_score": rs,
                      "fake_score": fs}
            new_state = dict(state, params_g=params_g, ema_g=ema,
                             opt_g=opt_g, params_d=params_d, opt_d=opt_d,
                             iter=state["iter"] + 1)
            return new_state, losses

        @jax.jit
        def d_reg(state, real):
            weight = self.r1_reg_weight / 2 * self.net_d_reg_every

            def loss(pd):
                return weight * r1_penalty(
                    lambda x: net_d.apply({"params": pd}, x), real)

            l_r1, grads = jax.value_and_grad(loss)(state["params_d"])
            up, opt_d = tx_d.update(grads, state["opt_d"],
                                    state["params_d"])
            return dict(state,
                        params_d=optax.apply_updates(state["params_d"], up),
                        opt_d=opt_d), l_r1

        @jax.jit
        def g_reg(state, rng):
            kz, kn, kp = jax.random.split(rng, 3)
            batch = max(1, self.opt["train"].get("path_batch_shrink", 2))

            def loss(pg):
                z = jax.random.normal(kz, (batch, self.num_style_feat))
                latents = self.net_g.apply({"params": pg}, z,
                                           method=self.net_g.style_forward)
                latents = jnp.tile(latents[:, None, :],
                                   (1, self.net_g.num_latent, 1))

                def fake_fn(lat):
                    img, _ = self.net_g.apply(
                        {"params": pg}, [lat], input_is_latent=True,
                        rngs={"noise": kn})
                    return img

                penalty, pl_mean, new_mpl = g_path_regularize(
                    fake_fn, latents, state["mean_path_length"], kp)
                l_path = (self.path_reg_weight * self.net_g_reg_every *
                          penalty)
                return l_path, new_mpl

            (l_path, new_mpl), grads = jax.value_and_grad(
                loss, has_aux=True)(state["params_g"])
            up, opt_g = tx_g.update(grads, state["opt_g"],
                                    state["params_g"])
            return dict(state,
                        params_g=optax.apply_updates(state["params_g"], up),
                        opt_g=opt_g, mean_path_length=new_mpl), l_path

        return step, d_reg, g_reg

    def optimize_parameters(self, current_iter: int, batch, rng):
        if self._step is None:
            self._step, self._d_reg, self._g_reg = self._build_step()
        real = jnp.asarray(batch["gt"])
        k1, k2 = jax.random.split(rng)
        self.state, losses = self._step(self.state, real, k1)
        if current_iter % self.net_d_reg_every == 0:
            self.state, l_r1 = self._d_reg(self.state, real)
            losses["l_d_r1"] = l_r1
        if current_iter % self.net_g_reg_every == 0:
            self.state, l_path = self._g_reg(self.state, k2)
            losses["l_g_path"] = l_path
        self.log_dict = self.reduce_loss_dict(losses)
        return self.log_dict
