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
        variables_d = jax.jit(
            lambda k, x: self.net_d.init(k, x))(
            jax.random.PRNGKey(opt.get("manual_seed", 0) or 0), example)
        params_d = variables_d["params"]
        self.cri_gan = build_loss(train_opt["gan_opt"])
        self.net_d_iters = train_opt.get("net_d_iters", 1)
        self.net_d_init_iters = train_opt.get("net_d_init_iters", 0)
        self.tx_d = self.make_optimizer("optim_d", params_d)
        extra = {"params_d": params_d, "opt_d": self.tx_d.init(params_d)}
        # BatchNorm discriminators (VGGStyleDiscriminator*) carry running
        # stats; like torch .train(), the D always runs in batch-stat mode
        # during training, and the running averages are refreshed once per
        # step for later eval/export.
        if "batch_stats" in variables_d:
            extra["stats_d"] = variables_d["batch_stats"]
        self.state = dict(self.state, **self.replicate(extra))

    @staticmethod
    def _flatten_time(x):
        """(b, t, h, w, c) clips → (b·t, h, w, c) — the reference feeds
        recurrent-GAN outputs to D/VGG frame-flattened
        (video_recurrent_gan_model.py:131,139,154,161)."""
        if x.ndim == 5:
            return x.reshape((-1,) + x.shape[2:])
        return x

    def _d_apply(self, params, x, train=True, stats=None):
        x = self._flatten_time(x)
        variables = {"params": params}
        if stats is not None:
            variables["batch_stats"] = stats
            # batch-stat mode always writes the running averages; the
            # in-step mutation is discarded (see _refresh_d_stats)
            out, _ = self.net_d.apply(variables, x, train=True,
                                      mutable=["batch_stats"])
        else:
            out = self.net_d.apply(variables, x)
        if isinstance(out, tuple):
            out = out[0]
        return out

    def _gan_g_loss(self, params_d, output, gt, stats=None):
        fake_pred = self._d_apply(params_d, output, stats=stats)
        return self.cri_gan(fake_pred, True, is_disc=False)

    def _gan_d_losses(self, params_d, output, gt, stats=None):
        real = self._d_apply(params_d, gt, stats=stats)
        fake = self._d_apply(params_d, jax.lax.stop_gradient(output),
                             stats=stats)
        l_real = self.cri_gan(real, True, is_disc=True)
        l_fake = self.cri_gan(fake, False, is_disc=True)
        return l_real + l_fake, {"l_d_real": l_real, "l_d_fake": l_fake,
                                 "real_score": jnp.mean(real),
                                 "fake_score": jnp.mean(fake)}

    def _refresh_d_stats(self, params_d, stats, output, gt):
        """Advance the D running stats from this step's real+fake batches
        (bookkeeping only — batch-stat mode never READS them)."""
        for batch in (gt, jax.lax.stop_gradient(output)):
            _, upd = self.net_d.apply(
                {"params": params_d, "batch_stats": stats},
                self._flatten_time(batch), train=True,
                mutable=["batch_stats"])
            stats = upd["batch_stats"]
        return stats

    def _build_train_step(self):
        tx_g, tx_d = self.tx_g, self.tx_d
        degrade = self.degrade_fn
        cri_pix, cri_perceptual = self.cri_pix, self.cri_perceptual

        def g_loss(params_g, params_d, lq, gt, **kwargs):
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
                l_p, l_s = cri_perceptual(self._flatten_time(out),
                                          self._flatten_time(gt))
                if l_p is not None:
                    total += l_p
                    losses["l_g_percep"] = l_p
                if l_s is not None:
                    total += l_s
                    losses["l_g_style"] = l_s
            l_gan = self._gan_g_loss(params_d, out, gt,
                                     stats=kwargs.get("stats"))
            total += l_gan
            losses["l_g_gan"] = l_gan
            return total, (losses, out)

        from functools import partial

        @partial(jax.jit, static_argnames=("update_g",))
        def step(state, batch, rng, update_g: bool):
            if degrade is not None:
                lq, gt = degrade(rng, batch["gt"])
            else:
                lq, gt = batch["lq"], batch["gt"]
            stats = state.get("stats_d")
            if update_g:
                (_, (losses, out)), grads = jax.value_and_grad(
                    g_loss, has_aux=True)(state["params_g"],
                                          state["params_d"], lq, gt,
                                          stats=stats)
                updates, opt_g = tx_g.update(grads, state["opt_g"],
                                             state["params_g"])
                params_g = optax.apply_updates(state["params_g"], updates)
            else:
                # skip iter (ref srgan_model.py:93): no optimizer_g.step()
                out = self.net_g.apply({"params": state["params_g"]}, lq)
                if isinstance(out, tuple):
                    out = out[0]
                losses = {}
                params_g, opt_g = state["params_g"], state["opt_g"]
            ema = self.ema_update(state["ema_g"], params_g, self.ema_decay)

            (l_d, d_losses), d_grads = jax.value_and_grad(
                lambda pd: self._gan_d_losses(pd, out, gt, stats=stats),
                has_aux=True)(state["params_d"])
            d_updates, opt_d = tx_d.update(d_grads, state["opt_d"],
                                           state["params_d"])
            params_d = optax.apply_updates(state["params_d"], d_updates)
            losses.update(d_losses)
            losses["l_d"] = l_d
            new_state = dict(state, params_g=params_g, ema_g=ema,
                             opt_g=opt_g, params_d=params_d, opt_d=opt_d,
                             iter=state["iter"] + 1)
            if stats is not None:
                new_state["stats_d"] = self._refresh_d_stats(
                    params_d, stats, out, gt)
            return new_state, losses

        def stepper(state, batch, rng):
            # reference gates on current_iter (1-based); state["iter"]
            # counts completed steps
            it = int(state["iter"]) + 1
            update_g = bool(it % self.net_d_iters == 0
                            and it > self.net_d_init_iters)
            return step(state, batch, rng, update_g=update_g)

        return stepper
