"""GFPGANModel — the production license-plate GAN trainer.

Parity with basicsr/models/gfpgan_model.py:18-894:
  * losses: L1 pixel (:519-523), Sobel (:526-529), image-pyramid L1 vs
    out_rgbs with `remove_pyramid_loss` schedule (:503-536), VGG
    perceptual+style (:539-546), wgan_softplus GAN (:549-552)
  * D: logistic loss + R1 penalty every net_d_reg_every (:669-691)
  * EMA decay 0.5**(32/10000) every step (:667)
  * G Adam betas (0, 0.99); D lr/β scaled by r = d_reg_every/(d_reg_every+1)
  * fix_decoder → optimizer mask over the stylegan_decoder subtree
  * char-component discriminators (`use_component_loss`,
    training_config/train_gfpgan_v4_rec_license_affine_component.yml):
    roi_align 64² crops of the 10 per-char bboxes (:334-430), per-char
    component GAN loss + Gram component-style loss on D feats (:556-642),
    per-char D updates with the reference's vanilla-real + wgan-fake mix
    (:700-760). The reference instantiates net_d_char_0..9 as ten separate
    modules and unrolls ten optimizer steps; here the ten Ds are ONE
    parameter tree stacked on a leading char axis and applied with
    jax.vmap — a single batched MXU graph and a single optax update.
    (Deviation, documented: the reference's G-side loop routes every char
    crop through net_d_char_1 — a copy-paste slip in code that is dead
    upstream (`use_facial_disc` is hardcoded False at :74); we use each
    char's own D, which is the evident intent and what the D-side updates
    at :700-760 do.)

TPU structure: jitted step functions — the fused G+D step (degradation
synthesis, G forward with pyramid, all G losses, G update, EMA, D logistic
update and char-D updates share one compiled graph) and a separate D-R1
step traced once and invoked every `net_d_reg_every` iters. The
`net_d_iters`/`net_d_init_iters` gate (:508) is a STATIC jit argument: the
skip variant compiles a forward-only G graph with no G optimizer update at
all (the reference skips optimizer_g.step(); zeroing the loss instead
would still advance Adam moment decay). The reference's
torch.autograd.set_detect_anomaly + try/except backward (:495,:658-664)
are unnecessary: debug_nans is an opt-in jax config (utils/debug.py).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..losses.losses import r1_penalty
from ..utils.registry import MODEL_REGISTRY
from ..ops.resize import resize as jresize
from ..ops.roi_align import roi_align
from .sr_model import SRModel

NUM_CHARS = 10  # per-char component discriminators (ref :77-146)
CHAR_CROP = 64  # roi_align output_size (ref :410-430)


def _gram(x):
    """Gram matrix of NHWC feats, matching ref _gram_mat (:466-478)."""
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", f, f) / (c * h * w)


@MODEL_REGISTRY.register()
class GFPGANModel(SRModel):
    def __init__(self, opt: dict):
        # SRModel builds net_g, EMA and optimizer_g; override its example
        opt = dict(opt)
        net_g_opt = opt["network_g"]
        self._hw = (net_g_opt.get("input_height", 256),
                    net_g_opt.get("input_width", 256))
        opt.setdefault("gt_size", self._hw[0])
        opt.setdefault("scale", 1)  # GFPGAN restores at full resolution
        super().__init__(opt)
        self.log_size = int(math.log2(min(self._hw)))
        self.ratio = net_g_opt.get("input_width", 256) // \
            net_g_opt.get("input_height", 256)
        if not self.is_train:
            return

        train_opt = opt["train"]
        # GFPGAN EMA decay (ref :667)
        self.ema_decay = 0.5 ** (32 / (10 * 1000))

        # rebuild optimizer_g with StyleGAN betas + decoder freeze
        params_g = jax.device_get(self.state["params_g"])
        frozen = "stylegan_decoder" if net_g_opt.get("fix_decoder") else None
        self._schedules = []
        self.tx_g = self.make_optimizer("optim_g", params_g,
                                        frozen_prefix=frozen,
                                        betas=(0.0, 0.99))

        # discriminator
        self.net_d = self.build_net("network_d")
        example = jnp.zeros((1, self._hw[0], self._hw[1], 3), jnp.float32)
        params_d = self.init_params(self.net_d, example)
        pre_d = opt["path"].get("pretrain_network_d")
        if pre_d and pre_d.endswith((".pth", ".pt")):
            params_d = self.load_pretrain_torch(
                self.net_d, opt["network_d"]["type"], params_d, pre_d)

        self.net_d_iters = train_opt.get("net_d_iters", 1)
        self.net_d_init_iters = train_opt.get("net_d_init_iters", 0)
        self.net_d_reg_every = train_opt.get("net_d_reg_every", 16)
        self.r1_reg_weight = train_opt.get("r1_reg_weight", 10.0)
        ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
        self.tx_d = self.make_optimizer("optim_d", params_d,
                                        lr_scale=ratio,
                                        betas=(0.0 ** ratio, 0.99 ** ratio))

        # losses (ref init_training_settings :160-215)
        self.cri_pix = build_loss(train_opt["pixel_opt"]) if \
            train_opt.get("pixel_opt") else None
        self.cri_sobel = build_loss(train_opt["sobel_opt"]) if \
            train_opt.get("sobel_opt") else None
        self.cri_l1 = build_loss(train_opt["L1_opt"]) if \
            train_opt.get("L1_opt") else None
        self.cri_perceptual = build_loss(train_opt["perceptual_opt"]) if \
            train_opt.get("perceptual_opt") else None
        self.cri_gan = build_loss(train_opt["gan_opt"])
        self.pyramid_loss_weight = train_opt.get("pyramid_loss_weight", 1.0)
        self.remove_pyramid_loss = train_opt.get("remove_pyramid_loss",
                                                 float("inf"))

        # identity loss (ref :185-205, :645-657). The reference's import is
        # BROKEN upstream (`backbones` undefined at :198, every shipped yml
        # comments network_identity out); this is the working equivalent:
        # arcface IResNet embeddings, L1(out, stop_grad(gt)), frozen net.
        self.use_identity = opt.get("network_identity") is not None
        if self.use_identity:
            self.net_identity = self.build_net("network_identity")
            ex_id = jnp.zeros((1, 112, 112, 3), jnp.float32)
            p_id = self.init_params(self.net_identity, ex_id)
            pre_id = opt["path"].get("pretrain_network_identity")
            if pre_id and pre_id.endswith((".pth", ".pt")):
                from ..convert.iresnet_import import import_iresnet
                p_id = import_iresnet(pre_id)
            self.params_identity = p_id  # frozen (ref :203-205)
            self.identity_weight = train_opt.get("identity_weight", 1.0)

        self.state = dict(
            {k: v for k, v in self.state.items()},
            opt_g=self.replicate(self.tx_g.init(params_g)),
            params_d=self.replicate(params_d),
            opt_d=self.replicate(self.tx_d.init(params_d)))

        # ---- char-component discriminators (ref :74-146, yml
        # use_component_loss). Ten Ds as ONE stacked tree on axis 0.
        self.use_facial_disc = bool(opt.get("use_component_loss")) and \
            opt.get("network_d_char") is not None
        if self.use_facial_disc:
            self.net_d_char = self.build_net("network_d_char")
            ex = jnp.zeros((1, CHAR_CROP, CHAR_CROP, 3), jnp.float32)
            seed = opt.get("manual_seed", 0) or 0

            def init_one(key):
                return self.net_d_char.init(key, ex)["params"]

            keys = jax.random.split(jax.random.PRNGKey(seed + 7), NUM_CHARS)
            params_dc = jax.device_get(jax.jit(jax.vmap(init_one))(keys))
            # per-char pretrain (ref loads pretrain_network_d_char_{i})
            loaded = []
            for i in range(NUM_CHARS):
                p_i = jax.tree.map(lambda a: a[i], params_dc)
                pre = opt["path"].get(f"pretrain_network_d_char_{i}")
                if pre and pre.endswith((".pth", ".pt")):
                    p_i = self.load_pretrain_torch(
                        self.net_d_char, opt["network_d_char"]["type"],
                        p_i, pre)
                loaded.append(p_i)
            params_dc = jax.tree.map(lambda *xs: jnp.stack(xs), *loaded)
            self.cri_component = build_loss(train_opt["gan_component_opt"])
            self.comp_style_weight = train_opt.get("comp_style_weight", 0)
            self.tx_dc = self.make_optimizer("optim_component", params_dc,
                                             betas=(0.9, 0.99))
            self.state["params_dc"] = self.replicate(params_dc)
            self.state["opt_dc"] = self.replicate(self.tx_dc.init(params_dc))

        self._gd_step = None
        self._r1_step = None

    # ------------------------------------------------------------- steps

    def _pyramid_gt(self, gt):
        """Ref construct_img_pyramid (:302-314): bilinear gt pyramid."""
        pyramid = []
        for i in range(self.log_size - 2):
            h = 2 ** (i + 3)
            pyramid.append(jresize(gt, (h, h * self.ratio), "bilinear"))
        return pyramid

    def _char_crops(self, img, boxes):
        """(B,H,W,3) + (B,10,4) → (10,B,64,64,3) char-major crops."""
        crops = roi_align(img, boxes, CHAR_CROP)
        return jnp.swapaxes(crops, 0, 1)

    def _build_gd_step(self):
        tx_g, tx_d = self.tx_g, self.tx_d
        degrade = self.degrade_fn
        net_g, net_d = self.net_g, self.net_d
        use_fd = self.use_facial_disc

        def d_apply(pd, x):
            return net_d.apply({"params": pd}, x)

        if use_fd:
            net_dc = self.net_d_char
            cri_comp = self.cri_component
            cri_l1 = self.cri_l1
            comp_style_w = self.comp_style_weight
            tx_dc = self.tx_dc

            def dc_apply(pdc, x):  # vmapped over the stacked char axis
                return jax.vmap(lambda p, xi: net_dc.apply(
                    {"params": p}, xi, return_feats=True))(pdc, x)

        use_identity = self.use_identity
        if use_identity:
            net_id = self.net_identity
            p_id = self.params_identity
            id_w = self.identity_weight
            cri_l1_id = self.cri_l1

            def embed(img):
                # ref resize_for_identity (:477-481): bilinear 112², clamp
                r = jresize(img, (112, 112), "bilinear")
                r = jnp.clip(r, -1.0, 1.0)
                return net_id.apply({"params": p_id}, r)

        remat = (self.opt.get("train", {}) or {}).get("remat", False)

        def g_forward(pg, lq, noise_rng):
            return net_g.apply({"params": pg}, lq, return_rgb=True,
                               rngs={"noise": noise_rng})

        if remat:
            # rematerialize the G forward in backward: trades FLOPs for HBM
            # (jax.checkpoint — the reference has no equivalent knob)
            g_forward = jax.checkpoint(g_forward)

        def g_loss(pg, pd, pdc, lq, gt, boxes, noise_rng, pyr_w):
            output, out_rgbs = g_forward(pg, lq, noise_rng)
            total = 0.0
            losses = {}
            if self.cri_pix is not None:
                l_pix = self.cri_pix(output, gt)
                total += l_pix
                losses["l_g_pix"] = l_pix
            if self.cri_sobel is not None:
                l_sobel = self.cri_sobel(output, gt)
                total += l_sobel
                losses["l_g_sobel"] = l_sobel
            if self.cri_l1 is not None and out_rgbs:
                pyramid_gt = self._pyramid_gt(gt)
                for i, (rgb, pgt) in enumerate(zip(out_rgbs, pyramid_gt)):
                    l_pyr = self.cri_l1(rgb, pgt) * pyr_w
                    total += l_pyr
                    losses[f"l_p_{2 ** (i + 3)}"] = l_pyr
            if self.cri_perceptual is not None:
                l_percep, l_style = self.cri_perceptual(output, gt)
                if l_percep is not None:
                    total += l_percep
                    losses["l_g_percep"] = l_percep
                if l_style is not None:
                    total += l_style
                    losses["l_g_style"] = l_style
            fake_pred = d_apply(pd, output)
            l_gan = self.cri_gan(fake_pred, True, is_disc=False)
            total = total + l_gan
            losses["l_g_gan"] = l_gan

            # identity loss (ref :645-657): gt embedding detached
            if use_identity:
                e_out = embed(output)
                e_gt = jax.lax.stop_gradient(embed(gt))
                if cri_l1_id is not None:
                    l_identity = cri_l1_id(e_out, e_gt) * id_w
                else:
                    l_identity = jnp.mean(jnp.abs(e_out - e_gt)) * id_w
                total = total + l_identity
                losses["l_identity"] = l_identity

            # component GAN + Gram-style losses (ref :556-642)
            if use_fd:
                cf = self._char_crops(output, boxes)       # (10,B,64,64,3)
                fake_logits, fake_feats = dc_apply(pdc, cf)
                l_char = jax.vmap(
                    lambda lg: cri_comp(lg, True, is_disc=False))(
                    fake_logits)                           # (10,)
                total = total + l_char.sum()
                for i in range(NUM_CHARS):
                    losses[f"l_g_gan_char_{i}"] = l_char[i]
                if comp_style_w > 0:
                    cr = self._char_crops(jax.lax.stop_gradient(gt), boxes)
                    _, real_feats = dc_apply(pdc, cr)

                    def style_one(f0, f1, r0, r1):
                        # ref _comp_style (:625-628): 0.5·L1(gram lvl0)
                        # + 1.0·L1(gram lvl1), gt feats detached
                        return (cri_l1(_gram(f0),
                                       jax.lax.stop_gradient(_gram(r0)))
                                * 0.5 +
                                cri_l1(_gram(f1),
                                       jax.lax.stop_gradient(_gram(r1))))

                    l_cs = jax.vmap(style_one)(
                        fake_feats[0], fake_feats[1],
                        real_feats[0], real_feats[1]).sum() * comp_style_w
                    total = total + l_cs
                    losses["l_g_comp_style_loss"] = l_cs
            return total, (losses, output)

        @partial(jax.jit, static_argnames=("update_g",))
        def step(state, batch, rng, pyr_w, update_g: bool):
            data_rng, noise_rng = jax.random.split(rng)
            if degrade is not None:
                lq, gt = degrade(data_rng, batch["gt"])
            else:
                lq, gt = batch["lq"], batch["gt"]
            boxes = batch.get("char_boxes")
            pdc = state.get("params_dc")

            if update_g:
                (_, (losses, output)), grads = jax.value_and_grad(
                    g_loss, has_aux=True)(
                    state["params_g"], state["params_d"], pdc, lq, gt,
                    boxes, noise_rng, pyr_w)
                updates, opt_g = tx_g.update(grads, state["opt_g"],
                                             state["params_g"])
                params_g = optax.apply_updates(state["params_g"], updates)
            else:
                # skip iter (ref :508): no G grads, no optimizer_g.step()
                losses = {}
                output, _ = g_forward(state["params_g"], lq, noise_rng)
                opt_g, params_g = state["opt_g"], state["params_g"]
            # EMA runs every iter, even on skip iters (ref :667)
            ema = self.ema_update(state["ema_g"], params_g, self.ema_decay)
            output = jax.lax.stop_gradient(output)

            # ---- D logistic step (ref :669-681)
            def d_loss(pd):
                fake = d_apply(pd, output)
                real = d_apply(pd, gt)
                l_d = self.cri_gan(real, True, is_disc=True) + \
                    self.cri_gan(fake, False, is_disc=True)
                return l_d, (jnp.mean(real), jnp.mean(fake))

            (l_d, (real_s, fake_s)), d_grads = jax.value_and_grad(
                d_loss, has_aux=True)(state["params_d"])
            d_updates, opt_d = tx_d.update(d_grads, state["opt_d"],
                                           state["params_d"])
            params_d = optax.apply_updates(state["params_d"], d_updates)

            losses["l_d"] = l_d
            losses["real_score"] = real_s
            losses["fake_score"] = fake_s
            new_state = dict(state, params_g=params_g, ema_g=ema,
                             opt_g=opt_g, params_d=params_d, opt_d=opt_d,
                             iter=state["iter"] + 1)

            # ---- per-char D updates, every iter (ref :700-760)
            if use_fd:
                cf = self._char_crops(output, boxes)
                cr = self._char_crops(gt, boxes)

                def dc_loss(pdc):
                    fl, _ = dc_apply(pdc, cf)
                    rl, _ = dc_apply(pdc, cr)
                    # reference quirk kept: vanilla loss on real, wgan
                    # (cri_gan) on fake (ref :702-705)
                    per = jax.vmap(lambda r, f:
                                   cri_comp(r, True, is_disc=True) +
                                   self.cri_gan(f, False, is_disc=True))(
                        rl, fl)
                    return per.sum(), per

                (_, per), dc_grads = jax.value_and_grad(
                    dc_loss, has_aux=True)(state["params_dc"])
                dc_updates, opt_dc = tx_dc.update(
                    dc_grads, state["opt_dc"], state["params_dc"])
                new_state["params_dc"] = optax.apply_updates(
                    state["params_dc"], dc_updates)
                new_state["opt_dc"] = opt_dc
                for i in range(NUM_CHARS):
                    losses[f"l_d_char_{i}"] = per[i]
            return new_state, losses, gt

        return step

    def _build_r1_step(self):
        tx_d = self.tx_d
        net_d = self.net_d
        weight = self.r1_reg_weight / 2 * self.net_d_reg_every

        @jax.jit
        def step(state, gt):
            def loss(pd):
                return weight * r1_penalty(
                    lambda x: net_d.apply({"params": pd}, x), gt)

            l_r1, grads = jax.value_and_grad(loss)(state["params_d"])
            updates, opt_d = tx_d.update(grads, state["opt_d"],
                                         state["params_d"])
            params_d = optax.apply_updates(state["params_d"], updates)
            return dict(state, params_d=params_d, opt_d=opt_d), l_r1

        return step

    def optimize_parameters(self, current_iter: int, batch, rng):
        if self._gd_step is None:
            self._gd_step = self._build_gd_step()
            self._r1_step = self._build_r1_step()
        if current_iter < self.remove_pyramid_loss:
            pyr_w = self.pyramid_loss_weight
        else:
            pyr_w = 1e-12  # ref :503-506
        update_g = bool(current_iter % self.net_d_iters == 0
                        and current_iter > self.net_d_init_iters)
        if self.use_facial_disc and "char_boxes" not in batch:
            raise KeyError("use_component_loss requires the dataset to "
                           "provide 'char_boxes' (crop_components: true)")
        batch = self.shard_batch(batch)
        self.state, losses, gt = self._gd_step(
            self.state, batch, rng, jnp.float32(pyr_w), update_g=update_g)
        if current_iter % self.net_d_reg_every == 0:
            self.state, l_r1 = self._r1_step(self.state, gt)
            losses["l_d_r1"] = l_r1
        self.log_dict = self.reduce_loss_dict(losses)
        return self.log_dict

    # -------------------------------------------------------------- test

    def test(self, lq):
        if not hasattr(self, "_test_fn") or self._test_fn is None:
            self._test_fn = jax.jit(
                lambda p, x: self.net_g.apply({"params": p}, x,
                                              randomize_noise=False)[0])
        return self._test_fn(
            self.state.get("ema_g", self.state["params_g"]),
            jnp.asarray(lq))
