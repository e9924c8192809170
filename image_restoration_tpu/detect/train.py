"""Detector training — parity with Plate_Detect/Retina-License-Plate/train.py:95-169.

SGD momentum 0.9, weight decay 5e-4, lr 1e-3 with ×0.1 step decay at the
config's decay epochs; loss = loc_weight·L_loc + L_conf + L_landm. One
jitted train step carrying BatchNorm batch_stats; data parallel over the
mesh via batch sharding.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..archs import build_network
from ..utils.logger import get_root_logger
from .config import get_cfg
from .multibox_loss import multibox_loss
from .priors import prior_box


class DetectorTrainer:
    def __init__(self, backbone: str = "Resnet18", image_size: int = 224,
                 lr: float = 1e-3, momentum: float = 0.9,
                 weight_decay: float = 5e-4,
                 resnet_pretrain_path: Optional[str] = None,
                 decay_steps=(), total_steps: int = 10000):
        self.cfg = get_cfg(backbone)
        self.image_size = image_size
        self.net = build_network(dict(type="RetinaFace", backbone=backbone,
                                      out_channel=self.cfg["out_channel"],
                                      phase="train"))
        dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        variables = jax.jit(
            lambda k, x: self.net.init(k, x, train=True))(
            jax.random.PRNGKey(0), dummy)
        if resnet_pretrain_path:
            from ..convert.resnet_import import load_torchvision_resnet
            variables = load_torchvision_resnet(resnet_pretrain_path,
                                                variables)
        self.priors = jnp.asarray(prior_box(self.cfg,
                                            (image_size, image_size)))

        boundaries = {int(s): 0.1 for s in decay_steps}
        schedule = optax.piecewise_constant_schedule(lr, boundaries)
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=schedule, momentum=momentum))
        self.state = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt": self.tx.init(variables["params"]),
            "step": 0,
        }
        self._train_step = self._build_step()
        self.logger = get_root_logger()

    def _build_step(self):
        loc_weight = self.cfg["loc_weight"]
        variances = tuple(self.cfg["variance"])

        @jax.jit
        def step(state, images, targets):
            def loss_fn(params):
                preds, mutated = self.net.apply(
                    {"params": params, "batch_stats": state["batch_stats"]},
                    images, train=True, mutable=["batch_stats"])
                l_loc, l_conf, l_landm = multibox_loss(
                    preds, self.priors, targets, variances)
                total = loc_weight * l_loc + l_conf + l_landm
                return total, (mutated["batch_stats"],
                               {"loss": total, "l_loc": l_loc,
                                "l_conf": l_conf, "l_landm": l_landm})

            (_, (new_stats, losses)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            updates, opt = self.tx.update(grads, state["opt"],
                                          state["params"])
            params = optax.apply_updates(state["params"], updates)
            return dict(params=params, batch_stats=new_stats, opt=opt,
                        step=state["step"] + 1), losses

        return step

    def train_step(self, images: np.ndarray, targets: np.ndarray):
        self.state, losses = self._train_step(
            self.state, jnp.asarray(images), jnp.asarray(targets))
        return {k: float(v) for k, v in losses.items()}

    def fit(self, dataset, epochs: int, batch_size: int = 24,
            log_every: int = 10):
        from ..data.loader import DataLoader
        loader = DataLoader(dataset, batch_size, shuffle=True,
                            drop_last=True)
        it = 0
        for epoch in range(epochs):
            loader.set_epoch(epoch)
            for batch in loader:
                t0 = time.time()
                losses = self.train_step(batch["image"], batch["target"])
                it += 1
                if it % log_every == 0:
                    msg = " ".join(f"{k}:{v:.4f}" for k, v in losses.items())
                    self.logger.info(
                        f"epoch {epoch} iter {it} {msg} "
                        f"({time.time() - t0:.2f}s/it)")
        return self.state

    def save(self, path: str):
        import orbax.checkpoint as ocp
        import os.path as osp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(osp.abspath(path),
                   jax.tree.map(np.asarray,
                                {"params": self.state["params"],
                                 "batch_stats": self.state["batch_stats"]}),
                   force=True)
        ckptr.wait_until_finished()
