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
                 decay_steps=(), total_steps: int = 10000,
                 data_parallel: int = 0):
        """data_parallel=N shards the train batch over the first N local
        devices (params replicated, batch split on a 1-D mesh) — the
        jax.sharding analog of the reference's nn.DataParallel wrap
        (Plate_Detect/Retina-License-Plate/train.py:78-79). BatchNorm
        stats and the loss reduce over the GLOBAL batch (GSPMD inserts
        the collectives for the batch-axis means), so DP numerics match
        single-device up to reduction order. Batch must divide by N."""
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
        self.schedule = optax.piecewise_constant_schedule(lr, boundaries)
        # The LR is applied from self.state["step"] inside the train step
        # (not from optax's internal count) so a resume that sets "step"
        # fast-forwards the decay schedule — matching the reference, which
        # recomputes lr from the resumed epoch each iteration
        # (Plate_Detect/Retina-License-Plate/train.py:121,154-166). unit
        # lr here; the schedule scales the update in _build_step.
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=1.0, momentum=momentum))
        self.state = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt": self.tx.init(variables["params"]),
            "step": 0,
        }
        self.data_parallel = int(data_parallel or 0)
        self._data_sharding = None
        if self.data_parallel > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            if self.data_parallel > len(jax.devices()):
                raise ValueError(
                    f"data_parallel={self.data_parallel} > "
                    f"{len(jax.devices())} devices")
            mesh = Mesh(np.asarray(jax.devices()[:self.data_parallel]),
                        ("data",))
            repl = NamedSharding(mesh, P())
            self._data_sharding = NamedSharding(mesh, P("data"))
            # replicate everything but the python step counter
            self.state = {k: (v if k == "step" else jax.device_put(v, repl))
                          for k, v in self.state.items()}
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
            # optax.sgd applies lr after the momentum trace, so scaling the
            # unit-lr updates by schedule(step) is exactly sgd(lr=schedule)
            lr = self.schedule(state["step"])
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(state["params"], updates)
            return dict(params=params, batch_stats=new_stats, opt=opt,
                        step=state["step"] + 1), losses

        return step

    def train_step(self, images: np.ndarray, targets: np.ndarray):
        images = jnp.asarray(images)
        targets = jnp.asarray(targets)
        if self._data_sharding is not None:
            images = jax.device_put(images, self._data_sharding)
            targets = jax.device_put(targets, self._data_sharding)
        self.state, losses = self._train_step(self.state, images, targets)
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

    def load(self, path: str):
        import orbax.checkpoint as ocp
        import os.path as osp
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray,
                              {"params": self.state["params"],
                               "batch_stats": self.state["batch_stats"]})
        restored = ckptr.restore(osp.abspath(path), target)
        if self._data_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self._data_sharding.mesh, P())
            restored = jax.device_put(restored, repl)
        self.state["params"] = restored["params"]
        self.state["batch_stats"] = restored["batch_stats"]


# Backbone aliases: the reference CLI calls them 'mobile0.25'/'resnet50'
# (Plate_Detect/Retina-License-Plate/train.py:18) while the arch registry
# uses the cfg names.
_BACKBONE_ALIASES = {"mobile0.25": "mobilenet0.25",
                     "mobilenet0.25": "mobilenet0.25",
                     "resnet18": "Resnet18", "Resnet18": "Resnet18",
                     "resnet50": "Resnet50", "Resnet50": "Resnet50",
                     "mobilenetv3": "MobilenetV3",
                     "MobilenetV3": "MobilenetV3"}


def main(argv=None):
    """CLI parity with Plate_Detect/Retina-License-Plate/train.py:17-28
    (SGD hyperparameters, epoch/decay schedule and default batch size come
    from the per-backbone cfg exactly as the reference's do; the torch
    DataLoader worker knob has no TPU equivalent and is accepted but
    ignored)."""
    import argparse

    p = argparse.ArgumentParser(description="RetinaFace plate-detector training")
    p.add_argument("--training_dataset",
                   default="./data/licenseplate/train/label.txt",
                   help="label.txt in the reference annotation format")
    p.add_argument("--network", default="resnet18",
                   help="mobile0.25 | resnet18 | resnet50 | mobilenetv3")
    p.add_argument("--num_workers", default=4, type=int,
                   help="accepted for CLI parity; loading is on-device")
    p.add_argument("--lr", "--learning-rate", default=1e-3, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--resume_net", default=None,
                   help="orbax checkpoint dir saved by this trainer")
    p.add_argument("--resume_epoch", default=0, type=int)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    p.add_argument("--gamma", default=0.1, type=float,
                   help="accepted for parity; decay factor is 0.1 as in cfg")
    p.add_argument("--save_folder", default="./weights/")
    p.add_argument("--image_size", default=224, type=int)
    p.add_argument("--batch_size", default=None, type=int,
                   help="default: the per-backbone cfg batch_size")
    p.add_argument("--epochs", default=None, type=int,
                   help="default: the per-backbone cfg epoch count")
    args = p.parse_args(argv)

    backbone = _BACKBONE_ALIASES[args.network]
    cfg = get_cfg(backbone)
    batch_size = args.batch_size or cfg["batch_size"]
    epochs = args.epochs or cfg["epoch"]
    from .dataset import LicensePlateDetection
    dataset = LicensePlateDetection(args.training_dataset,
                                    image_size=args.image_size)
    steps_per_epoch = max(1, len(dataset) // batch_size)
    decay_steps = [cfg["decay1"] * steps_per_epoch,
                   cfg["decay2"] * steps_per_epoch]
    trainer = DetectorTrainer(
        backbone=backbone, image_size=args.image_size, lr=args.lr,
        momentum=args.momentum, weight_decay=args.weight_decay,
        decay_steps=decay_steps, total_steps=epochs * steps_per_epoch)
    if args.resume_net:
        trainer.load(args.resume_net)
        trainer.state["step"] = args.resume_epoch * steps_per_epoch
    trainer.fit(dataset, epochs=epochs - args.resume_epoch,
                batch_size=batch_size)
    import os
    os.makedirs(args.save_folder, exist_ok=True)
    out = os.path.join(args.save_folder, f"{backbone}_final")
    trainer.save(out)
    trainer.logger.info(f"saved final checkpoint to {out}")


if __name__ == "__main__":
    main()
