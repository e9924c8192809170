"""BaseModel — shared trainer infrastructure.

TPU-native redesign of basicsr/models/base_model.py:13-353:
  * device placement + DP/DDP wrapping (:62-76) → a jax Mesh with the batch
    sharded over 'data'; XLA inserts the gradient psums (no DDP object)
  * EMA (:50-57) → functional tree_map blend inside the jitted step
  * optimizers/schedulers (:78-96,144-168) → optax chains with the schedule
    traced into the update
  * checkpoint save/load (:170-326) → orbax (net_{g,d} params/params_ema +
    training state in one step directory), plus .pth import for reference
    weights
  * distributed loss logging (:328-353) → losses are scalars from a pmean'd
    jit; no explicit reduce
"""

from __future__ import annotations

import os
from os import path as osp
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..archs import build_network
from ..utils.logger import get_root_logger
from .lr_scheduler import build_schedule


class BaseModel:
    def __init__(self, opt: dict):
        self.opt = opt
        self.is_train = opt.get("is_train", True)
        self.logger = get_root_logger()
        devices = jax.devices()
        n = opt.get("num_devices") or len(devices)
        self.mesh = Mesh(np.asarray(devices[:n]).reshape(-1),
                         axis_names=("data",))
        self.repl_sharding = NamedSharding(self.mesh, P())
        self.data_sharding = NamedSharding(self.mesh, P("data"))
        self.state: Dict[str, Any] = {}
        self.log_dict: Dict[str, float] = {}

    # ------------------------------------------------------------ helpers

    def shard_batch(self, batch):
        """Device-put array entries batch-sharded; drop host-only fields
        (paths etc.) so the batch is a pure jit argument."""
        return {k: jax.device_put(jnp.asarray(v), self.data_sharding)
                for k, v in batch.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))}

    def replicate(self, tree):
        return jax.device_put(tree, self.repl_sharding)

    def build_net(self, opt_key: str):
        net = build_network(self.opt[opt_key])
        return net

    def init_params(self, net, example, **apply_kwargs):
        variables = jax.jit(
            lambda k, x: net.init(k, x, **apply_kwargs))(
            jax.random.PRNGKey(self.opt.get("manual_seed", 0) or 0), example)
        # BN archs (DUF, VGG-style Ds) also create a batch_stats collection;
        # stash it so callers can thread it through apply (ref eval-mode
        # running stats).
        self._init_stats = variables.get("batch_stats")
        return variables["params"]

    def make_optimizer(self, train_opt_key: str, params,
                       frozen_prefix: Optional[str] = None,
                       lr_scale: float = 1.0, betas=(0.9, 0.999)):
        """Adam + schedule (+ optional frozen subtree mask, the
        `fix_decoder` analog of requires_grad=False)."""
        opt_cfg = dict(self.opt["train"][train_opt_key])
        opt_type = opt_cfg.pop("type", "Adam")
        lr = float(opt_cfg.pop("lr", 1e-4)) * lr_scale
        b = opt_cfg.pop("betas", betas)
        # optional global-norm gradient clip (the torch-side analog is
        # torch.nn.utils.clip_grad_norm_ before optimizer.step()). Deep
        # residual stacks (RRDB-23) occasionally spike: one bad batch at
        # lr 2e-4 measured a 60x L1-loss jump that destroyed 3k iters of
        # progress — a clip bounds the update without touching the path
        # when gradients are healthy.
        grad_clip = opt_cfg.pop("grad_clip", None)
        schedule = build_schedule(self.opt["train"], lr)
        self._schedules = getattr(self, "_schedules", [])
        self._schedules.append(schedule)
        if opt_type.lower() == "adam":
            tx = optax.adam(learning_rate=schedule, b1=b[0], b2=b[1])
        elif opt_type.lower() == "adamw":
            tx = optax.adamw(learning_rate=schedule, b1=b[0], b2=b[1],
                             weight_decay=opt_cfg.get("weight_decay", 0.0))
        elif opt_type.lower() == "sgd":
            tx = optax.sgd(learning_rate=schedule,
                           momentum=opt_cfg.get("momentum", 0.9))
        else:
            raise ValueError(f"unsupported optimizer {opt_type}")
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)),
                             tx)
        if frozen_prefix is not None:
            def mask_fn(tree):
                def walk(node, path):
                    if isinstance(node, dict):
                        return {k: walk(v, path + (k,)) for k, v in
                                node.items()}
                    return not (path and path[0] == frozen_prefix)
                return walk(tree, ())
            tx = optax.masked(tx, mask_fn(params))
        return tx

    def current_learning_rates(self, count: int):
        return [float(s(count)) for s in getattr(self, "_schedules", [])]

    @staticmethod
    def ema_update(ema_params, params, decay: float):
        """EMA blend (ref base_model.py:50-57 model_ema)."""
        return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay),
                            ema_params, params)

    # -------------------------------------------------------- checkpoints

    def _ckpt_dir(self):
        return self.opt["path"].get("models", "experiments/models")

    def _transient_state_keys(self):
        """State entries __init__ reconstructs deterministically (e.g. a
        frozen distillation teacher): excluded from checkpoints so an
        immutable multi-MB tree isn't re-serialized on every save."""
        return ()

    def save(self, current_iter: int):
        """Save full training state with orbax (ref :170-214,279-311)."""
        import orbax.checkpoint as ocp
        path = osp.abspath(osp.join(self._ckpt_dir(), f"ckpt_{current_iter}"))
        os.makedirs(osp.dirname(path), exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        skip = set(self._transient_state_keys())
        host_state = jax.tree.map(np.asarray, {
            k: v for k, v in self.state.items() if k not in skip})
        ckptr.save(path, host_state, force=True)
        ckptr.wait_until_finished()
        self.logger.info(f"Saved checkpoint {path}")

    def resume(self, path: str):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        skip = set(self._transient_state_keys())
        template = jax.tree.map(np.asarray, {
            k: v for k, v in self.state.items() if k not in skip})
        restored = ckptr.restore(osp.abspath(path), template)
        merged = dict(self.state)  # transient keys keep their live values
        merged.update(restored)
        self.state = self.replicate(merged)
        self.logger.info(f"Resumed from {path} at iter "
                         f"{int(self.state.get('iter', 0))}")

    def load_pretrain_torch(self, net, arch_name: str, params, pth_path: str,
                            param_key: str = "params"):
        from ..convert.torch_import import import_network, load_pth
        sd = load_pth(pth_path, param_key)
        variables = import_network(arch_name, net, {"params": params}, sd)
        self.logger.info(f"Imported torch weights from {pth_path} "
                         f"({param_key})")
        return variables["params"]

    # ----------------------------------------------------------- logging

    def get_current_log(self):
        return self.log_dict

    def reduce_loss_dict(self, loss_dict):
        """Scalars come out of jit already mesh-reduced; just floatify."""
        return {k: float(v) for k, v in loss_dict.items()}
