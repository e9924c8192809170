"""Serve an exported restorer engine (scripts/export_restorer.py).

The engine is a jax.export StableHLO artifact frozen at
(batch, tile+2·halo, ·, 3) — the TRT-engine analog. This loader feeds it
through the halo tiler with `tile_batch == engine batch`, so arbitrary
image sizes serve through the fixed-shape compiled module (the tiler
reflect-pads the grid and zero-pads the last chunk).
"""

from __future__ import annotations

import json
import os.path as osp

import numpy as np
import jax.numpy as jnp

from ..parallel.tiling import tiled_apply


class EngineRestorer:
    """Callable: RGB (H,W,3) — uint8 [0,255] or float [0,1] — → uint8
    RGB ×upscale. With a u8-IO engine (export_restorer --u8-io) uint8
    inputs go to the device untouched and outputs come back uint8 (the
    /255 + clip/round conversions are baked into the artifact)."""

    def __init__(self, engine_dir: str):
        with open(osp.join(engine_dir, "engine.json")) as f:
            self.meta = json.load(f)
        from jax import export as jexport
        with open(osp.join(engine_dir, "engine.bin"), "rb") as f:
            self.engine = jexport.deserialize(f.read())
        self.tile = int(self.meta["tile"])
        self.halo = int(self.meta["halo"])
        self.batch = int(self.meta["batch"])
        self.upscale = int(self.meta["upscale"])
        self.u8_io = self.meta.get("io") == "u8"

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.u8_io:
            if img.dtype != np.uint8:
                img = np.clip(np.asarray(img, np.float32) * 255.0 + 0.5,
                              0, 255).astype(np.uint8)
            out = tiled_apply(
                lambda t: self.engine.call(t),
                jnp.asarray(img)[None], tile=self.tile, halo=self.halo,
                scale=self.upscale, tile_batch=self.batch)
            return np.asarray(out[0])
        if img.dtype == np.uint8:
            img = np.asarray(img, np.float32) / 255.0
        x = jnp.asarray(img[None], jnp.float32)
        out = tiled_apply(
            lambda t: self.engine.call(t.astype(jnp.bfloat16)),
            x, tile=self.tile, halo=self.halo, scale=self.upscale,
            tile_batch=self.batch)
        out = np.asarray(out[0], np.float32)
        return np.clip(out * 255.0 + 0.5, 0, 255).astype(np.uint8)
