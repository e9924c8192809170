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


def _chunked_call(call, batch, *arrays):
    """Run `call` over leading-dim chunks of `arrays`, padding the last
    chunk to the engine's frozen batch by repeating the final row and
    discarding the padded outputs. Returns a list of concatenated
    outputs (one per engine output)."""
    n = arrays[0].shape[0]
    outs = None
    for s in range(0, n, batch):
        chunk = [a[s:s + batch] for a in arrays]
        pad = batch - chunk[0].shape[0]
        if pad:
            chunk = [np.concatenate([c, np.repeat(c[-1:], pad, 0)], 0)
                     for c in chunk]
        res = call(*[jnp.asarray(c) for c in chunk])
        if not isinstance(res, (tuple, list)):
            res = (res,)
        keep = batch - pad
        res = [np.asarray(r)[:keep] for r in res]
        outs = ([[r] for r in res] if outs is None
                else [o + [r] for o, r in zip(outs, res)])
    return [np.concatenate(o, 0) for o in outs]


class EngineFaceRestorer:
    """Fixed-size restorer engine (scripts/export_gfpgan.py) — the
    TorchScript-parity serving path: a source-free artifact with the
    weights and device-IO conversions baked in (api_plate_oto.py:336
    loads torch.jit artifacts the same way).

    Duck-compatible with Restorer's serving surface (`input_size`,
    `restore_batch_u8`, `restore_batch`, `__call__`), so it slots into
    ServiceCore(restorer=...) including micro-batching. Batches are
    padded/chunked to the engine's frozen batch size.
    """

    def __init__(self, engine_dir: str):
        with open(osp.join(engine_dir, "engine.json")) as f:
            self.meta = json.load(f)
        from jax import export as jexport
        with open(osp.join(engine_dir, "engine.bin"), "rb") as f:
            self.engine = jexport.deserialize(f.read())
        shape = self.meta["input_shape"]
        self.batch = int(shape[0])
        self.input_size = (int(shape[1]), int(shape[2]))
        self.out_min_max = tuple(self.meta.get("out_min_max", (-1, 1)))

    def _call_chunked(self, imgs_u8: np.ndarray) -> np.ndarray:
        return _chunked_call(self.engine.call, self.batch, imgs_u8)[0]

    def restore_batch_u8(self, imgs: np.ndarray) -> np.ndarray:
        """(N,H,W,3) RGB uint8 → (N,H,W,3) BGR uint8."""
        if imgs.dtype != np.uint8:
            raise TypeError(f"restore_batch_u8 expects uint8, got "
                            f"{imgs.dtype}")
        return self._call_chunked(imgs)

    def restore_batch(self, imgs: np.ndarray) -> np.ndarray:
        """(N,H,W,3) RGB float [0,1] → BGR uint8. The engine's IO is
        uint8, so float inputs are quantized to 8 bits first (≤0.5/255
        input error)."""
        return self._call_chunked(
            np.clip(np.asarray(imgs, np.float32) * 255.0 + 0.5,
                    0, 255).astype(np.uint8))

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return self.restore_batch(img[None])[0]


class EngineGeoPipeline:
    """Fused post-detector pipeline engine (scripts/export_gfpgan.py
    --with-geometry): mask/crop/resize/restores/warp/paste/montage in one
    source-free artifact. Slots into PlatePipeline(geo_engine=...) —
    `__call__((N,T,T,3) uint8 BGR canvases, (N,4,2) float32 quads)` →
    (montage_u8 (N,T,6T,3), masked_canvas_u8), padded/chunked to the
    engine's frozen batch."""

    def __init__(self, engine_dir: str):
        with open(osp.join(engine_dir, "engine.json")) as f:
            self.meta = json.load(f)
        if not self.meta.get("geometry"):
            raise ValueError(
                f"{engine_dir} is not a fused-geometry engine (export "
                "with scripts/export_gfpgan.py --with-geometry)")
        from jax import export as jexport
        with open(osp.join(engine_dir, "engine.bin"), "rb") as f:
            self.engine = jexport.deserialize(f.read())
        shape = self.meta["input_shape"]
        self.batch = int(shape[0])
        self.target = int(shape[1])

    def __call__(self, canvases: np.ndarray, quads: np.ndarray):
        if canvases.dtype != np.uint8:
            raise TypeError(f"expected uint8 canvases, got "
                            f"{canvases.dtype}")
        mont, masked = _chunked_call(self.engine.call, self.batch,
                                     canvases,
                                     np.asarray(quads, np.float32))
        return mont, masked


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
