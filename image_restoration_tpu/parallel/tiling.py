"""Spatial halo tiling for large-image inference.

The reference never implements tiling (SURVEY §5: no tile loop exists);
BASELINE mandates it: reflect-pad halo tiles restored independently, valid
centers stitched. This is the conv-net analog of sequence parallelism — the
receptive field is the "context window" and the halo is the exchanged
context.

TPU-native formulation: the tile grid is materialized as ONE batched tensor
(static shapes) so a whole grid is a single forward pass; across chips the
tile batch is sharded over the mesh's 'data'/'tile' axis, so scaling to a
pod is just a sharding annotation.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tile_image(img: jax.Array, tile: int, halo: int
               ) -> Tuple[jax.Array, Tuple[int, int, int, int]]:
    """(1|N, H, W, C) → (N·gh·gw, tile+2·halo, tile+2·halo, C) tile batch.

    Reflect-pads to a tile-grid multiple plus halos. Returns the tile batch
    and (gh, gw, H, W) needed to stitch.
    """
    if img.ndim == 3:
        img = img[None]
    n, h, w, c = img.shape
    gh, gw = math.ceil(h / tile), math.ceil(w / tile)
    ph, pw = gh * tile - h, gw * tile - w
    padded = jnp.pad(img, ((0, 0), (halo, halo + ph), (halo, halo + pw),
                           (0, 0)), mode="reflect")
    size = tile + 2 * halo
    tiles = []
    for i in range(gh):
        for j in range(gw):
            tiles.append(jax.lax.dynamic_slice(
                padded, (0, i * tile, j * tile, 0), (n, size, size, c)))
    return jnp.concatenate(tiles, axis=0), (gh, gw, h, w)


def untile_image(tiles: jax.Array, grid: Tuple[int, int, int, int],
                 tile: int, halo: int, scale: int = 1) -> jax.Array:
    """Crop halo centers and stitch back to (N, H·scale, W·scale, C)."""
    gh, gw, h, w = grid
    t, p = tile * scale, halo * scale
    num = gh * gw
    n = tiles.shape[0] // num
    c = tiles.shape[-1]
    centers = tiles[:, p:p + t, p:p + t, :]
    centers = centers.reshape(gh, gw, n, t, t, c)
    out = centers.transpose(2, 0, 3, 1, 4, 5).reshape(n, gh * t, gw * t, c)
    return out[:, :h * scale, :w * scale, :]


def tiled_apply(fn: Callable, img: jax.Array, tile: int, halo: int,
                scale: int = 1, tile_batch: Optional[int] = None,
                mesh: Optional[Mesh] = None, axis: str = "data",
                out_halo: Optional[int] = None) -> jax.Array:
    """Apply `fn` (NHWC→NHWC, ×scale) tile-wise with reflect halos.

    tile_batch: process the tile grid in chunks of this many tiles (bounds
    peak memory). With a mesh, each chunk is sharded over `axis` so tiles
    run data-parallel across chips.
    out_halo: halo remaining on fn's OUTPUT — pass 0 when fn crops the
    halo internally (e.g. quantized_srvgg_forward(crop_halo=...), which
    keeps conv_last + the pixel-shuffle tail at tile size). Default: halo.
    """
    tiles, grid = tile_image(img, tile, halo)
    num = tiles.shape[0]
    if tile_batch is None:
        tile_batch = num
    outs = []
    for start in range(0, num, tile_batch):
        chunk = tiles[start:start + tile_batch]
        pad = tile_batch - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)], 0)
        if mesh is not None:
            chunk = jax.device_put(chunk, NamedSharding(mesh, P(axis)))
        out = fn(chunk)
        if pad:
            out = out[:tile_batch - pad]
        outs.append(out)
    return untile_image(jnp.concatenate(outs, axis=0), grid, tile,
                        halo if out_halo is None else out_halo, scale)
