"""Cross-chip spatial sharding with halo exchange.

The conv-net analog of sequence/context parallelism (SURVEY §5): a large
image is sharded by ROWS across the mesh's axis; each chip exchanges its
boundary rows with its neighbors over ICI via `jax.lax.ppermute` (the
ring-exchange the reference would have needed NCCL point-to-point for),
runs the network on its halo-padded block, and keeps the valid center.

Interior pixels are bit-identical to the unsharded forward when
`halo ≥ receptive_field/2` — verified on the virtual CPU mesh in
tests/test_spatial.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def halo_exchange(block: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad a row-sharded block with `halo` rows from ring neighbors.

    block: (N, H_local, W, C) per-device view. Edge devices reflect-pad
    (matching tiled_apply's borders).
    """
    idx = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)

    top_rows = block[:, :halo]       # rows my top neighbor needs
    bot_rows = block[:, -halo:]      # rows my bottom neighbor needs

    down = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    up = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_top = jax.lax.ppermute(bot_rows, axis_name, down)  # prev dev's bottom
    from_bot = jax.lax.ppermute(top_rows, axis_name, up)    # next dev's top

    # edge devices: reflect own border instead of the wrapped-around rows
    reflect_top = block[:, 1:halo + 1][:, ::-1]
    reflect_bot = block[:, -halo - 1:-1][:, ::-1]
    from_top = jnp.where(idx == 0, reflect_top, from_top)
    from_bot = jnp.where(idx == n_dev - 1, reflect_bot, from_bot)
    return jnp.concatenate([from_top, block, from_bot], axis=1)


def spatial_sharded_apply(fn: Callable, img: jax.Array, mesh: Mesh,
                          halo: int, scale: int = 1,
                          axis: str = "tile") -> jax.Array:
    """Apply `fn` (NHWC→NHWC, ×scale, translation-equivariant) to an image
    row-sharded over `axis`, with ICI halo exchange.

    H must divide evenly by the axis size; pad beforehand if needed.
    """
    n_dev = mesh.shape[axis]
    n, h, w, c = img.shape
    assert h % n_dev == 0, f"H={h} must divide by mesh axis {n_dev}"
    assert halo < h // n_dev, (
        f"halo {halo} must be < rows/device {h // n_dev} "
        "(single-neighbor ring exchange)")

    @partial(shard_map, mesh=mesh, in_specs=P(None, axis, None, None),
             out_specs=P(None, axis, None, None), check_rep=False)
    def run(block):
        padded = halo_exchange(block, halo, axis)
        out = fn(padded)
        return out[:, halo * scale:out.shape[1] - halo * scale]

    return run(img)
