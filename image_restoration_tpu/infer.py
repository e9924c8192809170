"""Single-image / batch restoration inference.

Parity with Car_Plate-Restoration/inference.py:28-78 (restore 256×256 plate
crops with GFPGANv1OCR at params_ema) plus the tiled large-image path that
BASELINE mandates (reflect-pad halo tiles, SURVEY §5).
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .archs import build_network
from .convert.torch_import import import_network, load_pth
from .parallel.tiling import tiled_apply
from .utils.img_util import imread, imwrite, tensor2img
from .ops.resize import resize as jresize


PRODUCTION_GFPGAN = dict(
    type="GFPGANv1OCR", input_width=256, input_height=256,
    num_style_feat=256, channel_multiplier=0.5, num_mlp=4,
    input_is_latent=True, different_w=True, narrow=1, sft_half=True)


class Restorer:
    """Jitted restoration wrapper around any registered arch."""

    def __init__(self, network_opt: dict, ckpt_path: Optional[str] = None,
                 param_key: str = "params_ema", dtype=None,
                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                 out_min_max=(-1, 1), quant: Optional[str] = None,
                 data_parallel: Optional[int] = None):
        """quant="dyn-int8" traces every conv in dynamic-int8 serving mode
        (ops/modulated_conv.int8_serving): per-out-channel int8 weights,
        on-the-fly per-tensor activation scales. Measured on the
        production 256² generator: +42% over bf16 at batch 32 under a
        44.1 dB quality gate, slower below bs≈32 — use it with
        `restore_batch` (docs/PERFORMANCE.md "GFPGAN serving PTQ").

        data_parallel=N shards `restore_batch` over the first N local
        devices (params replicated, batch split on a 1-D jax.sharding
        Mesh — the serving-side analog of the trainers' DP mesh). Batches
        are padded up to a multiple of N so XLA sees static shapes."""
        if quant not in (None, "dyn-int8"):  # fail before the minutes of
            raise ValueError(f"unknown quant mode {quant!r}")  # build/init
        if data_parallel and data_parallel > jax.local_device_count():
            raise ValueError(
                f"data_parallel={data_parallel} > "
                f"{jax.local_device_count()} local devices")
        opt = dict(network_opt)
        if dtype is not None:
            opt["dtype"] = dtype
        self.net = build_network(opt)
        self.arch = network_opt["type"]
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.out_min_max = out_min_max
        self.input_size = (opt.get("input_height"), opt.get("input_width"))

        h = opt.get("input_height") or 64
        w = opt.get("input_width") or 64
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        self.variables = jax.jit(self.net.init)(jax.random.PRNGKey(0),
                                                dummy)
        if ckpt_path:
            sd = load_pth(ckpt_path, param_key)
            self.variables = import_network(self.arch, self.net,
                                            self.variables, sd)

        self.quant = quant

        def fwd(params, x):
            if quant == "dyn-int8":
                from .ops import modulated_conv
                with modulated_conv.int8_serving():
                    out = self.net.apply({"params": params}, x)
            else:
                out = self.net.apply({"params": params}, x)
            if isinstance(out, tuple):
                out = out[0]
            return out

        self._fwd = jax.jit(fwd)

        def fwd_u8(params, x_u8):
            # device-side IO: uint8 RGB in → /255 + mean/std normalize,
            # forward, clip/rescale/BGR-flip/round → uint8 BGR out. Same
            # math as the float path + host tensor2img (≤1 LSB from f32
            # ulp differences), 4× less host↔device traffic, zero host
            # normalize/convert passes.
            x = x_u8.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(self.mean)) / jnp.asarray(self.std)
            if self.input_size[0] is not None and (
                    x.shape[1] != self.input_size[0]
                    or x.shape[2] != self.input_size[1]):
                x = jresize(x, self.input_size, "bilinear")
            out = fwd(params, x)
            lo, hi = self.out_min_max
            y = jnp.clip(out.astype(jnp.float32), lo, hi)
            y = (y - lo) / (hi - lo)
            y = y[..., ::-1]  # rgb2bgr, as tensor2img does
            return jnp.round(y * 255.0).astype(jnp.uint8)

        self._fwd_u8 = jax.jit(fwd_u8)

        self.data_parallel = data_parallel or 0
        self._fwd_dp = None
        self._fwd_u8_dp = None
        self._mesh = None
        if self.data_parallel > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            self._mesh = Mesh(
                np.asarray(jax.devices()[:self.data_parallel]), ("data",))
            rep = NamedSharding(self._mesh, P())
            split = NamedSharding(self._mesh, P("data"))
            self.variables = jax.device_put(self.variables, rep)
            self._fwd_dp = jax.jit(fwd, in_shardings=(rep, split),
                                   out_shardings=split)
            self._fwd_u8_dp = jax.jit(fwd_u8, in_shardings=(rep, split),
                                      out_shardings=split)

    def restore_batch(self, imgs: np.ndarray) -> np.ndarray:
        """Batched restore: (N,H,W,3) RGB float [0,1] → (N,H',W',3) BGR
        uint8. The batch path is where quant="dyn-int8" pays (bs≥32).
        With data_parallel=N the batch is sharded across N devices
        (padded up to a multiple of N)."""
        n = imgs.shape[0]
        dp = self.data_parallel if self.data_parallel > 1 else 0
        if dp and n % dp:
            pad = dp - n % dp
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
        x = jnp.asarray((imgs - self.mean) / self.std)
        if self.input_size[0] is not None and (
                x.shape[1] != self.input_size[0]
                or x.shape[2] != self.input_size[1]):
            x = jresize(x, self.input_size, "bilinear")
        fwd = self._fwd_dp if dp else self._fwd
        # ONE device->host transfer for the whole batch (each np.asarray
        # of a device slice is a separate dispatch on the axon tunnel)
        out_np = np.asarray(fwd(self.variables["params"], x))[:n]
        return np.stack([tensor2img(out_np[i:i + 1],
                                    min_max=self.out_min_max)
                         for i in range(out_np.shape[0])])

    def restore_batch_u8(self, imgs: np.ndarray) -> np.ndarray:
        """Device-IO batched restore: (N,H,W,3) RGB uint8 → (N,H',W',3)
        BGR uint8, with uint8 on the wire both ways and all
        normalization/conversion on device — host does IO, device does
        math. Preferred for serving hot paths.

        Equivalence to `restore_batch(imgs/255)`: ≤1 LSB for float/bf16
        restorers (f32 ulp/rounding only). With quant="dyn-int8" this is
        a SEPARATE compilation of the int8 chain, and int8 requant
        rounding is compilation-dependent (docs/PERFORMANCE.md) — outputs
        match to the serving PSNR gate (≥30 dB, regression-tested), not
        bitwise."""
        if imgs.dtype != np.uint8:
            raise TypeError(f"restore_batch_u8 expects uint8, got "
                            f"{imgs.dtype}")
        n = imgs.shape[0]
        dp = self.data_parallel if self.data_parallel > 1 else 0
        if dp and n % dp:
            pad = dp - n % dp
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
        fwd = self._fwd_u8_dp if dp else self._fwd_u8
        return np.asarray(fwd(self.variables["params"],
                              jnp.asarray(imgs)))[:n]

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """HWC RGB float [0,1] → HWC BGR uint8 restored (matching reference
        normalization: (x-0.5)/0.5 in, (−1,1) out — inference.py:58-78)."""
        x = jnp.asarray((img - self.mean) / self.std)[None]
        if self.input_size[0] is not None and (
                x.shape[1] != self.input_size[0]
                or x.shape[2] != self.input_size[1]):
            x = jresize(x, self.input_size, "bilinear")
        out = self._fwd(self.variables["params"], x)
        return tensor2img(out, min_max=self.out_min_max)

    def restore_tiled(self, img: np.ndarray, tile: int = 512,
                      halo: int = 16, scale: int = 4,
                      tile_batch: int = 4) -> np.ndarray:
        """Halo-tiled large-image restore. With data_parallel=N the tile
        grid is sharded over the device mesh (tile_batch rounded up to a
        multiple of N) — tiles run data-parallel across chips."""
        dp = self.data_parallel if self.data_parallel > 1 else 0
        if dp and tile_batch % dp:
            tile_batch += dp - tile_batch % dp
        x = jnp.asarray((img - self.mean) / self.std)[None]
        out = tiled_apply(lambda t: self._fwd(self.variables["params"], t),
                          x, tile=tile, halo=halo, scale=scale,
                          tile_batch=tile_batch, mesh=self._mesh)
        return tensor2img(out, min_max=self.out_min_max)

    def restore_tiled_u8(self, img: np.ndarray, tile: int = 512,
                         halo: int = 16, scale: int = 4,
                         tile_batch: int = 4) -> np.ndarray:
        """Device-IO tiled restore: (H,W,3) RGB uint8 → (H·s,W·s,3) BGR
        uint8. Same tiling as restore_tiled with the /255 + normalize and
        clip/rescale/round conversions inside the per-chunk jitted graph —
        uint8 on the wire both ways (a 4096² image is 50 MB instead of
        200 MB each way). Equivalence: ≤1 LSB vs restore_tiled for
        float/bf16 nets (see restore_batch_u8 for the dyn-int8 caveat)."""
        if img.dtype != np.uint8:
            raise TypeError(f"restore_tiled_u8 expects uint8, got "
                            f"{img.dtype}")
        dp = self.data_parallel if self.data_parallel > 1 else 0
        if dp and tile_batch % dp:
            tile_batch += dp - tile_batch % dp
        x = jnp.asarray(img)[None]
        out = tiled_apply(
            lambda t: self._fwd_u8(self.variables["params"], t),
            x, tile=tile, halo=halo, scale=scale,
            tile_batch=tile_batch, mesh=self._mesh)
        return np.asarray(out[0])


def main(argv=None):
    parser = argparse.ArgumentParser(description="Restore plate/car images")
    parser.add_argument("--input", type=str, required=True,
                        help="image file or glob")
    parser.add_argument("--output", type=str, default="results")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="reference .pth checkpoint to import")
    parser.add_argument("--arch", type=str, default="gfpgan_ocr",
                        choices=["gfpgan_ocr", "rrdbnet", "srvgg"])
    parser.add_argument("--tile", type=int, default=0,
                        help=">0 enables halo-tiled inference")
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)

    if args.arch == "gfpgan_ocr":
        net_opt = PRODUCTION_GFPGAN
        mean_std = dict(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                        out_min_max=(-1, 1))
    elif args.arch == "rrdbnet":
        net_opt = dict(type="RRDBNet", num_in_ch=3, num_out_ch=3, scale=4,
                       num_feat=64, num_block=23, num_grow_ch=32)
        mean_std = dict(mean=(0, 0, 0), std=(1, 1, 1), out_min_max=(0, 1))
    else:
        net_opt = dict(type="SRVGGNetCompact", num_feat=64, num_conv=32,
                       upscale=4)
        mean_std = dict(mean=(0, 0, 0), std=(1, 1, 1), out_min_max=(0, 1))

    restorer = Restorer(net_opt, args.ckpt,
                        dtype=jnp.bfloat16 if args.bf16 else None, **mean_std)
    os.makedirs(args.output, exist_ok=True)
    paths = sorted(glob.glob(args.input))
    if not paths:
        raise FileNotFoundError(args.input)
    for path in paths:
        img = imread(path)
        t0 = time.time()
        if args.tile:
            out = restorer.restore_tiled(img, tile=args.tile)
        else:
            out = restorer(img)
        name = os.path.splitext(os.path.basename(path))[0]
        dst = os.path.join(args.output, f"{name}_restored.png")
        imwrite(out, dst)
        print(f"{path} -> {dst}  ({time.time() - t0:.2f}s)")


if __name__ == "__main__":
    main()
