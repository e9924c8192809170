#!/usr/bin/env python
"""MATLAB post-processing / data-generation scripts — TPU-native port of
scripts/matlab_scripts/{back_projection/backprojection.m, main_bp.m,
main_reverse_filter.m, generate_bicubic_img.m}.

The MATLAB bicubic is reproduced exactly by ops/resize.imresize (golden
vs the reference's matlab_functions); back-projection runs as one jitted
lax.scan on device.
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..")))


import argparse
import os
import os.path as osp

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.resize import imresize
from image_restoration_tpu.utils.misc import scandir


def _gauss_p():
    """fspecial('gaussian', 5, 1) squared + renormalized (backprojection.m)."""
    ax = np.arange(5) - 2.0
    g = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / 2.0)
    g /= g.sum()
    p = g ** 2
    return jnp.asarray(p / p.sum(), jnp.float32)


def backprojection(im_h, im_l, max_iter: int = 20):
    """Iterative back-projection (backprojection.m): push the bicubic
    re-downsampling residual back through a squared-gaussian kernel."""
    p = _gauss_p()[..., None, None] * jnp.eye(3)[None, None]
    row_l = im_l.shape[0]
    row_h = im_h.shape[0]
    scale_dn = row_l / row_h
    scale_up = row_h / row_l

    def step(im, _):
        im_l_s = imresize(im[None], scale_dn)[0]
        diff = imresize((im_l - im_l_s)[None], scale_up)[0]
        blurred = jax.lax.conv_general_dilated(
            diff[None], p, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return im + blurred, None

    out, _ = jax.lax.scan(step, im_h.astype(jnp.float32), None,
                          length=max_iter)
    return out


def reverse_filter(im_out, im_l, scale: int = 4, max_iter: int = 20):
    """Iterative reverse filtering (main_reverse_filter.m)."""
    j = imresize(im_l[None].astype(jnp.float32), scale)[0]

    def step(im, _):
        down_up = imresize(imresize(im[None], 1.0 / scale)[0][None],
                           scale)[0]
        return im + (j - down_up), None

    out, _ = jax.lax.scan(step, im_out.astype(jnp.float32), None,
                          length=max_iter)
    return out


def run_folder(mode, lr_folder, preout_folder, save_folder, max_iter,
               scale):
    os.makedirs(save_folder, exist_ok=True)
    fn = jax.jit(lambda h, l: backprojection(h, l, max_iter)
                 if mode == "bp" else reverse_filter(h, l, scale, max_iter))
    for name in sorted(scandir(preout_folder, suffix=("png",))):
        im_l = cv2.imread(osp.join(lr_folder, name)).astype(
            np.float32) / 255.0
        im_h = cv2.imread(osp.join(preout_folder, name)).astype(
            np.float32) / 255.0
        out = np.asarray(fn(jnp.asarray(im_h), jnp.asarray(im_l)))
        cv2.imwrite(osp.join(save_folder, name),
                    np.clip(out * 255.0, 0, 255).astype(np.uint8))
        print(name)


def generate_bicubic(input_folder, save_mod, save_lr, save_bic, mod_scale,
                     up_scale):
    """generate_bicubic_img.m: mod-crop GT + bicubic LR (+ bicubic up)."""
    for d in (save_mod, save_lr, save_bic):
        if d:
            os.makedirs(d, exist_ok=True)
    for name in sorted(scandir(input_folder,
                               suffix=("png", "jpg", "jpeg", "bmp"))):
        img = cv2.imread(osp.join(input_folder, name)).astype(
            np.float32) / 255.0
        h, w = img.shape[:2]
        img = img[:h - h % mod_scale, :w - w % mod_scale]
        base = osp.splitext(name)[0] + ".png"

        def save(folder, arr):
            cv2.imwrite(osp.join(folder, base),
                        np.clip(np.asarray(arr) * 255.0, 0,
                                255).astype(np.uint8))

        if save_mod:
            save(save_mod, img)
        lr = imresize(jnp.asarray(img)[None], 1.0 / up_scale)[0]
        if save_lr:
            save(save_lr, lr)
        if save_bic:
            save(save_bic, imresize(lr[None], float(up_scale))[0])
        print(base)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin "
                        "overrides JAX_PLATFORMS; this uses jax.config)")
    sub = p.add_subparsers(dest="cmd", required=True)
    for mode in ("bp", "reverse_filter"):
        sp = sub.add_parser(mode)
        sp.add_argument("--lr_folder", required=True)
        sp.add_argument("--preout_folder", required=True)
        sp.add_argument("--save_folder", required=True)
        sp.add_argument("--max_iter", type=int, default=20)
        sp.add_argument("--scale", type=int, default=4)
    sp = sub.add_parser("generate_bicubic")
    sp.add_argument("--input_folder", required=True)
    sp.add_argument("--save_mod_folder", default=None)
    sp.add_argument("--save_lr_folder", default=None)
    sp.add_argument("--save_bic_folder", default=None)
    sp.add_argument("--mod_scale", type=int, default=12)
    sp.add_argument("--up_scale", type=int, default=2)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cmd in ("bp", "reverse_filter"):
        run_folder(args.cmd, args.lr_folder, args.preout_folder,
                   args.save_folder, args.max_iter, args.scale)
    else:
        generate_bicubic(args.input_folder, args.save_mod_folder,
                         args.save_lr_folder, args.save_bic_folder,
                         args.mod_scale, args.up_scale)
