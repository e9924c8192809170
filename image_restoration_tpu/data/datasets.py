"""Host-side datasets.

TPU-first split of responsibilities: datasets only do file IO, decode,
resize/crop/augment (cheap, host); ALL degradation synthesis runs on-device
(data/pipelines.py) inside the jitted train step. Each dataset therefore
exposes `device_pipeline()` returning the jittable degrade fn (or None).

Parity map:
  FFHQDegradationDataset ← basicsr/data/ffhq_degradation_dataset.py:19-335
  RealESRGANDataset      ← basicsr/data/realsr_degradation_dataset.py:19-316
  PairedImageDataset     ← basicsr/data/paired_image_dataset.py:11-101
  SingleImageDataset     ← basicsr/data/single_image_dataset.py:11-65
  FFHQDataset            ← basicsr/data/ffhq_dataset.py:13-80
"""

from __future__ import annotations

import os
from os import path as osp

import numpy as np

from ..utils.registry import DATASET_REGISTRY
from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes
from ..utils.misc import scandir
from .transforms import augment, paired_random_crop
from .pipelines import (FFHQDegradationConfig, make_ffhq_degradation,
                        RealESRGANDegradationConfig,
                        make_realesrgan_degradation)


def _gather_paths(root: str, backend_opt: dict):
    backend = backend_opt.get("type", "disk")
    if backend in ("pak", "lmdb"):
        client = FileClient(backend, pak_path=root)
        return sorted(client._client.keys()), client
    client = FileClient("disk")
    paths = sorted(osp.join(root, p) for p in scandir(
        root, suffix=("png", "jpg", "jpeg", "bmp", "webp"), recursive=True))
    return paths, client


class _BaseDataset:
    def __init__(self, opt: dict):
        self.opt = opt

    def __len__(self):
        return len(self.paths)

    def device_pipeline(self):
        return None


@DATASET_REGISTRY.register()
class FFHQDegradationDataset(_BaseDataset):
    """GT-only dataset; the production degradation chain runs on-device."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.io_backend_opt = opt.get("io_backend", {"type": "disk"})
        self.paths, self.client = _gather_paths(opt["dataroot_gt"],
                                                self.io_backend_opt)
        self.input_width = opt.get("input_width", 256)
        self.input_height = opt.get("input_height", 256)
        self.mean = opt.get("mean", (0.5, 0.5, 0.5))
        self.std = opt.get("std", (0.5, 0.5, 0.5))
        # per-char component bboxes for the component-D training path
        # (ref ffhq_degradation_dataset.py:34-38,209-219: a torch .pth dict
        # keyed '%08d' with 'char_0'..'char_9' 4-vectors; we also accept an
        # .npz with an (N, 10, 4) 'boxes' array)
        self.crop_components = opt.get("crop_components", False)
        if self.crop_components:
            comp_path = opt["component_path"]
            if comp_path.endswith(".npz"):
                import numpy as np
                self.components_list = np.load(comp_path)["boxes"]
            else:
                import torch
                self.components_list = torch.load(comp_path,
                                                  map_location="cpu")

    def _component_boxes(self, index: int):
        """(10, 4) float32 [x1,y1,x2,y2] per-char boxes for one image."""
        import numpy as np
        if not isinstance(self.components_list, dict):
            return np.asarray(self.components_list[index], np.float32)
        entry = self.components_list[f"{index:08d}"]
        return np.stack([np.asarray(entry[f"char_{i}"][0:4], np.float32)
                         for i in range(10)])

    def __getitem__(self, index: int):
        import cv2
        path = self.paths[index]
        img = imfrombytes(self.client.get(path), float32=True)  # BGR
        img = cv2.resize(img, (self.input_width, self.input_height),
                         interpolation=cv2.INTER_LINEAR)
        item = {"gt": img[..., ::-1].copy(), "gt_path": path}  # RGB [0,1]
        if self.crop_components:
            item["char_boxes"] = self._component_boxes(index)
        return item

    def device_pipeline(self):
        opt = self.opt
        cfg = FFHQDegradationConfig(
            blur_kernel_size=opt.get("blur_kernel_size", 21),
            min_kernel_size=opt.get("min_kernel_size",
                                    opt.get("blur_kernel_size", 21)),
            kernel_list=tuple(opt.get("kernel_list",
                                      FFHQDegradationConfig.kernel_list)),
            kernel_prob=tuple(opt.get("kernel_prob",
                                      FFHQDegradationConfig.kernel_prob)),
            blur_sigma=tuple(opt.get("blur_sigma", (0.1, 10))),
            downsample_range=tuple(opt.get("downsample_range", (4.0, 12.0))),
            noise_range=tuple(opt["noise_range"])
            if opt.get("noise_range") else None,
            jpeg_range=tuple(opt["jpeg_range"])
            if opt.get("jpeg_range") else None,
            color_jitter_prob=opt.get("color_jitter_prob"),
            color_jitter_shift=opt.get("color_jitter_shift", 20) / 255.0,
            color_jitter_pt_prob=opt.get("color_jitter_pt_prob"),
            gray_prob=opt.get("gray_prob", 0.0),
            gt_gray=bool(opt.get("gt_gray", False)),
            use_hflip=opt.get("use_hflip", False),
            mean=tuple(self.mean), std=tuple(self.std))
        return make_ffhq_degradation(cfg)


@DATASET_REGISTRY.register()
class RealESRGANDataset(_BaseDataset):
    """GT-only; second-order Real-ESRGAN chain on-device."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.io_backend_opt = opt.get("io_backend", {"type": "disk"})
        self.paths, self.client = _gather_paths(opt["dataroot_gt"],
                                                self.io_backend_opt)
        self.gt_size = opt.get("gt_size", 256)
        self.use_hflip = opt.get("use_hflip", True)
        self.use_rot = opt.get("use_rot", False)

    def __getitem__(self, index: int):
        import cv2
        path = self.paths[index]
        img = imfrombytes(self.client.get(path), float32=True)
        h, w = img.shape[:2]
        if h < self.gt_size or w < self.gt_size:
            img = cv2.resize(img, (max(w, self.gt_size),
                                   max(h, self.gt_size)))
            h, w = img.shape[:2]
        top = np.random.randint(0, h - self.gt_size + 1)
        left = np.random.randint(0, w - self.gt_size + 1)
        img = img[top:top + self.gt_size, left:left + self.gt_size]
        img = augment(img, self.use_hflip, self.use_rot)
        return {"gt": img[..., ::-1].copy(), "gt_path": path}

    def device_pipeline(self):
        opt = self.opt
        kwargs = {}
        for f in RealESRGANDegradationConfig.__dataclass_fields__:
            if f in opt:
                v = opt[f]
                kwargs[f] = tuple(v) if isinstance(v, list) else v
        cfg = RealESRGANDegradationConfig(**kwargs)
        return make_realesrgan_degradation(cfg)


RealSRDegradationDataset = DATASET_REGISTRY.register(
    type("RealSRDegradationDataset", (RealESRGANDataset,), {}))


@DATASET_REGISTRY.register()
class OCRDegradationDataset(FFHQDegradationDataset):
    """FFHQ pipeline + aspect-preserving pad + random occlusion masks.

    Ref basicsr/data/ocr_degradation_dataset.py:19-293 (`pad_input`
    :214-223, mask suite :92-183). The masks run on-device: the pipeline
    returned by device_pipeline() chains the FFHQ degradation with
    apply_random_mask.
    """

    def __getitem__(self, index: int):
        import cv2
        path = self.paths[index]
        img = imfrombytes(self.client.get(path), float32=True)  # BGR
        if self.opt.get("pad_input", True):
            # aspect-preserving resize + center pad to (W,H) (ref :214-223)
            h, w = img.shape[:2]
            scale = min(self.input_width / w, self.input_height / h)
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            resized = cv2.resize(img, (nw, nh),
                                 interpolation=cv2.INTER_LINEAR)
            canvas = np.ones((self.input_height, self.input_width, 3),
                             np.float32)
            y0 = (self.input_height - nh) // 2
            x0 = (self.input_width - nw) // 2
            canvas[y0:y0 + nh, x0:x0 + nw] = resized
            img = canvas
        else:
            img = cv2.resize(img, (self.input_width, self.input_height),
                             interpolation=cv2.INTER_LINEAR)
        return {"gt": img[..., ::-1].copy(), "gt_path": path}

    def device_pipeline(self):
        import jax
        import jax.numpy as jnp
        from .masks import build_irregular_mask_bank, apply_random_mask
        base = super().device_pipeline()
        if not self.opt.get("random_mask", False):
            return base
        bank = jnp.asarray(build_irregular_mask_bank(self.input_height))
        mask_prob = self.opt.get("mask_prob", 0.5)
        mean = jnp.asarray(self.mean, jnp.float32)
        std = jnp.asarray(self.std, jnp.float32)
        white = float(((1.0 - mean) / std)[0])  # fill in normalized space

        def degrade(key, gt):
            k1, k2 = jax.random.split(key)
            lq, gt_n = base(k1, gt)
            lq, _ = apply_random_mask(k2, lq, bank, mask_prob, fill=white)
            return lq, gt_n

        return degrade


@DATASET_REGISTRY.register()
class PairedImageDataset(_BaseDataset):
    """LQ/GT pairs from folders or a meta_info file."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.io_backend_opt = opt.get("io_backend", {"type": "disk"})
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        gt_folder, lq_folder = opt["dataroot_gt"], opt["dataroot_lq"]
        # LQ filename template over the GT stem, e.g. '{}x2' (ref
        # paired_image_dataset.py:62 + data_util paired_paths_from_folder)
        tmpl = opt.get("filename_tmpl", "{}")

        def lq_name(name):
            stem, ext = osp.splitext(name)
            return tmpl.format(stem) + ext

        if opt.get("meta_info_file"):
            with open(opt["meta_info_file"]) as f:
                names = [line.strip().split(" ")[0] for line in f]
            self.paths = [(osp.join(lq_folder, lq_name(n)),
                           osp.join(gt_folder, n)) for n in names]
        else:
            gt_paths = sorted(scandir(gt_folder,
                                      suffix=("png", "jpg", "jpeg", "bmp")))
            self.paths = [(osp.join(lq_folder, lq_name(p)),
                           osp.join(gt_folder, p)) for p in gt_paths]
        self.client = FileClient("disk")

    def __getitem__(self, index: int):
        lq_path, gt_path = self.paths[index]
        img_lq = imfrombytes(self.client.get(lq_path), float32=True)
        img_gt = imfrombytes(self.client.get(gt_path), float32=True)
        scale = self.opt.get("scale", 1)
        if self.opt.get("phase") == "train":
            gt_size = self.opt["gt_size"]
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size,
                                                scale, gt_path)
            img_gt, img_lq = augment([img_gt, img_lq],
                                     self.opt.get("use_hflip", True),
                                     self.opt.get("use_rot", True))
        out = {"lq": img_lq[..., ::-1].copy(),
               "gt": img_gt[..., ::-1].copy(),
               "lq_path": lq_path, "gt_path": gt_path}
        if self.mean is not None:
            mean = np.asarray(self.mean, np.float32)
            std = np.asarray(self.std, np.float32)
            out["lq"] = (out["lq"] - mean) / std
            out["gt"] = (out["gt"] - mean) / std
        return out


@DATASET_REGISTRY.register()
class SingleImageDataset(_BaseDataset):
    """LQ only (no-GT test). Ref single_image_dataset.py:11-65."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.io_backend_opt = opt.get("io_backend", {"type": "disk"})
        self.paths, self.client = _gather_paths(opt["dataroot_lq"],
                                                self.io_backend_opt)
        self.mean = opt.get("mean")
        self.std = opt.get("std")

    def __getitem__(self, index: int):
        path = self.paths[index]
        img = imfrombytes(self.client.get(path), float32=True)[..., ::-1]
        img = img.copy()
        if self.mean is not None:
            img = (img - np.asarray(self.mean, np.float32)) / \
                np.asarray(self.std, np.float32)
        return {"lq": img, "lq_path": path}


@DATASET_REGISTRY.register()
class FFHQDataset(_BaseDataset):
    """GT-only (StyleGAN pretrain). Ref ffhq_dataset.py:13-80."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.io_backend_opt = opt.get("io_backend", {"type": "disk"})
        self.paths, self.client = _gather_paths(opt["dataroot_gt"],
                                                self.io_backend_opt)
        self.mean = opt.get("mean", (0.5, 0.5, 0.5))
        self.std = opt.get("std", (0.5, 0.5, 0.5))

    def __getitem__(self, index: int):
        path = self.paths[index]
        img = imfrombytes(self.client.get(path), float32=True)
        img = augment(img, hflip=self.opt.get("use_hflip", True),
                      rotation=False)
        img = img[..., ::-1].copy()
        img = (img - np.asarray(self.mean, np.float32)) / \
            np.asarray(self.std, np.float32)
        return {"gt": img, "gt_path": path}
