"""Video SR datasets — parity with basicsr/data/{reds_dataset.py,
vimeo90k_dataset.py,video_test_dataset.py}.

Host side only (decode + crop + augment); clips are (T, H, W, 3) float32
RGB stacked into batches by the loader.
"""

from __future__ import annotations

import random
from os import path as osp

import numpy as np

from ..utils.registry import DATASET_REGISTRY
from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes
from ..utils.misc import scandir
from .transforms import augment, paired_random_crop


@DATASET_REGISTRY.register()
class REDSDataset:
    """REDS training clips (ref reds_dataset.py:14-210).

    Folder layout <root>/<clip>/<frame:08d>.png for gt and lq.
    """

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 5)
        self.num_half = self.num_frame // 2
        self.client = FileClient("disk")
        self.clip_frames = {}  # frames per clip (REDS ships 100)
        if opt.get("meta_info_file"):
            with open(opt["meta_info_file"]) as f:
                self.keys = []
                for line in f:
                    clip, num = line.strip().split(" ")[:2]
                    self.clip_frames[clip] = int(num)
                    self.keys.extend(f"{clip}/{i:08d}"
                                     for i in range(int(num)))
        else:
            import os
            clips = [d for d in os.listdir(self.gt_root)
                     if osp.isdir(osp.join(self.gt_root, d))]
            self.keys = []
            for clip in sorted(clips):
                frames = sorted(scandir(osp.join(self.gt_root, clip)))
                self.clip_frames[clip] = len(frames)
                self.keys.extend(f"{clip}/{osp.splitext(f)[0]}"
                                 for f in frames)
        # the reference excludes REDS4 validation clips (:72-76)
        val_partition = opt.get("val_partition", ["000", "011", "015",
                                                  "020"])
        self.keys = [k for k in self.keys
                     if k.split("/")[0] not in val_partition]
        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)

    def __len__(self):
        return len(self.keys)

    def device_pipeline(self):
        return None  # video degradations are pre-rendered on disk

    def __getitem__(self, index):
        import cv2
        scale = self.opt.get("scale", 4)
        gt_size = self.opt.get("gt_size", 256)
        key = self.keys[index]
        clip_name, frame_name = key.split("/")
        center = int(frame_name)
        interval = random.choice(self.interval_list)

        # temporally valid window (ref :118-135)
        start = center - self.num_half * interval
        end = center + self.num_half * interval
        max_frame = self.clip_frames.get(clip_name, 100) - 1
        while start < 0 or end > max_frame:
            center = random.randint(self.num_half * interval,
                                    max_frame - self.num_half * interval)
            start = center - self.num_half * interval
            end = center + self.num_half * interval
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        lqs, gts = [], []
        for i in neighbors:
            lq = imfrombytes(self.client.get(
                osp.join(self.lq_root, clip_name, f"{i:08d}.png")),
                float32=True)
            lqs.append(lq)
        gt = imfrombytes(self.client.get(
            osp.join(self.gt_root, clip_name, f"{center:08d}.png")),
            float32=True)
        gt, lqs = paired_random_crop(gt, lqs, gt_size, scale)
        out = augment(lqs + [gt], self.opt.get("use_hflip", True),
                      self.opt.get("use_rot", True))
        lqs, gt = out[:-1], out[-1]
        return {"lq": np.stack([f[..., ::-1] for f in lqs]).copy(),
                "gt": gt[..., ::-1].copy(), "key": key}


@DATASET_REGISTRY.register()
class REDSRecurrentDataset(REDSDataset):
    """Returns matched gt/lq clips for recurrent models (BasicVSR)."""

    def __getitem__(self, index):
        import cv2
        scale = self.opt.get("scale", 4)
        gt_size = self.opt.get("gt_size", 256)
        key = self.keys[index]
        clip_name, frame_name = key.split("/")
        start = int(frame_name)
        total = self.clip_frames.get(clip_name, 100)
        if start > total - self.num_frame:
            start = random.randint(0, total - self.num_frame)
        frames = list(range(start, start + self.num_frame))
        lqs, gts = [], []
        for i in frames:
            lqs.append(imfrombytes(self.client.get(
                osp.join(self.lq_root, clip_name, f"{i:08d}.png")),
                float32=True))
            gts.append(imfrombytes(self.client.get(
                osp.join(self.gt_root, clip_name, f"{i:08d}.png")),
                float32=True))
        gts, lqs = paired_random_crop(gts, lqs, gt_size, scale)
        out = augment(lqs + gts, self.opt.get("use_hflip", True),
                      self.opt.get("use_rot", True))
        t = self.num_frame
        return {"lq": np.stack([f[..., ::-1] for f in out[:t]]).copy(),
                "gt": np.stack([f[..., ::-1] for f in out[t:]]).copy(),
                "key": key}


@DATASET_REGISTRY.register()
class Vimeo90KDataset:
    """Vimeo-90K septuplets (ref vimeo90k_dataset.py:12-127)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        with open(opt["meta_info_file"]) as f:
            self.keys = [line.strip().split(" ")[0] for line in f]
        self.client = FileClient("disk")
        self.neighbor_list = [i + (9 - opt.get("num_frame", 7)) // 2
                              for i in range(opt.get("num_frame", 7))]

    def __len__(self):
        return len(self.keys)

    def device_pipeline(self):
        return None

    def __getitem__(self, index):
        scale = self.opt.get("scale", 4)
        gt_size = self.opt.get("gt_size", 256)
        key = self.keys[index]
        gt = imfrombytes(self.client.get(
            osp.join(self.gt_root, key, "im4.png")), float32=True)
        lqs = [imfrombytes(self.client.get(
            osp.join(self.lq_root, key, f"im{i}.png")), float32=True)
            for i in self.neighbor_list]
        gt, lqs = paired_random_crop(gt, lqs, gt_size, scale)
        out = augment(lqs + [gt], self.opt.get("use_hflip", True),
                      self.opt.get("use_rot", True))
        return {"lq": np.stack([f[..., ::-1] for f in out[:-1]]).copy(),
                "gt": out[-1][..., ::-1].copy(), "key": key}


@DATASET_REGISTRY.register()
class Vimeo90KRecurrentDataset(Vimeo90KDataset):
    """Full septuplet gt/lq sequences for recurrent models (ref
    vimeo90k_dataset.py:130-186): both roots hold im1..im7; `flip_sequence`
    mirrors the clip to 14 frames, `random_reverse` flips time order."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.flip_sequence = opt.get("flip_sequence", False)
        self.random_reverse = opt.get("random_reverse", False)
        self.neighbor_list = [1, 2, 3, 4, 5, 6, 7]

    def __getitem__(self, index):
        scale = self.opt.get("scale", 4)
        gt_size = self.opt.get("gt_size", 256)
        key = self.keys[index]
        neighbors = list(self.neighbor_list)
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        lqs = [imfrombytes(self.client.get(
            osp.join(self.lq_root, key, f"im{i}.png")), float32=True)
            for i in neighbors]
        gts = [imfrombytes(self.client.get(
            osp.join(self.gt_root, key, f"im{i}.png")), float32=True)
            for i in neighbors]
        gts, lqs = paired_random_crop(gts, lqs, gt_size, scale)
        out = augment(lqs + gts, self.opt.get("use_hflip", True),
                      self.opt.get("use_rot", True))
        t = len(neighbors)
        lq = np.stack([f[..., ::-1] for f in out[:t]])
        gt = np.stack([f[..., ::-1] for f in out[t:]])
        if self.flip_sequence:  # T → 2T by temporal mirror (ref :181-184)
            lq = np.concatenate([lq, lq[::-1]], axis=0)
            gt = np.concatenate([gt, gt[::-1]], axis=0)
        return {"lq": lq.copy(), "gt": gt.copy(), "key": key}


@DATASET_REGISTRY.register()
class VideoTestVimeo90KDataset:
    """Vimeo90K-Test: num_frame LQ neighbors, center (im4) GT only (ref
    video_test_dataset.py:133-199). Items enumerate the meta_info list;
    folder is the constant 'vimeo90k' as in the reference."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        num_frame = opt.get("num_frame", 7)
        self.neighbor_list = [i + (9 - num_frame) // 2
                              for i in range(num_frame)]
        self.client = FileClient("disk")
        with open(opt["meta_info_file"]) as f:
            self.subfolders = [line.strip().split(" ")[0] for line in f]

    def __len__(self):
        return len(self.subfolders)

    def device_pipeline(self):
        return None

    def __getitem__(self, index):
        sub = self.subfolders[index]
        lqs = [imfrombytes(self.client.get(
            osp.join(self.lq_root, sub, f"im{i}.png")), float32=True)
            for i in self.neighbor_list]
        gt = imfrombytes(self.client.get(
            osp.join(self.gt_root, sub, "im4.png")), float32=True)
        return {"lq": np.stack([f[..., ::-1] for f in lqs]).copy(),
                "gt": gt[..., ::-1].copy(), "folder": "vimeo90k",
                "idx": index}


def generate_frame_indices(crt_idx: int, max_frame_num: int,
                           num_frames: int, padding: str = "reflection"):
    """Sliding-window indices with border padding (ref data_util.py:43-92).

    padding ∈ replicate | reflection | reflection_circle | circle, e.g. for
    crt_idx=0, num_frames=5: [0,0,0,1,2] | [2,1,0,1,2] | [4,3,0,1,2] |
    [3,4,0,1,2].
    """
    assert num_frames % 2 == 1, "num_frames should be an odd number."
    max_frame_num = max_frame_num - 1
    num_pad = num_frames // 2
    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == "replicate":
                i = 0
            elif padding == "reflection":
                i = -i
            elif padding == "reflection_circle":
                i = crt_idx + num_pad - i
            else:  # circle
                i = num_frames + i
        elif i > max_frame_num:
            if padding == "replicate":
                i = max_frame_num
            elif padding == "reflection":
                i = max_frame_num * 2 - i
            elif padding == "reflection_circle":
                i = (crt_idx - num_pad) - (i - max_frame_num)
            else:  # circle
                i = i - num_frames
        indices.append(i)
    return indices


@DATASET_REGISTRY.register()
class VideoTestDataset:
    """Per-folder video eval (ref video_test_dataset.py:12-130): sliding
    window of num_frame LQ frames per GT frame, border handling per the
    `padding` option; folders restricted by `meta_info_file` when given."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 5)
        self.padding = opt.get("padding", "reflection")
        self.client = FileClient("disk")
        if opt.get("meta_info_file"):
            with open(opt["meta_info_file"]) as f:
                self.folders = [line.strip().split(" ")[0] for line in f]
        else:
            import os
            self.folders = sorted(d for d in os.listdir(self.lq_root)
                                  if osp.isdir(osp.join(self.lq_root, d)))
        self.items = []
        for folder in self.folders:
            frames = sorted(scandir(osp.join(self.lq_root, folder)))
            for i in range(len(frames)):
                self.items.append((folder, i, len(frames)))

    def __len__(self):
        return len(self.items)

    def device_pipeline(self):
        return None

    def _frame(self, root, folder, idx):
        frames = sorted(scandir(osp.join(root, folder)))
        return imfrombytes(self.client.get(
            osp.join(root, folder, frames[idx])), float32=True)

    def __getitem__(self, index):
        folder, i, total = self.items[index]
        idxs = generate_frame_indices(i, total, self.num_frame, self.padding)
        lqs = [self._frame(self.lq_root, folder, j) for j in idxs]
        gt = self._frame(self.gt_root, folder, i)
        return {"lq": np.stack([f[..., ::-1] for f in lqs]).copy(),
                "gt": gt[..., ::-1].copy(), "folder": folder, "idx": i}


def duf_downsample(x: np.ndarray, kernel_size: int = 13,
                   scale: int = 4) -> np.ndarray:
    """DUF official gaussian downsampling (ref data_util.py:283-313).

    x: (T, H, W, C) float frames → (T, H', W', C). Host-side numpy (this
    feeds the eval dataloader; training DUF synthesis is on-device).
    """
    assert scale in (2, 3, 4), f"Only support scale (2, 3, 4), got {scale}"
    # gaussian kernel, sigma = 0.4 * scale (ref generate_gaussian_kernel)
    from scipy import signal
    sigma = 0.4 * scale
    g1 = signal.windows.gaussian(kernel_size, std=sigma)
    kernel = np.outer(g1, g1)
    kernel /= kernel.sum()

    pad = kernel_size // 2 + scale * 2
    t, h, w, c = x.shape
    out = []
    for f in range(t):
        chans = []
        for ci in range(c):
            img = np.pad(x[f, :, :, ci], pad, mode="reflect")
            blurred = signal.convolve2d(img, kernel, mode="valid")
            sub = blurred[::scale, ::scale]
            chans.append(sub[2:-2, 2:-2])
        out.append(np.stack(chans, axis=-1))
    return np.stack(out)


def _mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[:h - h % scale, :w - w % scale]


@DATASET_REGISTRY.register()
class VideoRecurrentTestDataset(VideoTestDataset):
    """Whole-clip eval items for recurrent models (ref
    video_test_dataset.py:255-287): one item per folder, lq/gt (T,H,W,C)."""

    def __init__(self, opt: dict):
        super().__init__(opt)

    def __len__(self):
        return len(self.folders)

    def __getitem__(self, index):
        folder = self.folders[index]
        frames = sorted(scandir(osp.join(self.lq_root, folder)))
        lqs = [self._frame(self.lq_root, folder, i)
               for i in range(len(frames))]
        gts = [self._frame(self.gt_root, folder, i)
               for i in range(len(frames))]
        return {"lq": np.stack([f[..., ::-1] for f in lqs]).copy(),
                "gt": np.stack([f[..., ::-1] for f in gts]).copy(),
                "folder": folder}


@DATASET_REGISTRY.register()
class VideoTestDUFDataset(VideoTestDataset):
    """VideoTestDataset + optional on-the-fly DUF gaussian downsampling of
    the GT frames (ref video_test_dataset.py:202-252)."""

    def __getitem__(self, index):
        folder, i, total = self.items[index]
        idxs = generate_frame_indices(i, total, self.num_frame, self.padding)
        scale = self.opt.get("scale", 4)
        if self.opt.get("use_duf_downsampling"):
            gts = np.stack([_mod_crop(self._frame(self.gt_root, folder, j),
                                      scale) for j in idxs])
            lqs = duf_downsample(gts, kernel_size=13, scale=scale)
        else:
            lqs = np.stack([self._frame(self.lq_root, folder, j)
                            for j in idxs])
        gt = _mod_crop(self._frame(self.gt_root, folder, i), scale)
        return {"lq": np.ascontiguousarray(lqs[..., ::-1]),
                "gt": np.ascontiguousarray(gt[..., ::-1]),
                "folder": folder, "idx": i}
