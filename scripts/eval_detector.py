#!/usr/bin/env python
"""Detector evaluation CLI — parity with Plate_Detect/Retina-License-Plate/
test.py:69-231: per-image detection .txt files (name, count, then
`x y w h confidence` lines) plus optional rendered boxes + landmark dots.

Coordinates are written in ORIGINAL-image pixels (the reference writes them
in its intermediate resized frame — an artifact of its resize chain; the
txt format is identical).
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..")))


import argparse
import os
import os.path as osp
import time

import cv2
import numpy as np

from image_restoration_tpu.detect.engine import PlateDetector
from image_restoration_tpu.utils.misc import scandir


def main():
    p = argparse.ArgumentParser(description="RetinaFace plate eval")
    p.add_argument("-m", "--trained_model", default=None,
                   help="orbax dir or torch .pth/.tar checkpoint")
    p.add_argument("--network", default="Resnet18",
                   choices=("Resnet18", "Resnet50", "mobilenet0.25",
                            "MobilenetV3"))
    p.add_argument("--dataset_folder", required=True)
    p.add_argument("--testset_list", default=None,
                   help="optional txt listing image names; defaults to "
                        "scanning --dataset_folder")
    p.add_argument("--confidence_threshold", type=float, default=0.02)
    p.add_argument("--nms_threshold", type=float, default=0.4)
    p.add_argument("--save_folder", default="./plate_txt/")
    p.add_argument("--save_image", action="store_true")
    p.add_argument("--results_folder", default="./results/")
    p.add_argument("--vis_thres", type=float, default=0.5)
    args = p.parse_args()

    det = PlateDetector(backbone=args.network,
                        ckpt_path=args.trained_model,
                        score_threshold=args.confidence_threshold,
                        iou_threshold=args.nms_threshold)

    if args.testset_list:
        with open(args.testset_list) as fr:
            names = fr.read().split()
    else:
        names = sorted(scandir(args.dataset_folder,
                               suffix=("png", "jpg", "jpeg", "bmp")))
    os.makedirs(args.save_folder, exist_ok=True)
    if args.save_image:
        os.makedirs(args.results_folder, exist_ok=True)

    t_forward = 0.0
    for i, name in enumerate(names):
        img_raw = cv2.imread(osp.join(args.dataset_folder, name),
                             cv2.IMREAD_COLOR)
        if img_raw is None:
            print(f"skip unreadable {name}")
            continue
        t0 = time.perf_counter()
        boxes, scores, landms, valid = det.detect_image(img_raw)
        t_forward += time.perf_counter() - t0

        keep = valid.astype(bool)
        dets = np.concatenate(
            [boxes[keep], scores[keep, None], landms[keep]], axis=1)

        txt_path = osp.join(args.save_folder,
                            osp.splitext(name)[0] + ".txt")
        os.makedirs(osp.dirname(txt_path) or ".", exist_ok=True)
        with open(txt_path, "w") as fd:
            fd.write(osp.splitext(osp.basename(name))[0] + "\n")
            fd.write(f"{len(dets)}\n")
            for b in dets:
                x, y = int(b[0]), int(b[1])
                w, h = int(b[2]) - int(b[0]), int(b[3]) - int(b[1])
                fd.write(f"{x} {y} {w} {h} {b[4]} \n")
        print(f"im_detect: {i + 1}/{len(names)} "
              f"avg_time: {t_forward / (i + 1):.4f}s")

        if args.save_image:
            img = img_raw.copy()
            for b in dets:
                if b[4] < args.vis_thres:
                    continue
                text = f"{b[4]:.4f}"
                bi = list(map(int, b))
                cv2.rectangle(img, (bi[0], bi[1]), (bi[2], bi[3]),
                              (0, 0, 255), 2)
                cv2.putText(img, text, (bi[0], bi[1] + 12),
                            cv2.FONT_HERSHEY_DUPLEX, 0.5, (255, 255, 255))
                colors = [(0, 200, 200), (0, 255, 255), (255, 0, 255),
                          (0, 255, 0), (255, 0, 0)]
                for j, color in enumerate(colors):
                    cv2.circle(img, (bi[5 + 2 * j], bi[6 + 2 * j]), 1,
                               color, 4)
            cv2.imwrite(osp.join(args.results_folder, f"{i}.jpg"), img)


if __name__ == "__main__":
    main()
