#!/usr/bin/env python
"""Export the plate detector as a deployable artifact.

Parity role: the reference's ONNX→TRT chain (convert_onnx.py,
create_post_process.py, add_nms_plugin.py, trtexec). On TPU the "engine" is
the jitted detect graph; this script (a) converts weights to an orbax
checkpoint and (b) AOT-lowers/compiles the full graph (net + decode + NMS)
and reports its compiled stats — the artifact a serving host loads.
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..")))


import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="Resnet18")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--ckpt", default=None,
                   help="torch .pth or orbax checkpoint to load")
    p.add_argument("--out", required=True, help="orbax output dir")
    p.add_argument("--batch", type=int, default=4,
                   help="engine batch size (ref TRT profile 1-4)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import os.path as osp
    from image_restoration_tpu.detect.engine import PlateDetector

    det = PlateDetector(backbone=args.backbone, image_size=args.image_size,
                        ckpt_path=args.ckpt)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(args.out),
               jax.tree.map(np.asarray, det.variables), force=True)
    ckptr.wait_until_finished()

    # AOT compile the full engine graph at the serving batch size
    x = jnp.zeros((args.batch, args.image_size, args.image_size, 3),
                  jnp.float32)
    lowered = jax.jit(det._detect.__wrapped__
                      if hasattr(det._detect, "__wrapped__")
                      else det._detect).lower(det.variables, x)
    compiled = lowered.compile()
    print(f"exported weights → {args.out}")
    print(f"AOT-compiled detect graph: batch={args.batch}, "
          f"input {x.shape}, flops≈"
          f"{compiled.cost_analysis().get('flops', 0) / 1e9:.2f} GFLOP")


if __name__ == "__main__":
    main()
