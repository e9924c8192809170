"""Optical-flow IO — parity with basicsr/utils/flow_util.py:7-150.

.flo read/write, uint16 quantized flow read/write (the video-SR support
path).
"""

from __future__ import annotations

import os
from os import path as osp

import numpy as np


def flowread(flow_path: str, quantize: bool = False, concat_axis: int = 0,
             *args, **kwargs) -> np.ndarray:
    """Read a .flo file or a quantized dual-channel image (ref :7-48)."""
    if quantize:
        import cv2
        cat_flow = cv2.imread(flow_path, cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f"{flow_path} is not a valid quantized flow")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs)
    with open(flow_path, "rb") as f:
        try:
            header = f.read(4).decode("utf-8")
        except Exception:
            raise IOError(f"Invalid flow file: {flow_path}")
        if header != "PIEH":
            raise IOError(f"Invalid flow file header: {flow_path}")
        w = np.fromfile(f, np.int32, 1).squeeze()
        h = np.fromfile(f, np.int32, 1).squeeze()
        flow = np.fromfile(f, np.float32, int(w * h * 2))
        return flow.reshape((int(h), int(w), 2))


def flowwrite(flow: np.ndarray, filename: str, quantize: bool = False,
              concat_axis: int = 0, *args, **kwargs) -> None:
    """Write flow (ref :51-80)."""
    if not quantize:
        with open(filename, "wb") as f:
            f.write(b"PIEH")
            np.array([flow.shape[1], flow.shape[0]], np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
            f.flush()
        return
    import cv2
    dx, dy = quantize_flow(flow, *args, **kwargs)
    dxdy = np.concatenate((dx, dy), axis=concat_axis)
    os.makedirs(osp.dirname(osp.abspath(filename)), exist_ok=True)
    cv2.imwrite(filename, dxdy)


def quantize_flow(flow: np.ndarray, max_val: float = 0.02,
                  norm: bool = True):
    """Flow → two uint8 maps (ref :83-110)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    flow_comps = [quantize(d, -max_val, max_val, 255, np.uint8)
                  for d in [dx, dy]]
    return tuple(flow_comps)


def dequantize_flow(dx: np.ndarray, dy: np.ndarray, max_val: float = 0.02,
                    denorm: bool = True) -> np.ndarray:
    """Inverse of quantize_flow (ref :113-136)."""
    assert dx.shape == dy.shape
    dx, dy = [dequantize(d, -max_val, max_val, 255) for d in [dx, dy]]
    if denorm:
        dx *= dx.shape[1]
        dy *= dx.shape[0]
    return np.dstack((dx, dy))


def quantize(arr, min_val, max_val, levels, dtype=np.int64):
    """Uniform quantization (ref :139-150 analog)."""
    arr = np.clip(arr, min_val, max_val - 1e-9)
    return ((arr - min_val) / (max_val - min_val) * levels).astype(dtype)


def dequantize(arr, min_val, max_val, levels):
    return (arr.astype(np.float64) + 0.5) / levels * \
        (max_val - min_val) + min_val
