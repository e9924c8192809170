"""Box/landmark coding, IoU, matching and NMS — jittable.

Parity with Plate_Detect/Retina-License-Plate/utils/box_utils.py:
encode/encode_landm (:156-206), decode/decode_landm (:209-248), match (:96)
and the CPU/GPU NMS (utils/nms/py_cpu_nms.py, box_utils.py:264). The NMS
replaces the whole TensorRT BatchedNMSCustomDynamic_TRT plugin
(rlp/create_plugin/plugins/*): vectorized IoU + top_k + a masked greedy
suppression loop, all inside jit.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def point_form(boxes):
    """(cx,cy,w,h) → (x1,y1,x2,y2)."""
    return jnp.concatenate([boxes[..., :2] - boxes[..., 2:] / 2,
                            boxes[..., :2] + boxes[..., 2:] / 2], -1)


def intersect(box_a, box_b):
    """(A,4),(B,4) corner boxes → (A,B) intersection areas."""
    max_xy = jnp.minimum(box_a[:, None, 2:], box_b[None, :, 2:])
    min_xy = jnp.maximum(box_a[:, None, :2], box_b[None, :, :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    return inter[..., 0] * inter[..., 1]


def jaccard(box_a, box_b):
    """(A,B) IoU of corner boxes."""
    inter = intersect(box_a, box_b)
    area_a = ((box_a[:, 2] - box_a[:, 0]) *
              (box_a[:, 3] - box_a[:, 1]))[:, None]
    area_b = ((box_b[:, 2] - box_b[:, 0]) *
              (box_b[:, 3] - box_b[:, 1]))[None, :]
    return inter / (area_a + area_b - inter)


def encode(matched, priors, variances):
    """Corner gt matched per prior → loc targets (ref :156-183)."""
    g_cxcy = (matched[:, :2] + matched[:, 2:]) / 2 - priors[:, :2]
    g_cxcy = g_cxcy / (variances[0] * priors[:, 2:])
    g_wh = (matched[:, 2:] - matched[:, :2]) / priors[:, 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-8)) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], 1)


def encode_landm(matched, priors, variances):
    """(P, 10) landmark targets (ref :186-206)."""
    matched = matched.reshape(-1, 5, 2)
    g_cxcy = matched - priors[:, None, :2]
    g_cxcy = g_cxcy / (variances[0] * priors[:, None, 2:])
    return g_cxcy.reshape(-1, 10)


def decode(loc, priors, variances):
    """loc predictions → corner boxes (ref :209-230)."""
    boxes = jnp.concatenate([
        priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
        priors[:, 2:] * jnp.exp(loc[:, 2:] * variances[1])], 1)
    return jnp.concatenate([boxes[:, :2] - boxes[:, 2:] / 2,
                            boxes[:, :2] + boxes[:, 2:] / 2], 1)


def decode_landm(pre, priors, variances):
    """(P, 10) landmark predictions → absolute coords (ref :233-248)."""
    pre = pre.reshape(pre.shape[0], 5, 2)
    landms = priors[:, None, :2] + pre * variances[0] * priors[:, None, 2:]
    return landms.reshape(landms.shape[0], 10)


def match(truths, labels, landms, priors, variances, threshold: float):
    """SSD matching for ONE image, vectorized (ref box_utils.py:96-153).

    truths: (M, 4) corner gt (padded rows have label 0), labels: (M,),
    landms: (M, 10). Returns (loc_t, conf_t, landm_t) per prior.
    """
    pf = point_form(priors)
    valid = labels > 0  # padded gt rows excluded
    overlaps = jaccard(truths, pf) * valid[:, None]  # (M, P)

    best_prior_overlap = jnp.max(overlaps, axis=1)  # (M,)
    best_prior_idx = jnp.argmax(overlaps, axis=1)
    best_truth_overlap = jnp.max(overlaps, axis=0)  # (P,)
    best_truth_idx = jnp.argmax(overlaps, axis=0)

    # force each (valid, matchable) gt's best prior to that gt
    gt_ok = valid & (best_prior_overlap >= 0.2)  # ref filters tiny overlaps
    best_truth_overlap = best_truth_overlap.at[best_prior_idx].set(
        jnp.where(gt_ok, 2.0, best_truth_overlap[best_prior_idx]))
    m = truths.shape[0]
    best_truth_idx = best_truth_idx.at[best_prior_idx].set(
        jnp.where(gt_ok, jnp.arange(m), best_truth_idx[best_prior_idx]))

    matched = truths[best_truth_idx]
    conf = labels[best_truth_idx]
    conf = jnp.where(best_truth_overlap < threshold, 0, conf)
    loc_t = encode(matched, priors, variances)
    landm_t = encode_landm(landms[best_truth_idx], priors, variances)
    return loc_t, conf, landm_t


def nms_jax(boxes, scores, iou_threshold: float = 0.6, top_k: int = 200,
            score_threshold: float = 0.0):
    """Greedy NMS inside jit (TRT batchedNMS plugin equivalent).

    boxes: (N, 4) corner; scores: (N,). Returns (keep_boxes (top_k,4),
    keep_scores (top_k,), valid (top_k,) bool) sorted by score; suppressed /
    below-threshold entries have valid=False.
    """
    k = min(top_k, boxes.shape[0])
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    iou = jaccard(top_boxes, top_boxes)

    def body(i, keep):
        # suppress j > i when iou > threshold and i is kept
        row = (iou[i] > iou_threshold) & (jnp.arange(k) > i) & keep[i]
        return keep & ~row

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    keep = keep & (top_scores > score_threshold)
    return top_boxes, top_scores, keep, order


def py_cpu_nms(dets: np.ndarray, thresh: float) -> list:
    """Host NMS (ref utils/nms/py_cpu_nms.py:10) for eval scripts."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], \
        dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return keep
