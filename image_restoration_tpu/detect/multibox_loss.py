"""MultiBox loss — jittable, vectorized matching.

Parity with Plate_Detect/Retina-License-Plate/layers/modules/multibox_loss.py
:9-125: SSD matching + encoding per image, smooth-L1 loc and landmark
losses on positives, cross-entropy confidence with 7:1 hard-negative mining.
The reference's per-image Python matching loop (:66-71) becomes a vmap; the
data-dependent positive/negative counts become masked reductions (static
shapes, no host sync).

Targets are padded to a fixed (B, M, 15) tensor: 4 bbox (corner, absolute
coords pre-normalized by image size) + 10 landmarks + label
(1 = plate w/ landmarks, −1 = plate w/o landmarks, 0 = padding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .box_utils import match


def smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def multibox_loss(predictions, priors, targets, variances=(0.1, 0.2),
                  overlap_thresh: float = 0.35, neg_pos_ratio: int = 7):
    """Returns (loss_loc, loss_conf, loss_landm) scalars.

    predictions: (loc (B,P,4), conf (B,P,2), landm (B,P,10)) raw logits.
    targets: (B, M, 15) padded as documented above.
    """
    loc_data, conf_data, landm_data = predictions
    b, num_priors = loc_data.shape[0], loc_data.shape[1]

    def match_one(t):
        truths = t[:, :4]
        landms = t[:, 4:14]
        labels = t[:, 14]
        # match() expects labels>0 valid; here both 1 and −1 are objects
        obj_labels = jnp.where(labels != 0,
                               jnp.where(labels > 0, 1.0, -1.0), 0.0)
        # run matching with validity = any object
        loc_t, conf_t, landm_t = match(
            truths, jnp.abs(obj_labels), landms, priors,
            jnp.asarray(variances), overlap_thresh)
        # re-attach the landmark-validity sign: conf_t is 0/1; matched gt
        # with label −1 → conf −1 (ref multibox_loss.py conf semantics)
        pf_label = obj_labels  # (M,)
        # find the label of the matched gt per prior
        from .box_utils import point_form, jaccard
        overlaps = jaccard(truths, point_form(priors)) * \
            (obj_labels != 0)[:, None]
        best_truth_idx = jnp.argmax(overlaps, axis=0)
        signed = pf_label[best_truth_idx]
        conf_signed = jnp.where(conf_t > 0, signed, 0.0)
        return loc_t, conf_signed, landm_t

    loc_t, conf_t, landm_t = jax.vmap(match_one)(targets)

    # ---- landmark loss: positives with landmarks (conf_t == 1)
    pos1 = conf_t > 0
    n1 = jnp.maximum(jnp.sum(pos1), 1.0)
    loss_landm = jnp.sum(
        smooth_l1(landm_data - landm_t) * pos1[..., None]) / n1

    # ---- localization loss: all objects (conf_t != 0)
    pos = conf_t != 0
    n = jnp.maximum(jnp.sum(pos), 1.0)
    loss_loc = jnp.sum(smooth_l1(loc_data - loc_t) * pos[..., None]) / n

    # ---- confidence loss with hard negative mining
    cls_target = pos.astype(jnp.int32)  # −1 labels train class 1 too
    logp = jax.nn.log_softmax(conf_data, axis=-1)
    ce = -jnp.take_along_axis(logp, cls_target[..., None],
                              axis=-1)[..., 0]  # (B,P)
    # mining score: logsumexp - true-class logit (ref :103-109)
    mining = jax.nn.logsumexp(conf_data, axis=-1) - \
        jnp.take_along_axis(conf_data, cls_target[..., None],
                            axis=-1)[..., 0]
    mining = jnp.where(pos, -jnp.inf, mining)
    # rank negatives per image
    order = jnp.argsort(-mining, axis=1)
    ranks = jnp.argsort(order, axis=1)
    num_pos = jnp.sum(pos, axis=1, keepdims=True)
    num_neg = jnp.clip(neg_pos_ratio * num_pos, 0, num_priors - 1)
    neg = ranks < num_neg
    loss_conf = jnp.sum(ce * (pos | neg)) / n
    return loss_loc, loss_conf, loss_landm
