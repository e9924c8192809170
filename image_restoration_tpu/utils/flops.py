"""Exact MXU-FLOP counting from jaxprs (training-roofline support).

XLA's compiled `cost_analysis()['flops']` on the TPU backend reports
post-fusion flops and can undercount convolutions that were rewritten or
fused, which made the round-3/4 "achieved TFLOP/s" training numbers (and
the 2-3%-MFU reading of them) untrustworthy as a *numerator*. This module
counts the algorithmic matmul/conv FLOPs straight from the jaxpr —
backend-independent, fusion-independent, exact for `dot_general` and
`conv_general_dilated` (2·MACs), and recursive through pjit / scan
(×length) / while (×1, flagged) / cond (max over branches, flagged) /
custom_{jvp,vjp} / remat.

Elementwise/reduction flops are NOT counted (they are never the v5e
bottleneck at these shapes; HBM bytes bound them — use XLA's
`bytes accessed` for that side of the roofline).

Reference context: the reference never measures utilization at all (its
only timing is the per-iter wall clock in basicsr/train.py:149-187).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import numpy as np
from jax import core as jcore


def _aval_shape(v):
    return tuple(getattr(v.aval, "shape", ()))


def _dot_general_flops(eqn) -> float:
    """2 · prod(out) · prod(contracting dims of lhs)."""
    (contract, _batch) = eqn.params["dimension_numbers"]
    lhs_c, _ = contract
    lhs_shape = _aval_shape(eqn.invars[0])
    k = math.prod(lhs_shape[d] for d in lhs_c) if lhs_c else 1
    out = math.prod(_aval_shape(eqn.outvars[0]))
    return 2.0 * out * k


def _conv_flops(eqn) -> float:
    """2 · prod(out) · (C_in/feature_groups) · prod(kernel spatial).

    `out` already includes batch and out-channels; grouped/depthwise convs
    divide the contraction depth by feature_group_count.
    """
    dn = eqn.params["dimension_numbers"]
    rhs_spec = dn.rhs_spec  # (out_ch, in_ch, *spatial)
    rhs_shape = _aval_shape(eqn.invars[1])
    in_ch_per_group = rhs_shape[rhs_spec[1]]
    ksp = math.prod(rhs_shape[d] for d in rhs_spec[2:])
    out = math.prod(_aval_shape(eqn.outvars[0]))
    return 2.0 * out * in_ch_per_group * ksp


def _sub_jaxprs(params):
    """Yield (jaxpr, multiplier, flagged) for every sub-jaxpr of an eqn."""
    # scan: body runs `length` times
    if "jaxpr" in params and "length" in params:
        yield params["jaxpr"], float(params["length"]), None
        return
    if "branches" in params:  # cond / switch: report the max branch
        yield ("__max__", params["branches"]), 1.0, "cond"
        return
    if "cond_jaxpr" in params and "body_jaxpr" in params:  # while
        yield params["body_jaxpr"], 1.0, "while"
        yield params["cond_jaxpr"], 1.0, "while"
        return
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in params and params[key] is not None:
            yield params[key], 1.0, None


def _count(jaxpr, acc: Dict[str, Any], mult: float):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            f = _dot_general_flops(eqn) * mult
            acc["matmul"] += f
            acc["by_shape"][_eqn_sig(eqn)] = (
                acc["by_shape"].get(_eqn_sig(eqn), 0.0) + f)
        elif prim == "conv_general_dilated":
            f = _conv_flops(eqn) * mult
            acc["conv"] += f
            acc["by_shape"][_eqn_sig(eqn)] = (
                acc["by_shape"].get(_eqn_sig(eqn), 0.0) + f)
        else:
            for sub, m, flag in _sub_jaxprs(eqn.params):
                if flag == "cond":
                    best, best_acc = -1.0, None
                    for br in sub[1]:
                        a = _new_acc()
                        _count(_as_jaxpr(br), a, mult * m)
                        tot = a["matmul"] + a["conv"]
                        if tot > best:
                            best, best_acc = tot, a
                    if best_acc is not None:
                        _merge(acc, best_acc)
                        acc["flags"].add("cond:max-branch")
                else:
                    if flag:
                        acc["flags"].add(f"{flag}:x1")
                    _count(_as_jaxpr(sub), acc, mult * m)


def _as_jaxpr(j):
    return j.jaxpr if hasattr(j, "jaxpr") else j


def _eqn_sig(eqn) -> str:
    ins = ",".join("x".join(map(str, _aval_shape(v))) for v in eqn.invars[:2])
    out = "x".join(map(str, _aval_shape(eqn.outvars[0])))
    return f"{eqn.primitive.name}[{ins}->{out}]"


def _new_acc():
    return {"matmul": 0.0, "conv": 0.0, "by_shape": {}, "flags": set()}


def _merge(dst, src):
    dst["matmul"] += src["matmul"]
    dst["conv"] += src["conv"]
    for k, v in src["by_shape"].items():
        dst["by_shape"][k] = dst["by_shape"].get(k, 0.0) + v
    dst["flags"] |= src["flags"]


def count_flops(fn, *args, top=12, **kwargs) -> Dict[str, Any]:
    """Count exact matmul+conv FLOPs of `fn(*args, **kwargs)`.

    Returns {total, matmul, conv, flags, top_shapes: [(sig, flops), ...]}.
    `fn` may be jitted or plain; grad/scan/cond all traced through.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    acc = _new_acc()
    _count(jaxpr.jaxpr, acc, 1.0)
    top_shapes = sorted(acc["by_shape"].items(), key=lambda kv: -kv[1])[:top]
    return {
        "total": acc["matmul"] + acc["conv"],
        "matmul": acc["matmul"],
        "conv": acc["conv"],
        "flags": sorted(acc["flags"]),
        "top_shapes": [(k, float(v)) for k, v in top_shapes],
    }
