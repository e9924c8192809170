#!/usr/bin/env python
"""Export the tiled SR restorer as a deployable serving engine.

Parity role: the reference serves its plate restorer as a TorchScript
artifact (`api_plate_oto.py:336`) and its detector through TensorRT
engines. The TPU analog of an "engine" is a serialized AOT-compiled
StableHLO function: shape-frozen, loadable without the model source, and
runnable with nothing but jax.export + the weights bundled inside.

This script builds SRVGGNetCompact (the BASELINE serving model), optionally
imports torch weights, applies the int8 PTQ + 2-way channel packing
serving path (ops/quantized_inference.py), and writes:

  <out>/engine.bin    jax.export-serialized StableHLO of the serving fn
                      at the frozen (batch, tile+2·halo)² input shape
  <out>/engine.json   shape/dtype/halo metadata for the serving host

Round-trip (deserialize → call) is verified before writing.
"""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..")))

import argparse
import json
import os


def build_engine(num_feat=64, num_conv=32, upscale=4, tile=512, halo=8,
                 batch=8, pth=None, int8=True, calib=None, seed=0,
                 io="bf16", qat_ckpt=None):
    """Returns (serialized_bytes, meta dict, reference outputs fn).

    io="u8" freezes DEVICE-side IO into the engine: uint8 [0,255] tiles
    in, uint8 output tiles out, with the /255 and clip/round conversions
    inside the exported graph — 4× less traffic between the serving host
    and the chip (the Restorer.restore_batch_u8 analog, baked into the
    artifact)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from image_restoration_tpu.archs import build_network
    from image_restoration_tpu.ops.packed_inference import (
        pack_srvgg_params, packed_srvgg_forward)
    from image_restoration_tpu.ops.quantized_inference import (
        calibrate_srvgg_act_scales, quantize_srvgg_params,
        quantized_srvgg_forward)

    size = tile + 2 * halo
    rng = np.random.default_rng(seed)

    if qat_ckpt:
        # Export from a quantization-aware-training checkpoint
        # (train.quant_opt): the EMA params trained against the fake-quant
        # twin of this very serving graph, with the learned activation
        # scales standing in for the calibration batch (ops/qat.py).
        # No net init / calibration needed — everything is in the ckpt.
        if pth:
            raise ValueError("--pth and --qat-ckpt are mutually exclusive "
                             "(the checkpoint carries the weights)")
        if not int8:
            raise ValueError("--bf16 conflicts with --qat-ckpt: a QAT "
                             "checkpoint is trained for the int8 serving "
                             "graph; drop --bf16 (or export the float EMA "
                             "params via the regular path)")
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            _osp.abspath(qat_ckpt))
        params = restored.get("ema_g") or restored["params_g"]
        qscale = np.asarray(restored["qscale"])
        assert len(qscale) == num_conv + 3, \
            f"checkpoint num_conv mismatch: {len(qscale) - 3} vs {num_conv}"
        if float(qscale.min()) <= 0.0:
            raise ValueError(
                "checkpoint qscale contains untrained (<= 0) activation "
                "scales — it was saved before any QAT training step")
        # the round-trip gate can't catch geometry lies (it compares the
        # engine against the same serve fn), so validate against the
        # checkpoint's own shapes
        feat_ck = np.asarray(params["body_0"]["kernel"]).shape[-1]
        out_ck = np.asarray(params["conv_last"]["kernel"]).shape[-1]
        assert feat_ck == num_feat, \
            f"checkpoint num_feat mismatch: {feat_ck} vs {num_feat}"
        assert out_ck == 3 * upscale ** 2, \
            (f"checkpoint upscale mismatch: conv_last has {out_ck} output "
             f"channels, expected {3 * upscale ** 2} for upscale={upscale}")
        q = quantize_srvgg_params(params, [float(s) for s in qscale],
                                  num_conv, pack=2)

        def serve(x):
            return quantized_srvgg_forward(q, x, num_conv, upscale, pack=2)

    else:
        net = build_network(dict(type="SRVGGNetCompact", num_feat=num_feat,
                                 num_conv=num_conv, upscale=upscale,
                                 dtype=jnp.bfloat16))
        x1 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32),
                         jnp.bfloat16)
        variables = jax.jit(net.init)(jax.random.PRNGKey(seed), x1)
        params = variables["params"]
        if pth:
            from image_restoration_tpu.convert.torch_import import (
                import_network, load_pth)
            params = import_network("SRVGGNetCompact", net,
                                    {"params": params},
                                    load_pth(pth))["params"]
        if int8:
            if calib is None:
                calib = jnp.asarray(rng.random((2, 128, 128, 3),
                                               np.float32))
            scales = jax.device_get(jax.jit(
                lambda p, x: calibrate_srvgg_act_scales(p, x, num_conv))(
                jax.tree.map(lambda a: a.astype(jnp.float32), params),
                calib))
            q = quantize_srvgg_params(jax.device_get(params),
                                      [float(s) for s in scales],
                                      num_conv, pack=2)

            def serve(x):
                return quantized_srvgg_forward(q, x, num_conv, upscale,
                                               pack=2)
        else:
            packed = pack_srvgg_params(params, num_conv)

            def serve(x):
                return packed_srvgg_forward(packed, x, num_conv, upscale)

    if io == "u8":
        inner = serve

        def serve(x_u8):
            y = inner(x_u8.astype(jnp.bfloat16) / 255.0)
            y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0)
            return jnp.round(y * 255.0).astype(jnp.uint8)

        in_dtype, in_dtype_name = jnp.uint8, "uint8"
    elif io == "bf16":
        in_dtype, in_dtype_name = jnp.bfloat16, "bfloat16"
    else:
        raise ValueError(f"unknown io {io!r}")

    x_spec = jax.ShapeDtypeStruct((batch, size, size, 3), in_dtype)
    exported = jexport.export(jax.jit(serve))(x_spec)
    ser = exported.serialize()

    meta = {"model": "SRVGGNetCompact", "num_feat": num_feat,
            "num_conv": num_conv, "upscale": upscale, "tile": tile,
            "halo": halo, "batch": batch, "mode": "int8" if int8 else
            "bf16", "io": io, "input_shape": [batch, size, size, 3],
            "input_dtype": in_dtype_name, "qat": bool(qat_ckpt),
            "platforms": list(exported.platforms)}
    return ser, meta, serve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--pth", default=None, help="torch SRVGG weights")
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--halo", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num_conv", type=int, default=32)
    p.add_argument("--bf16", action="store_true",
                   help="skip int8 PTQ, export the packed bf16 path")
    p.add_argument("--u8-io", action="store_true",
                   help="bake device-side IO into the engine: uint8 tiles "
                        "in/out, /255 + clip/round inside the graph")
    p.add_argument("--qat-ckpt", default=None,
                   help="orbax checkpoint dir of a train.quant_opt run: "
                        "export the QAT EMA params with the learned "
                        "activation scales (implies int8)")
    p.add_argument("--num_feat", type=int, default=64)
    p.add_argument("--upscale", type=int, default=4)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    # the axon plugin overrides the JAX_PLATFORMS env var; re-apply it so
    # `JAX_PLATFORMS=cpu scripts/export_restorer.py` builds a CPU engine
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ser, meta, serve = build_engine(
        num_feat=args.num_feat, num_conv=args.num_conv,
        upscale=args.upscale, tile=args.tile, halo=args.halo,
        batch=args.batch, pth=args.pth, int8=not args.bf16,
        io="u8" if args.u8_io else "bf16", qat_ckpt=args.qat_ckpt)

    # Round-trip gate before writing. Exactness is NOT required for the
    # int8 engine: the deserialized module is a separate XLA compilation,
    # and ulp-level fusion differences in the bf16 epilogues shift
    # per-layer requant rounding points — each compilation is a valid
    # quantization realization (measured on v5e: engine 36.6 dB vs the
    # bf16 reference where the jit path scores 36.4 dB). Gate at >=30 dB.
    size = args.tile + 2 * args.halo
    if args.u8_io:
        x = jnp.asarray((np.random.default_rng(0).random(
            (args.batch, size, size, 3)) * 255).astype(np.uint8))
    else:
        x = jnp.asarray(np.random.default_rng(0).random(
            (args.batch, size, size, 3)), jnp.bfloat16)
    got = np.asarray(jexport.deserialize(ser).call(x), np.float32)
    want = np.asarray(serve(x), np.float32)
    mse = float(np.mean((got - want) ** 2))
    span = float(want.max() - want.min()) or 1.0
    gate_db = 10 * np.log10(span ** 2 / max(mse, 1e-12))
    print(f"engine vs jit round-trip: {gate_db:.1f} dB")
    assert gate_db >= 30.0, f"engine round-trip too lossy: {gate_db:.1f} dB"

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "engine.bin"), "wb") as f:
        f.write(ser)
    with open(os.path.join(args.out, "engine.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"engine: {len(ser) / 1e6:.1f} MB, {meta}")


if __name__ == "__main__":
    main()
