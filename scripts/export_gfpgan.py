#!/usr/bin/env python
"""Export the production GFPGAN restorer as a deployable serving engine.

Parity role: the reference serves its plate/car restorer as TorchScript
artifacts loaded WITHOUT model source (api_plate_oto.py:336
`torch.jit.load`). This is the TPU analog for the GFPGAN family:
a jax.export StableHLO artifact of `Restorer`'s device-IO serving graph
(uint8 RGB in → uint8 BGR out, normalization and output conversion baked
in, weights embedded as constants) at a frozen (batch, H, W, 3) shape.

Loaded by `serve.engine_restorer.EngineFaceRestorer`, which is
duck-compatible with `Restorer`'s serving surface (`input_size`,
`restore_batch`, `restore_batch_u8`, `__call__`) — so it slots straight
into `ServiceCore(restorer=...)`, including micro-batching.

    python scripts/export_gfpgan.py --out engine_gfpgan/ \
        [--pth weights.pth] [--batch 32] [--quant dyn-int8]

Weights live inside engine.bin (~tens of MB for the production config,
halved by bf16); through the axon tunnel prefer building on CPU
(`JAX_PLATFORMS=cpu`) — the artifact is platform-checked at load.
"""

import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.abspath(_osp.join(_osp.dirname(__file__), "..")))

import argparse
import json
import os


def build_engine(net_opt=None, pth=None, batch=32, quant=None, dtype=None,
                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                 out_min_max=(-1, 1), with_geometry=False):
    """Returns (serialized_bytes, meta dict, restorer). u8 IO always —
    the engine IS the device-IO serving graph.

    with_geometry exports the FUSED post-detector pipeline graph instead
    (serve.pipeline.build_geo_fused, same restorer on the plate and car
    slots): (canvas_u8 (N,T,T,3 BGR), quads_f32 (N,4,2)) → (montage_u8
    (N,T,6T,3), masked_canvas_u8). Loaded by EngineGeoPipeline and
    slotted into PlatePipeline(geo_engine=...) — the whole product
    endpoint after the detector runs source-free from the artifact."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp
    from image_restoration_tpu.infer import Restorer, PRODUCTION_GFPGAN

    net_opt = dict(net_opt or PRODUCTION_GFPGAN)
    restorer = Restorer(net_opt, pth, quant=quant, dtype=dtype,
                        mean=mean, std=std, out_min_max=out_min_max)
    h, w = restorer.input_size
    if h is None:
        raise ValueError("GFPGAN engines need a fixed input size "
                         "(net_opt input_height/input_width)")
    params = restorer.variables["params"]

    if with_geometry:
        if h != w:
            raise ValueError("the fused geometry graph assumes a square "
                             f"canvas; got {h}x{w}")
        from image_restoration_tpu.serve.pipeline import build_geo_fused
        fused = build_geo_fused(restorer, restorer, h)

        def serve(canvas_u8, quads):
            return fused(params, params, canvas_u8, quads)

        specs = (jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8),
                 jax.ShapeDtypeStruct((batch, 4, 2), jnp.float32))
        exported = jexport.export(jax.jit(serve))(*specs)
    else:
        def serve(x_u8):
            # weights close over as constants → embedded in the artifact;
            # calling the jitted _fwd_u8 inside the trace inlines its graph
            return restorer._fwd_u8(params, x_u8)

        x_spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
        exported = jexport.export(jax.jit(serve))(x_spec)
    meta = {"model": net_opt["type"], "net_opt": net_opt, "batch": batch,
            "input_shape": [batch, h, w, 3], "input_dtype": "uint8",
            "io": "u8", "quant": quant, "mean": list(mean),
            "std": list(std), "out_min_max": list(out_min_max),
            "geometry": bool(with_geometry),
            "platforms": list(exported.platforms)}
    return exported.serialize(), meta, restorer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--pth", default=None,
                   help="reference GFPGAN .pth (params_ema) to import")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--quant", default=None, choices=[None, "dyn-int8"])
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--with-geometry", action="store_true",
                   help="export the fused post-detector pipeline graph "
                        "(crop/mask/restores/warp/paste/montage) instead "
                        "of the bare restorer")
    args = p.parse_args()

    import numpy as np
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    # the axon plugin overrides the JAX_PLATFORMS env var; re-apply it so
    # `JAX_PLATFORMS=cpu scripts/export_gfpgan.py` builds a CPU engine
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ser, meta, restorer = build_engine(
        pth=args.pth, batch=args.batch, quant=args.quant,
        dtype=jnp.bfloat16 if args.bf16 else None,
        with_geometry=args.with_geometry)

    # round-trip gate: deserialize and compare against the live graph.
    # Bitwise for float/bf16; dyn-int8 is a separate compilation of the
    # int8 chain → PSNR-gated (docs/PERFORMANCE.md "Chip calibration").
    h, w = restorer.input_size
    rng0 = np.random.default_rng(0)
    if args.with_geometry:
        from image_restoration_tpu.serve.pipeline import build_geo_fused
        canv = (rng0.random((args.batch, h, w, 3)) * 255).astype(np.uint8)
        quads = np.stack([np.float32(
            [[h // 5, h // 3], [4 * h // 5, h // 4],
             [3 * h // 4, 2 * h // 3], [h // 6, 3 * h // 4]])
            for _ in range(args.batch)])
        fused = build_geo_fused(restorer, restorer, h)
        params = restorer.variables["params"]
        want = np.asarray(fused(params, params, jnp.asarray(canv),
                                jnp.asarray(quads))[0], np.float32)
        got = np.asarray(jexport.deserialize(ser).call(
            jnp.asarray(canv), jnp.asarray(quads))[0], np.float32)
    else:
        x = (rng0.random((args.batch, h, w, 3)) * 255).astype(np.uint8)
        got = np.asarray(jexport.deserialize(ser).call(jnp.asarray(x)),
                         np.float32)
        want = restorer.restore_batch_u8(x).astype(np.float32)  # BGR u8
    mse = float(np.mean((got - want) ** 2))
    gate_db = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
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
