"""End-to-end product pipeline: detect → crop/mask/pad → restore plate +
car → perspective paste-back → montage.

Parity with Car_Plate-Restoration/api_plate_oto.py:
  * detector landmarks scaled to the 256² canvas (:238-245)
  * crop = boundingRect of corner landmarks [p1,p2,p5,p4], polygon mask,
    masked composite, aspect-preserving pad to 256² (:264-297; the reference
    saves the mask-composite `dst`, i.e. black background — preserved)
  * plate restorer fed WITHOUT BGR→RGB swap, car restorer WITH it, both
    ±0.5-normalized, outputs (−1,1) (:349-401)
  * perspective warp of the restored plate back onto the restored car with
    a polygon mask paste (:304-320, :455-466)
  * 6-panel montage hconcat (:449-466)

The reference's disk round-trips (image.jpg / results.jpg / ...) are gone —
everything stays in memory; the TRT engine + TorchScript + torch GFPGAN trio
become three jitted JAX graphs.
"""

from __future__ import annotations

import base64
from typing import Dict, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..infer import Restorer, PRODUCTION_GFPGAN
from ..detect.engine import PlateDetector


def image_to_base64(img_bgr: np.ndarray) -> str:
    """utils.py:image_to_base64 parity."""
    _, buf = cv2.imencode(".jpg", img_bgr)
    return base64.b64encode(buf.tobytes()).decode("utf-8")


def base64_to_image(data: str) -> np.ndarray:
    """utils.py:base64_to_image parity."""
    arr = np.frombuffer(base64.b64decode(data), np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


def resize_with_padding(img_bgr: np.ndarray, expected=(256, 256),
                        fill: int = 0) -> np.ndarray:
    """PIL thumbnail+expand equivalent (api_plate_oto.py:186-194)."""
    h, w = img_bgr.shape[:2]
    scale = min(expected[0] / w, expected[1] / h, 1.0)
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    resized = cv2.resize(img_bgr, (nw, nh))
    canvas = np.full((expected[1], expected[0], 3), fill, np.uint8)
    x0 = (expected[0] - nw) // 2
    y0 = (expected[1] - nh) // 2
    canvas[y0:y0 + nh, x0:x0 + nw] = resized
    return canvas


def build_geo_fused(plate_restorer, car_restorer, target: int):
    """ONE jitted graph for everything after the detector: masked
    boundingRect crop+resize → both restores → perspective warp-back →
    paste → 6-panel montage (the host stages of ref
    api_plate_oto.py:264-320,449-466, on device via ops/geometry.py).

    Signature: fused(params_plate, params_car, canvas_u8 (N,T,T,3 BGR),
    quads_f32 (N,4,2)) → (montage_u8 (N,T,6T,3), masked_canvas_u8).
    Params/images enter as jit ARGUMENTS (axon constant-embedding rule);
    `scripts/export_gfpgan.py --with-geometry` exports this same graph
    with the params baked in as a source-free artifact."""
    import jax
    import jax.numpy as jnp
    from ..ops.geometry import (bbox_of_quad, crop_resize, det3x3,
                                homography_square_to_quad, pad_resize,
                                quad_mask, quad_mask_aa, warp_perspective)

    t = target
    plate, car = plate_restorer, car_restorer
    same = plate is car
    for name, r in (("plate", plate), ("car", car)):
        # the fused graph feeds the net at the canvas size directly; a
        # restorer whose serving surface would resize (input_size !=
        # target) or shard (data_parallel) would silently diverge from
        # the host path here — refuse instead
        isz = getattr(r, "input_size", (None, None))
        if isz[0] is not None and tuple(isz) != (t, t):
            raise ValueError(
                f"device_geometry: {name} restorer input_size {isz} != "
                f"pipeline target ({t}, {t}) — the fused graph does not "
                "re-implement the resize step")
        if getattr(r, "data_parallel", 0) and r.data_parallel > 1:
            raise ValueError(
                f"device_geometry does not support data_parallel "
                f"restorers ({name} has data_parallel={r.data_parallel})")
    mean_p, std_p = (jnp.asarray(plate.mean), jnp.asarray(plate.std))
    mean_c, std_c = (jnp.asarray(car.mean), jnp.asarray(car.std))
    lo_p, hi_p = plate.out_min_max
    lo_c, hi_c = car.out_min_max

    def apply_net(net, quant, params, x):
        if quant == "dyn-int8":
            from ..ops import modulated_conv
            with modulated_conv.int8_serving():
                out = net.apply({"params": params}, x)
        else:
            out = net.apply({"params": params}, x)
        return out[0] if isinstance(out, tuple) else out

    def pre(canvas_f, quad):
        # crop composite: drawContours-AA twin (keeps the ~1.5 px AA
        # ink band); paste: fillPoly twin (hard polygon) — matching
        # the two different cv2 masks the host path draws
        masked = canvas_f * quad_mask_aa(quad, (t, t))[..., None]
        paste_mask = quad_mask(quad, (t, t))
        bbox = bbox_of_quad(quad, (t, t))
        crop_rs = crop_resize(masked, bbox, (t, t))   # BGR f32 0..255
        crop_pad = pad_resize(masked, bbox, (t, t))
        return masked, paste_mask, crop_rs, crop_pad

    def post(crop_rs, plate_f, car_f, mask, quad):
        # closed-form square→quad homography: no LAPACK custom call, so
        # the graph stays exportable (engine artifacts) and TPU-cheap
        m = homography_square_to_quad(float(t), quad)
        # degenerate quad → black warped content (the host path's f64
        # garbage matrix also lands ~nowhere). TWO failure shapes: a
        # repeated q2/q3 corner makes m non-finite (den=0), while a
        # repeated q0/q1 corner leaves m FINITE but singular (det=0 —
        # inv3x3 would NaN-poison the warp), so guard both.
        m_ok = jnp.all(jnp.isfinite(m)) & (jnp.abs(det3x3(m)) > 1e-8)
        m_safe = jnp.where(m_ok, m, jnp.eye(3, dtype=m.dtype))
        ok_f = m_ok.astype(crop_rs.dtype)
        # both warps sample the SAME homography at the same grid: stack
        # channel-wise so the coordinate math + the 4 bilinear gathers run
        # ONCE over 6 channels instead of twice over 3 (bilinear is
        # per-channel — bit-identical to two separate warps). The 2D
        # gathers are the fused graph's dominant geometry cost on TPU.
        both = warp_perspective(jnp.concatenate([crop_rs, plate_f],
                                                axis=-1), m_safe) * ok_f
        transform, plate_warp = both[..., :3], both[..., 3:]
        pasted = jnp.where((mask > 0)[..., None], plate_warp, car_f)
        return transform, pasted

    def fused(params_p, params_c, canvas_u8, quads):
        canvas_f = canvas_u8.astype(jnp.float32)
        masked, mask, crop_rs, crop_pad = jax.vmap(pre)(canvas_f, quads)
        # plate input: NO channel swap (ref :349-374, the net saw
        # BGR); car input: BGR→RGB (ref :376-401)
        plate_in = (crop_rs / 255.0 - mean_p) / std_p
        car_in = (canvas_f[..., ::-1] / 255.0 - mean_c) / std_c
        if same:
            n = canvas_u8.shape[0]
            out = apply_net(plate.net, plate.quant, params_p,
                            jnp.concatenate([plate_in, car_in]))
            out_p, out_c = out[:n], out[n:]
        else:
            out_p = apply_net(plate.net, plate.quant, params_p, plate_in)
            out_c = apply_net(car.net, car.quant, params_c, car_in)
        yp = (jnp.clip(out_p.astype(jnp.float32), lo_p, hi_p) - lo_p)
        plate_f = yp / (hi_p - lo_p) * 255.0    # stays in net order
        yc = (jnp.clip(out_c.astype(jnp.float32), lo_c, hi_c) - lo_c)
        car_f = (yc / (hi_c - lo_c))[..., ::-1] * 255.0   # → BGR
        transform, pasted = jax.vmap(post)(crop_rs, plate_f, car_f,
                                           mask, quads)
        montage = jnp.concatenate(
            [canvas_f, plate_f, car_f, crop_pad, transform, pasted],
            axis=2)
        montage_u8 = jnp.round(jnp.clip(montage, 0.0, 255.0)
                               ).astype(jnp.uint8)
        masked_u8 = jnp.round(masked).astype(jnp.uint8)
        return montage_u8, masked_u8

    return jax.jit(fused)


class PlatePipeline:
    """detector + plate restorer + car restorer, all-TPU."""

    TARGET = 256

    def __init__(self, detector: Optional[PlateDetector] = None,
                 plate_restorer: Optional[Restorer] = None,
                 car_restorer: Optional[Restorer] = None,
                 detector_ckpt: Optional[str] = None,
                 plate_ckpt: Optional[str] = None,
                 car_ckpt: Optional[str] = None, dtype=None,
                 device_io: bool = True, device_geometry: bool = False,
                 geo_engine=None):
        """device_io routes the restores through Restorer.restore_batch_u8
        (uint8 on the wire both ways, normalization/uint8-conversion on
        device) — equivalent to the host float path to ≤1 LSB; set False
        for the reference-exact host normalize (api_plate_oto.py:386-390
        does it on host with torch). Duck-typed restorers without the u8
        entry point fall back to the host path automatically.

        device_geometry moves EVERY post-detector stage on device —
        polygon mask, boundingRect crop+resize, both restores, the
        perspective warp-back, paste and montage assembly run as ONE
        jitted dispatch per chunk (ops/geometry.py), so the host does
        only JPEG decode + the initial resizes. Equivalent to the host
        path up to cv2's fixed-point bilinear rounding (~1 LSB interior)
        and polygon-edge rasterization (≤1-px band); set False for the
        reference-exact cv2 stages. Requires jitted Restorer objects on
        both slots (exported-engine restorers fall back to the host
        stages automatically).

        geo_engine: an exported fused-geometry engine
        (scripts/export_gfpgan.py --with-geometry, loaded via
        serve.engine_restorer.EngineGeoPipeline) serving the same
        post-detector graph source-free; implies device_geometry. The
        ENGINE'S baked weights serve every restore — restorer/ckpt
        arguments only feed fallback surfaces, and passing them
        alongside an engine logs a warning."""
        if geo_engine is not None:
            tgt = getattr(geo_engine, "target", None)
            if tgt is not None and tgt != self.TARGET:
                raise ValueError(
                    f"geo_engine target {tgt} != pipeline TARGET "
                    f"{self.TARGET} (exported at a different canvas "
                    "size)")
            if any(a is not None for a in (plate_restorer, car_restorer,
                                           plate_ckpt, car_ckpt)):
                from ..utils.logger import get_root_logger
                get_root_logger().warning(
                    "PlatePipeline: geo_engine is set — every restore is "
                    "served from the ENGINE'S baked weights; the "
                    "restorer/ckpt arguments are ignored on this path")
        self.detector = detector or PlateDetector(ckpt_path=detector_ckpt,
                                                  dtype=dtype)
        # the reference's TorchScript plate model is GFPGANv1OCR at the
        # production config (SURVEY §7 hard parts). With a geo_engine the
        # restorers are unused (the engine carries the weights) — don't
        # build two production generators just to ignore them.
        if geo_engine is not None and plate_restorer is None and \
                car_restorer is None:
            self.plate_restorer = self.car_restorer = None
        else:
            self.plate_restorer = plate_restorer or Restorer(
                PRODUCTION_GFPGAN, plate_ckpt, dtype=dtype)
            self.car_restorer = car_restorer or Restorer(
                PRODUCTION_GFPGAN, car_ckpt, dtype=dtype)
        self.device_io = (device_io
                          and hasattr(self.plate_restorer,
                                      "restore_batch_u8")
                          and hasattr(self.car_restorer,
                                      "restore_batch_u8"))
        self._geo_engine = geo_engine
        geo_capable = bool(geo_engine) or all(
            hasattr(r, "net") and hasattr(r, "variables")
            for r in (self.plate_restorer, self.car_restorer))
        # device_geometry="auto": measure both paths on the first real
        # batch and lock in the faster one (r3 measured the fused device
        # graph LOSING to the overlapped host-cv2 path at bs8 — 8.15 vs
        # 7.47 ms/img — so neither choice is safe to hardcode; it depends
        # on batch size, host load, and the geometry-op mix)
        self._geo_auto_pending = (device_geometry == "auto"
                                  and geo_capable and geo_engine is None)
        self.device_geometry = bool(geo_engine) or (
            device_geometry is True and geo_capable)
        self.geo_auto_ms_per_image = None
        self._geo_fused = None

    def _dispatch(self, restorer, rgb_u8_batch: np.ndarray) -> np.ndarray:
        """(N,H,W,3) uint8 RGB batch → (N,H',W',3) BGR uint8 via the
        selected IO path — the single place the device_io choice lives."""
        if self.device_io:
            return restorer.restore_batch_u8(rgb_u8_batch)
        return restorer.restore_batch(
            rgb_u8_batch.astype(np.float32) / 255.0)

    # --------------------------------------------- device geometry path

    def _build_geo_fused(self):
        """See module-level build_geo_fused — the pipeline's fused graph
        for everything after the detector."""
        return build_geo_fused(self.plate_restorer, self.car_restorer,
                               self.TARGET)

    def _geo_batch(self, canvases: np.ndarray, quads: np.ndarray):
        """Run the fused device-geometry graph (or the exported engine)
        on a canvas batch; returns (montage_u8, masked_u8) as numpy."""
        if self._geo_engine is not None:
            return self._geo_engine(canvases, quads.astype(np.float32))
        if self._geo_fused is None:
            self._geo_fused = self._build_geo_fused()
        mont, masked = self._geo_fused(
            self.plate_restorer.variables["params"],
            self.car_restorer.variables["params"],
            canvases, quads.astype(np.float32))
        return np.asarray(mont), np.asarray(masked)

    def _geo_result(self, montage: np.ndarray, masked: np.ndarray,
                    canvas, quad, score, ok) -> Dict[str, np.ndarray]:
        """process()-shaped dict from one montage row (panels are
        views into the montage) + the raw crop from the masked canvas."""
        t = self.TARGET
        panel = lambda i: montage[:, i * t:(i + 1) * t]
        x, y, w, h = cv2.boundingRect(quad)
        x, y = max(x, 0), max(y, 0)
        w, h = max(w, 1), max(h, 1)
        return {
            "input": canvas,
            "quad": quad,
            "score": score,
            "detected": ok,
            "crop": masked[y:y + h, x:x + w],
            "crop_padded": panel(3),
            "plate_restored": panel(1),
            "car_restored": panel(2),
            "transform": panel(4),
            "pasted": panel(5),
            "montage": montage,
        }

    # ----------------------------------------------------------- helpers

    def _detect_quad(self, img_bgr: np.ndarray):
        """5 landmarks on the 256² canvas → corner quad [p1,p2,p5,p4]."""
        t = self.TARGET
        inp = cv2.resize(img_bgr.astype(np.float32),
                         (self.detector.image_size,
                          self.detector.image_size),
                         interpolation=cv2.INTER_LINEAR)
        boxes, scores, landms, valid = self.detector(inp[None])
        pts = (landms[0, 0].reshape(5, 2) * t).astype(np.int32)
        ok = bool(valid[0, 0])
        p1, p2, _, p4, p5 = pts
        quad = np.array([p1, p2, p5, p4], np.int32)
        return quad, float(scores[0, 0]), ok

    def _crop_plate(self, canvas_bgr: np.ndarray, quad: np.ndarray):
        """boundingRect crop + polygon mask composite (ref :264-297)."""
        x, y, w, h = cv2.boundingRect(quad)
        x, y = max(x, 0), max(y, 0)
        w, h = max(w, 1), max(h, 1)
        croped = canvas_bgr[y:y + h, x:x + w].copy()
        pts = quad - quad.min(axis=0)
        mask = np.zeros(croped.shape[:2], np.uint8)
        cv2.drawContours(mask, [pts], -1, (255, 255, 255), -1, cv2.LINE_AA)
        dst = cv2.bitwise_and(croped, croped, mask=mask)
        return dst

    def _restore_plate(self, crop_bgr256: np.ndarray) -> np.ndarray:
        """ref restoration_plate (:349-374): NO channel swap, ±0.5 norm."""
        out = self._dispatch(self.plate_restorer, crop_bgr256[None])[0]
        return out[..., ::-1]                   # undo its RGB→BGR: net saw BGR

    def _restore_car(self, img_bgr: np.ndarray) -> np.ndarray:
        """ref restoration_car (:376-401): BGR→RGB swap + ±0.5 norm."""
        img = cv2.resize(img_bgr, (self.TARGET, self.TARGET))
        return self._dispatch(self.car_restorer,
                              np.ascontiguousarray(img[..., ::-1])[None])[0]

    def _finish_one(self, canvas, quad, score, ok, crop, plate_restored,
                    car_restored) -> Dict[str, np.ndarray]:
        """Host post stage: perspective warp, paste-back, montage
        (ref :304-320, :449-466). Pure OpenCV/numpy — no device work."""
        t = self.TARGET
        crop_padded = resize_with_padding(crop, (t, t))

        # perspective: restored crop (256²) → original quad (ref :304-320)
        pst1 = np.float32([[0, 0], [t, 0], [t, t], [0, t]])
        pst2 = quad.astype(np.float32)
        matrix = cv2.getPerspectiveTransform(pst1, pst2)
        crop_resized = cv2.resize(crop, (t, t)) if crop.size else \
            np.zeros((t, t, 3), np.uint8)
        transform = cv2.warpPerspective(crop_resized, matrix, (t, t))

        # paste the warped restored plate into the restored car (ref :455-466)
        plate_warp = cv2.warpPerspective(plate_restored, matrix, (t, t))
        mask = np.zeros((t, t), np.uint8)
        cv2.fillPoly(mask, [quad], 255)
        # copy-where-mask≠0, same semantics as `pasted[mask>0] = warp[mask>0]`
        # but ~5× cheaper (no boolean index materialization) — this paste was
        # the single largest host post-stage cost (2.0 of 3.2 ms measured)
        pasted = cv2.copyTo(plate_warp, mask, car_restored.copy())

        montage = cv2.hconcat([canvas, plate_restored, car_restored,
                               crop_padded, transform, pasted])
        return {
            "input": canvas,
            "quad": quad,
            "score": score,
            "detected": ok,
            "crop": crop,
            "crop_padded": crop_padded,
            "plate_restored": plate_restored,
            "car_restored": car_restored,
            "transform": transform,
            "pasted": pasted,
            "montage": montage,
        }

    def _autoselect_geometry(self, chunk, chunk_size: int):
        """device_geometry="auto": wall-time one warmed chunk through the
        host-cv2 path and the fused device path, keep the faster. Runs
        once, on the first process_batch call (that call pays ~4 extra
        chunk passes: warm + timed, both paths); process() stays on the
        host path until a batch call decides."""
        import time as _time
        self._geo_auto_pending = False
        times = {}
        for flag in (False, True):
            self.device_geometry = flag
            self.process_batch(chunk, chunk_size)       # warm / compile
            t0 = _time.perf_counter()
            self.process_batch(chunk, chunk_size)
            times["device" if flag else "host"] = \
                (_time.perf_counter() - t0) / len(chunk)
        self.device_geometry = times["device"] <= times["host"]
        self.geo_auto_ms_per_image = {
            k: round(v * 1e3, 3) for k, v in times.items()}
        from ..utils.logger import get_root_logger
        get_root_logger().info(
            f"PlatePipeline geometry auto-select (bs={len(chunk)}): host "
            f"{self.geo_auto_ms_per_image['host']} ms/img vs device "
            f"{self.geo_auto_ms_per_image['device']} ms/img → "
            f"{'DEVICE' if self.device_geometry else 'HOST'} path")

    # -------------------------------------------------------------- main

    def process(self, img_bgr: np.ndarray) -> Dict[str, np.ndarray]:
        """Full pipeline on one BGR uint8 image. Returns all stage images
        (montage matches the reference's 6-panel output)."""
        t = self.TARGET
        canvas = cv2.resize(img_bgr, (t, t),
                            interpolation=cv2.INTER_LINEAR)
        quad, score, ok = self._detect_quad(img_bgr)
        quad = np.clip(quad, 0, t - 1)

        if self.device_geometry:
            mont, masked = self._geo_batch(canvas[None], quad[None])
            return self._geo_result(mont[0], masked[0], canvas, quad,
                                    score, ok)

        crop = self._crop_plate(canvas, quad)
        plate_restored = self._restore_plate(
            cv2.resize(crop, (t, t)) if crop.size else
            np.zeros((t, t, 3), np.uint8))
        car_restored = self._restore_car(img_bgr)
        return self._finish_one(canvas, quad, score, ok, crop,
                                plate_restored, car_restored)

    def process_batch(self, imgs, chunk_size: int = 8,
                      host_workers: int = 4):
        """Batched + pipelined E2E over a list of BGR uint8 images.

        Per-image `process` leaves the chip idle during every host OpenCV
        stage and dispatches each restore alone; this path runs the
        detector at bs=chunk_size, the two restores as batched dispatches
        (ONE fused 2N dispatch when plate and car share a Restorer), host
        stages thread-parallel across the chunk, and the paste/montage of
        chunk i overlapped with chunk i+1's device work. Ragged final
        chunks are padded up to chunk_size (compute discarded) so XLA
        compiles exactly one batch shape per stage.

        Returns a list of `process`-shaped dicts in input order.
        """
        from concurrent.futures import ThreadPoolExecutor

        if not len(imgs):
            return []
        if self._geo_auto_pending and len(imgs) > 1:
            self._autoselect_geometry(list(imgs[:chunk_size]), chunk_size)
        t = self.TARGET
        ds = self.detector.image_size
        fused = self.plate_restorer is self.car_restorer
        results: list = [None] * len(imgs)
        post: list = []  # (result index, future)

        def pre(img):
            canvas = cv2.resize(img, (t, t), interpolation=cv2.INTER_LINEAR)
            det_in = cv2.resize(img.astype(np.float32), (ds, ds),
                                interpolation=cv2.INTER_LINEAR)
            if self.device_geometry:
                # the fused graph builds the car input from the canvas
                # (identical resize); skip the extra host resize
                return canvas, det_in, None
            # _restore_car input: BGR→RGB swap (ref :376-401); stays uint8
            # — _dispatch handles the device_io/float conversion choice
            car_in = cv2.resize(img, (t, t))[..., ::-1]
            return canvas, det_in, car_in

        def mid(canvas, quad):
            crop = self._crop_plate(canvas, quad)
            # _restore_plate input: NO channel swap (ref :349-374)
            plate_in = (cv2.resize(crop, (t, t)) if crop.size else
                        np.zeros((t, t, 3), np.uint8))
            return crop, plate_in

        with ThreadPoolExecutor(max_workers=host_workers) as pool:
            for base in range(0, len(imgs), chunk_size):
                chunk = list(imgs[base:base + chunk_size])
                n_real = len(chunk)
                chunk += [chunk[-1]] * (chunk_size - n_real)

                canvases, det_ins, car_ins = zip(*pool.map(pre, chunk))
                boxes, scores, landms, valid = self.detector(
                    np.stack(det_ins))

                quads, scs, oks = [], [], []
                for i in range(len(chunk)):
                    pts = (landms[i, 0].reshape(5, 2) * t).astype(np.int32)
                    p1, p2, _, p4, p5 = pts
                    quads.append(np.clip(
                        np.array([p1, p2, p5, p4], np.int32), 0, t - 1))
                    scs.append(float(scores[i, 0]))
                    oks.append(bool(valid[i, 0]))

                if self.device_geometry:
                    # everything after the detector is ONE dispatch
                    monts, maskeds = self._geo_batch(
                        np.stack(canvases), np.stack(quads))
                    for i in range(n_real):
                        results[base + i] = self._geo_result(
                            monts[i], maskeds[i], canvases[i], quads[i],
                            scs[i], oks[i])
                    continue

                mids = list(pool.map(mid, canvases, quads))
                crops = [m[0] for m in mids]
                plate_ins = np.stack([m[1] for m in mids])
                cars = np.stack(car_ins)
                if fused:
                    both = self._dispatch(self.plate_restorer,
                                          np.concatenate([plate_ins, cars]))
                    plate_outs = both[:len(chunk)][..., ::-1]
                    car_outs = both[len(chunk):]
                else:
                    plate_outs = self._dispatch(self.plate_restorer,
                                                plate_ins)[..., ::-1]
                    car_outs = self._dispatch(self.car_restorer, cars)

                for i in range(n_real):
                    post.append((base + i, pool.submit(
                        self._finish_one, canvases[i], quads[i], scs[i],
                        oks[i], crops[i], plate_outs[i], car_outs[i])))
            for idx, fut in post:
                results[idx] = fut.result()
        return results
