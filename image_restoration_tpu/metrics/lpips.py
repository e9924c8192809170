"""LPIPS perceptual distance — flax/NHWC.

Parity with the reference's scripts/metrics/calculate_lpips.py, which wraps
the `lpips` pip package (`lpips.LPIPS(net='vgg')`): inputs in [-1, 1], the
package's ScalingLayer shift/scale, VGG16 features at relu{1_2,2_2,3_3,4_3,
5_3}, channel-unit-normalized, squared difference, learned non-negative 1×1
"lin" weights, spatial mean, summed over the five taps.

The learned lin weights + VGG16 backbone weights are DATA this zero-egress
environment cannot download (the reference script likewise requires
`pip install lpips` + its weight fetch). `lpips_weights_path` accepts the
lpips package checkpoint (e.g. lpips/weights/v0.1/vgg.pth — the lin layers)
and `vgg_weights_path` a torchvision vgg16 state_dict; with neither, the
distance is computed with uniform lin weights over an ImageNet-normalized
random-init VGG — well-defined for tests, NOT calibrated LPIPS (a warning
is emitted once).
"""

from __future__ import annotations

import warnings
from typing import Optional

import numpy as np

from ..utils.registry import METRIC_REGISTRY

_TAPS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3")
# lpips.ScalingLayer constants
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class LPIPS:
    """Callable LPIPS(img, img2) over NHWC float arrays in [-1, 1]."""

    def __init__(self, lpips_weights_path: Optional[str] = None,
                 vgg_weights_path: Optional[str] = None):
        import jax
        import jax.numpy as jnp
        from ..archs.vgg_arch import VGGFeatureExtractor

        net = VGGFeatureExtractor(layer_name_list=_TAPS, vgg_type="vgg16",
                                  use_input_norm=False, range_norm=False)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(net.init)(jax.random.PRNGKey(0), dummy)
        if vgg_weights_path:
            from ..convert.vgg_import import load_torchvision_vgg
            variables = load_torchvision_vgg(vgg_weights_path, variables,
                                             vgg_type="vgg16")
        self._lins = None
        if lpips_weights_path:
            from ..convert.torch_import import load_pth
            sd = load_pth(lpips_weights_path, param_key=None)
            # lpips checkpoint keys: lin{i}.model.1.weight, (1, C, 1, 1)
            self._lins = [
                jnp.asarray(np.asarray(
                    sd[f"lin{i}.model.1.weight"])).reshape(-1)
                for i in range(len(_TAPS))]
        if not (lpips_weights_path and vgg_weights_path):
            warnings.warn(
                "LPIPS running without calibrated weights (pass "
                "lpips_weights_path= and vgg_weights_path=); values are "
                "self-consistent but not comparable to published LPIPS.",
                stacklevel=2)

        lins = self._lins
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        @jax.jit
        def dist(a, b):
            def feats(x):
                x = (x - shift) / scale
                out = net.apply(variables, x)
                return [out[t] for t in _TAPS]

            total = 0.0
            for i, (fa, fb) in enumerate(zip(feats(a), feats(b))):
                fa = fa / jnp.sqrt((fa ** 2).sum(-1, keepdims=True) + 1e-10)
                fb = fb / jnp.sqrt((fb ** 2).sum(-1, keepdims=True) + 1e-10)
                d2 = (fa - fb) ** 2
                if lins is not None:
                    d2 = d2 * lins[i]
                else:
                    d2 = d2.mean(-1, keepdims=True)
                total = total + d2.sum(-1).mean((-2, -1))
            return total

        self._dist = dist

    def __call__(self, img, img2):
        """img, img2: (N,H,W,3) or (H,W,3) RGB in [-1, 1] → per-image
        distance (N,) or scalar."""
        import jax.numpy as jnp
        a = jnp.asarray(img, jnp.float32)
        b = jnp.asarray(img2, jnp.float32)
        squeeze = a.ndim == 3
        if squeeze:
            a, b = a[None], b[None]
        d = self._dist(a, b)
        return float(d[0]) if squeeze else np.asarray(d)


_CACHED: dict = {}


@METRIC_REGISTRY.register()
def calculate_lpips(img, img2, crop_border: int = 0,
                    lpips_weights_path: Optional[str] = None,
                    vgg_weights_path: Optional[str] = None,
                    **kwargs) -> float:
    """Registered metric: img/img2 are HWC BGR uint8/float images in
    [0, 255] (the repo's metric convention); converted to RGB [-1, 1]."""
    key = (lpips_weights_path, vgg_weights_path)
    if key not in _CACHED:
        _CACHED[key] = LPIPS(lpips_weights_path, vgg_weights_path)
    a = np.asarray(img, np.float32)[..., ::-1] / 255.0 * 2 - 1
    b = np.asarray(img2, np.float32)[..., ::-1] / 255.0 * 2 - 1
    if crop_border:
        a = a[crop_border:-crop_border, crop_border:-crop_border]
        b = b[crop_border:-crop_border, crop_border:-crop_border]
    return float(_CACHED[key](a, b))
