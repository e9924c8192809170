"""FID — parity with basicsr/metrics/fid.py:10-80.

Fréchet distance between feature Gaussians + feature extraction with the
flax InceptionV3 (weights imported from a pt_inception .pth when provided).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.registry import METRIC_REGISTRY


def load_patched_inception_v3(weights_path: Optional[str] = None,
                              dtype=None):
    """Build the InceptionV3 FID extractor (+ optional torch weights)."""
    import jax
    import jax.numpy as jnp
    from ..archs import build_network

    net = build_network(dict(type="InceptionV3", dtype=dtype))
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: net.init(k, x, train=False))(
        jax.random.PRNGKey(0), dummy)
    if weights_path:
        from ..convert.torch_import import load_pth, convert_state_dict
        sd = load_pth(weights_path, param_key=None)
        params_sd, stats_sd = {}, {}
        for k, v in sd.items():
            if k.startswith(("fc.", "AuxLogits")):
                continue
            if k.endswith(("running_mean", "running_var")):
                stats_sd[k] = v
            elif not k.endswith("num_batches_tracked"):
                params_sd[k] = v
        v = dict(variables)
        v["params"] = convert_state_dict(params_sd, v["params"],
                                         strict=False)
        v["batch_stats"] = convert_state_dict(stats_sd, v["batch_stats"],
                                              strict=False)
        variables = v

    import functools

    @functools.partial(jax.jit)
    def extract(imgs):
        return net.apply(variables, imgs, train=False)

    return extract


def extract_inception_features(data_generator, extract_fn,
                               len_generator=None):
    """Iterate batches of NHWC [0,1] images → (N, 2048) features."""
    feats = []
    for batch in data_generator:
        feats.append(np.asarray(extract_fn(batch)))
    return np.concatenate(feats, axis=0)


@METRIC_REGISTRY.register()
def calculate_fid(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between N(mu1,S1), N(mu2,S2) (ref fid.py:42-80)."""
    from scipy import linalg
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    cov_sqrt, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(cov_sqrt).all():
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f"Imaginary component {m}")
        cov_sqrt = cov_sqrt.real

    diff = mu1 - mu2
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(cov_sqrt))
