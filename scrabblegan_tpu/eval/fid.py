"""Quality evaluation: Fréchet distance between generated and real word images.

BASELINE.json's quality criterion is "FID parity with the TF2 reference on IAM".
Classic FID requires InceptionV3 weights, which cannot be downloaded in a
zero-egress environment; this module implements the full Fréchet machinery with a
PLUGGABLE feature extractor and ships a built-in one — the trained recognizer's
conv trunk (pooled 512-d features), i.e. "rFID". Any callable
`images (N,H,W,C) in [-1,1] -> features (N,D)` (e.g. a real Inception embedding
where weights are available) can be passed instead.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray,
                     eps: float = 1e-6) -> float:
    """FID between two feature sets (N_a, D), (N_b, D):
    |mu_a - mu_b|^2 + tr(Ca + Cb - 2 sqrtm(Ca Cb))."""
    import scipy.linalg

    feats_a = np.asarray(feats_a, np.float64)
    feats_b = np.asarray(feats_b, np.float64)
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False)
    cov_b = np.cov(feats_b, rowvar=False)

    diff = mu_a - mu_b
    covmean, _ = scipy.linalg.sqrtm(cov_a @ cov_b, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov_a.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm((cov_a + offset) @ (cov_b + offset),
                                        disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov_a) + np.trace(cov_b)
                 - 2.0 * np.trace(covmean))


def recognizer_features(recognizer, r_params, r_stats) -> Callable:
    """Feature extractor from a (trained) Recognizer: pooled 512-d conv features."""
    import jax

    @jax.jit
    def extract(imgs):
        return recognizer.apply({"params": r_params, "batch_stats": r_stats},
                                imgs, train=False, return_features=True)

    def extractor(images: np.ndarray) -> np.ndarray:
        return np.asarray(extract(images))

    return extractor


def compute_rfid(gen_images: np.ndarray, real_images: np.ndarray,
                 extractor: Callable, batch_size: Optional[int] = None) -> float:
    """Fréchet distance between generated and real images under `extractor`.

    Images must share one shape (use a common bucket or padded canvases)."""
    def feats(images):
        if batch_size is None:
            return extractor(images)
        out = [extractor(images[i:i + batch_size])
               for i in range(0, len(images), batch_size)]
        return np.concatenate(out, 0)

    return frechet_distance(feats(gen_images), feats(real_images))
