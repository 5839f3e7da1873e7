"""Host-side image IO helpers with a cv2 -> PIL fallback chain.

The reference depends on OpenCV for all image work (imread grayscale, resize,
imwrite — iam_handwriting_db.py, data_utils.py). This module isolates that
dependency so the framework degrades gracefully to PIL when cv2 is absent.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

try:
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def read_grayscale(path: str) -> np.ndarray | None:
    """Read an image as uint8 grayscale (H, W); None on failure."""
    if _HAS_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        return img
    if _HAS_PIL:
        try:
            return np.asarray(Image.open(path).convert("L"))
        except Exception:
            return None
    raise RuntimeError("Neither cv2 nor PIL is available for image IO")


def resize(img: np.ndarray, width: int, height: int, quality: str = "area") -> np.ndarray:
    """Resize (H, W) uint8/float to (height, width)."""
    if _HAS_CV2:
        interp = {
            "area": cv2.INTER_AREA,
            "cubic": cv2.INTER_CUBIC,
            "linear": cv2.INTER_LINEAR,
        }[quality]
        return cv2.resize(img, (width, height), interpolation=interp)
    if _HAS_PIL:
        mode_img = Image.fromarray(img.astype(np.uint8))
        resample = {"area": Image.BOX, "cubic": Image.BICUBIC, "linear": Image.BILINEAR}[quality]
        return np.asarray(mode_img.resize((width, height), resample=resample))
    raise RuntimeError("Neither cv2 nor PIL is available for image IO")


def write_grayscale(path: str, img: np.ndarray) -> None:
    img = np.clip(img, 0, 255).astype(np.uint8)
    if _HAS_CV2:
        cv2.imwrite(str(path), img)
        return
    if _HAS_PIL:
        Image.fromarray(img).save(path)
        return
    raise RuntimeError("Neither cv2 nor PIL is available for image IO")
