"""Visual evaluation: fixed-seed sample grids per epoch and the training GIF.

Capability parity with generate_and_save_images / make_gif (data_utils.py:493-547):
a 4x4 matplotlib grid of generator samples on a FIXED (style image, label) seed,
saved as image_at_epoch_%04d.png, and an imageio GIF over the saved grids with the
reference's sqrt-spaced frame schedule.
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

import numpy as np

from scrabblegan_tpu.config import CHAR_VECTOR


def save_image_grid(images: np.ndarray, labels: Sequence[Sequence[int]],
                    out_path: str, char_vector: str = CHAR_VECTOR,
                    grid: tuple = (4, 4)) -> None:
    """images: (N, H, W) or (N, H, W, 1) in [-1, 1]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    if images.ndim == 4:
        images = images[..., 0]
    images = (images + 1.0) / 2.0

    rows, cols = grid
    fig = plt.figure(figsize=(cols * 2.2, rows * 1.2))
    for i in range(min(len(images), rows * cols)):
        ax = fig.add_subplot(rows, cols, i + 1)
        ax.imshow(images[i], cmap="gray", vmin=0, vmax=1)
        ax.text(0, -1, "".join(char_vector[int(l)] for l in labels[i]))
        ax.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)


def save_epoch_grid(images, labels, gen_path: str, epoch: int,
                    char_vector: str = CHAR_VECTOR) -> str:
    out = os.path.join(gen_path, f"image_at_epoch_{epoch:04d}.png")
    save_image_grid(images, labels, out, char_vector)
    return out


def make_gif(gen_path: str, out_name: str = "training.gif") -> str | None:
    """sqrt-spaced frame schedule over image_at_epoch_*.png (data_utils.py:522-547)."""
    try:
        import imageio.v2 as imageio
    except Exception:  # pragma: no cover
        import imageio

    filenames = sorted(glob.glob(os.path.join(gen_path, "image*.png")))
    if not filenames:
        return None
    anim_file = os.path.join(gen_path, out_name)
    with imageio.get_writer(anim_file, mode="I") as writer:
        last = -1.0
        for i, filename in enumerate(filenames):
            frame = 2 * (i ** 0.5)
            if round(frame) > round(last):
                last = frame
            else:
                continue
            writer.append_data(imageio.imread(filename))
        writer.append_data(imageio.imread(filenames[-1]))
    return anim_file
