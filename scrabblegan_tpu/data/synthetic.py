"""Synthetic on-disk dataset fixture in the bucketed GAN-Reading format.

Stands in for IAM in tests and benchmarks (SURVEY.md §4: "a tiny synthetic on-disk
dataset fixture standing in for IAM — the bucketed png+txt format is trivial to
fabricate"). Images are procedurally drawn per-character stripe patterns so the
recognizer has learnable (if trivial) structure.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from scrabblegan_tpu.config import CHAR_VECTOR
from scrabblegan_tpu.data.images import write_grayscale

_WORDS = (
    "a an the and of to in is it he she we they word hand write pen ink page "
    "letter script style glyph stroke curve line dot bar loop tail stem bowl "
    "serif quick brown fox jumps over lazy dog alphabet character".split()
)


def _draw_word(word: str, h: int = 32) -> np.ndarray:
    """Deterministic per-character texture: each char renders a 16px-wide stripe
    pattern keyed by its index, on a white background."""
    w = (h // 2) * len(word)
    img = np.full((h, w), 255.0, np.float32)
    for i, ch in enumerate(word):
        code = CHAR_VECTOR.index(ch) if ch in CHAR_VECTOR else 0
        x0 = i * (h // 2)
        ys = np.arange(h)[:, None]
        xs = np.arange(h // 2)[None, :]
        pattern = 127.5 + 127.5 * np.sin(
            0.35 * (code + 1) * xs + 0.2 * (code % 7 + 1) * ys)
        img[:, x0:x0 + h // 2] = np.minimum(img[:, x0:x0 + h // 2], pattern)
    return img


def make_synthetic_dataset(root: str, samples_per_bucket: int = 8,
                           bucket_size: int = 10, h: int = 32,
                           seed: int = 0) -> Tuple[str, str, str]:
    """Create <root>/words-Reading/{1..bucket_size}/ + a lexicon + style images.

    Returns (read_dir, words_file, style_dir)."""
    rng = np.random.default_rng(seed)
    read_dir = os.path.join(root, "words-Reading")
    style_dir = os.path.join(root, "style_imgs")
    words_file = os.path.join(root, "random_words.txt")
    os.makedirs(style_dir, exist_ok=True)

    chars = list(CHAR_VECTOR)
    lexicon = set(_WORDS)
    for b in range(1, bucket_size + 1):
        bucket_dir = os.path.join(read_dir, str(b))
        os.makedirs(bucket_dir, exist_ok=True)
        for s in range(samples_per_bucket):
            word = "".join(rng.choice(chars, size=b))
            lexicon.add(word)
            img = _draw_word(word, h)
            noise = rng.normal(0, 8, img.shape)
            write_grayscale(os.path.join(bucket_dir, f"s{b}_{s}.png"), img + noise)
            with open(os.path.join(bucket_dir, f"s{b}_{s}.txt"), "w") as f:
                f.write(word)

    with open(words_file, "w") as f:
        f.write("\n".join(sorted(lexicon)))

    for s in range(12):
        word = "".join(rng.choice(chars, size=int(rng.integers(3, 10))))
        img = _draw_word(word, h)
        write_grayscale(os.path.join(style_dir, f"style_{s}.png"), img)
    return read_dir, words_file, style_dir
