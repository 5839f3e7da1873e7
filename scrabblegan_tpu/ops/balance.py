"""ScrabbleGAN gradient balancing (arXiv:2003.10557 §"gradient balancing").

The reference implements it as LOSS rescaling rather than per-layer gradient
rescaling (data_utils.py:476-490): the CTC-on-fake term is rescaled by the ratio of
the adversarial-loss std to the CTC-loss std across the batch, so neither objective
dominates G's update. Exact algebra parity with the reference (no epsilon guard;
alpha default 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def gradient_balance(r_fake, g_loss, alpha: float = 1.0):
    """Returns (g_balanced, r_balanced, alpha, r_fake_std, g_loss_std).

    r_fake: (B,) per-sample CTC loss of the recognizer on generated images.
    g_loss: (B,) per-sample adversarial generator loss.
    """
    r_fake_std = jnp.std(r_fake)
    g_loss_std = jnp.std(g_loss)
    r_balanced = alpha * (g_loss_std / r_fake_std) * r_fake
    g_balanced = g_loss + r_balanced
    return g_balanced, r_balanced, alpha, r_fake_std, g_loss_std
