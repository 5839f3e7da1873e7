"""ScrabbleGAN gradient balancing (arXiv:2003.10557 §"gradient balancing").

Two implementations:

- `gradient_balance` — the REFERENCE's formulation (data_utils.py:476-490):
  LOSS rescaling. The CTC-on-fake term is rescaled by the ratio of the
  adversarial-loss std to the CTC-loss std across the batch. Exact algebra
  parity (no epsilon guard; alpha default 1). Measured fragility
  (docs/QUALITY.md): when D saturates, std(g_loss) collapses and the CTC
  weight goes to ~0 — G loses its readability pressure exactly when the
  adversarial signal is degenerate.
- `balance_image_gradients` — the PAPER's formulation: balance the two
  objectives' GRADIENTS w.r.t. the generated image ("we found it crucial to
  balance ... by scaling the gradient of l_R to match the gradient magnitude
  of the adversarial loss"). The CTC image-gradient is rescaled so its std
  matches alpha x the adversarial image-gradient's std, then the combined
  cotangent is pulled back through G once. Robust to D saturation: the scale
  ratio is between gradient fields, not loss scalars.
"""

from __future__ import annotations

from functools import partial

import jax
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


def balance_image_gradients(adv_cot, ctc_cot, alpha: float = 1.0,
                            eps: float = 1e-12):
    """Paper-faithful balancing of two cotangents w.r.t. the generated image.

    adv_cot, ctc_cot: arrays shaped like the generated image batch — the
    gradients of the adversarial and CTC objectives w.r.t. that image.
    Returns (combined_cot, scale): combined = adv + scale * ctc with
    scale = alpha * std(adv_cot) / std(ctc_cot), stds over the whole batch
    tensor (the paper balances gradient magnitudes, not per-sample losses).
    """
    adv_std = jnp.std(adv_cot)
    ctc_std = jnp.std(ctc_cot)
    scale = alpha * adv_std / (ctc_std + eps)
    return adv_cot + scale * ctc_cot, scale


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def balanced_fanout(imgs, alpha: float = 1.0):
    """Identity fanout with a BALANCING BACKWARD: returns (imgs, imgs); the
    backward combines the two branches' cotangents via
    `balance_image_gradients` instead of summing them.

    Usage in the train step (balance_mode='grad_norm'): route the generated
    images to the adversarial G-terms through branch 0 and to the CTC-on-fake
    term through branch 1; the loss VALUE is the plain sum, but the gradient
    reaching G is adv_cot + alpha*(std(adv_cot)/std(ctc_cot))*ctc_cot — the
    paper's formulation, computed inside the same single backward pass."""
    return imgs, imgs


def _fanout_fwd(imgs, alpha):
    return (imgs, imgs), None


def _fanout_bwd(alpha, _res, cots):
    cot_adv, cot_ctc = cots
    combined, _ = balance_image_gradients(cot_adv, cot_ctc, alpha)
    return (combined,)


balanced_fanout.defvjp(_fanout_fwd, _fanout_bwd)
