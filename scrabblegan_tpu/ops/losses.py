"""GAN loss library: hinge and non-saturating, with the INTENDED five-logit style
semantics.

Reference parity notes (net_loss.py:4-54 + call site data_utils.py:409-418):
- The reference's gin default `@hinge` takes 4 logits but is called with 5 and would
  crash (SURVEY.md defect #1). Here both losses take the same 5 logits.
- The reference call site passes style-promoter logits in the wrong order
  (SURVEY.md defect #2), so W is effectively trained style-imgs(1) vs GENERATED(0)
  and G's style gradient is zero. The literal reading of the reference's parameter
  names (W separates style images from IAM images; G maximizes W(G(.))) is
  adversarially UNSOUND — W never sees G's outputs, and G exploits it into logit
  runaway (measured: NaN at ~16k steps, docs/QUALITY.md). The loss functions here
  are mode-agnostic per-logit primitives; the train step's
  `optimizer.style_loss_mode` selects the wiring ('adversarial' default /
  'style_vs_iam' / 'bug_compatible' — see config.py for the analysis).

Each loss returns the reference's 7-tuple of PER-SAMPLE vectors:
(d_loss, d_loss_real, d_loss_fake, g_loss, s_loss, s_loss_pos, s_loss_neg).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _sce_ones(logits):
    return optax.sigmoid_binary_cross_entropy(logits, jnp.ones_like(logits))


def _sce_zeros(logits):
    return optax.sigmoid_binary_cross_entropy(logits, jnp.zeros_like(logits))


# ---------------------------------------------------------------- decomposed
# Both adversaries (D and the style promoter W) use the same real-vs-fake loss
# form; the generator term composes per adversary. The decomposition lets the
# train step ablate networks (G+D-only training, BASELINE.json config 2)
# without polluting the remaining terms.

def hinge_disc(real, fake):
    """-> (loss, real_term, fake_term), per-sample."""
    real_term = jnp.maximum(0.0, 1.0 - real)
    fake_term = jnp.maximum(0.0, 1.0 + fake)
    return real_term + fake_term, real_term, fake_term


def hinge_gen(fake):
    return -fake


def not_saturating_disc(real, fake):
    real_term = _sce_ones(real)
    fake_term = _sce_zeros(fake)
    return real_term + fake_term, real_term, fake_term


def not_saturating_gen(fake):
    return _sce_ones(fake)


DISC_LOSS_REGISTRY = {"hinge": hinge_disc, "not_saturating": not_saturating_disc}
GEN_LOSS_REGISTRY = {"hinge": hinge_gen, "not_saturating": not_saturating_gen}


def hinge(d_real, d_fake, s_pos, s_neg, s_for_g):
    """Hinge GAN loss (net_loss.py:38-54, extended to the intended 5-logit form).

    d_real/d_fake: discriminator logits on real/generated images.
    s_pos: style-promoter logits on target-style images (positive class).
    s_neg: style-promoter logits on the negative class (IAM images intended;
           generated images in bug-compatible mode).
    s_for_g: style-promoter logits through which G's style term flows
             (generated images intended; IAM logits — zero grad — in bug mode).
    """
    d_loss, d_loss_real, d_loss_fake = hinge_disc(d_real, d_fake)
    s_loss, s_loss_pos, s_loss_neg = hinge_disc(s_pos, s_neg)
    g_loss = hinge_gen(d_fake) + hinge_gen(s_for_g)
    return d_loss, d_loss_real, d_loss_fake, g_loss, s_loss, s_loss_pos, s_loss_neg


def not_saturating(d_real, d_fake, s_pos, s_neg, s_for_g):
    """Non-saturating (sigmoid cross-entropy) GAN loss (net_loss.py:4-35)."""
    d_loss, d_loss_real, d_loss_fake = not_saturating_disc(d_real, d_fake)
    s_loss, s_loss_pos, s_loss_neg = not_saturating_disc(s_pos, s_neg)
    g_loss = not_saturating_gen(d_fake) + not_saturating_gen(s_for_g)
    return d_loss, d_loss_real, d_loss_fake, g_loss, s_loss, s_loss_pos, s_loss_neg


LOSS_REGISTRY = {
    "hinge": hinge,
    "not_saturating": not_saturating,
}


def get_loss_fn(name: str):
    if name not in LOSS_REGISTRY:
        raise ValueError(f"Unknown loss '{name}'; available: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]
