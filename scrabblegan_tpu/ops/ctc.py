"""CTC loss with Keras-compatible conventions.

The reference recognizer wraps tf.keras.backend.ctc_batch_cost in a Lambda whose
output IS the model output (net_architecture.py:57-74). Keras's ctc_batch_cost takes
post-softmax probabilities and an implicit blank id = num_classes - 1 (the LAST
class). Our recognizer emits raw logits and this wrapper uses optax.ctc_loss with
blank_id = num_classes - 1; log_softmax(logits) == log(softmax) so the math is
identical up to Keras's internal epsilon.

The CTC time-step algebra must match the reference exactly: the recognizer's width
downsampling is /2, /2 then a kernel-2 valid conv, so T = W/4 - 1 = 4*len - 1 for
16px-per-char images (data_utils.py:400,413).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def ctc_loss(logits, labels, logit_lengths, label_lengths):
    """Per-sample CTC negative log-likelihood.

    Args:
      logits: (B, T, K) pre-softmax frame scores; blank id = K - 1.
      labels: (B, L) dense int labels in [0, K-1).
      logit_lengths: (B,) valid frame counts (T for unpadded buckets, 4*len-1).
      label_lengths: (B,) valid label counts.

    Returns: (B,) per-sample loss.
    """
    b, t, k = logits.shape
    l = labels.shape[1]
    logit_paddings = (
        jnp.arange(t)[None, :] >= logit_lengths.astype(jnp.int32)[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(l)[None, :] >= label_lengths.astype(jnp.int32)[:, None]
    ).astype(jnp.float32)
    return optax.ctc_loss(
        logits.astype(jnp.float32),
        logit_paddings,
        labels.astype(jnp.int32),
        label_paddings,
        blank_id=k - 1,
    )
