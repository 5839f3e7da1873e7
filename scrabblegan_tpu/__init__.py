"""scrabblegan_tpu — a TPU-native JAX/XLA framework for adversarial handwritten-text
generation with the full capabilities of the TF2 ScrabbleGAN reference
(UtkuKaradeniz/scrabble-gan; arXiv:2003.10557 plus the fork's style-promoter and
style-encoder extensions).

This is a from-scratch, idiomatic JAX design — flax.linen modules over parameter
pytrees, optax optimizers, a single jitted multi-network train step, pjit/shard_map
data parallelism over a `jax.sharding.Mesh`, Orbax checkpoint/resume, and optional
Pallas kernels for the attention hot path. It is NOT a port of the reference's
Keras/GradientTape code; see SURVEY.md for the capability blueprint.
"""

__version__ = "0.1.0"
