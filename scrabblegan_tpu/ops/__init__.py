from scrabblegan_tpu.ops.layers import SNConv, SNConvTranspose, SNDense, orthogonal_init
from scrabblegan_tpu.ops.blocks import ConditionalBatchNorm, ResNetBlockUp, ResNetBlockDown
from scrabblegan_tpu.ops.attention import NonLocalBlock
from scrabblegan_tpu.ops.embedding import FilterBank
from scrabblegan_tpu.ops.losses import hinge, not_saturating, get_loss_fn, LOSS_REGISTRY
from scrabblegan_tpu.ops.ctc import ctc_loss
from scrabblegan_tpu.ops.balance import gradient_balance

__all__ = [
    "SNConv",
    "SNConvTranspose",
    "SNDense",
    "orthogonal_init",
    "ConditionalBatchNorm",
    "ResNetBlockUp",
    "ResNetBlockDown",
    "NonLocalBlock",
    "FilterBank",
    "hinge",
    "not_saturating",
    "get_loss_fn",
    "LOSS_REGISTRY",
    "ctc_loss",
    "gradient_balance",
]
