from scrabblegan_tpu.models.generator import Generator, StyleEncoder, gen_channels
from scrabblegan_tpu.models.discriminator import Discriminator, DCGANDiscriminator, disc_channels
from scrabblegan_tpu.models.recognizer import Recognizer, BiLSTMRecognizer, ctc_time_steps
from scrabblegan_tpu.models.style import StylePromoter, StyleExtractor

__all__ = [
    "Generator",
    "StyleEncoder",
    "gen_channels",
    "Discriminator",
    "DCGANDiscriminator",
    "disc_channels",
    "Recognizer",
    "BiLSTMRecognizer",
    "ctc_time_steps",
    "StylePromoter",
    "StyleExtractor",
]
