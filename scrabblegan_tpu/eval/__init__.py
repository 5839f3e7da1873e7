from scrabblegan_tpu.eval.fid import (
    compute_rfid,
    frechet_distance,
    random_features,
    recognizer_features,
)
from scrabblegan_tpu.eval.decode import greedy_ctc_decode, character_error_rate

__all__ = [
    "frechet_distance",
    "recognizer_features",
    "random_features",
    "compute_rfid",
    "greedy_ctc_decode",
    "character_error_rate",
]
