from scrabblegan_tpu.eval.fid import frechet_distance, recognizer_features, compute_rfid
from scrabblegan_tpu.eval.decode import greedy_ctc_decode, character_error_rate

__all__ = [
    "frechet_distance",
    "recognizer_features",
    "compute_rfid",
    "greedy_ctc_decode",
    "character_error_rate",
]
