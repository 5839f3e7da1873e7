"""A/B the Trainer's chunked dispatch (parallel.steps_per_call) on the real
chip at the e2e bench shape (batch 16, len 5, synthetic, trunk-bf16 config).

The raw device step runs 32 steps/s but the e2e Trainer loop sustains ~29.8
(BENCH r4, e2e_over_raw 0.934): per-call dispatch + metric fetch + host
assembly. steps_per_call=K packs K sequential steps into one lax.scan
dispatch (semantically identical, tests/test_chunked.py). Usage:
  python scripts/e2e_chunk_ab.py [k ...]   (default: 1 4)
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ks = [int(a) for a in sys.argv[1:]] or [1, 4]

from scrabblegan_tpu.config import load_config
from scrabblegan_tpu.data.synthetic import make_synthetic_dataset
from scrabblegan_tpu.train.loop import Trainer
from scrabblegan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
results = {}
for k in ks:
    workdir = f"/tmp/scrabblegan_chunk_ab_{k}"
    shutil.rmtree(workdir, ignore_errors=True)
    cfg = load_config(None, {"shared.batch_size": 16, "io.seq_len": 5,
                             "shared.num_gen": 4, "io.ckpt_every": 2,
                             "shared.trunk_dtype": "bfloat16",
                             "parallel.steps_per_call": k})
    read_dir, words_file, style_dir = make_synthetic_dataset(
        os.path.join(workdir, "data"), samples_per_bucket=64, bucket_size=5)
    trainer = Trainer(cfg, workdir=workdir, verbose=False)
    trainer.load_data(read_dir=read_dir, style_dir=style_dir,
                      words_file=words_file)
    t0 = time.time()
    trainer.train(epochs=2, batches_per_epoch=250, resume=False)
    rate = 250 / trainer.last_epoch_secs
    results[k] = round(rate, 2)
    print(f"k={k}: 2 epochs in {time.time() - t0:.1f}s; epoch 2 "
          f"{trainer.last_epoch_secs:.1f}s -> {rate:.2f} steps/s",
          file=sys.stderr, flush=True)

import json

print(json.dumps(results))
