"""Structured training metrics: per-batch and per-epoch summaries.

Content parity with the reference's 16-column `;`-separated batch_summary.txt /
epoch_summary.txt (data_utils.py:250-328) — including the same column set and
order — written CORRECTLY (the reference's writer drops a ';' between g_loss_std
and s_loss, data_utils.py:299,327). Additionally writes a batch_summary.csv with
an epoch/batch index prefix so the offline plotter consumes the loop's own output
(fixing SURVEY.md defect #9: the reference's utilities.py expects a CSV the train
loop never writes).
"""

from __future__ import annotations

import os
from typing import Dict, List

HEADER_COLUMNS = (
    "disc_loss", "disc_loss_real", "disc_loss_fake",
    "r_loss_real", "r_loss_fake", "r_loss_balanced",
    "g_loss", "g_lossT", "g_lossS", "g_loss_final",
    "alpha", "r_loss_fake_std", "g_loss_std",
    "s_loss", "s_loss_real", "s_loss_fake",
)

# step-metric key -> summary column (reference naming quirk: g_lossT is the
# added/traditional term, g_lossS the balanced one; see data_utils.py:254,296-300)
_COLUMN_SOURCES = {
    "disc_loss": "d_loss", "disc_loss_real": "d_loss_real",
    "disc_loss_fake": "d_loss_fake",
    "r_loss_real": "r_loss_real", "r_loss_fake": "r_loss_fake",
    "r_loss_balanced": "r_loss_balanced",
    "g_loss": "g_loss", "g_lossT": "g_loss_added", "g_lossS": "g_loss_balanced",
    "g_loss_final": "g_loss_final",
    "alpha": "alpha", "r_loss_fake_std": "r_loss_fake_std",
    "g_loss_std": "g_loss_std",
    "s_loss": "s_loss", "s_loss_real": "s_loss_real", "s_loss_fake": "s_loss_fake",
}


class SummaryWriter:
    """Writes batch_summary.txt / epoch_summary.txt / batch_summary.csv."""

    def __init__(self, gen_path: str, append: bool = False):
        """append=True continues existing summaries (checkpoint resume) instead of
        truncating them."""
        os.makedirs(gen_path, exist_ok=True)
        mode = "a" if append else "w"
        fresh = not append or not os.path.exists(
            os.path.join(gen_path, "batch_summary.txt"))
        self.batch_txt = open(os.path.join(gen_path, "batch_summary.txt"), mode)
        self.epoch_txt = open(os.path.join(gen_path, "epoch_summary.txt"), mode)
        self.batch_csv = open(os.path.join(gen_path, "batch_summary.csv"), mode)
        if fresh:
            header = ";".join(HEADER_COLUMNS) + "\n"
            self.batch_txt.write(header)
            self.epoch_txt.write(header)
            self.batch_csv.write("epoch,batch," + ",".join(HEADER_COLUMNS) + "\n")
        self._epoch_acc: Dict[str, float] = {c: 0.0 for c in HEADER_COLUMNS}
        self._epoch_count = 0

    def _row(self, metrics: Dict[str, float]) -> List[float]:
        return [float(metrics[_COLUMN_SOURCES[c]]) for c in HEADER_COLUMNS]

    def write_batch(self, epoch: int, batch: int, metrics: Dict[str, float]) -> None:
        row = self._row(metrics)
        self.batch_txt.write(";".join(str(v) for v in row) + "\n")
        self.batch_csv.write(f"{epoch},{batch}," + ",".join(f"{v:.6g}" for v in row) + "\n")
        for c, v in zip(HEADER_COLUMNS, row):
            self._epoch_acc[c] += v
        self._epoch_count += 1

    def end_epoch(self) -> Dict[str, float]:
        n = max(self._epoch_count, 1)
        means = {c: self._epoch_acc[c] / n for c in HEADER_COLUMNS}
        self.epoch_txt.write(";".join(str(means[c]) for c in HEADER_COLUMNS) + "\n")
        self.batch_txt.flush()
        self.epoch_txt.flush()
        self.batch_csv.flush()
        self._epoch_acc = {c: 0.0 for c in HEADER_COLUMNS}
        self._epoch_count = 0
        return means

    def close(self) -> None:
        self.batch_txt.close()
        self.epoch_txt.close()
        self.batch_csv.close()
