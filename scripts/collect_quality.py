#!/usr/bin/env python
"""Collect quality-campaign artifacts into docs/quality/ (committed evidence).

Copies each run's quality.jsonl + quality_curve.png + first/mid/last epoch
sample grids out of the (gitignored) runs/ tree, and writes a summary table
to docs/quality/RESULTS.md. docs/QUALITY.md narrates these numbers.

Usage: python scripts/collect_quality.py [--root runs/quality] [--out docs/quality]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def collect_run(run_dir: str, name: str, out_dir: str):
    # quality.jsonl = the run's own per-epoch scores; quality_sweep.jsonl =
    # optional epoch-restricted bucket sweeps (quality_campaign.py
    # --eval-epochs). Merge, deduping on (epoch, bucket) with sweep rows
    # winning (they are newer re-scores of the same exports).
    merged = {}
    found = False
    # lowest precedence: rows already committed under docs/ — a partial or
    # restricted re-score in runs/ must never erase earlier evidence
    prior = os.path.join(out_dir, f"{name}.jsonl")
    sources = [prior, os.path.join(run_dir, "quality.jsonl"),
               os.path.join(run_dir, "quality_sweep.jsonl")]
    for qj in sources:
        if not os.path.exists(qj):
            continue
        if qj != prior:
            found = True
        with open(qj) as f:
            for line in f:
                line = line.strip()
                if line:
                    r = json.loads(line)
                    merged[(r["epoch"], r.get("bucket"))] = r
    if not found or not merged:
        return None
    rows = [merged[k] for k in sorted(merged)]
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{name}.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    curve = os.path.join(run_dir, "quality_curve.png")
    if os.path.exists(curve):
        shutil.copy(curve, os.path.join(out_dir, f"{name}_curve.png"))
    # epoch grids: first / mid / last available
    grids = sorted(fn for fn in os.listdir(os.path.join(run_dir, "output"))
                   if fn.startswith("image_at_epoch_") and fn.endswith(".png"))
    picks = sorted({0, len(grids) // 2, len(grids) - 1}) if grids else []
    for i in picks:
        src = os.path.join(run_dir, "output", grids[i])
        shutil.copy(src, os.path.join(out_dir, f"{name}_{grids[i]}"))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="runs/quality")
    p.add_argument("--out", default="docs/quality")
    args = p.parse_args(argv)

    runs = sorted(d for d in os.listdir(args.root)
                  if os.path.isdir(os.path.join(args.root, d)) and d != "data")
    summary = {}
    for name in runs:
        rows = collect_run(os.path.join(args.root, name), name, args.out)
        if rows:
            summary[name] = rows

    # Runs collected by EARLIER sessions survive as <name>.jsonl in --out even
    # when their runs/ workdir is gone (fresh container): merge them in so a
    # partial re-collect can never clobber committed evidence.
    for fn in sorted(os.listdir(args.out)) if os.path.isdir(args.out) else []:
        if fn.endswith(".jsonl"):
            name = fn[:-6]
            if name in summary:
                continue
            with open(os.path.join(args.out, fn)) as f:
                rows = [json.loads(l) for l in f if l.strip()]
            if rows:
                summary[name] = rows
    summary = dict(sorted(summary.items()))

    lines = ["# Quality campaign results (auto-collected)", "",
             "Per-run epoch curves; rFID = Fréchet distance over the final",
             "recognizer's pooled conv features (frozen across epochs),",
             "cer_gen = CER of that recognizer reading generated images,",
             "cer_real = its CER on real data (the floor).", ""]
    for name, rows in summary.items():
        # multi-bucket sweeps (--eval-buckets all) carry one row per
        # (epoch, bucket): the headline epoch curve uses the canonical len-5
        # bucket (or the middlemost available), plus a length-generalization
        # table over the final epoch when more than one bucket was scored
        buckets = sorted({r["bucket"] for r in rows})
        head_bucket = 5 if 5 in buckets else buckets[len(buckets) // 2]
        hrows = [r for r in rows if r["bucket"] == head_bucket]
        first, last = hrows[0], hrows[-1]
        best = min(hrows, key=lambda r: r["rfid"])
        lines += [f"## {name}", "",
                  f"- epochs scored: {len(hrows)}; samples/epoch: "
                  f"{last['num_samples']} (len-{last['bucket']} words)",
                  f"- rFID: {first['rfid']:.3f} (ep {first['epoch']}) -> "
                  f"{last['rfid']:.3f} (ep {last['epoch']}); best "
                  f"{best['rfid']:.3f} @ ep {best['epoch']}",
                  f"- cer_gen: {first['cer_gen']:.3f} -> {last['cer_gen']:.3f}"
                  f"; cer_real {last['cer_real']:.3f}",
                  f"- train wall: {last.get('train_secs', 0):.0f}s "
                  f"({last.get('total_steps', '?')} steps)", "",
                  "| epoch | rFID | cer_gen |", "|---|---|---|"]
        lines += [f"| {r['epoch']} | {r['rfid']:.3f} | {r['cer_gen']:.3f} |"
                  for r in hrows]
        lines.append("")
        if len(buckets) > 1:
            final_ep = max(r["epoch"] for r in rows)
            frows = {r["bucket"]: r for r in rows if r["epoch"] == final_ep}
            lines += [f"Length generalization @ epoch {final_ep} "
                      "(rFID / cer_gen / cer_real per word length):", "",
                      "| len | rFID | cer_gen | cer_real |",
                      "|---|---|---|---|"]
            lines += [f"| {b} | {frows[b]['rfid']:.3f} | "
                      f"{frows[b]['cer_gen']:.3f} | "
                      f"{frows[b]['cer_real']:.3f} |"
                      for b in buckets if b in frows]
            lines.append("")
    out_md = os.path.join(args.out, "RESULTS.md")
    os.makedirs(args.out, exist_ok=True)
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md} ({len(summary)} runs)")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
