#!/usr/bin/env python
"""Calibrate the second Fréchet axis `rfid_rand` (VERDICT r3 item 7).

`rfid_rand` (eval/fid.py random_features) is the run-INDEPENDENT Fréchet
distance over a fixed-seed untrained-conv extractor, recorded next to the
self-referential rFID. Round 3 left it uncalibrated: its numeric range
(~1-21) is ~300x smaller than rFID's (48-7000) and no guidance said what
delta is signal. This script derives that guidance from every scored export
(known-good pm-family epochs vs known-bad collapsed bucketed epochs, using
cer_gen as ground truth for "readable" vs "broken"):

- rank correlation rfid_rand vs rFID and vs cer_gen,
- the rfid_rand distribution per quality band,
- the operating threshold and its confusion counts.

Writes a markdown table to stdout (pasted into docs/QUALITY.md) and
docs/quality/rfid_rand_calibration.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    return float(np.corrcoef(ra, rb)[0, 1])


def main(argv=None):
    roots = ["docs/quality/*.jsonl", "runs/quality/*/quality.jsonl"]
    rows, seen = [], set()
    for pat in roots:
        for path in glob.glob(pat):
            for line in open(path):
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "rfid_rand" not in r or "rfid" not in r:
                    continue
                key = (r.get("run"), r.get("epoch"), r.get("bucket"),
                       r["rfid"])
                if key in seen:  # runs/ copies duplicate docs/ copies
                    continue
                seen.add(key)
                rows.append(r)
    if not rows:
        print("no rows with rfid_rand found", file=sys.stderr)
        return 1

    rf = np.array([r["rfid"] for r in rows])
    rr = np.array([r["rfid_rand"] for r in rows])
    cer = np.array([r["cer_gen"] for r in rows])

    bands = {
        "readable (cer_gen < 0.10)": cer < 0.10,
        "degraded (0.10-0.50)": (cer >= 0.10) & (cer <= 0.50),
        "broken (cer_gen > 0.50)": cer > 0.50,
    }
    out = {
        "n_rows": int(len(rows)),
        "n_runs": len({r.get("run") for r in rows}),
        "spearman_rfid": round(spearman(rf, rr), 3),
        "spearman_cer": round(spearman(cer, rr), 3),
        "bands": {},
    }
    lines = [
        f"{len(rows)} scored exports across {out['n_runs']} arms; "
        f"Spearman(rfid_rand, rFID) = {out['spearman_rfid']}, "
        f"Spearman(rfid_rand, cer_gen) = {out['spearman_cer']}", "",
        "| band (ground truth = cer_gen) | n | rfid_rand p10 | median | p90 |",
        "|---|---|---|---|---|",
    ]
    for name, m in bands.items():
        if not m.any():
            continue
        v = rr[m]
        out["bands"][name] = {
            "n": int(m.sum()),
            "p10": round(float(np.percentile(v, 10)), 2),
            "median": round(float(np.median(v)), 2),
            "p90": round(float(np.percentile(v, 90)), 2),
        }
        b = out["bands"][name]
        lines.append(f"| {name} | {b['n']} | {b['p10']} | {b['median']} | "
                     f"{b['p90']} |")

    # operating threshold sweep: classify "broken" as rfid_rand > t
    good, bad = rr[cer < 0.10], rr[cer > 0.50]
    lines += ["", "| threshold t | broken caught (recall) | readable "
              "false-alarmed |", "|---|---|---|"]
    out["thresholds"] = {}
    for t in (3.0, 4.0, 5.0, 6.0, 8.0):
        rec = float((bad > t).mean()) if len(bad) else float("nan")
        fa = float((good > t).mean()) if len(good) else float("nan")
        out["thresholds"][t] = {"recall": round(rec, 3),
                                "false_alarm": round(fa, 3)}
        lines.append(f"| {t} | {rec:.0%} | {fa:.0%} |")

    os.makedirs("docs/quality", exist_ok=True)
    with open("docs/quality/rfid_rand_calibration.json", "w") as f:
        json.dump(out, f, indent=2)
    print("\n".join(lines))
    print("\nwrote docs/quality/rfid_rand_calibration.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
