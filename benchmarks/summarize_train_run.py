"""Summarise an on-chip training burn-in into TRAIN_RUN_r04.json
(VERDICT r3 item 1: loss-curve summary, steps/s, and the kill/resume event
demonstrating step/optimizer/join-gate continuity).

Usage:
  python benchmarks/summarize_train_run.py LOGDIR RUN1.log [RUN2.log ...] \
      [--out TRAIN_RUN_r04.json] [--notes "..."]

LOGDIR holds metrics.jsonl (MetricsWriter output, appended across resumes);
RUN*.log are the stdout logs of each process segment (for steps/s lines and
the resume banner).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def load_metrics(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except ValueError:
                    pass
    return rows


def series(rows, tag):
    return [(r["step"], r[tag]) for r in rows if tag in r]


def summarize(vals, k=5):
    if not vals:
        return None
    head = sum(v for _, v in vals[:k]) / min(k, len(vals))
    tail = sum(v for _, v in vals[-k:]) / min(k, len(vals))
    finite = all(v == v and abs(v) != float("inf") for _, v in vals)
    return {
        "first_step": vals[0][0],
        "last_step": vals[-1][0],
        f"mean_first_{k}": round(head, 4),
        f"mean_last_{k}": round(tail, 4),
        "decreased": tail < head,
        "all_finite": finite,
        "points": len(vals),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("runlogs", nargs="+")
    p.add_argument("--out", default="TRAIN_RUN_r04.json")
    p.add_argument("--notes", default="")
    args = p.parse_args()

    rows = load_metrics(os.path.join(args.logdir, "metrics.jsonl"))
    out = {
        "method": (
            "train/loop.py::train_decoder via cli/train_decoder on the real "
            "chip; procedurally generated dataset (benchmarks/"
            "gen_synth_dataset.py -> cli/preprocess.py); mid-run SIGKILL + "
            "orbax resume; losses from logs/metrics.jsonl, steps/s from the "
            "loop's own log lines"
        ),
        "losses": {},
        "segments": [],
    }
    for tag in [
        "loss/Spectrogram", "loss/DSP", "loss/Generator Adversarial",
        "loss/Feature Matching", "loss/Discriminator Adversarial",
    ]:
        s = summarize(series(rows, tag))
        if s:
            out["losses"][tag] = s

    step_re = re.compile(
        r"^step (\d+) .*\((\d+\.\d+) steps/s, (\d+)s\)", re.M
    )
    resume_re = re.compile(r"resumed decoder training at step (\d+)")
    for path in args.runlogs:
        text = open(path, errors="replace").read()
        steps = [
            (int(m.group(1)), float(m.group(2))) for m in step_re.finditer(text)
        ]
        seg = {
            "log": os.path.basename(path),
            "first_step": steps[0][0] if steps else None,
            "last_step": steps[-1][0] if steps else None,
        }
        m = resume_re.search(text)
        if m:
            seg["resumed_at_step"] = int(m.group(1))
        # steady-state steps/s: median of logged rates, split at the join
        join = [r for s, r in steps if 0.2 < r]  # drop compile-interval rows
        if join:
            import statistics

            seg["median_steps_per_s"] = round(statistics.median(join), 2)
        out["segments"].append(seg)
    if args.notes:
        out["notes"] = args.notes
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
