#!/usr/bin/env python
"""Extract a time-to-quality curve from a run's train_log.jsonl.

Prints, per eval record: stage/iter, wall-clock train time at that point
(the loop's pausable-timer 'elapsed' of the nearest step record — eval and
saving excluded, matching the reference's reported train times, ref
utils/timer.py + train.py:242-257), held-out test PSNR, and the first
crossing times for the requested thresholds.

Usage: python scripts/time_to_quality.py output/<run> [--db 30 33 35]
"""
from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--db", nargs="+", type=float, default=[30.0, 33.0, 35.0])
    args = p.parse_args()

    path = os.path.join(args.run_dir, "train_log.jsonl")
    recs = [json.loads(ln) for ln in open(path)]
    # elapsed trackers per (stage, iter): nearest step record at-or-before
    steps = [r for r in recs if "elapsed" in r]
    evals = [r for r in recs if r.get("eval")]

    stage_end = {}
    for r in steps:
        stage_end[r["stage"]] = max(stage_end.get(r["stage"], 0.0),
                                    r["elapsed"])

    def wall_at(stage, it):
        """Total train time when (stage, it) was reached: this stage's
        elapsed at it + full elapsed of prior stages."""
        before = [r["elapsed"] for r in steps
                  if r["stage"] == stage and r["iter"] <= it]
        base = stage_end.get("coarse", 0.0) if stage == "fine" else 0.0
        return base + (max(before) if before else 0.0)

    crossings = {}
    print(f"{'stage':7s} {'iter':>6s} {'train_s':>8s} {'test_dB':>8s}")
    for r in evals:
        w = wall_at(r["stage"], r["iter"])
        print(f"{r['stage']:7s} {r['iter']:6d} {w:8.1f} {r['psnr']:8.2f}")
        for db in args.db:
            if db not in crossings and r["psnr"] >= db:
                crossings[db] = (r["stage"], r["iter"], w)
    print()
    for db in args.db:
        if db in crossings:
            st, it, w = crossings[db]
            print(f"time to {db:g} dB: {w:7.1f} s ({w/60:.1f} min) "
                  f"at {st} {it}")
        else:
            print(f"time to {db:g} dB: not reached")


if __name__ == "__main__":
    main()
