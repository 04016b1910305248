#!/usr/bin/env python3
"""Harvest the round's hardware-drive logs into BENCH-ready markdown.

The queued drive script (train -> predict -> eval CLIs per experiment)
writes logs under /tmp; this collects, per drive: final train/val losses
from the run's metrics.csv, per-scene + mean eval rows from the eval CLI
logs, and the bench/renderer headline lines — so the BENCH.md update after
a tunnel window is a paste, not an archaeology session.

Usage: python scripts/local/harvest_drives.py [--runs NAME=DIR ...]
       (default: the round-3 queued drives)
"""
import argparse
import csv
import json
import os
import re
import sys

DEFAULT_RUNS = {
    "multigeo4 (rooms)": ("/tmp/multigeo4_run", "/tmp/multigeo4_eval.log",
                          "/tmp/multigeo4_eval_tsdf.log"),
    "voxelnet multigeo": ("/tmp/voxelnet_run", "/tmp/voxelnet_eval.log",
                          "/tmp/voxelnet_eval_tsdf.log"),
    "multigeo3 big A/B": ("/tmp/multigeo3_big_run", "/tmp/multigeo3_big_eval.log",
                          "/tmp/multigeo3_big_eval_tsdf.log"),
}
HEADLINES = {
    "bench.py": "/tmp/bench_sanity.log",
    "renderer": "/tmp/renderer_bench.log",
}


def last_losses(run_dir):
    path = os.path.join(run_dir, "csv", "metrics.csv")
    if not os.path.exists(path):
        return None
    rows = list(csv.DictReader(open(path)))
    out = {}
    for row in rows:  # keep the LAST non-empty value per column
        for k, v in row.items():
            if v not in (None, ""):
                out[k] = v
    return out


def eval_rows(log_path):
    if not os.path.exists(log_path):
        return []
    rows = []
    for line in open(log_path):
        line = line.strip()
        if line.startswith("mean:"):
            rows.append(("mean", json.loads(line[len("mean:"):])))
        elif line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            rows.append((rec.get("scene", "?"), rec))
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", nargs="*", default=None,
                        help="NAME=RUN_DIR[,EVAL_LOG[,TSDF_LOG]] overrides")
    args = parser.parse_args(argv)
    runs = DEFAULT_RUNS
    if args.runs:
        runs = {}
        for spec in args.runs:
            name, rest = spec.split("=", 1)
            parts = (rest.split(",") + [None, None])[:3]
            runs[name] = tuple(parts)

    for name, path in HEADLINES.items():
        if os.path.exists(path):
            lines = [l.strip() for l in open(path)
                     if re.search(r'"metric"|pts/s|rays/s|ms/step', l)]
            if lines:
                print(f"### {name}")
                print("\n".join(f"    {l}" for l in lines[-6:]))
                print()

    for name, (run_dir, eval_log, tsdf_log) in runs.items():
        losses = last_losses(run_dir) if run_dir else None
        ev = eval_rows(eval_log) if eval_log else []
        tv = eval_rows(tsdf_log) if tsdf_log else []
        if not (losses or ev or tv):
            continue
        print(f"### {name}")
        if losses:
            keep = {k: v for k, v in losses.items()
                    if k in ("epoch", "train_combined", "val_combined",
                             "val_tsdf", "train_tsdf", "val_recon_tsdf_l1")}
            print(f"  final losses: {keep}")
        if ev:
            cols = ["l1", "fscore", "prec", "recal", "complete", "AbsRel"]
            print("  | scene | " + " | ".join(cols) + " |")
            print("  |---" * (len(cols) + 1) + "|")
            for scene, rec in ev:
                vals = " | ".join(
                    f"{rec.get(c):.3f}" if isinstance(rec.get(c), float)
                    else str(rec.get(c)) for c in cols
                )
                print(f"  | {scene} | {vals} |")
        for scene, rec in tv:
            if scene == "mean":
                print(f"  tsdf-eval mean: {rec}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
