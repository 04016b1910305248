#!/usr/bin/env python3
"""Hyperparameter sweep runner.

Reference surface: configs/sweeps/*.yaml + job_scripts/sweep.sh (wandb
agent). Self-contained equivalent: a sweep yaml declares dotted-parameter
value lists (grid) or distributions (random); each trial composes the
training config with those overrides and runs the trainer; results land in
<output>/trial_XXX with a sweep_results.jsonl summary.

Sweep yaml:
    method: grid | random
    count: 8              # random only
    metric: val_combined  # ranked in the summary (lower = better)
    command_overrides: [experiment=overfit_synthetic]
    parameters:
      model.optimizer.lr: {values: [1e-3, 3e-4]}
      model.mlp.d_hidden: {values: [128, 256]}
      model.loss.tsdf.shift: {min: 5.0, max: 25.0}   # random only

Usage: python scripts/sweep.py --config configs/sweeps/<name>.yaml --output DIR [extra overrides...]
"""
import argparse
import itertools
import json
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trial_overrides(sweep_cfg, rng):
    params = sweep_cfg.get("parameters", {})
    if sweep_cfg.get("method", "grid") == "grid":
        keys = list(params)
        grids = [params[k]["values"] for k in keys]
        for combo in itertools.product(*grids):
            yield {k: v for k, v in zip(keys, combo)}
    else:
        for _ in range(int(sweep_cfg.get("count", 10))):
            trial = {}
            for k, spec in params.items():
                if "values" in spec:
                    trial[k] = spec["values"][rng.integers(len(spec["values"]))]
                else:
                    lo, hi = float(spec["min"]), float(spec["max"])
                    if spec.get("log", False):
                        trial[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
                    else:
                        trial[k] = float(rng.uniform(lo, hi))
            yield trial


def main(argv=None, spec=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=spec is None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("extra", nargs="*", help="extra config overrides for every trial")
    args = parser.parse_args(argv)

    import train as train_cli

    if spec is not None:  # hparams_search group dict from scripts/train.py
        sweep_cfg = dict(spec)
    else:
        with open(args.config) as f:
            sweep_cfg = yaml.safe_load(f)
    rng = np.random.default_rng(args.seed)
    metric_key = sweep_cfg.get("metric", "val_combined")
    os.makedirs(args.output, exist_ok=True)
    results_path = os.path.join(args.output, "sweep_results.jsonl")

    results = []
    for i, trial in enumerate(trial_overrides(sweep_cfg, rng)):
        out_dir = os.path.join(args.output, f"trial_{i:03d}")
        overrides = (
            list(sweep_cfg.get("command_overrides", []))
            + list(args.extra)
            + [f"{k}={v}" for k, v in trial.items()]
            + [f"paths.output_dir={out_dir}"]
        )
        print(f"=== trial {i}: {trial}")
        try:
            metrics = train_cli.main(overrides)
            record = {"trial": i, "params": trial,
                      "metrics": {k: float(v) for k, v in metrics.items()}}
        except Exception as e:  # keep the sweep alive (reference finish() intent)
            record = {"trial": i, "params": trial, "error": str(e)}
        results.append(record)
        with open(results_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    scored = [r for r in results if metric_key in r.get("metrics", {})]
    if scored:
        best = min(scored, key=lambda r: r["metrics"][metric_key])
        print(f"best trial {best['trial']}: {metric_key}={best['metrics'][metric_key]:.5f} "
              f"params={best['params']}")
    return results


if __name__ == "__main__":
    main()
