"""Hyperparameter sweep driver (reference hyperopt/hyperopt.py:29-124).

The reference drives train.py subprocesses through cluster_utils CEM/grid
search and scrapes the composite metric back from eval_output.txt.  This
native version keeps the same contract — spawn `python train.py key=value...`,
read `Composite Metric` from the newest eval_output.txt — but implements the
search loop itself (grid or random search; no cluster_utils dependency).

Usage:
  python -m facegantts_tpu.hyperopt config=sweep.json [max_jobs=8] [mode=grid]

sweep.json: {"fixed": {...}, "grid": {"learning_rate": [1e-4, 1e-5], ...}}
or {"random": {"learning_rate": {"min": 1e-6, "max": 1e-3, "log": true}}}
"""

import itertools
import json
import os
import re
import subprocess
import sys
from typing import Any, Dict, Iterator, List

import numpy as np

METRIC_RE = re.compile(r"Composite Metric:\s*([0-9.eE+-]+)")


def read_composite(results_dir: str) -> float:
    """Newest eval_output.txt under results_dir -> composite value
    (reference hyperopt.py:102-124)."""
    candidates = []
    for base, _, files in os.walk(results_dir):
        if "eval_output.txt" in files:
            p = os.path.join(base, "eval_output.txt")
            candidates.append((os.path.getmtime(p), p))
    if not candidates:
        return float("inf")
    _, newest = max(candidates)
    m = METRIC_RE.search(open(newest).read())
    return float(m.group(1)) if m else float("inf")


def grid_points(grid: Dict[str, List[Any]]) -> Iterator[Dict[str, Any]]:
    keys = sorted(grid)
    for combo in itertools.product(*(grid[k] for k in keys)):
        yield dict(zip(keys, combo))


def random_points(spec: Dict[str, Dict], n: int, seed: int = 0) -> Iterator[Dict[str, Any]]:
    rng = np.random.default_rng(seed)
    for _ in range(n):
        point = {}
        for k, s in spec.items():
            if "choices" in s:
                point[k] = s["choices"][rng.integers(len(s["choices"]))]
            elif s.get("log"):
                point[k] = float(np.exp(rng.uniform(np.log(s["min"]), np.log(s["max"]))))
            else:
                point[k] = float(rng.uniform(s["min"], s["max"]))
        yield point


def run_trial(params: Dict[str, Any], work_dir: str, train_script: str = "train.py") -> float:
    args = [sys.executable, train_script] + [
        f"{k}={v}" for k, v in params.items()
    ] + [f"work_dir={work_dir}"]
    print("[hyperopt] running:", " ".join(args))
    env = dict(os.environ, DYNAMIC_EVAL_PATH=os.path.join(work_dir, "eval"))
    proc = subprocess.run(args, env=env)
    if proc.returncode != 0:
        print(f"[hyperopt] trial failed (rc={proc.returncode})")
        return float("inf")
    return read_composite(work_dir)


def sweep(config: Dict[str, Any], out_root: str = "runs/sweep", max_jobs: int = 8,
          mode: str = "grid", seed: int = 0) -> List[Dict[str, Any]]:
    fixed = config.get("fixed", {})
    if mode == "grid":
        points = list(grid_points(config["grid"]))[:max_jobs]
    else:
        points = list(random_points(config["random"], max_jobs, seed))
    results = []
    for i, p in enumerate(points):
        wd = os.path.join(out_root, f"trial_{i:03d}")
        score = run_trial({**fixed, **p}, wd)
        results.append({"trial": i, "params": p, "composite": score})
        print(f"[hyperopt] trial {i}: composite={score}")
        with open(os.path.join(out_root, "results.json"), "w") as f:
            json.dump(sorted(results, key=lambda r: r["composite"]), f, indent=2)
    return results


def main(argv=None):
    from facegantts_tpu.config import parse_cli_overrides

    o = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    with open(o.get("config", "sweep.json")) as f:
        cfg = json.load(f)
    sweep(
        cfg,
        out_root=o.get("out_root", "runs/sweep"),
        max_jobs=int(o.get("max_jobs", 8)),
        mode=o.get("mode", "grid"),
    )


if __name__ == "__main__":
    main()
