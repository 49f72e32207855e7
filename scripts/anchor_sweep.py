#!/usr/bin/env python
"""Seed-averaged anchor protocol (VERDICT r4 task 7).

The hard anchors (cls_synthetic_hard, shapenetpart_hard) are learnable and
off the ceiling, so a single-seed pin cannot distinguish a 1-2 % real
regression from seed noise (round-4 spread: 0.922/0.930/0.949).  This
script runs train -> eval at N seeds (default 0,1,2: train-set draw AND
init vary; the eval set stays the config default, seed 0) and prints the
per-seed metrics plus the MEAN and MIN — GOLDEN pins the 3-seed mean, and
a regression flag is any single seed below the pinned historical min.

    python scripts/anchor_sweep.py --config cls_synthetic_hard \
        --steps 1000 --votes 12
    python scripts/anchor_sweep.py --config shapenetpart_hard --steps 1200
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(config: str, seed: int, steps: int | None, votes: int | None):
    with tempfile.TemporaryDirectory(prefix=f"anchor_{config}_{seed}_") as d:
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "--config", config, "--seed", str(seed),
               "--checkpoint-dir", d]
        if steps:
            cmd += ["--steps", str(steps)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        if out.returncode != 0:
            raise RuntimeError(f"train seed {seed} failed:\n"
                               + out.stderr[-2000:])
        cmd = [sys.executable, os.path.join(REPO, "eval.py"),
               "--config", config, "--checkpoint-dir", d]
        if votes:
            cmd += ["--votes", str(votes)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        if out.returncode != 0:
            raise RuntimeError(f"eval seed {seed} failed:\n"
                               + out.stderr[-2000:])
        recs = [json.loads(ln) for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        return recs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--votes", type=int, default=None)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    args = ap.parse_args()

    rows = []
    for seed in args.seeds:
        rec = run_one(args.config, seed, args.steps, args.votes)
        rec["seed"] = seed
        rows.append(rec)
        print(f"# seed {seed}: {json.dumps(rec)}", flush=True)

    # whichever scalar metrics all rows share get the mean/min treatment
    keys = [k for k, v in rows[0].items()
            if isinstance(v, (int, float)) and k not in ("seed", "n", "scenes")
            and all(isinstance(r.get(k), (int, float)) for r in rows)]
    summary = {"config": args.config, "seeds": args.seeds}
    for k in keys:
        vals = [float(r[k]) for r in rows]
        summary[f"{k}_mean"] = round(sum(vals) / len(vals), 4)
        summary[f"{k}_min"] = round(min(vals), 4)
        summary[f"{k}_per_seed"] = [round(v, 4) for v in vals]
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
