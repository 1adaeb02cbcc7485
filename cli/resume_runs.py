#!/usr/bin/env python
"""Scan for interrupted training runs and resume them.

Equivalent surface to the reference resume helper
(reference utils/aws/resume.py:14-37: find every **/last checkpoint and
relaunch its training command). Multi-host relaunches reuse the same
command on every host — jax.distributed handles the rendezvous, so no
torch.distributed.launch reconstruction is needed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def find_interrupted(root: str):
    """Runs with a `last` checkpoint whose opt.json epochs exceed the
    checkpointed epoch."""
    out = []
    for meta_path in glob.glob(os.path.join(root, "**", "weights",
                                            "last.meta.json"),
                               recursive=True):
        run_dir = Path(meta_path).parent.parent
        opt_path = run_dir / "opt.json"
        if not opt_path.exists():
            continue
        with open(meta_path) as f:
            meta = json.load(f)
        with open(opt_path) as f:
            opt = json.load(f)
        done = int(meta.get("epoch", -1)) + 1
        want = int(opt.get("epochs", 0))
        if done < want:
            out.append((str(run_dir), done, want, opt))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/train")
    ap.add_argument("--dry-run", action="store_true",
                    help="print commands without launching")
    args = ap.parse_args(argv)

    runs = find_interrupted(args.root)
    if not runs:
        print(f"no interrupted runs under {args.root}")
        return 0
    for run_dir, done, want, opt in runs:
        cmd = [sys.executable, str(Path(__file__).parent / "train.py"),
               "--resume", "--exist-ok",
               "--project", str(Path(run_dir).parent),
               "--name", Path(run_dir).name]
        for key in ("model", "data", "hyp", "epochs", "batch_size",
                    "img_size", "kpt_label"):
            if opt.get(key) is not None:
                cmd += [f"--{key.replace('_', '-')}", str(opt[key])]
        print(f"resume {run_dir} (epoch {done}/{want}):")
        print("  " + " ".join(cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
