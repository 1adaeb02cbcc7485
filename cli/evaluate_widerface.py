#!/usr/bin/env python
"""WIDER FACE evaluation CLI.

Same surface as the reference harness (reference
widerface_evaluate/evaluation.py:284-291: `-p/--pred`, `-g/--gt`), prints
the identical Easy/Medium/Hard AP block, exits nonzero if --expect-* gates
fail (for CI-style regression runs).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--pred", default="./widerface_txt/")
    ap.add_argument("-g", "--gt", default="./ground_truth/")
    ap.add_argument("--expect-easy", type=float, default=None)
    ap.add_argument("--expect-medium", type=float, default=None)
    ap.add_argument("--expect-hard", type=float, default=None)
    args = ap.parse_args(argv)

    from face_detection_multi_scale_tpu.eval.widerface import evaluation

    aps = evaluation(args.pred, args.gt)
    ok = True
    for setting in ("easy", "medium", "hard"):
        want = getattr(args, f"expect_{setting}")
        if want is not None and aps[setting] < want:
            print(f"FAIL: {setting} AP {aps[setting]:.4f} < {want}")
            ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
