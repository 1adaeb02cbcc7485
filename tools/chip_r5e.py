#!/usr/bin/env python
"""Round-5e: does the w6 int8 EVAL point also like b256?

CHIP_R5D measured the serving point's saturation knee moving 128->256
under int8 (1368 -> 1445 img/s) but never took the eval operating
point (conf 0.01, k=4096) at b256. bench.py's headline batch should be
256 only if BOTH points hold there (vs_baseline is pinned to eval).
Re-measures the b128 eval row in the same process as the same-day
control (relay variance rule, CLAUDE.md).

    python tools/chip_r5e.py
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import run_point  # noqa: E402

OUT = pathlib.Path(__file__).parent / "CHIP_R5E.json"


def main():
    rows = []
    # same-process control first: eval b128 int8 (CHIP_R5D: 1213)
    for batch, conf, k, iters in [
        (128, 0.01, 4096, 12),   # control
        (256, 0.01, 4096, 8),    # the question
        (256, 0.25, 1024, 8),    # serving b256 re-read (R5D: 1445)
    ]:
        r = run_point("yolov7-w6-face", 640, batch, iters, 3,
                      "bfloat16", conf, k, with_h2d=False,
                      quantize=True)
        rows.append(r)
        print(json.dumps(r), flush=True)
        OUT.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
