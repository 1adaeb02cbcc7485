#!/usr/bin/env python
"""Round-5 chip batch D: packed-gather postprocess A/B, end to end.

The round-5 trace attribution (TRACE_EVAL_bf16/int8.json) showed the
eval point's residue is the per-plane top-k gathers (bf16: 27 of
147 ms; int8: 46 of 142 ms); probe_gather.py measured a single packed
(B,N,4) gather at 5.4x. ops/nms.py now gathers packed — this batch
re-measures the SAME operating points as tools/chip_r5a.py in one
process so the delta is same-day, same-relay comparable
(CHIP_R5A.json rows are the 'before').

Writes tools/CHIP_R5D.json incrementally (one row at a time — a relay
stall mid-batch must not lose finished rows).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).parent / "CHIP_R5D.json"


def main():
    import bench

    points = [
        # (model, size, batch, iters, pool, dtype, conf, k, h2d, mb, q)
        # the two headline eval points first (stall insurance)
        ("yolov7-w6-face", 640, 128, 8, 3, "bfloat16", 0.01, 4096,
         False, None, False),
        ("yolov7-w6-face", 640, 128, 8, 3, "bfloat16", 0.01, 4096,
         False, None, True),
        ("yolov7-w6-face", 640, 128, 10, 3, "bfloat16", 0.25, 1024,
         False, None, False),
        ("yolov7-w6-face", 640, 128, 10, 3, "bfloat16", 0.25, 1024,
         False, None, True),
        ("yolov7-tiny-face", 640, 128, 20, 4, "bfloat16", 0.25, 1024,
         False, None, False),
        ("yolov7-tiny-face", 640, 128, 20, 4, "bfloat16", 0.25, 1024,
         False, None, True),
        # tiny at eval-density postprocess load (the gather-heaviest
        # point relative to its forward)
        ("yolov7-tiny-face", 640, 128, 15, 4, "bfloat16", 0.01, 4096,
         False, None, False),
        ("yolov7-tiny-face", 640, 128, 15, 4, "bfloat16", 0.01, 4096,
         False, None, True),
        ("yolov7-w6-face", 1280, 32, 8, 2, "bfloat16", 0.25, 1024,
         False, 8, True),
        # does int8's smaller working set move the b128 saturation?
        ("yolov7-w6-face", 640, 256, 6, 2, "bfloat16", 0.25, 1024,
         False, None, True),
        ("yolov7-tiny-face", 640, 256, 10, 2, "bfloat16", 0.25, 1024,
         False, None, True),
    ]
    rows = []
    for p in points:
        t0 = time.perf_counter()
        try:
            row = bench.run_point(*p[:8], with_h2d=p[8],
                                  micro_batch=p[9], quantize=p[10])
        except Exception as e:  # noqa: BLE001 — record, keep going
            row = {"model": p[0], "img_size": p[1], "batch": p[2],
                   "quantize": p[10], "conf_thres": p[6],
                   "error": str(e)[-1500:]}
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        OUT.write_text(json.dumps(rows, indent=1))
    print("CHIP_R5D_DONE")


if __name__ == "__main__":
    main()
