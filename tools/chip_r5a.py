#!/usr/bin/env python
"""Round-5 chip batch A: int8 W8A8 serving A/B, end to end.

tools/QUANT_AB.json measured the FORWARD only (99 -> 73.2 ms/batch,
bytes 38.6 -> 23.4 GB for w6@640 b128). This batch measures the full
serving engines (forward + decode + NMS + gathers) at the published
operating points, int8 vs bf16 in the same process on the same day
(relay variance rule, CLAUDE.md). Rows reuse bench.run_point
(quantize=True runs models/quant.quant_apply with structure-only
scales — the perf-identical graph).

Writes tools/CHIP_R5A.json incrementally (one row at a time — a relay
stall mid-batch must not lose finished rows).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).parent / "CHIP_R5A.json"


def main():
    import bench

    points = [
        # (model, size, batch, iters, pool, dtype, conf, k, h2d, mb, q)
        ("yolov7-w6-face", 640, 128, 10, 3, "bfloat16", 0.25, 1024,
         False, None, False),
        ("yolov7-w6-face", 640, 128, 10, 3, "bfloat16", 0.25, 1024,
         False, None, True),
        ("yolov7-w6-face", 640, 128, 8, 3, "bfloat16", 0.01, 4096,
         False, None, False),
        ("yolov7-w6-face", 640, 128, 8, 3, "bfloat16", 0.01, 4096,
         False, None, True),
        ("yolov7-tiny-face", 640, 128, 20, 4, "bfloat16", 0.25, 1024,
         False, None, False),
        ("yolov7-tiny-face", 640, 128, 20, 4, "bfloat16", 0.25, 1024,
         False, None, True),
        # 1280 int8 at the round-4 winner config (b32 micro-batch 8)
        ("yolov7-w6-face", 1280, 32, 8, 2, "bfloat16", 0.25, 1024,
         False, 8, True),
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
        print(json.dumps(row), file=sys.stderr, flush=True)
        OUT.write_text(json.dumps(rows, indent=1))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
