#!/usr/bin/env python
"""Put a number on the spatial-sharding claim (round-4 verdict #7).

The README design table recommends spatial (sp_h, sp_w) sharding for
giant pyramid scales on multi-chip; that was a design assertion proven
for correctness only (dryrun at toy shapes). This tool models the cost
at the REAL shape — w6@3840 b1 — by AOT-compiling the GSPMD-partitioned
forward over a virtual 2x4 CPU mesh and reading what the compiler
actually scheduled:

  * per-chip flops + bytes-accessed from compiled.cost_analysis()
  * halo-exchange / gather traffic by summing the result shapes of
    every collective (collective-permute, all-gather, all-reduce) in
    the partitioned HLO text

then converts to time with the v5e peaks used everywhere else in
PERF.md (819 GB/s HBM) plus a stated ICI assumption (2D torus, ~45
GB/s per direction per link => a 1-hop halo exchange streams at ~45
GB/s), and compares against the measured single-chip answers: plain b1
(2.86 img/s) and the tiled path (7.8 img/s, PERF.md §3b).

Everything is compile-time analysis on the CPU backend — no TPU, no
execution. Writes tools/SPATIAL_COST.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).parent / "SPATIAL_COST.json"

HBM_BW = 819e9          # v5e HBM, PERF.md roofline
MXU_BF16 = 197e12       # v5e bf16 peak
ICI_BW = 45e9           # per-direction per-link, 2D torus (assumption)

DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s8": 1, "u8": 1,
               "s32": 4, "u32": 4, "pred": 1, "s16": 2, "u16": 2,
               "f64": 8, "s64": 8, "u64": 8}


def collective_bytes(hlo_text: str):
    """Sum output bytes of every cross-device collective in the HLO,
    keyed by op kind. Shapes look like `bf16[1,480,960,128]{3,2,1,0}`;
    tuple-result collectives list several shapes inside `( ... )`."""
    per_kind = {}
    shape_re = re.compile(r"(\w+)\[([0-9,]*)\]")
    for m in re.finditer(
            r"^\s*\S+ = (\([^)]*\)|\S+) (collective-permute|all-gather|"
            r"all-reduce|all-to-all|reduce-scatter)\(",
            hlo_text, re.M):
        shapes, kind = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_re.findall(shapes):
            if dt not in DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES[dt]
        per_kind.setdefault(kind, [0, 0])
        per_kind[kind][0] += 1
        per_kind[kind][1] += nbytes
    return {k: {"count": c, "bytes": b} for k, (c, b) in per_kind.items()}


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-w6-face")
    ap.add_argument("--img-size", type=int, default=3840)
    ap.add_argument("--rows", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.parallel import mesh as MESH

    spec = zoo.get_spec(args.model)
    model, variables = init_model(spec, img_size=64, dtype=jnp.bfloat16)
    var_shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    x_shape = jax.ShapeDtypeStruct(
        (1, args.img_size, args.img_size, 3), jnp.uint8)

    def run(v, x_u8):
        x = x_u8.astype(jnp.bfloat16) / 255.0
        raws = model.apply(v, x, train=False)
        return decode(raws, spec)

    result = {"model": args.model, "img_size": args.img_size,
              "assumptions": {"hbm_gbps": HBM_BW / 1e9,
                              "ici_gbps_per_link": ICI_BW / 1e9,
                              "mesh": f"{args.rows}x{8 // args.rows} "
                                      "spatial (sp_h, sp_w)"}}

    # -- single-device baseline ------------------------------------
    t0 = time.time()
    c1 = jax.jit(run).lower(var_shapes, x_shape).compile()
    fl1, by1 = cost_of(c1)
    result["single_device"] = {
        "compile_s": round(time.time() - t0, 1),
        "tflops": round(fl1 / 1e12, 2), "gbytes": round(by1 / 1e9, 2),
        "hbm_floor_ms": round(1e3 * by1 / HBM_BW, 1),
        "mxu_floor_ms": round(1e3 * fl1 / MXU_BF16, 1),
        "measured_img_per_s_plain_b1": 2.86,
        "measured_img_per_s_tiled": 7.8}

    # -- spatially sharded over the 2x4 mesh -----------------------
    smesh = MESH.make_spatial_mesh(jax.devices(), rows=args.rows)
    x_sh = jax.ShapeDtypeStruct(
        x_shape.shape, x_shape.dtype,
        sharding=MESH.spatial_input_sharding(smesh))
    v_sh = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=NamedSharding(smesh, P())), var_shapes)
    t0 = time.time()
    with smesh:
        c8 = jax.jit(run).lower(v_sh, x_sh).compile()
    fl8, by8 = cost_of(c8)
    coll = collective_bytes(c8.as_text())
    exch = sum(v["bytes"] for v in coll.values())
    n_dev = 8

    # per-device numbers: cost_analysis reports the partitioned
    # (per-device) module under SPMD
    hbm_ms = 1e3 * by8 / HBM_BW
    mxu_ms = 1e3 * fl8 / MXU_BF16
    ici_ms = 1e3 * exch / ICI_BW
    per_chip_ms = max(hbm_ms, mxu_ms) + ici_ms  # serial worst case
    result["spatial_8dev"] = {
        "compile_s": round(time.time() - t0, 1),
        "per_device_tflops": round(fl8 / 1e12, 2),
        "per_device_gbytes": round(by8 / 1e9, 2),
        "collectives": coll,
        "exchange_gbytes_per_device": round(exch / 1e9, 3),
        "hbm_floor_ms": round(hbm_ms, 1),
        "mxu_floor_ms": round(mxu_ms, 1),
        "ici_ms_at_45gbps": round(ici_ms, 1),
        "modeled_ms_per_image": round(per_chip_ms, 1),
        "modeled_img_per_s_8chips": round(1e3 / per_chip_ms, 1),
    }
    # 100%-of-roofline is an upper bound; the per-shard work is still
    # a batch-1 giant-conv problem, the regime where this chip MEASURES
    # far below roofline. Derate by two measured anchors (PERF.md §3b):
    #   plain w6@3840 b1 forward: 325 ms vs a 22 ms HBM floor -> 0.068
    #   tiled (4x2176 as b4):     128 ms vs a 28 ms floor      -> 0.22
    for name, eff in (("b1_giant", 0.068), ("tiled_b4", 0.22)):
        ms = max(hbm_ms, mxu_ms) / eff + ici_ms
        result["spatial_8dev"][f"derated_{name}_img_per_s"] = round(
            1e3 / ms, 1)
        result["spatial_8dev"][f"derated_{name}_ms"] = round(ms, 1)

    # the honest comparison: 8 chips could instead each run the tiled
    # single-chip path on their own images (embarrassing parallelism)
    result["alternative_8x_tiled_img_per_s"] = round(8 * 7.8, 1)
    result["verdict"] = (
        "THROUGHPUT: spatial sharding wins only if its derated "
        "img/s/8chips beats 62.4 (8 chips running the measured tiled "
        "path independently, zero communication). LATENCY: spatial "
        "sharding is the only lever that cuts single-image wall time "
        "below the single-chip tiled time.")
    OUT.write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
