#!/usr/bin/env python
"""Attribute the w6 eval-point postprocess residue IN THE REAL GRAPH
(round-4 verdict weak #1 / next-round #2).

The honest w6 eval engine (conf 0.01, k=4096, b128@640) measures
~157 ms = 105 forward + 52 postprocess, yet the isolated postprocess
components (sort ~5, tile-sequential NMS 12.3, keeper gathers) sum to
~25 ms. Truncated-graph stage cuts cannot see where the other ~27 ms
goes (they force materializations the fused graph doesn't have), so
this tool profiles the ACTUAL compiled executable with jax.profiler
and aggregates device-side op durations by HLO op name.

Buckets (by op-name substring, first match wins):
  conv/fusion with dot  -> forward
  custom-call nms       -> pallas NMS kernel
  sort                  -> top-k sort
  gather/scatter        -> gathers
  everything else       -> glue (fusions: decode, masks, epilogues)

Output: per-bucket totals + the top-25 single ops, written to
tools/TRACE_EVAL.json. Works on the axon relay iff the profiler
captures device events through the tunnel; if only host events appear,
says so explicitly instead of publishing garbage.
"""

from __future__ import annotations

import glob
import gzip
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).parent / "TRACE_EVAL.json"


def parse_xspace(trace_dir: str):
    """Read the xplane protobuf via tensorflow's bundled schema and
    return [(plane_name, event_name, duration_ps)]."""
    import importlib

    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "xprof.protobuf.xplane_pb2"):
        try:
            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise ImportError("no xplane_pb2 schema available")

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(sorted(paths)[-1], "rb").read())
    rows = []
    for plane in xspace.planes:
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                rows.append((plane.name, line.name, name,
                             ev.duration_ps))
    return rows


def bucket_of(name: str) -> str:
    n = name.lower()
    # async spans (copy-start / all the *-start ops) measure start->done
    # INCLUDING everything they overlap with — bucket them apart so the
    # sync buckets can be read as an additive decomposition
    if "-start" in n or "start(" in n.split(" = ")[0]:
        return "async_span_overlapped"
    if "tpu_custom_call" in n or n.startswith("%engine"):
        return "nms_pallas_kernel"
    if "kind=kcustom" in n:
        # XLA emits kCustom fusions for gather/scatter/top-k epilogues
        return "gather_kcustom"
    if "nms" in n:
        return "nms_pallas_kernel"
    if "sort" in n or "top-k" in n or "topk" in n:
        return "sort_topk"
    if "gather" in n or "scatter" in n or "dynamic-slice" in n:
        return "gather"
    if "convolution" in n or "conv" in n or "dot" in n:
        return "forward_conv"
    if "fusion" in n:
        return "fusion_glue"
    if "copy" in n or "transpose" in n or "reshape" in n \
            or "bitcast" in n:
        return "layout_copy"
    return "other"


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-w6-face")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--conf", type=float, default=0.01)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--out", default=str(OUT))
    ap.add_argument("--parse-only", default=None, metavar="TRACE_DIR",
                    help="skip the run; re-bucket an existing xplane "
                         "capture (wall_ms_per_iter reported as null)")
    args = ap.parse_args()

    if args.parse_only:
        trace_dir, wall_ms = args.parse_only, None
        return finish(args, trace_dir, wall_ms)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    dtype = jnp.bfloat16
    spec = zoo.get_spec(args.model)
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    if args.quantize:
        from face_detection_multi_scale_tpu.models import quant
        variables = quant.quantize(
            spec, variables, quant.calibrate_shape_only(spec, variables))

        def forward(v, x):
            return quant.quant_apply(spec, v, x, dtype=dtype)
    else:
        def forward(v, x):
            return model.apply(v, x.astype(dtype) / 255.0, train=False)
    variables = jax.device_put(variables)

    @jax.jit
    def engine(v, x):
        raws = forward(v, x)
        d = NMS.non_max_suppression(
            decode(raws, spec), args.conf, 0.5, nc=spec.nc,
            nkpt=spec.nkpt, max_candidates=args.k, max_det=300)
        return (d.boxes.sum() + d.scores.sum() + d.classes.sum()
                + d.extras.astype(jnp.float32).sum()
                + d.valid.sum() + d.n_gated.sum())

    rng = np.random.default_rng(0)
    pool = [jax.device_put(rng.integers(
        0, 255, (args.batch, args.img_size, args.img_size, 3), np.uint8))
        for _ in range(3)]
    jax.block_until_ready(pool)
    float(engine(variables, pool[0]))  # compile
    float(engine(variables, pool[1]))  # warm

    trace_dir = "/tmp/jax-trace-eval"
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for i in range(args.iters):
        acc = engine(variables, pool[i % 3])
    float(acc)
    jax.profiler.stop_trace()
    wall_ms = 1000 * (time.perf_counter() - t0) / args.iters
    return finish(args, trace_dir, wall_ms)


def finish(args, trace_dir, wall_ms):
    rows = parse_xspace(trace_dir)
    device_rows = [(ln, name, ps) for pl, ln, name, ps in rows
                   if "TPU" in pl or "/device" in pl.lower()
                   or "xla op" in ln.lower()]
    result = {"model": args.model, "batch": args.batch,
              "conf": args.conf, "k": args.k, "iters": args.iters,
              "quantize": args.quantize,
              "wall_ms_per_iter": (None if wall_ms is None
                                   else round(wall_ms, 1)),
              "planes": sorted({pl for pl, _, _, _ in rows}),
              "n_device_events": len(device_rows)}
    if not device_rows:
        result["verdict"] = ("no device-side events captured through "
                             "the relay — attribution not possible via "
                             "jax.profiler here")
    else:
        # per trace-line totals: within one xplane line events are laid
        # out sequentially, so a line total is meaningful; summing
        # ACROSS lines double-counts (module line nests the op line)
        per_line = {}
        for ln, _, ps in device_rows:
            t, n = per_line.get(ln, (0.0, 0))
            per_line[ln] = (t + ps / 1e9 / args.iters, n + 1)
        result["lines_ms_per_iter"] = {
            ln: {"ms": round(t, 2), "events": n}
            for ln, (t, n) in
            sorted(per_line.items(), key=lambda kv: -kv[1][0])}
        # attribute on the op-level line only (the one with the most
        # events); module-level entries (jit_engine totals) stay in
        # lines_ms_per_iter as the ground-truth device total
        op_line = max(per_line, key=lambda ln: per_line[ln][1])
        result["attribution_line"] = op_line
        per_op, per_bucket = {}, {}
        for ln, name, ps in device_rows:
            if ln != op_line:
                continue
            ms = ps / 1e9 / args.iters
            per_op[name] = per_op.get(name, 0.0) + ms
            b = bucket_of(name)
            per_bucket[b] = per_bucket.get(b, 0.0) + ms
        result["buckets_ms_per_iter"] = {
            k: round(v, 2) for k, v in
            sorted(per_bucket.items(), key=lambda kv: -kv[1])}
        result["top_ops_ms_per_iter"] = [
            {"op": k[:200], "ms": round(v, 3)} for k, v in
            sorted(per_op.items(), key=lambda kv: -kv[1])[:25]]
    pathlib.Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
