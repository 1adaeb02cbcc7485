#!/usr/bin/env python
"""Throughput benchmark: 640px images/sec/chip through the fused
inference engine (uint8 normalize -> backbone/head -> grid decode ->
on-device matrix NMS -> detections).

Methodology: the primary number is steady-state engine throughput over
device-resident uint8 batches (rotating pool of distinct inputs),
synchronized by fetching a scalar reduction of the detection output —
on this environment's tunneled TPU, `block_until_ready` returns at
enqueue time, and host<->device bandwidth (~1.5 GB/s through the relay)
is an artifact of the tunnel rather than of v5e hardware, so H2D-included
throughput is also measured and reported as an aux field inside the
metric string.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"};
vs_baseline is the ratio against the 2000 img/s/chip north star
(BASELINE.json). Run with --smoke for a fast CPU sanity pass.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(fn, fetch, batches, iters):
    accs = [fn(batches[i % len(batches)]) for i in range(2)]
    fetch(accs[-1])  # warmup + sync
    t0 = time.perf_counter()
    accs = [fn(batches[i % len(batches)]) for i in range(iters)]
    fetch(accs[-1])
    return time.perf_counter() - t0


def run_point(model_name: str, img_size: int, batch: int, iters: int,
              pool: int, dtype_name: str, conf_thres: float,
              max_candidates: int, with_h2d: bool = True,
              micro_batch: int | None = None,
              quantize: bool = False) -> dict:
    """Measure one (model, size, batch, dtype, conf) operating point.

    micro_batch: run the engine as lax.map over chunks of this size
    inside the one jit — peak activation memory scales with the chunk,
    the lever for HBM-capacity-capped points (w6@1280 regresses past
    b8; see FaceDetector(micro_batch=...) for the serving-side knob).

    quantize: W8A8 int8 serving forward (models/quant.py) — the
    byte-reduction mode for the HBM-bound forward; scales come from the
    structure-only calibration (perf-identical graph, arbitrary
    numerics; FaceDetector(quantize='int8') calibrates on real data)."""
    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    spec = zoo.get_spec(model_name)
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    if quantize:
        from face_detection_multi_scale_tpu.models import quant
        variables = quant.quantize(
            spec, variables, quant.calibrate_shape_only(spec, variables))

        def forward(v, xc):
            return quant.quant_apply(spec, v, xc, dtype=dtype)
    else:
        def forward(v, xc):
            return model.apply(v, xc.astype(dtype) / 255.0, train=False)

    # variables ride as a jit ARGUMENT, not a closure: closed-over arrays
    # are inlined into the HLO as constants, and on this environment the
    # remote-compile request then exceeds the tunnel's size limit for the
    # larger models (HTTP 413 at ~w6 scale)
    variables = jax.device_put(variables)

    @jax.jit
    def engine_v(variables, x):
        def chunk_sum(xc):
            raws = forward(variables, xc)
            dets = NMS.non_max_suppression(
                decode(raws, spec), conf_thres, 0.5, nc=spec.nc,
                nkpt=spec.nkpt, max_candidates=max_candidates,
                max_det=300)
            # scalar reduction over EVERY output field forces the full
            # serving computation at fetch time — summing only
            # boxes+scores lets XLA dead-code the landmark gather, which
            # round-3 profiling showed is a major cost when consumed
            return (dets.boxes.sum() + dets.scores.sum()
                    + dets.classes.sum()
                    + dets.extras.astype(jnp.float32).sum()
                    + dets.valid.sum() + dets.n_gated.sum())

        b = x.shape[0]
        if micro_batch and b > micro_batch and b % micro_batch == 0:
            chunks = x.reshape((b // micro_batch, micro_batch)
                               + x.shape[1:])
            return jax.lax.map(chunk_sum, chunks).sum()
        return chunk_sum(x)

    def engine(x):
        return engine_v(variables, x)

    rng = np.random.default_rng(0)
    host_batches = [
        rng.integers(0, 255, (batch, img_size, img_size, 3),
                     dtype=np.uint8) for _ in range(pool)]

    # primary: device-resident inputs
    resident = [jax.device_put(b) for b in host_batches]
    jax.block_until_ready(resident)
    dt = measure(engine, float, resident, iters)
    point = {
        "model": model_name, "img_size": img_size, "batch": batch,
        "dtype": "int8-w8a8" if quantize else dtype_name,
        "conf_thres": conf_thres,
        "max_candidates": max_candidates,
        "images_per_sec": round(batch * iters / dt, 2),
    }
    if micro_batch and batch > micro_batch and batch % micro_batch == 0:
        # stamp only when the engine actually chunked — engine_v falls
        # back to whole-batch otherwise, and the row must not claim a
        # configuration that never ran
        point["micro_batch"] = micro_batch

    if with_h2d:
        # aux: H2D included (device_put inside the loop)
        def engine_h2d(b):
            return engine(jax.device_put(b))

        h2d_iters = max(iters // 3, 2)
        dt2 = measure(engine_h2d, float, host_batches, h2d_iters)
        point["images_per_sec_h2d"] = round(batch * h2d_iters / dt2, 2)
    return point


def run_latency(model_name: str, img_size: int, dtype_name: str,
                iters: int = 30, conf_thres: float = 0.25,
                max_candidates: int = 1024) -> dict:
    """Single-image (batch 1) end-to-end latency percentiles — the p50
    the BASELINE tracks alongside throughput. Each call fetches the
    scalar reduction, so the number includes dispatch + full execution."""
    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.ops import nms as NMS

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    spec = zoo.get_spec(model_name)
    model, variables = init_model(spec, img_size=64, dtype=dtype)
    variables = jax.device_put(variables)

    @jax.jit
    def engine(variables, x):
        raws = model.apply(variables, x.astype(dtype) / 255.0,
                           train=False)
        d = NMS.non_max_suppression(
            decode(raws, spec), conf_thres, 0.5, nc=spec.nc,
            nkpt=spec.nkpt, max_candidates=max_candidates, max_det=300)
        return (d.boxes.sum() + d.scores.sum() + d.classes.sum()
                + d.extras.astype(jnp.float32).sum()
                + d.valid.sum() + d.n_gated.sum())

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(rng.integers(
        0, 255, (1, img_size, img_size, 3), np.uint8))
        for _ in range(4)]
    jax.block_until_ready(imgs)
    float(engine(variables, imgs[0]))  # compile
    samples = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(engine(variables, imgs[i % 4]))
        samples.append(1000 * (time.perf_counter() - t0))
    samples.sort()
    return {"model": model_name, "img_size": img_size,
            "dtype": dtype_name, "batch": 1,
            "latency_ms_p50": round(samples[len(samples) // 2], 2),
            "latency_ms_p90": round(samples[int(len(samples) * 0.9)], 2)}


def run_sweep(smoke: bool, out_path=None) -> list:
    """The published operating-point table: the serving point
    (tiny-face, the latency/throughput model) and the AP-parity flagship
    (yolov7-w6-face — the production checkpointed architecture behind the
    WIDER hard 0.830 target, reference multi_scale_face_detector.py:696)
    at 640 and its P6-native 1280, plus a loaded-postprocess point at the
    WIDER eval conf 0.01 where the NMS stage actually works.

    out_path: when given, the partial table is (re)written after EVERY
    row — on this relay a single compile can take 10-25 minutes, so a
    timeout mid-sweep must not lose the rows already measured."""
    if smoke:
        pts = [("yolov7-lite-t", 128, 2, 2, 2, "float32", 0.25, 256),
               ("yolov7-lite-t", 128, 2, 2, 2, "float32", 0.01, 256)]
    else:
        pts = [
            # small serving model, large batch
            ("yolov7-tiny-face", 640, 128, 30, 4, "bfloat16", 0.25, 1024),
            # serving point under eval-density postprocess load
            ("yolov7-tiny-face", 640, 128, 15, 4, "bfloat16", 0.01, 4096),
            # AP-parity flagship (the bench.py HEADLINE) at the TTA base
            # scale. Round-2 batch scan: b32 754, b64 866, b128 1047,
            # b256 1046 img/s — saturates at 128 (landmark-free
            # protocol; round-3 numbers include the landmark gather)
            ("yolov7-w6-face", 640, 128, 10, 3, "bfloat16", 0.25, 1024),
            ("yolov7-w6-face", 640, 128, 8, 3, "bfloat16", 0.01, 4096),
            # flagship at its P6-native resolution (r2 scan: b4 100,
            # b8 172, b16 110, b32 119 — 8 is the sweet spot; b16+
            # regress from HBM capacity, see CLAUDE.md)
            ("yolov7-w6-face", 1280, 8, 10, 4, "bfloat16", 0.25, 1024),
            # micro_batch=8: lax.map of b8 chunks inside one jit — b8's
            # working set with a large outer batch's amortization.
            # Round-4 grid: b16/mb8 169, b32/mb8 178 (best), b32/mb16
            # 110 (the chunk itself spills) — PERF.md §3d
            ("yolov7-w6-face", 1280, 32, 8, 2, "bfloat16", 0.25, 1024,
             True, 8),
            # 1280 eval point (3-repeat pinned 171±2, 2026-08-18)
            ("yolov7-w6-face", 1280, 32, 8, 2, "bfloat16", 0.01, 4096,
             True, 8),
            # W8A8 int8 serving rows (models/quant.py; bytes 38.6 ->
            # 23.4 GB) — same-day A/B 2026-08-19 (tools/CHIP_R5A.json):
            # w6 serving 1032 -> 1332 (+29%), tiny 2265 -> 2667 (+18%),
            # w6 eval 848 -> 879 (the eval point is postprocess-bound)
            ("yolov7-w6-face", 640, 128, 10, 3, "bfloat16", 0.25, 1024,
             False, None, True),
            ("yolov7-w6-face", 640, 128, 8, 3, "bfloat16", 0.01, 4096,
             False, None, True),
            ("yolov7-tiny-face", 640, 128, 15, 4, "bfloat16", 0.25, 1024,
             False, None, True),
        ]
    rows = []
    # train rows come from tools/train_bench.py --record — a sweep
    # re-measures the inference side only and must not wipe them
    preserved = []
    if out_path is not None and out_path.exists():
        try:
            preserved = [r for r in json.loads(out_path.read_text())
                         if str(r.get("mode", "")).startswith("train")]
        except Exception:
            preserved = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
        if out_path is not None:
            out_path.write_text(json.dumps(rows + preserved, indent=1))

    for p in pts:
        emit(run_point(*p))
    lat_pts = ([("yolov7-lite-t", 128, "float32", 4)] if smoke else
               [("yolov7-tiny-face", 640, "bfloat16", 30),
                ("yolov7-w6-face", 640, "bfloat16", 20)])
    for lp in lat_pts:
        emit(run_latency(*lp))
    return rows


def _last_known() -> dict | None:
    """Best prior flagship measurement, for the failure line: the
    driver's record must stay parseable even when the relay is down."""
    import pathlib

    p = pathlib.Path(__file__).parent / "BENCH_SWEEP.json"
    try:
        rows = json.loads(p.read_text())
        for r in rows:
            if (r.get("model") == "yolov7-w6-face"
                    and r.get("img_size") == 640
                    and r.get("conf_thres") == 0.25):
                return r
    except Exception:
        pass
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-w6-face",
                    help="default is the FLAGSHIP (the production "
                         "AP-parity architecture, reference "
                         "multi_scale_face_detector.py:696); the tiny "
                         "serving model's numbers live in the sweep")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128,
                    help="128 is the headline default: int8 serving "
                         "saturates at 256 (1445 vs 1368, CHIP_R5D) "
                         "but the EVAL point — which vs_baseline is "
                         "pinned to — measured 1228 b128 vs 1187 b256 "
                         "same-process (CHIP_R5E); b256 is a "
                         "serving-only recommendation")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--pool", type=int, default=4,
                    help="distinct resident input batches to rotate")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--max-candidates", type=int, default=1024,
                    help="pre-NMS candidate cap (1024 is ample at the "
                         "serving conf threshold; the WIDER eval point "
                         "conf 0.01 needs 4096+, an accuracy knob)")
    ap.add_argument("--micro-batch", type=int, default=None,
                    help="engine runs as lax.map over chunks of this "
                         "size inside one jit (HBM-capacity lever for "
                         "large-image points, e.g. 1280px b16 mb8)")
    ap.add_argument("--quantize", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="W8A8 int8 serving forward (models/quant.py) — "
                         "the byte-reduction mode for the HBM-bound "
                         "forward. DEFAULT ON for the flagship headline "
                         "(the production serving mode, "
                         "FaceDetector(quantize='int8'); measured AP "
                         "label +0.000/+0.002/+0.002 vs float on the "
                         "e2e protocol, AP_PARITY.md); --no-quantize "
                         "for the bf16 engine")
    ap.add_argument("--sweep", action="store_true",
                    help="measure the full operating-point table "
                         "(serving + AP-parity flagship) and write "
                         "BENCH_SWEEP.json next to this script")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-friendly configuration")
    args = ap.parse_args()

    if args.smoke:
        args.model, args.img_size, args.batch = "yolov7-lite-t", 128, 2
        args.iters, args.pool, args.dtype = 2, 2, "float32"
        # actually run on CPU: the JAX_PLATFORMS env var is ignored on
        # this machine's sitecustomize; only the config update works
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.sweep:
        import pathlib
        # smoke runs must not clobber the recorded real-chip sweep
        name = "BENCH_SWEEP_SMOKE.json" if args.smoke \
            else "BENCH_SWEEP.json"
        out = pathlib.Path(__file__).parent / name
        rows = run_sweep(args.smoke, out_path=out)
        print(json.dumps({"sweep": rows}))
        return 0

    if args.quantize is None:
        # headline default: the flagship ships int8 (W8A8) serving —
        # measured +29% over bf16 with an AP label of
        # +0.000/+0.002/+0.002 vs float (PERF.md §3e, AP_PARITY.md);
        # bf16 rows stay in the sweep table
        args.quantize = (not args.smoke
                         and args.model == "yolov7-w6-face")

    point = run_point(args.model, args.img_size, args.batch, args.iters,
                      args.pool, args.dtype, args.conf_thres,
                      args.max_candidates, micro_batch=args.micro_batch,
                      quantize=args.quantize)
    extra = ""
    eval_point = None
    if not args.smoke and args.model == "yolov7-w6-face" \
            and args.conf_thres >= 0.1:
        # also measure the WIDER-eval operating point (conf 0.01, deep
        # candidate buffer) in the same run — the number AP parity is
        # actually earned at
        eval_point = run_point(args.model, args.img_size, args.batch,
                               max(args.iters // 2, 4), args.pool,
                               args.dtype, 0.01, 4096, with_h2d=False,
                               quantize=args.quantize)
        extra = (f"; eval point conf 0.01/k4096: "
                 f"{eval_point['images_per_sec']:.0f} img/s")
    tag = " (flagship)" if args.model == "yolov7-w6-face" else ""
    # vs_baseline is pinned to the EVAL operating point when measured —
    # the north star is throughput *at AP parity*, and conf 0.01/k4096
    # is the point the AP protocol actually runs at (the serving-point
    # ratio is reported alongside, round-4 verdict weak #6)
    vs_serving = round(point["images_per_sec"] / 2000.0, 4)
    vs_eval = (round(eval_point["images_per_sec"] / 2000.0, 4)
               if eval_point else None)
    result = {
        "metric": (f"{args.model}{tag} {args.img_size}px "
                   f"images/sec/chip (batch={args.batch}, "
                   f"{point['dtype']}"
                   + (", AP label +0.000/+0.002/+0.002 vs float e2e"
                      if args.quantize else "") + ", "
                   f"fused infer+decode+NMS, serving point conf "
                   f"{args.conf_thres}, device-resident inputs; "
                   f"with H2D over tunnel: "
                   f"{point['images_per_sec_h2d']:.0f} img/s"
                   f"{extra}; vs_baseline is the eval-point ratio, "
                   f"serving-point ratio {vs_serving}; full "
                   f"operating-point table in BENCH_SWEEP.json)"),
        "value": point["images_per_sec"],
        "unit": "images/sec/chip",
        "vs_baseline": vs_eval if vs_eval is not None else vs_serving,
        "vs_baseline_serving": vs_serving,
    }
    if vs_eval is not None:
        result["vs_baseline_eval"] = vs_eval
    print(json.dumps(result))
    return 0


def _main_guarded():
    """Run main(), but NEVER exit without one parseable JSON line.

    Round 3's driver bench record is empty because a relay outage
    surfaced as a bare traceback (BENCH_r03.json rc=1, parsed=null).
    Any failure — backend init, remote compile, OOM — now emits
    {"metric", "value": 0, "unit", "vs_baseline": 0, "error",
    "last_known"} so the perf record has an explicit hole instead of a
    silent one."""
    try:
        return main()
    except BaseException as e:  # noqa: BLE001 - deliberate catch-all
        if isinstance(e, (SystemExit, KeyboardInterrupt)):
            raise
        import traceback

        traceback.print_exc(file=sys.stderr)
        lk = _last_known()
        print(json.dumps({
            "metric": ("BENCH FAILED (environment): yolov7-w6-face "
                       "(flagship) 640px images/sec/chip; last known "
                       "real-chip measurement attached"),
            "value": 0,
            "unit": "images/sec/chip",
            "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}",
            "last_known": lk,
        }))
        return 0  # the JSON line IS the result; rc=0 keeps it recorded


if __name__ == "__main__":
    sys.exit(_main_guarded())
