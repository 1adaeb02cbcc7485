#!/usr/bin/env python
"""A/B the fused-ELAN Pallas kernel against plain XLA on the real chip.

Per-shape isolated timings (each of w6-face@640's fusable group shapes
at b128 bf16) plus a full-forward engine A/B (model.apply vs
models/fused.fused_apply). Writes JSON lines to tools/ELAN_AB.json as
sections complete, so a partial run still yields data.

Protocol per CLAUDE.md: scalar-fetch timing (block_until_ready returns
at enqueue over the axon relay), a pool of distinct device inputs,
background-friendly (compiles can take 10+ min on a bad relay day).

Usage: python tools/bench_elan.py [--cpu] [--iters 10] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT_PATH = pathlib.Path(__file__).parent / "ELAN_AB.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--skip-engine", action="store_true")
    ap.add_argument("--skip-blocks", action="store_true")
    # Relay RTT is 35-70 ms; a single block eval is ~1 ms of device
    # work, so naive dispatch+fetch timing measures the tunnel, not the
    # kernel (CLAUDE.md).  --reps K runs the block K times inside ONE
    # jitted call via fori_loop (a k-dependent perturbation of every
    # BIAS defeats hoisting at negligible cost — see repeated()).
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--only", default="",
                    help="comma list of block start indices to run")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the numeric cross-check compile")
    ap.add_argument("--fuse-only", default="",
                    help="engine A/B: fuse only these start indices")
    ap.add_argument("--engine-variant", default="taps",
                    help="engine A/B: kernel variant expression applied "
                    "to every fused block (same grammar as --kernels)")
    ap.add_argument("--kernels", default="taps",
                    help="comma list of fused variants: taps,im2col")
    ap.add_argument("--skip-xla", action="store_true",
                    help="block section: time only the fused variants")
    ap.add_argument("--absorb-pre", action="store_true",
                    help="absorb each group's feeding 3x3 downsample")
    ap.add_argument("--th", type=int, default=0,
                    help="override the strip height (0 = footprint-"
                    "model pick): largest divisor of h <= TH, even "
                    "past the model (the raised scoped-vmem limit "
                    "makes bigger strips compilable; real bounds "
                    "surface as per-row compile errors)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.fused import (
        apply_variant, find_elan_blocks, fused_apply,
        pack_elan_weights)
    from face_detection_multi_scale_tpu.models.model import (
        YoloFace, init_model)
    from face_detection_multi_scale_tpu.ops.pallas_elan import (
        choose_strip_height, fused_elan, reference_elan)

    # append-only log: every invocation adds its rows under a header
    # line instead of clobbering earlier measurements (a CPU smoke once
    # erased a day of chip rows)
    with OUT_PATH.open("a") as fh:
        fh.write(json.dumps({
            "section": "run", "argv": sys.argv[1:],
            "at": time.strftime("%Y-%m-%dT%H:%M:%S")}) + "\n")

    def emit(row):
        print(json.dumps(row), flush=True)
        with OUT_PATH.open("a") as fh:
            fh.write(json.dumps(row) + "\n")

    def timed(fn, pool, iters):
        for i in range(2):
            float(fn(*pool[i % len(pool)]))
        t0 = time.perf_counter()
        for i in range(iters):
            float(fn(*pool[i % len(pool)]))
        return (time.perf_counter() - t0) / iters

    dt = jnp.bfloat16
    b = args.batch
    rng = np.random.RandomState(0)

    spec = zoo.get_spec("yolov7-w6-face")
    blocks = find_elan_blocks(spec, absorb_pre=args.absorb_pre)
    _, variables = init_model(spec, jax.random.PRNGKey(0), img_size=64,
                              dtype=dt)
    # spatial size of each block's input at --img (static propagation)
    heights = _node_heights(spec, args.img)
    shapes_at = {blk.start: heights[blk.start] for blk in blocks}

    only = {int(s) for s in args.only.split(",") if s}
    reps = args.reps

    def repeated(block_fn):
        # K reps inside one jitted call; acc + perturbation defeat both
        # hoisting and relay result caching.  Perturb one BIAS (a
        # (1, c) tensor), never x: a per-rep x + eps materializes a
        # full extra input copy per rep — ~2 ms/rep at b128@160 on both
        # arms, and on the fused arm it also re-runs the host-side
        # halo pad (found in review, 2026-08-17).
        def f(ws_, x_):
            def body(k, acc):
                # every bias is a (1, c) f32 row; perturbing them all
                # makes every conv k-dependent so no stage can hoist
                wk = [wv + k.astype(wv.dtype) * 1e-12
                      if wv.ndim == 2 and wv.shape[0] == 1 else wv
                      for wv in ws_]
                return acc + block_fn(wk, x_)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return jax.jit(f)

    if not args.skip_blocks:
        for blk in blocks:
            if only and blk.start not in only:
                continue
            h = w = int(shapes_at[blk.start])
            th = choose_strip_height(blk.shape, h, w, 2)
            if args.th:
                # explicit override: largest divisor of h <= --th, even
                # past the footprint model's pick (the raised scoped-
                # vmem limit makes bigger strips compilable; the real
                # bound surfaces as a compile error, recorded per row)
                caps = [d for d in range(1, args.th + 1) if h % d == 0]
                th = caps[-1] if caps else th
            name = f"elan@{blk.start}@{h}"
            if th == 0:
                emit({"section": "block", "name": name, "status": "no-th"})
                continue
            ws = pack_elan_weights(variables, blk, dt)
            s = blk.shape.pre_stride if blk.shape.has_pre else 1
            cin_in = blk.shape.pre_cin if blk.shape.has_pre \
                else blk.shape.cin
            pool = [
                (ws, jnp.asarray(
                    rng.randn(b, s * h, s * w, cin_in) * 0.5, dt))
                for _ in range(3)]
            row = {"section": "block", "name": name, "th": th,
                   "h": h, "cin": blk.shape.cin, "cch": blk.shape.cch,
                   "members": len(blk.shape.members), "reps": reps,
                   "status": "ok"}
            try:
                if not args.no_check:
                    chk = apply_variant(blk.shape,
                                        args.kernels.split(",")[0])
                    # check batch must be a multiple of the variant's
                    # image group or fused_elan's bsz%group assert
                    # aborts the row before any timing
                    xs = pool[0][1][:max(2, chk.group)]
                    row["max_abs_diff"] = float(jnp.max(jnp.abs(
                        fused_elan(xs, ws, chk, th=th,
                                   interpret=args.cpu).astype(jnp.float32)
                        - reference_elan(xs, ws, blk.shape)
                        .astype(jnp.float32))))
                if not args.skip_xla:
                    ref = repeated(lambda ws_, x_, s=blk.shape: jnp.sum(
                        reference_elan(x_, ws_, s).astype(jnp.float32)))
                    row["xla_ms"] = round(
                        timed(ref, pool, args.iters) / reps * 1e3, 3)
                for kname in args.kernels.split(","):
                    shp = apply_variant(blk.shape, kname)
                    fused = repeated(
                        lambda ws_, x_, s=shp, t=th: jnp.sum(
                            fused_elan(x_, ws_, s, th=t,
                                       interpret=args.cpu)
                            .astype(jnp.float32)))
                    key = "fused_ms" if kname == "taps" else \
                        f"fused_{kname.replace('+', '_')}_ms"
                    row[key] = round(
                        timed(fused, pool, args.iters) / reps * 1e3, 3)
                if "xla_ms" in row and "fused_ms" in row:
                    row["speedup"] = round(row["xla_ms"] / row["fused_ms"],
                                           3)
                emit(row)
            except Exception as e:  # lowering/compile failures per shape
                import traceback
                with open(OUT_PATH.with_name("ELAN_ERRORS.txt"), "a") as fh:
                    fh.write(f"==== {name} ====\n")
                    fh.write(traceback.format_exc() + "\n")
                row.update({"status": "error", "error": repr(e)[:500]})
                emit(row)

    if not args.skip_engine:
        model = YoloFace(spec=spec, dtype=dt)
        x_pool = [jnp.asarray(rng.rand(b, args.img, args.img, 3), dt)
                  for _ in range(3)]
        eng_blocks = blocks
        if args.fuse_only:
            keep = {int(s) for s in args.fuse_only.split(",") if s}
            eng_blocks = [blk for blk in blocks if blk.start in keep]
        if args.engine_variant != "taps":
            import dataclasses as _dc
            eng_blocks = [
                _dc.replace(blk, shape=apply_variant(
                    blk.shape, args.engine_variant))
                for blk in eng_blocks]

        def consume(raws):
            return sum(jnp.sum(r.astype(jnp.float32)) for r in raws)

        xla_fwd = jax.jit(lambda v, x: consume(
            model.apply(v, x, train=False)))
        fused_fwd = jax.jit(lambda v, x: consume(
            fused_apply(spec, v, x, blocks=eng_blocks, dtype=dt,
                        interpret=args.cpu)))
        for name, fn in [("xla_fwd", xla_fwd), ("fused_fwd", fused_fwd)]:
            try:
                t = timed(fn, [(variables, x) for x in x_pool], args.iters)
                emit({"section": "engine", "name": name,
                      "ms_per_batch": round(t * 1e3, 2),
                      "img_s": round(b / t, 1), "batch": b,
                      "img": args.img, "status": "ok",
                      "fused_starts": [blk.start for blk in eng_blocks]})
            except Exception as e:
                emit({"section": "engine", "name": name, "status": "error",
                      "error": repr(e)[:500]})


def _node_heights(spec, img):
    """Per-node output spatial height at input size `img` (the block
    input height = the height of the node feeding the block's 1x1s,
    which equals the 1x1s' own output height: every fused op is
    stride 1)."""
    spec = spec.resolve()
    hs = []
    for i, node in enumerate(spec.nodes):
        srcs = [node.f] if isinstance(node.f, int) else list(node.f)
        s0 = i - 1 if srcs[0] == -1 else srcs[0]
        h = img if i == 0 else hs[s0]
        if node.op == "ReOrg":
            h //= 2
        elif node.op in ("Conv", "DWConv") and len(node.args) > 2:
            h //= int(node.args[2])
        elif node.op == "MP":
            h //= int(node.args[0]) if node.args else 2
        elif node.op == "Upsample":
            h *= 2
        hs.append(h)
    return hs


if __name__ == "__main__":
    main()
