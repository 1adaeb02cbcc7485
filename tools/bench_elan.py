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
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.fused import (
        find_elan_blocks, fused_apply, pack_elan_weights)
    from face_detection_multi_scale_tpu.models.model import (
        YoloFace, init_model)
    from face_detection_multi_scale_tpu.ops.pallas_elan import (
        choose_strip_height, fused_elan, reference_elan)

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        OUT_PATH.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

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
    blocks = find_elan_blocks(spec)
    _, variables = init_model(spec, jax.random.PRNGKey(0), img_size=64,
                              dtype=dt)
    # spatial size of each block's input at --img (static propagation)
    heights = _node_heights(spec, args.img)
    shapes_at = {blk.start: heights[blk.start] for blk in blocks}

    if not args.skip_blocks:
        for blk in blocks:
            h = w = int(shapes_at[blk.start])
            th = choose_strip_height(blk.shape, h, w, 2)
            name = f"elan@{blk.start}@{h}"
            if th == 0:
                emit({"section": "block", "name": name, "status": "no-th"})
                continue
            ws = pack_elan_weights(variables, blk, dt)
            pool = [
                (ws, jnp.asarray(
                    rng.randn(b, h, w, blk.shape.cin) * 0.5, dt))
                for _ in range(3)]
            fused = jax.jit(lambda ws_, x_, s=blk.shape, t=th: jnp.sum(
                fused_elan(x_, ws_, s, th=t,
                           interpret=args.cpu).astype(jnp.float32)))
            ref = jax.jit(lambda ws_, x_, s=blk.shape: jnp.sum(
                reference_elan(x_, ws_, s).astype(jnp.float32)))
            try:
                # numeric check on one (small) input first
                xs = pool[0][1][:2]
                d = float(jnp.max(jnp.abs(
                    fused_elan(xs, ws, blk.shape, th=th,
                               interpret=args.cpu).astype(jnp.float32)
                    - reference_elan(xs, ws, blk.shape).astype(jnp.float32))))
                t_ref = timed(ref, pool, args.iters)
                t_fused = timed(fused, pool, args.iters)
                emit({"section": "block", "name": name, "th": th,
                      "h": h, "cin": blk.shape.cin, "cch": blk.shape.cch,
                      "members": len(blk.shape.members),
                      "xla_ms": round(t_ref * 1e3, 3),
                      "fused_ms": round(t_fused * 1e3, 3),
                      "speedup": round(t_ref / t_fused, 3),
                      "max_abs_diff": d, "status": "ok"})
            except Exception as e:  # lowering/compile failures per shape
                emit({"section": "block", "name": name, "status": "error",
                      "error": repr(e)[:500]})

    if not args.skip_engine:
        model = YoloFace(spec=spec, dtype=dt)
        x_pool = [jnp.asarray(rng.rand(b, args.img, args.img, 3), dt)
                  for _ in range(3)]

        def consume(raws):
            return sum(jnp.sum(r.astype(jnp.float32)) for r in raws)

        xla_fwd = jax.jit(lambda v, x: consume(
            model.apply(v, x, train=False)))
        fused_fwd = jax.jit(lambda v, x: consume(
            fused_apply(spec, v, x, blocks=blocks, dtype=dt,
                        interpret=args.cpu)))
        for name, fn in [("xla_fwd", xla_fwd), ("fused_fwd", fused_fwd)]:
            try:
                t = timed(fn, [(variables, x) for x in x_pool], args.iters)
                emit({"section": "engine", "name": name,
                      "ms_per_batch": round(t * 1e3, 2),
                      "img_s": round(b / t, 1), "batch": b,
                      "img": args.img, "status": "ok"})
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
