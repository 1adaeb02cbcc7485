#!/usr/bin/env python
"""The decisive int8 byte-reduction experiment (round-4 VERDICT #1).

The w6 forward is HBM-bound (65 GB/batch bf16 vs an 11.1 TF MXU load,
PERF.md roofline).  tools/probe_int8.py measured a single COMPUTE-bound
conv and could not answer whether W8A8 halves the network's HBM
traffic.  This probe measures the real thing, end to end, on chip:

  (a) XLA cost_analysis bytes-accessed of the compiled W8A8 w6 forward
      vs the bf16 baseline -- does the lowering keep int8 in HBM?
  (b) wall-clock ms/batch at b128@640 for both, same process, same day.
  (c) an s8-buffer census of both HLO texts as lowering evidence.

Writes one JSON line per stage to stderr and the final table to
tools/QUANT_AB.json.  Run on the axon chip (default platform); expect
multi-minute remote compiles.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PEAK_TF_BF16 = 197e12
PEAK_BW = 819e9
OUT = pathlib.Path(__file__).parent / "QUANT_AB.json"


def log(obj):
    print(json.dumps(obj), file=sys.stderr, flush=True)


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def s8_census(compiled):
    """Count distinct s8/bf16/f32/s32 buffer mentions in the HLO."""
    txt = compiled.as_text()
    out = {}
    for dt in ("s8", "bf16", "f32", "s32"):
        out[dt] = len(re.findall(rf"\b{dt}\[", txt))
    # fusion roots writing s8 back to HBM is the load-bearing signal
    out["s8_fusion_roots"] = len(
        re.findall(r"s8\[[0-9,]*\][^\n]*fusion", txt))
    return out


def measure(fn, pool, iters=12):
    # discard the first point of a fresh process (cold clocks,
    # CLAUDE.md round-4 facts), then time with distinct device inputs
    float(fn(*pool[0]))
    float(fn(*pool[1 % len(pool)]))
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(*pool[i % len(pool)])
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models import quant, zoo
    from face_detection_multi_scale_tpu.models.model import init_model

    batch, size = 128, 640
    spec = zoo.get_spec("yolov7-w6-face")
    model, variables = init_model(spec, img_size=64, dtype=jnp.bfloat16)
    qparams = quant.quantize(
        spec, variables, quant.calibrate_shape_only(spec, variables))
    log({"stage": "init", "batch": batch, "size": size})

    def fwd_bf16(v, x):
        raws = model.apply(v, x.astype(jnp.bfloat16) / 255.0, train=False)
        return sum(r.astype(jnp.float32).sum() for r in raws)

    def fwd_int8(q, x):
        raws = quant.quant_apply(spec, q, x, dtype=jnp.bfloat16)
        return sum(r.astype(jnp.float32).sum() for r in raws)

    x_sds = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8)
    results = {"batch": batch, "size": size}

    rng = np.random.default_rng(0)
    pool_imgs = [jax.device_put(rng.integers(
        0, 255, (batch, size, size, 3), dtype=np.uint8)) for _ in range(3)]

    for name, fn, weights in (("bf16", fwd_bf16, variables),
                              ("int8", fwd_int8, qparams)):
        t0 = time.perf_counter()
        try:
            compiled = jax.jit(fn).lower(
                jax.eval_shape(lambda: weights), x_sds).compile()
        except Exception as e:  # noqa: BLE001 — record lowering failure
            results[name] = {"error": str(e)[-2000:]}
            log({"stage": name, "error": str(e)[-500:]})
            continue
        compile_s = time.perf_counter() - t0
        flops, bytes_acc = cost(compiled)
        census = s8_census(compiled)
        row = {
            "compile_s": round(compile_s, 1),
            "gflops": round(flops / 1e9, 1),
            "gbytes": round(bytes_acc / 1e9, 2),
            "t_hbm_ms": round(1000 * bytes_acc / PEAK_BW, 1),
            "hlo_census": census,
        }
        log({"stage": f"{name}-compiled", **row})
        w_dev = jax.device_put(weights)
        pool = [(w_dev, img) for img in pool_imgs]
        dt = measure(lambda w, x, f=compiled: f(w, x), pool)
        row["ms_per_batch"] = round(1000 * dt, 1)
        row["img_per_s"] = round(batch / dt, 1)
        results[name] = row
        log({"stage": f"{name}-measured", "ms": row["ms_per_batch"],
             "img_per_s": row["img_per_s"]})
        del w_dev, pool

    if "ms_per_batch" in results.get("int8", {}) and \
            "ms_per_batch" in results.get("bf16", {}):
        results["speedup"] = round(
            results["bf16"]["ms_per_batch"] /
            results["int8"]["ms_per_batch"], 3)
        results["byte_ratio"] = round(
            results["int8"]["gbytes"] / results["bf16"]["gbytes"], 3)
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
