"""Analytic per-node HBM byte census for a model spec.

Answers "where do the forward's HBM bytes actually go?" without the
chip: walks the resolved node graph, propagates spatial dims, and
charges each op its activation reads+writes (bf16, weights amortized
over the batch). The fusion model matches what PERF.md measured of
XLA's behavior at this fusion level: BN/act fold into their conv
(no extra traffic), concats are charged only as the transition conv's
read (XLA keeps/eliminates them), pools and upsamples pay read+write.

Usage: python tools/byte_census.py [--model yolov7-w6-face]
       [--img 640] [--batch 128] [--top 15]
"""

from __future__ import annotations

import argparse
import collections
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.spec import HEAD_OPS

BYTES = 2  # bf16


def census(spec, img: int, batch: int):
    """Return per-node rows: (idx, op, hw, cin, cout, gbytes, tag)."""
    spec = spec.resolve()
    hw = [None] * len(spec.nodes)   # (h, w) per node output
    rows = []
    for i, node in enumerate(spec.nodes):
        srcs = [node.f] if isinstance(node.f, int) else list(node.f)
        srcs = [i - 1 if s == -1 else s for s in srcs]
        h, w = (img, img) if i == 0 else hw[srcs[0]]
        op = node.op
        if op == "ReOrg":
            out_hw = (h // 2, w // 2)
        elif op in ("Conv", "DWConv"):
            s = int(node.args[2]) if len(node.args) > 2 else 1
            out_hw = (h // s, w // s)
        elif op == "MP":
            k = int(node.args[0]) if node.args else 2
            out_hw = (h // k, w // k)
        elif op == "MaxPool2d":
            k = int(node.args[0])
            s = int(node.args[1]) if len(node.args) > 1 else k
            out_hw = (h // s, w // s)
        elif op == "Upsample":
            out_hw = (h * 2, w * 2)
        else:
            out_hw = (h, w)
        hw[i] = out_hw

        # ---- byte charge -------------------------------------------------
        if i == 0:
            read = img * img * spec.in_ch
        else:
            read = sum(hw[s][0] * hw[s][1] * spec.nodes[s].c2 for s in srcs)
        write = out_hw[0] * out_hw[1] * node.c2
        if op == "Concat":
            # charged at the consumer; XLA eliminates or holds these
            read = write = 0
        if op in HEAD_OPS:
            # per-level 3x3 convs: read each level in, write na*no maps
            read = 0
            for s in srcs:
                read += hw[s][0] * hw[s][1] * spec.nodes[s].c2
            write = sum(hw[s][0] * hw[s][1] for s in srcs) * spec.na * spec.no
        gb = (read + write) * BYTES * batch / 1e9
        rows.append((i, op, out_hw, node.c1, node.c2, gb))
    return rows


def tag_elan_blocks(spec, rows):
    """Group nodes into ELAN blocks: the span from the pair of sibling
    1x1 convs through their Concat's transition conv."""
    spec = spec.resolve()
    groups = {}
    for i, node in enumerate(spec.nodes):
        if node.op != "Concat" or not isinstance(node.f, tuple):
            continue
        if len(node.f) < 4:
            continue
        members = set()
        for s in node.f:
            members.add(s)
        lo = min(members)
        members.add(i)
        if i + 1 < len(spec.nodes) and spec.nodes[i + 1].op == "Conv":
            members.add(i + 1)
        groups[f"elan@{lo}"] = set(range(lo, max(members) + 1))
    tags = {}
    for name, idxs in groups.items():
        for i in idxs:
            tags[i] = name
    return tags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-w6-face")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    spec = zoo.get_spec(args.model)
    rows = census(spec, args.img, args.batch)
    tags = tag_elan_blocks(spec, rows)
    total = sum(r[-1] for r in rows)
    print(f"{args.model} @{args.img} b{args.batch}: "
          f"total activation traffic ~{total:.1f} GB/batch")

    by_group = collections.defaultdict(float)
    for r in rows:
        by_group[tags.get(r[0], f"{r[1]}@{r[0]}")] += r[-1]
    print("\n-- by block (GB, % of total) --")
    for name, gb in sorted(by_group.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {name:>16s}  {gb:7.2f}  {100*gb/total:5.1f}%")

    print("\n-- top single nodes --")
    for r in sorted(rows, key=lambda r: -r[-1])[:args.top]:
        i, op, ohw, c1, c2, gb = r
        print(f"  n{i:3d} {op:>10s} out{ohw[0]:4d}x{ohw[1]:<4d} "
              f"c{c1:4d}->{c2:4d}  {gb:6.2f} GB {100*gb/total:5.1f}%")

    elan_total = sum(gb for n, gb in by_group.items() if n.startswith("elan"))
    print(f"\nELAN-block share: {elan_total:.1f} GB "
          f"({100*elan_total/total:.1f}%)")


if __name__ == "__main__":
    main()
