"""Pallas TPU kernel: one fused E-ELAN block, strip-resident in VMEM.

The YOLOv7 E-ELAN group (reference cfg/yolov7-w6.yaml rows 15-24 and the
head groups; each row a `Conv` = conv+BN+act, models/common.py:85-105) is

    a  = act(1x1(x))                 # cv "route" branch
    b  = act(1x1(x))                 # chain input
    y1 = act(3x3(b)), ... yn = act(3x3(y_{n-1}))
    out = act(1x1(concat(members)))  # members ⊆ {a, b, y1..yn}

Executed conv-by-conv, XLA writes every intermediate to HBM and reads it
back (PERF.md: ELAN groups carry ~65% of w6's activation traffic, and
the concat lever is already taken by XLA — tools/byte_census.py).  This
kernel computes the WHOLE group per (batch, row-strip) grid cell: the
input strip is DMA'd from HBM once with a 2*n_chain-pixel halo, every
intermediate lives only in VMEM, and only the transition conv's output
is written back.  HBM traffic for the group drops from ~10 tensors to
read-x + write-out.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * 3x3 convs are 9 shifted (R*C, K) @ (K, N) MXU matmuls accumulated in
    f32 — K = N = chain width, full MXU tiles for widths >= 128.
  * SAME zero-padding of every *intermediate* conv is reproduced by
    masking each intermediate to zero outside the true image domain
    (halo positions beyond the border would otherwise hold act(bias)).
  * Strips overlap by the halo, which plain BlockSpec index maps cannot
    express, so the input stays in HBM (`pl.ANY`) and each cell issues
    its own `make_async_copy`, double-buffered: strip si+1 prefetches
    into the other scratch slot while si computes.  With
    `host_pad=False` the copies clamp at the image borders and the
    SAME-pad ring comes from masks (+ scratch zeroing for the absorbed
    pre conv, whose 3x3 mixes positions before any mask).
  * BN is consumed in folded scale/bias form (models/fuse.py semantics):
    callers pass per-conv (kernel*, bias) with the BN scale already
    multiplied into the kernel.  The kernel applies act(dot + bias).
  * No `dynamic_update_slice`, no lane-dim offsets, no bool carries —
    the Mosaic limits recorded in CLAUDE.md.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Feasibility budgets check strip_footprint's ESTIMATE
# (ElanShape.vmem_budget_mb, default 12 MB).  Mosaic's real scoped-
# stack allocation runs ~4x the estimate (elan@12@80 th=16: est
# 5.9 MB, compiler reported 22.05 MB, 2026-08-17), so 12 MB estimated
# ~= 48 MB real — which is why fused_elan raises the kernel's scoped-
# vmem limit (default 16 MB) to VMEM_LIMIT; v5e has 128 MB per core.
VMEM_LIMIT = 96 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class ElanShape:
    """Static geometry of one fused ELAN group."""
    cin: int              # input channels
    ccv: int              # width of the two 1x1 branches (a, b)
    cch: int              # width of the 3x3 chain convs
    cout: int             # transition conv output channels
    n_chain: int          # number of 3x3 convs in the chain
    members: Tuple[str, ...]  # concat order; entries in {a, b, y1..yn}
    act: str = "silu"     # activation of every conv in the group
    # optional absorbed 3x3 conv feeding the group (the backbone
    # downsample): pre_cin > 0 enables it; its output channels == cin
    pre_cin: int = 0
    pre_stride: int = 1
    # chain convs as 3 per-dy (M, 3*cch) @ (3*cch, cch) matmuls instead
    # of 9 accumulated K=cch taps: feeds the MXU a wider contraction
    # when the chain is narrow (cch < 128) at the cost of a 3x wider
    # temp (dx-only concat — dy-mixed concats fail Mosaic layout)
    im2col: bool = False
    # collapse each matmul's (rows, cols) strip dims into one M dim:
    # a 3-D dot_general keeps the leading dim untiled and lowers as a
    # serial per-row loop of M=cols matmuls; a (rows*cols, K) 2-D dot
    # feeds the MXU one deep M.  Cols are sublane-padded to 16 first so
    # the collapse is tile-exact (dead columns sliced off after).
    flat_mm: bool = False
    # full 9-way im2col (flat_mm only): every chain tap flattens to
    # (M, cch) and lane-concatenates into one (M, 9*cch) operand, so
    # each 3x3 conv is a single K=9*cch matmul.  2-D lane concat is
    # layout-legal where the 3-D dx-mixed concat was not.
    im2col9: bool = False
    # run the a and b 1x1 branches as one (cin, 2*ccv) matmul over the
    # ext strip: N doubles to fill the 128-lane MXU when ccv = 64, at
    # the cost of computing "a" on the halo ring it doesn't need.
    pack_ab: bool = False
    # transition as ONE matmul over the lane-concatenated members
    # (flat_mm only) instead of a sum of per-member dots: removes
    # members-1 full-size f32 accumulator adds and widens K to
    # concat_width.
    concat_trans: bool = False
    # host_pad=True: the caller jnp.pads the input with the halo ring
    # before the pallas_call (one full extra HBM copy of x per
    # invocation).  host_pad=False DMAs straight from the unpadded
    # input with row-clamped copies at the image borders; the ring
    # comes from the in-kernel masks (1x1-branch outputs) plus
    # explicit scratch zeroing where a 3x3 mixes positions (pre conv).
    host_pad: bool = True
    # images per grid cell (flat_mm only): the G strips flatten into
    # one G*rows*cols16 M dim, so small-spatial blocks stop being
    # M-starved (w6's 40 px groups run M=672 matmuls at group=1) and
    # each cell's DMA covers G images.  VMEM scales by G.
    group: int = 1
    # per-shape VMEM budget (MB, against strip_footprint's ESTIMATE)
    # driving choose_strip_height.  The default matches the historical
    # global; measured on elan@3@160, th=32 (needs ~2x the default
    # budget) beat th=16 by 14% — variant part "bN" raises it for
    # kernels whose codegen is known to compile at bigger strips.
    vmem_budget_mb: int = 12
    # perf-ablation knob (tools/bench_elan --kernels ...+nomask): skip
    # the SAME-pad ring zeroing.  NUMERICALLY WRONG near borders — only
    # for isolating the masks' VPU cost on-chip, never for serving.
    debug_skip_mask: bool = False

    @property
    def has_pre(self) -> bool:
        return self.pre_cin > 0

    @property
    def halo(self) -> int:
        return self.n_chain

    def member_width(self, m: str) -> int:
        return self.ccv if m in ("a", "b") else self.cch

    @property
    def concat_width(self) -> int:
        return sum(self.member_width(m) for m in self.members)


def _act_fn(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "leaky":
        return lambda v: jax.nn.leaky_relu(v, negative_slope=0.1)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"fused ELAN: unsupported activation {name!r}")


def strip_footprint(shape: ElanShape, th: int, w: int, itemsize: int) -> int:
    """Approximate VMEM bytes for one grid cell at strip height `th`."""
    p = shape.halo
    a = th + 2 * p
    bw = w + 2 * p + (-(w + 2 * p) % 16)   # 16-aligned ext width
    total = 2 * a * bw * shape.cin * itemsize            # x strip (+copy slack)
    if shape.has_pre:
        s = shape.pre_stride
        la = s * (a - 1) + 3
        lb = s * (bw - 1) + 3
        lb += -lb % 16
        total += 2 * la * lb * shape.pre_cin * itemsize  # pre strip
        total += 9 * shape.pre_cin * shape.cin * itemsize
    total += a * bw * shape.ccv * itemsize               # b branch (ext)
    for k in range(1, shape.n_chain + 1):
        total += (a - 2 * k) * (bw - 2 * k) * shape.cch * itemsize
    if shape.im2col:  # widest (M, 3*c) per-dy temp of the chain
        total += (a - 2) * (bw - 2) * 3 * max(shape.ccv, shape.cch) \
            * itemsize
    if shape.im2col9:  # (M, 9*c) concat operand of the chain
        total += (a - 2) * bw * 9 * max(shape.ccv, shape.cch) * itemsize
    total += th * w * shape.ccv * itemsize               # a branch (center)
    total += th * w * shape.cout * 4                     # f32 accumulator
    total *= shape.group                # per-image activations scale
    # weights resident in VMEM (shared across the image group)
    total += (2 * shape.cin * shape.ccv
              + 9 * shape.ccv * shape.cch
              + 9 * (shape.n_chain - 1) * shape.cch * shape.cch
              + shape.concat_width * shape.cout) * itemsize
    return total


def choose_strip_height(shape: ElanShape, h: int, w: int,
                        itemsize: int) -> int:
    """Largest divisor of `h` whose working set fits the shape's VMEM
    budget (vmem_budget_mb, default == the historical global).
    Returns 0 if none fits (caller should leave the block unfused)."""
    budget = shape.vmem_budget_mb * 1024 * 1024
    for th in sorted({d for d in range(1, h + 1) if h % d == 0
                      and d in (h, 80, 64, 48, 40, 32, 20, 16, 10, 8, 5, 4)},
                     reverse=True):
        if strip_footprint(shape, th, w, itemsize) <= budget:
            return th
    return 0


def _elan_kernel(*refs, shape: ElanShape, h: int, w: int, th: int,
                 wpad: int = 0):
    ns = shape
    p = ns.halo
    npre = 2 if ns.has_pre else 0
    n_in = 5 + npre + 2 * ns.n_chain + 2
    x_hbm = refs[0]
    if ns.has_pre:
        wp, bp = refs[1], refs[2]
    wa, ba, wb, bb = refs[1 + npre:5 + npre]
    chain = [(refs[5 + npre + 2 * k], refs[6 + npre + 2 * k])
             for k in range(ns.n_chain)]
    wt, bt = refs[5 + npre + 2 * ns.n_chain], refs[6 + npre + 2 * ns.n_chain]
    out_ref = refs[n_in]
    xs_ref, sem = refs[n_in + 1], refs[n_in + 2]

    bi = pl.program_id(0)
    si = pl.program_id(1)
    act = _act_fn(ns.act)
    # b_ext carries extra right-pad columns so the DMA'd scratch strip's
    # sublane dim is 16-aligned (unaligned widths crash the Mosaic
    # compile — every measured 2026-08-17 HTTP-500 block had
    # (w + 2p) % 16 != 0, every compiling one had 0).  The domain mask
    # zeroes the extra columns; center slices never read them.
    a_ext, b_ext = th + 2 * p, w + 2 * p + wpad

    def flat2d(arr):
        # (..., rows, cols, k) -> (prod(lead)*rows*cols16, k) with cols
        # sublane-padded to 16 so the collapse is tile-exact; leading
        # dims (the image group) fold into M for free
        *lead, aq, bq, kk = arr.shape
        bq16 = bq + (-bq % 16)
        if bq16 != bq:
            pads = [(0, 0)] * len(lead) + [(0, 0), (0, bq16 - bq), (0, 0)]
            arr = jnp.pad(arr, pads)
        m = aq * bq16
        for d in lead:
            m *= d
        return arr.reshape(m, kk), (tuple(lead), aq, bq, bq16)

    def unflat(y2, geom):
        lead, aq, bq, bq16 = geom
        y = y2.reshape(*lead, aq, bq16, y2.shape[-1])
        return y[..., :bq, :] if bq16 != bq else y

    def dot2d(a2, wmat):
        return jax.lax.dot_general(
            a2, wmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mm(arr, wref_or_w):
        wmat = wref_or_w[...] if hasattr(wref_or_w, "at") else wref_or_w
        if ns.flat_mm:
            a2, geom = flat2d(arr)
            return unflat(dot2d(a2, wmat), geom)
        return jax.lax.dot_general(
            arr, wmat,
            dimension_numbers=(((arr.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def bias_act(acc, bref):
        n = acc.shape[-1]
        return act(acc + bref[...].reshape(1, 1, n))

    def mask_zero(arr, q):
        # arr[..., r, c, :] holds image row si*th + r - q, col c - q;
        # zero the out-of-domain ring so downstream taps see SAME-pad
        # zeros.  The (rows, cols, 1) mask broadcasts over any leading
        # image-group dim.
        if ns.debug_skip_mask:
            return arr
        aq, bq = arr.shape[-3], arr.shape[-2]
        rid = jax.lax.broadcasted_iota(jnp.int32, (aq, bq, 1), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (aq, bq, 1), 1)
        grow = rid + (si * th - q)
        ok = (grow >= 0) & (grow < h) & (cid >= q) & (cid < q + w)
        return jnp.where(ok, arr, jnp.zeros_like(arr))

    # Double-buffered input DMA: strip si+1 prefetches while si
    # computes, hiding the copy behind the matmuls.  Prefetch stays
    # within one batch image (si is the sequential grid dim; bi is
    # parallel, so a cross-bi prefetch could land in another core's
    # scratch on megacore parts) — each image pays one cold DMA.
    nstrips = pl.num_programs(1)
    s = ns.pre_stride if ns.has_pre else 1
    la = s * (a_ext - 1) + 3 if ns.has_pre else a_ext
    # src-row pad ahead of true row 0 in the padded coordinate frame
    # (host_pad: the rows physically exist; else they are clamped away)
    q0 = s * p + 1 if ns.has_pre else p

    G = ns.group

    def src_at(rows):
        # group=1 keeps the exact descriptor ranks that compiled on
        # chip before the group refactor; G>1 adds the leading dim
        if G == 1:
            return x_hbm.at[bi, rows]
        return x_hbm.at[pl.ds(bi * G, G), rows]

    def dst_at(slot, *idx):
        if G == 1:
            return xs_ref.at[(slot, 0) + idx]
        return xs_ref.at[(slot, slice(None)) + idx]

    if ns.host_pad:
        def strip_ops(s2, slot):
            return [(None, pltpu.make_async_copy(
                src_at(pl.ds(s * s2 * th, la)),
                dst_at(slot), sem.at[slot]))]
    else:
        # clamped copies straight from the unpadded input: strip s2
        # wants true rows [s*s2*th - q0, +la) — the first/last strip
        # clamp to the image and leave the ring rows to the zeroing
        # below.  Every case has a STATIC length so the descriptors
        # lower; conditions pick exactly one per (s2, nstrips).
        hs = x_hbm.shape[1]          # s*h (pre) or h
        ws_img = x_hbm.shape[2]      # s*w (pre) or w

        last0 = s * (nstrips - 1) * th - q0   # static src row of last strip

        def strip_ops(s2, slot):
            def cp(src0, dst0, n):
                return pltpu.make_async_copy(
                    src_at(pl.ds(src0, n)),
                    dst_at(slot, pl.ds(dst0, n), pl.ds(q0, ws_img)),
                    sem.at[slot])
            if nstrips == 1:
                return [(None, cp(0, q0, hs))]
            ops = [(s2 == 0, cp(0, q0, la - q0)),
                   (s2 == nstrips - 1, cp(last0, 0, hs - last0))]
            if nstrips > 2:  # a mid descriptor only exists (and only
                #              fits the operand) when middle strips do
                ops.append(((s2 > 0) & (s2 < nstrips - 1),
                            cp(s * s2 * th - q0, 0, la)))
            return ops

    def strip_start(s2, slot):
        for cond, c in strip_ops(s2, slot):
            if cond is None:
                c.start()
            else:
                pl.when(cond)(lambda c=c: c.start())

    def strip_wait(s2, slot):
        for cond, c in strip_ops(s2, slot):
            if cond is None:
                c.wait()
            else:
                pl.when(cond)(lambda c=c: c.wait())

    @pl.when(si == 0)
    def _():
        strip_start(si, si % 2)

    @pl.when(si + 1 < nstrips)
    def _():
        strip_start(si + 1, (si + 1) % 2)

    strip_wait(si, si % 2)

    if not ns.host_pad and ns.has_pre:
        # the pre 3x3 mixes positions BEFORE any mask, so its input
        # ring must be true zeros: clear the col bands every strip and
        # the top/bottom row bands on the border strips.  (Without a
        # pre conv the 1x1 outputs are ring-masked after, so garbage
        # halo inputs never escape and no zeroing is needed.)
        slot = si % 2
        n_scr = xs_ref.shape[2]
        wid = xs_ref.shape[3]

        def zstore(rows, cols, shape3):
            z3 = jnp.zeros(shape3, xs_ref.dtype)
            if G == 1:
                xs_ref[slot, 0, rows, cols] = z3
            else:
                xs_ref[slot, :, rows, cols] = \
                    jnp.broadcast_to(z3, (G,) + shape3)

        # the DMA never writes the col bands, so each slot's bands stay
        # zero after its first use: one pass per slot (si < 2) suffices
        wr = wid - (q0 + ws_img)

        @pl.when(si < 2)
        def _():
            zstore(slice(None), slice(0, q0),
                   (n_scr, q0, ns.pre_cin))
            if wr > 0:
                zstore(slice(None), slice(q0 + ws_img, wid),
                       (n_scr, wr, ns.pre_cin))

        @pl.when(si == 0)
        def _():
            zstore(slice(0, q0), slice(None), (q0, wid, ns.pre_cin))

        # rows the last strip's clamped copy leaves stale (static)
        last_written = (q0 + hs) if nstrips == 1 else \
            hs - (s * (nstrips - 1) * th - q0)
        nb = n_scr - last_written
        if nb > 0:
            @pl.when(si == nstrips - 1)
            def _():
                zstore(slice(last_written, n_scr), slice(None),
                       (nb, wid, ns.pre_cin))

    # group=1 squeezes the G dim so every traced vector keeps the rank
    # that already compiled on chip; G>1 carries it (flat2d folds it
    # into M, masks/biases broadcast from the right)
    xg = xs_ref[si % 2, 0] if G == 1 else xs_ref[si % 2]

    if ns.has_pre:
        # the absorbed 3x3 (stride s) runs on the fetched pre strip to
        # materialize the group input only in VMEM
        xp = xg
        dt = xp.dtype
        w3 = wp[...]
        if ns.im2col9 and ns.flat_mm:
            flats = []
            for dy in range(3):
                for dx in range(3):
                    tap = xp[..., dy:dy + s * (a_ext - 1) + 1:s,
                             dx:dx + s * (b_ext - 1) + 1:s, :]
                    f2, geom = flat2d(tap)
                    flats.append(f2)
            w9 = w3.reshape(9 * w3.shape[2], w3.shape[3])
            acc = unflat(dot2d(jnp.concatenate(flats, axis=1), w9), geom)
        else:
            acc = None
            for dy in range(3):
                for dx in range(3):
                    tap = xp[..., dy:dy + s * (a_ext - 1) + 1:s,
                             dx:dx + s * (b_ext - 1) + 1:s, :]
                    t = mm(tap, w3[dy, dx])
                    acc = t if acc is None else acc + t
        x = mask_zero(act(acc + bp[...].reshape(1, 1, ns.cin)),
                      p).astype(dt)
    else:
        # halo'd strip: rows [si*th, si*th + th + 2p) of the padded input
        x = xg
        dt = x.dtype

    # chain input branch "b": 1x1 over the full ext strip
    ya_packed = None
    if ns.pack_ab and "a" in ns.members:
        # both 1x1 branches in one N=2*ccv matmul; "a" only needs the
        # center slice, so its halo-ring compute is the packing price
        wab = jnp.concatenate([wb[...], wa[...]], axis=1)
        bab = jnp.concatenate([bb[...], ba[...]], axis=1)
        yab = bias_act(mm(x, wab), bab)
        yb = mask_zero(yab[..., :ns.ccv], p).astype(dt)
        ya_packed = yab[..., p:p + th, p:p + w, ns.ccv:].astype(dt)
    else:
        yb = mask_zero(bias_act(mm(x, wb), bb), p).astype(dt)

    # the 3x3 chain, shrinking the halo by 1 per conv
    ys = []
    cur, q = yb, p
    for k in range(ns.n_chain):
        wk, bk = chain[k]
        w3 = wk[...]  # (3, 3, c_in_k, cch)
        aq, bq = cur.shape[-3] - 2, cur.shape[-2] - 2
        if ns.im2col9 and ns.flat_mm:
            # all 9 taps flattened to 2-D then lane-concatenated: one
            # (M, 9*c) @ (9*c, cch) matmul per chain conv.  Legal only
            # in flat space — 2-D operands share the {0,0} layout
            # offset the 3-D dx-mixed concat lacked.
            flats = []
            for dy in range(3):
                for dx in range(3):
                    f2, geom = flat2d(
                        cur[..., dy:dy + aq, dx:dx + bq, :])
                    flats.append(f2)
            cols = jnp.concatenate(flats, axis=1)
            w9 = w3.reshape(9 * w3.shape[2], w3.shape[3])
            acc = unflat(dot2d(cols, w9), geom)
        elif ns.im2col:
            # concat only over dy: Mosaic tiles the (row, col, chan)
            # vector as (sublane=col, lane=chan), so dy-slices (row
            # offsets) share their sublane offset and the lane-dim
            # concat lowers; dx-slices differ in sublane offset and a
            # dx (or 9-way) concat is rejected ("result/input offset
            # mismatch on non-concat dimension", measured 2026-08-17).
            # K still widens 3x (3*cch) — the MXU win for narrow chains.
            acc = None
            for dx in range(3):
                cols = jnp.concatenate(
                    [cur[..., dy:dy + aq, dx:dx + bq, :]
                     for dy in range(3)], axis=-1)
                t = mm(cols,
                       w3[:, dx].reshape(3 * w3.shape[2], w3.shape[3]))
                acc = t if acc is None else acc + t
        else:
            acc = None
            for dy in range(3):
                for dx in range(3):
                    t = mm(cur[..., dy:dy + aq, dx:dx + bq, :],
                           w3[dy, dx])
                    acc = t if acc is None else acc + t
        q -= 1
        cur = mask_zero(bias_act(acc, bk), q).astype(dt)
        ys.append((cur, q))

    members: Dict[str, jnp.ndarray] = {
        "b": yb[..., p:p + th, p:p + w, :],
    }
    for k, (y, q) in enumerate(ys):
        members[f"y{k + 1}"] = y[..., q:q + th, q:q + w, :]
    if ya_packed is not None:
        members["a"] = ya_packed
    elif "a" in ns.members:
        xa = x[..., p:p + th, p:p + w, :]
        members["a"] = bias_act(mm(xa, wa), ba).astype(dt)

    wt_all = wt[...]
    if ns.concat_trans and ns.flat_mm:
        # one K=concat_width matmul over the lane-concatenated members:
        # concat is legal between 2-D flattened operands, and the MXU
        # accumulates internally instead of members-1 f32 VMEM adds
        flats = []
        for m in ns.members:
            f2, geom = flat2d(members[m])
            flats.append(f2)
        acc = unflat(dot2d(jnp.concatenate(flats, axis=1), wt_all), geom)
    else:
        # transition 1x1 as a sum of per-member matmuls (the concat
        # never materializes; f32 partials stay in VMEM)
        acc = None
        off = 0
        for m in ns.members:
            cm = ns.member_width(m)
            t = mm(members[m], wt_all[off:off + cm, :])
            acc = t if acc is None else acc + t
            off += cm
    out = bias_act(acc, bt).astype(out_ref.dtype)
    out_ref[...] = out.reshape(out_ref.shape)


def fused_elan(x: jnp.ndarray, weights: Sequence[jnp.ndarray],
               shape: ElanShape, *, th: int = 0,
               interpret=None) -> jnp.ndarray:
    """Run one fused ELAN group.

    x: (B, H, W, cin) — or, when shape.has_pre, the absorbed 3x3 conv's
    own input (B, s*H, s*W, pre_cin) (SAME pad 1, stride s).  weights:
    flat sequence
    [wp (3,3,pre_cin,cin), bp (1,cin) f32,]   (only when has_pre)
    [wa (cin,ccv), ba (1,ccv) f32, wb, bb, w1 (3,3,ccv,cch), b1, ...,
    wn, bn, wt (concat_width,cout), bt (1,cout) f32], kernels in x.dtype
    with BN scale pre-folded (see models/fused.pack_elan_weights).
    Returns (B, H, W, cout) in x.dtype.
    """
    if (shape.im2col9 or shape.concat_trans or shape.group > 1) \
            and not shape.flat_mm:
        # im2col9 / concat_trans / image grouping are defined in flat
        # (2-D) space only; normalize rather than silently running the
        # taps path
        shape = dataclasses.replace(shape, flat_mm=True)
    bsz = x.shape[0]
    assert bsz % shape.group == 0, (bsz, shape.group)
    if shape.has_pre:
        s = shape.pre_stride
        assert x.shape[3] == shape.pre_cin, (x.shape, shape.pre_cin)
        assert x.shape[1] % s == 0 and x.shape[2] % s == 0
        h, w = x.shape[1] // s, x.shape[2] // s
    else:
        h, w = x.shape[1], x.shape[2]
        assert x.shape[3] == shape.cin, (x.shape, shape.cin)
    if interpret is None:
        # Mosaic only exists on TPU; everywhere else run interpreted
        interpret = jax.default_backend() in ("cpu",)
    p = shape.halo
    if th <= 0:
        th = choose_strip_height(shape, h, w, x.dtype.itemsize)
    assert th > 0 and h % th == 0, (h, th)

    # Mosaic rejects DMA strips whose sublane (second-minor) dim is not
    # 16-aligned; extend the group's ext width with dead right-pad
    # columns (masked to zero in-kernel) so every scratch is aligned.
    wpad = -(w + 2 * p) % 16
    b_ext = w + 2 * p + wpad
    if not shape.host_pad:
        # the kernel's clamped border copies need at least one full
        # halo inside every interior strip
        assert th >= p + (1 if shape.has_pre else 0), (th, p)
    if shape.has_pre:
        # pad so that padded row s*g + dy (dy in 0..2) is the absorbed
        # conv's tap row s*g + dy - 1 of the true input, with the group
        # halo's p extra rows in front: pad = s*p + 1 each side
        s = shape.pre_stride
        q = s * p + 1
        w_pre = s * (b_ext - 1) + 3
        w_pre += -w_pre % 16
        xp = x if not shape.host_pad else jnp.pad(
            x, ((0, 0), (q, q), (q, w_pre - q - s * w), (0, 0)))
        scratch_x = pltpu.VMEM(
            (2, shape.group, s * (th + 2 * p - 1) + 3, w_pre,
             shape.pre_cin), x.dtype)
    else:
        xp = x if not shape.host_pad else jnp.pad(
            x, ((0, 0), (p, p), (p, p + wpad), (0, 0)))
        scratch_x = pltpu.VMEM(
            (2, shape.group, th + 2 * p, b_ext, shape.cin), x.dtype)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights)
    kern = functools.partial(_elan_kernel, shape=shape, h=h, w=w, th=th,
                             wpad=wpad)
    return pl.pallas_call(
        kern,
        grid=(bsz // shape.group, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((shape.group, th, w, shape.cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, shape.cout), x.dtype),
        scratch_shapes=[
            scratch_x,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # batch cells are independent; strips stay sequential so a
        # future cross-strip carry keeps its ordering guarantee.  The
        # scoped-vmem limit must be raised explicitly: Mosaic's default
        # is 16 MB and the compiler's stack accounting rejects strips
        # the footprint model says fit (see VMEM_LIMIT note above).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xp, *weights)


def reference_elan(x: jnp.ndarray, weights: Sequence[jnp.ndarray],
                   shape: ElanShape) -> jnp.ndarray:
    """Plain-XLA execution of the same folded group (conv-by-conv), used
    as the numeric oracle and the A/B baseline for the kernel."""
    act = _act_fn(shape.act)

    def conv1(v, wmat, bias):
        y = jax.lax.dot_general(
            v, wmat, dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return act(y + bias.reshape(1, 1, 1, -1)).astype(v.dtype)

    def conv3(v, w3, bias, stride=1):
        y = jax.lax.conv_general_dilated(
            v, w3, window_strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return act(y + bias.reshape(1, 1, 1, -1)).astype(v.dtype)

    if shape.has_pre:
        x = conv3(x, weights[0], weights[1], stride=shape.pre_stride)
        weights = weights[2:]
    wa, ba, wb, bb = weights[:4]
    outs = {"a": conv1(x, wa, ba), "b": conv1(x, wb, bb)}
    cur = outs["b"]
    for k in range(shape.n_chain):
        w3, bk = weights[4 + 2 * k], weights[5 + 2 * k]
        cur = conv3(cur, w3, bk)
        outs[f"y{k + 1}"] = cur
    wt, bt = weights[4 + 2 * shape.n_chain], weights[5 + 2 * shape.n_chain]
    cat = jnp.concatenate([outs[m] for m in shape.members], axis=-1)
    return conv1(cat, wt, bt)
