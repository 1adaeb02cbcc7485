"""Native ONNX export: jaxpr -> ONNX graph, no onnx/tf2onnx packages.

The reference ships its models to external runtimes as ONNX
(reference models/export.py:85-132, torch.onnx.export, and the raw-head
variant cpp/export.py:62-70 for the ncnn C++ app).  This image's frozen
environment has neither the `onnx` nor the `tf2onnx` package, so the
TPU rebuild serializes ONNX itself: the inference function is traced to
a jaxpr with `jax.make_jaxpr`, each lax primitive is mapped to standard
ONNX-13 ops, and the graph is written through protobuf bindings
generated (protoc) from a transcribed subset of the public ONNX schema
(onnx.proto here — wire-compatible with upstream, so the artifact loads
in any stock ONNX toolchain).

Design notes:
  * Layout: the JAX graph is NHWC end-to-end (flax default).  ONNX Conv
    and MaxPool are NCHW-only, so each spatial op is wrapped in a
    Transpose pair and its weights are re-laid-out HWIO->OIHW at export
    time; everything between stays NHWC (elementwise ONNX ops are
    layout-agnostic).  Standard ONNX runtimes fold adjacent transposes
    during their own layout pass.
  * Model params enter the traced function as ARGUMENTS (never closed
    over) and become graph initializers named by their pytree path, so
    the exported file is inspectable weight-by-weight.
  * Ops with no data-dependent shape (iota, static pads/slices) are
    constant-folded to initializers — the graph stays static-shape,
    matching the framework's XLA discipline.
  * Call-like primitives (pjit, custom_jvp/vjp, checkpoint) are inlined
    recursively, so jax.nn activations trace through transparently.

Round-trip evidence without the onnx package: `runner.run_onnx` is an
independent numpy executor of the emitted op subset; tests compare it
against `model.apply` on every exported family
(tests/test_onnx_native.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from face_detection_multi_scale_tpu.onnx import onnx_pb2 as pb

OPSET = 13
IR_VERSION = 8

_DTYPES = {
    "float32": pb.TensorProto.FLOAT,
    "float64": pb.TensorProto.DOUBLE,
    "float16": pb.TensorProto.FLOAT16,
    "bfloat16": pb.TensorProto.BFLOAT16,
    "int8": pb.TensorProto.INT8,
    "int32": pb.TensorProto.INT32,
    "int64": pb.TensorProto.INT64,
    "uint8": pb.TensorProto.UINT8,
    "bool": pb.TensorProto.BOOL,
}

# Elementwise lax primitive -> ONNX op, 1:1 on inputs/outputs.
_ELEMENTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "neg": "Neg", "exp": "Exp",
    "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
    "sqrt": "Sqrt", "abs": "Abs", "sign": "Sign", "floor": "Floor",
    "ceil": "Ceil", "pow": "Pow", "gt": "Greater",
    "ge": "GreaterOrEqual", "lt": "Less", "le": "LessOrEqual",
    "eq": "Equal", "and": "And", "or": "Or", "not": "Not",
    "copy": "Identity",
}

# Call-like primitives whose sub-jaxpr is inlined. Maps primitive name
# to the params key holding the (Closed)Jaxpr.
_CALL_PRIMS = {
    "jit": "jaxpr",
    "pjit": "jaxpr",
    "closed_call": "call_jaxpr",
    "custom_jvp_call": "call_jaxpr",
    "custom_vjp_call": "call_jaxpr",
    "custom_vjp_call_jaxpr": "fun_jaxpr",
    "remat2": "jaxpr",
    "checkpoint": "jaxpr",
}


def _np_dtype_to_onnx(dt) -> int:
    name = np.dtype(dt).name  # jax's bfloat16 dtype reports 'bfloat16'
    if name not in _DTYPES:
        raise NotImplementedError(f"ONNX export: unsupported dtype {dt}")
    return _DTYPES[name]


def _inverse_perm(perm: Sequence[int]) -> List[int]:
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return inv


class _Builder:
    """Accumulates ONNX nodes/initializers with unique tensor names."""

    def __init__(self):
        self.nodes: List[pb.NodeProto] = []
        self.initializers: Dict[str, pb.TensorProto] = {}
        self._n = 0

    def name(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def node(self, op: str, inputs: Sequence[str], n_out: int = 1,
             name_hint: Optional[str] = None,
             outputs: Optional[Sequence[str]] = None,
             **attrs) -> List[str]:
        outs = list(outputs) if outputs is not None else \
            [self.name(name_hint or op.lower()) for _ in range(n_out)]
        n = pb.NodeProto()
        n.op_type = op
        n.name = self.name(f"node_{op}")
        n.input.extend(inputs)
        n.output.extend(outs)
        for k, v in attrs.items():
            a = n.attribute.add()
            a.name = k
            if isinstance(v, float):
                a.type = pb.AttributeProto.FLOAT
                a.f = v
            elif isinstance(v, (bool, int, np.integer)):
                a.type = pb.AttributeProto.INT
                a.i = int(v)
            elif isinstance(v, str):
                a.type = pb.AttributeProto.STRING
                a.s = v.encode()
            elif isinstance(v, (list, tuple)) and all(
                    isinstance(x, (int, np.integer)) for x in v):
                a.type = pb.AttributeProto.INTS
                a.ints.extend(int(x) for x in v)
            elif isinstance(v, (list, tuple)):
                a.type = pb.AttributeProto.FLOATS
                a.floats.extend(float(x) for x in v)
            else:
                raise NotImplementedError(f"attr {k}={v!r}")
        self.nodes.append(n)
        return outs

    def tensor(self, arr: np.ndarray, name: Optional[str] = None) -> str:
        arr = np.asarray(arr)
        name = name or self.name("const")
        t = pb.TensorProto()
        t.name = name
        t.dims.extend(arr.shape)
        t.data_type = _np_dtype_to_onnx(arr.dtype)
        t.raw_data = np.ascontiguousarray(arr).tobytes()
        self.initializers[name] = t
        return name

    def i64(self, values) -> str:
        return self.tensor(np.asarray(values, np.int64))


class _Converter:
    def __init__(self, builder: _Builder):
        self.b = builder
        self.env: Dict[Any, str] = {}  # jax Var -> onnx tensor name
        # (weight initializer name, rhs_spec) -> OIHW-transposed copy
        self._oihw_cache: Dict[Any, str] = {}

    # -- var plumbing -------------------------------------------------
    def read(self, v) -> str:
        from jax._src import core as jcore
        if isinstance(v, jcore.Literal):
            return self.b.tensor(np.asarray(v.val))
        return self.env[v]

    def write(self, v, name: str):
        self.env[v] = name

    # -- jaxpr walk ---------------------------------------------------
    def convert(self, jaxpr, consts: Sequence[np.ndarray]):
        for cv, cval in zip(jaxpr.constvars, consts):
            self.write(cv, self.b.tensor(np.asarray(cval)))
        for eqn in jaxpr.eqns:
            self.eqn(eqn)

    def _inline(self, eqn, closed):
        """Inline a call-like primitive's sub-jaxpr into this graph."""
        inner = closed.jaxpr if hasattr(closed, "jaxpr") else closed
        consts = list(getattr(closed, "consts", ()))
        sub = _Converter(self.b)
        sub.env = {}
        sub._oihw_cache = self._oihw_cache
        for cv, cval in zip(inner.constvars, consts):
            sub.write(cv, self.b.tensor(np.asarray(cval)))
        n_in = len(inner.invars)
        for iv, outer in zip(inner.invars, eqn.invars[-n_in:]):
            sub.write(iv, self.read(outer))
        for ie in inner.eqns:
            sub.eqn(ie)
        for ov, res in zip(eqn.outvars, inner.outvars):
            self.write(ov, sub.read(res))

    def eqn(self, eqn):
        prim = eqn.primitive.name
        if prim in _CALL_PRIMS:
            closed = eqn.params[_CALL_PRIMS[prim]]
            self._inline(eqn, closed)
            return
        handler = getattr(self, f"op_{prim}", None)
        if handler is not None:
            handler(eqn)
            return
        if prim in _ELEMENTWISE:
            ins = [self.read(v) for v in eqn.invars]
            out = self.b.node(_ELEMENTWISE[prim], ins)[0]
            self.write(eqn.outvars[0], out)
            return
        raise NotImplementedError(
            f"ONNX export: unhandled primitive '{prim}' "
            f"(params: {sorted(eqn.params)})")

    # -- shape / layout primitives -----------------------------------
    def op_reshape(self, eqn):
        # lax.reshape's `dimensions` is a pre-reshape PERMUTATION; an
        # ONNX Reshape alone would silently reorder data wrongly.
        if eqn.params.get("dimensions") is not None:
            raise NotImplementedError(
                "lax.reshape with dimensions (fused transpose)")
        shape = self.b.i64(eqn.params["new_sizes"])
        out = self.b.node("Reshape", [self.read(eqn.invars[0]), shape])[0]
        self.write(eqn.outvars[0], out)

    def op_squeeze(self, eqn):
        # lax.squeeze's `dimensions` only names the size-1 axes being
        # dropped (no data movement), so reshaping to the output aval
        # is exact for any value of it.
        out_shape = eqn.outvars[0].aval.shape
        shape = self.b.i64(out_shape)
        out = self.b.node("Reshape", [self.read(eqn.invars[0]), shape])[0]
        self.write(eqn.outvars[0], out)

    def op_expand_dims(self, eqn):
        self.op_squeeze(eqn)  # same treatment: reshape to the out aval

    def op_transpose(self, eqn):
        perm = list(eqn.params["permutation"])
        out = self.b.node("Transpose", [self.read(eqn.invars[0])],
                          perm=perm)[0]
        self.write(eqn.outvars[0], out)

    def op_broadcast_in_dim(self, eqn):
        target = list(eqn.params["shape"])
        bdims = list(eqn.params["broadcast_dimensions"])
        in_shape = eqn.invars[0].aval.shape
        mid = [1] * len(target)
        for operand_axis, out_axis in enumerate(bdims):
            mid[out_axis] = in_shape[operand_axis]
        x = self.read(eqn.invars[0])
        if list(in_shape) != mid:
            x = self.b.node("Reshape", [x, self.b.i64(mid)])[0]
        if mid != target:
            x = self.b.node("Expand", [x, self.b.i64(target)])[0]
        elif list(in_shape) == mid:
            x = self.b.node("Identity", [x])[0]
        self.write(eqn.outvars[0], x)

    def op_concatenate(self, eqn):
        ins = [self.read(v) for v in eqn.invars]
        out = self.b.node("Concat", ins, axis=int(eqn.params["dimension"]))[0]
        self.write(eqn.outvars[0], out)

    def op_slice(self, eqn):
        p = eqn.params
        starts = list(p["start_indices"])
        ends = list(p["limit_indices"])
        steps = list(p["strides"] or [1] * len(starts))
        axes = list(range(len(starts)))
        out = self.b.node("Slice", [
            self.read(eqn.invars[0]), self.b.i64(starts), self.b.i64(ends),
            self.b.i64(axes), self.b.i64(steps)])[0]
        self.write(eqn.outvars[0], out)

    def op_rev(self, eqn):
        dims = list(eqn.params["dimensions"])
        shape = eqn.invars[0].aval.shape
        starts = [shape[d] - 1 for d in dims]
        ends = [-(shape[d] + 1) for d in dims]
        steps = [-1] * len(dims)
        out = self.b.node("Slice", [
            self.read(eqn.invars[0]), self.b.i64(starts), self.b.i64(ends),
            self.b.i64(dims), self.b.i64(steps)])[0]
        self.write(eqn.outvars[0], out)

    def op_pad(self, eqn):
        cfg = eqn.params["padding_config"]
        if any(interior != 0 for _, _, interior in cfg):
            raise NotImplementedError("interior pad")
        los = [lo for lo, _, _ in cfg]
        his = [hi for _, hi, _ in cfg]
        if any(v < 0 for v in los + his):
            raise NotImplementedError("negative pad")
        pads = self.b.i64(los + his)
        x, pad_value = self.read(eqn.invars[0]), self.read(eqn.invars[1])
        out = self.b.node("Pad", [x, pads, pad_value], mode="constant")[0]
        self.write(eqn.outvars[0], out)

    # -- dtype / constants -------------------------------------------
    def op_convert_element_type(self, eqn):
        to = _np_dtype_to_onnx(eqn.params["new_dtype"])
        out = self.b.node("Cast", [self.read(eqn.invars[0])], to=to)[0]
        self.write(eqn.outvars[0], out)

    def op_iota(self, eqn):
        p = eqn.params
        shape, dim = list(p["shape"]), int(p["dimension"])
        rng = np.arange(shape[dim], dtype=np.dtype(p["dtype"]))
        view = [1] * len(shape)
        view[dim] = shape[dim]
        arr = np.broadcast_to(rng.reshape(view), shape)
        self.write(eqn.outvars[0], self.b.tensor(np.ascontiguousarray(arr)))

    def op_integer_pow(self, eqn):
        y = float(eqn.params["y"])
        x = self.read(eqn.invars[0])
        expo = self.b.tensor(
            np.asarray(y, eqn.invars[0].aval.dtype))
        out = self.b.node("Pow", [x, expo])[0]
        self.write(eqn.outvars[0], out)

    def op_round(self, eqn):
        # jnp.round rounds half-to-even, exactly ONNX Round's contract;
        # lax.round's other mode (AWAY_FROM_ZERO) has no 1:1 ONNX op.
        method = eqn.params.get("rounding_method")
        # arrives as the enum OR its raw value (TO_NEAREST_EVEN == 1)
        if method is not None and int(method) != 1:
            raise NotImplementedError(
                f"lax.round with rounding_method={method} (ONNX Round "
                "is half-to-even only)")
        out = self.b.node("Round", [self.read(eqn.invars[0])])[0]
        self.write(eqn.outvars[0], out)

    def op_rsqrt(self, eqn):
        s = self.b.node("Sqrt", [self.read(eqn.invars[0])])[0]
        out = self.b.node("Reciprocal", [s])[0]
        self.write(eqn.outvars[0], out)

    def op_select_n(self, eqn):
        if len(eqn.invars) != 3:
            raise NotImplementedError("select_n with >2 cases")
        pred, case_f, case_t = (self.read(v) for v in eqn.invars)
        out = self.b.node("Where", [pred, case_t, case_f])[0]
        self.write(eqn.outvars[0], out)

    def op_stop_gradient(self, eqn):
        self.write(eqn.outvars[0],
                   self.b.node("Identity", [self.read(eqn.invars[0])])[0])

    # -- spatial ops --------------------------------------------------
    def _to_nchw(self, name: str, spec: Sequence[int]) -> str:
        perm = list(spec)
        if perm == list(range(len(perm))):
            return name
        return self.b.node("Transpose", [name], perm=perm)[0]

    def _from_nchw(self, name: str, out_spec: Sequence[int]) -> str:
        perm = _inverse_perm(list(out_spec))
        if perm == list(range(len(perm))):
            return name
        return self.b.node("Transpose", [name], perm=perm)[0]

    def op_conv_general_dilated(self, eqn):
        p = eqn.params
        dn = p["dimension_numbers"]
        lhs_spec, rhs_spec, out_spec = (list(dn.lhs_spec), list(dn.rhs_spec),
                                        list(dn.out_spec))
        if list(p["lhs_dilation"]) != [1] * len(p["lhs_dilation"]):
            raise NotImplementedError("transposed conv (lhs_dilation != 1)")
        if p.get("batch_group_count", 1) != 1:
            raise NotImplementedError("batch_group_count != 1")
        x = self._to_nchw(self.read(eqn.invars[0]), lhs_spec)

        # Weights must be a known constant so we can re-lay them out.
        # The OIHW copy is registered under a NEW name (the original
        # initializer is left untouched so a shared weight is never
        # transposed twice and non-conv consumers still read the
        # original layout); unconsumed originals are pruned at the end.
        wname = self.read(eqn.invars[1])
        if wname not in self.b.initializers:
            raise NotImplementedError(
                "conv weights must be initializers (pass params as "
                "arguments to the traced function)")
        cache_key = (wname, tuple(rhs_spec))
        w_onnx = self._oihw_cache.get(cache_key)
        if w_onnx is None:
            wt = self.b.initializers[wname]
            w = np.frombuffer(wt.raw_data, dtype=np.dtype(
                {v: k for k, v in _DTYPES.items()}[wt.data_type])).reshape(
                    tuple(wt.dims))
            w_oihw = np.ascontiguousarray(np.transpose(w, rhs_spec))
            w_onnx = self.b.tensor(w_oihw, name=f"{wname}.oihw")
            self._oihw_cache[cache_key] = w_onnx

        pads = list(p["padding"])  # [(lo, hi)] per spatial dim
        # Integer conv (the W8A8 quantized executor, models/quant.py):
        # int8 x int8 with int32 accumulate maps 1:1 to ONNX
        # ConvInteger-10 (zero points default to 0 — our quantization
        # is symmetric).  Same attribute set as Conv.
        conv_op = "Conv"
        if np.dtype(eqn.invars[0].aval.dtype).kind in "iu":
            conv_op = "ConvInteger"
            if np.dtype(eqn.outvars[0].aval.dtype) != np.int32:
                raise NotImplementedError(
                    "integer conv must accumulate to int32 "
                    "(ConvInteger's output type)")
        out = self.b.node(
            conv_op, [x, w_onnx],
            strides=list(p["window_strides"]),
            pads=[lo for lo, _ in pads] + [hi for _, hi in pads],
            dilations=list(p["rhs_dilation"]),
            group=int(p["feature_group_count"]))[0]
        self.write(eqn.outvars[0], self._from_nchw(out, out_spec))

    def op_reduce_window_max(self, eqn):
        p = eqn.params
        wd = list(p["window_dimensions"])
        ws = list(p["window_strides"])
        pad = list(p["padding"])
        if list(p.get("base_dilation", [1] * len(wd))) != [1] * len(wd) or \
           list(p.get("window_dilation", [1] * len(wd))) != [1] * len(wd):
            raise NotImplementedError("dilated pooling")
        if len(wd) != 4 or wd[0] != 1 or wd[3] != 1:
            raise NotImplementedError(f"non-NHWC pooling window {wd}")
        if pad[0] != (0, 0) or pad[3] != (0, 0):
            raise NotImplementedError("pooling pads batch/channel")
        x = self._to_nchw(self.read(eqn.invars[0]), [0, 3, 1, 2])
        out = self.b.node(
            "MaxPool", [x],
            kernel_shape=[wd[1], wd[2]], strides=[ws[1], ws[2]],
            pads=[pad[1][0], pad[2][0], pad[1][1], pad[2][1]])[0]
        self.write(eqn.outvars[0], self._from_nchw(out, [0, 3, 1, 2]))

    def op_reduce_max(self, eqn):
        axes = list(eqn.params["axes"])
        out = self.b.node("ReduceMax", [self.read(eqn.invars[0])],
                          axes=axes, keepdims=0)[0]
        self.write(eqn.outvars[0], out)

    def op_reduce_sum(self, eqn):
        axes = list(eqn.params["axes"])
        out = self.b.node("ReduceSum", [
            self.read(eqn.invars[0]), self.b.i64(axes)], keepdims=0)[0]
        self.write(eqn.outvars[0], out)

    def op_dot_general(self, eqn):
        p = eqn.params
        (lc, rc), (lb, rb) = p["dimension_numbers"]
        lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
        # Plain matmul over the last/first axes with no batching maps
        # directly; everything else in this model family is conv.
        if (list(lb), list(rb)) == ([], []) and \
                list(lc) == [len(lhs.shape) - 1] and list(rc) == [0]:
            out = self.b.node("MatMul", [self.read(eqn.invars[0]),
                                         self.read(eqn.invars[1])])[0]
            self.write(eqn.outvars[0], out)
            return
        raise NotImplementedError(f"dot_general {p['dimension_numbers']}")


def _trace_graph(fn, example_args):
    """Trace fn(*example_args) into a fresh builder.

    Every leaf of every argument except the LAST becomes a graph
    initializer (named by its pytree path); the last argument is the
    graph input.  Returns (builder, graph_inputs, traced_outputs) where
    traced_outputs is a list of (tensor_name, aval)."""
    import jax
    from jax import tree_util

    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr

    def _leaf_name(path) -> str:
        s = tree_util.keystr(path)
        for ch in "[]'\" ":
            s = s.replace(ch, "")
        return s.replace("][", ".") or "leaf"

    leaves: List[Any] = []
    names: List[str] = []
    for arg in example_args:
        flat, _ = tree_util.tree_flatten_with_path(arg)
        for path, leaf in flat:
            leaves.append(leaf)
            names.append(_leaf_name(path))
    n_input_leaves = len(tree_util.tree_leaves(example_args[-1]))

    b = _Builder()
    conv = _Converter(b)

    graph_inputs: List[pb.ValueInfoProto] = []
    for i, (var, leaf, nm) in enumerate(zip(jaxpr.invars, leaves, names)):
        if i < len(leaves) - n_input_leaves:
            conv.write(var, b.tensor(np.asarray(leaf), name=f"p.{nm}.{i}"))
        else:
            vi = pb.ValueInfoProto()
            vi.name = "images" if n_input_leaves == 1 else f"images_{nm}"
            vi.type.tensor_type.elem_type = _np_dtype_to_onnx(var.aval.dtype)
            for d in var.aval.shape:
                dim = vi.type.tensor_type.shape.dim.add()
                dim.dim_value = int(d)
            graph_inputs.append(vi)
            conv.write(var, vi.name)

    conv.convert(jaxpr, closed.consts)
    outs = [(conv.read(ov), ov.aval) for ov in jaxpr.outvars]
    return b, graph_inputs, outs


def _finalize_model(b: _Builder, graph_inputs, outputs, *,
                    graph_name: str, doc: str = "") -> pb.ModelProto:
    """Assemble the ModelProto.  `outputs` is a list of
    (src_tensor_name, onnx_elem_type, dims) where a dim may be None for
    a dynamic (data-dependent) dimension; each output is renamed to the
    exact contract name out_{i} via an Identity."""
    out_infos = []
    for oi, (src, elem, dims) in enumerate(outputs):
        ident = b.node("Identity", [src], outputs=[f"out_{oi}"])[0]
        out_infos.append((ident, elem, dims))

    # prune initializers no node consumes (e.g. HWIO conv-weight
    # originals superseded by their OIHW copies)
    used = {i for n in b.nodes for i in n.input}
    for name in [k for k in b.initializers if k not in used]:
        del b.initializers[name]

    m = pb.ModelProto()
    m.ir_version = IR_VERSION
    op = m.opset_import.add()
    op.domain = ""
    op.version = OPSET
    m.producer_name = "face_detection_multi_scale_tpu"
    m.doc_string = doc
    g = m.graph
    g.name = graph_name
    g.node.extend(b.nodes)
    g.initializer.extend(b.initializers.values())
    g.input.extend(graph_inputs)
    for name, elem, dims in out_infos:
        vi = g.output.add()
        vi.name = name
        vi.type.tensor_type.elem_type = elem
        for d in dims:
            dim = vi.type.tensor_type.shape.dim.add()
            if d is None:
                dim.dim_param = "n_detections"
            else:
                dim.dim_value = int(d)
    return m


def trace_to_onnx(fn, example_args, *, graph_name: str,
                  arg_names: Optional[Sequence[str]] = None,
                  doc: str = "") -> pb.ModelProto:
    """Trace fn(*example_args) and convert the jaxpr to an ONNX model.

    Every leaf of every argument except the LAST becomes a graph
    initializer (named by its pytree path); the last argument is the
    graph input.  Outputs are the flattened results, named out_0..N.
    """
    b, graph_inputs, outs = _trace_graph(fn, example_args)
    outputs = [(src, _np_dtype_to_onnx(aval.dtype), list(aval.shape))
               for src, aval in outs]
    return _finalize_model(b, graph_inputs, outputs,
                           graph_name=graph_name, doc=doc)


def _append_nms_postprocess(b: _Builder, pred: str, pred_shape, *,
                            nc: int, conf_thres: float, iou_thres: float,
                            max_det: int):
    """Append the serving postprocess as standard ONNX ops
    (NonMaxSuppression + Gather), the contract equivalent of the
    reference's --export-nms graph (models/export.py:78-132 appending
    NMS_Export, models/common.py:556-568 -> non_max_suppression_export,
    utils/general.py:603-632).

    Input: decoded predictions (bs, N, no) named `pred`.  Emitted
    outputs (dynamic leading dim K = total selected, like the
    reference's per-image dynamic NMS output):
      boxes (K, 4) xyxy network-input pixels, scores (K,),
      classes (K,) f32, extras (K, no-5-nc) landmark triplets,
      batch_index (K,) int64.
    Selection semantics match ops/nms.non_max_suppression for nc=1:
    conf = obj * cls, gate conf > conf_thres (the reference's two-stage
    obj/conf gate collapses to this since cls = sigmoid < 1), greedy
    IoU > iou_thres suppression, at most max_det keeps per image.
    """
    bs, n, no = (int(d) for d in pred_shape)
    if nc != 1:
        raise NotImplementedError(
            "fused ONNX postprocess is single-class (face); nc>1 needs "
            "ArgMax/class-offset plumbing")
    f32 = np.float32

    def sl(lo, hi):
        return b.node("Slice", [pred, b.i64([lo]), b.i64([hi]),
                                b.i64([2]), b.i64([1])])[0]

    cx, cy, w, h = sl(0, 1), sl(1, 2), sl(2, 3), sl(3, 4)
    obj, cls = sl(4, 5), sl(5, 6)
    conf = b.node("Mul", [obj, cls])[0]                    # (bs, N, 1)
    half = b.tensor(np.asarray(0.5, f32))
    w2 = b.node("Mul", [w, half])[0]
    h2 = b.node("Mul", [h, half])[0]
    x1 = b.node("Sub", [cx, w2])[0]
    y1 = b.node("Sub", [cy, h2])[0]
    x2 = b.node("Add", [cx, w2])[0]
    y2 = b.node("Add", [cy, h2])[0]
    boxes = b.node("Concat", [x1, y1, x2, y2], axis=2)[0]  # (bs, N, 4)

    scores = b.node("Transpose", [conf], perm=[0, 2, 1])[0]  # (bs,1,N)
    sel = b.node(
        "NonMaxSuppression",
        [boxes, scores,
         b.tensor(np.asarray(max_det, np.int64)),
         b.tensor(np.asarray(iou_thres, f32)),
         b.tensor(np.asarray(conf_thres, f32))],
        center_point_box=0)[0]                             # (K, 3)

    ax1 = b.i64([1])
    batch_i = b.node("Gather", [sel, b.i64([0])], axis=1)[0]
    box_i = b.node("Gather", [sel, b.i64([2])], axis=1)[0]
    batch_idx = b.node("Squeeze", [batch_i, ax1])[0]       # (K,)
    box_idx = b.node("Squeeze", [box_i, ax1])[0]
    n_const = b.tensor(np.asarray(n, np.int64))
    flat = b.node("Add", [b.node("Mul", [batch_idx, n_const])[0],
                          box_idx])[0]                     # (K,)

    def take(src3d, width):
        fl = b.node("Reshape",
                    [src3d, b.i64([bs * n, width])])[0]
        return b.node("Gather", [fl, flat], axis=0)[0]

    out_boxes = take(boxes, 4)                             # (K, 4)
    out_scores = b.node("Squeeze", [take(conf, 1), ax1])[0]  # (K,)
    out_classes = b.node("Sub", [out_scores, out_scores])[0]  # zeros (K,)
    rows = take(pred, no)                                  # (K, no)
    extras = b.node("Slice", [rows, b.i64([5 + nc]), b.i64([no]),
                              ax1, b.i64([1])])[0]

    e_f = pb.TensorProto.FLOAT
    return [
        (out_boxes, e_f, [None, 4]),
        (out_scores, e_f, [None]),
        (out_classes, e_f, [None]),
        (extras, e_f, [None, no - 5 - nc]),
        (batch_idx, pb.TensorProto.INT64, [None]),
    ]


def export_onnx_native_fused(model, variables, spec, path: str, *,
                             img_size: int = 640, batch: int = 1,
                             conf_thres: float = 0.25,
                             iou_thres: float = 0.45,
                             max_det: int = 300,
                             fold_batchnorm: bool = True) -> str:
    """Native --export-nms equivalent: model + decode + NMS postprocess
    in one ONNX-13 graph with zero optional packages.  Output contract
    (all dynamic K = total selections across the batch):
    out_0 boxes (K,4) xyxy, out_1 scores (K,), out_2 classes (K,),
    out_3 extras (K, 3*nkpt), out_4 batch_index (K,) int64."""
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models.fuse import fold_bn
    from face_detection_multi_scale_tpu.models.head import decode

    use_vars = fold_bn(variables) if fold_batchnorm else variables

    def fn(params, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        raws = model.apply(params, x, train=False)
        return decode(raws, spec)

    x_spec = jnp.zeros((batch, img_size, img_size, 3), jnp.uint8)
    b, graph_inputs, outs = _trace_graph(fn, (use_vars, x_spec))
    (pred_name, pred_aval), = outs
    outputs = _append_nms_postprocess(
        b, pred_name, pred_aval.shape, nc=spec.nc,
        conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det)
    m = _finalize_model(
        b, graph_inputs, outputs,
        graph_name=f"{spec.name}-{img_size}-nms",
        doc=(f"{spec.name} {img_size}px decoded + fused NMS "
             f"(conf {conf_thres}, iou {iou_thres}, max_det {max_det}); "
             "input uint8 NHWC RGB network-input frame; outputs "
             "boxes/scores/classes/extras/batch_index with dynamic K; "
             "exported natively (no onnx/tf2onnx) via jaxpr->ONNX"))
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    return path


def export_onnx_native_quant(spec, qparams, path: str, *,
                             img_size: int = 640, batch: int = 1,
                             raw_heads: bool = False,
                             include_postprocess: bool = False,
                             conf_thres: float = 0.25,
                             iou_thres: float = 0.45,
                             max_det: int = 300) -> str:
    """Export the W8A8 quantized forward (models/quant.quant_apply) as
    a self-contained int8 ONNX graph: int8 weight initializers,
    `ConvInteger` (int32 accumulate) per conv, dequant/activation/
    requant epilogues as explicit float ops, float head + decode.

    This is the deployment analogue of the reference's int8-capable
    ncnn app (cpp/yolov7-face-ncnn — its vendored runtime requantizes
    conv outputs int32->int8 exactly like our epilogue,
    include/ncnn/mat.h:795-797; model interchange via cpp/export.py) —
    but the quantization arithmetic here is the repo's own measured
    TPU serving mode, so an ONNX consumer reproduces
    `FaceDetector(quantize="int8")` bit-for-bit up to float
    reassociation.  `qparams` comes from models/quant.quantize_model
    (real calibration data; detector.calibrate_int8).

    include_postprocess=True appends the same NonMaxSuppression tail
    as export_onnx_native_fused (the --export-nms contract)."""
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models.head import decode
    from face_detection_multi_scale_tpu.models.quant import quant_apply

    if raw_heads and include_postprocess:
        raise ValueError("raw_heads and include_postprocess are "
                         "mutually exclusive")

    def fn(qp, images_u8):
        raws = quant_apply(spec, qp, images_u8, dtype=jnp.float32)
        if raw_heads:
            return tuple(raws)
        return decode(raws, spec)

    x_spec = jnp.zeros((batch, img_size, img_size, 3), jnp.uint8)
    doc_tail = ("; W8A8 int8 (ConvInteger) with calibrated requant "
                "epilogues; input uint8 NHWC RGB network-input frame; "
                "exported natively (no onnx/tf2onnx) via jaxpr->ONNX")
    if include_postprocess:
        b, graph_inputs, outs = _trace_graph(fn, (qparams, x_spec))
        (pred_name, pred_aval), = outs
        outputs = _append_nms_postprocess(
            b, pred_name, pred_aval.shape, nc=spec.nc,
            conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det)
        m = _finalize_model(
            b, graph_inputs, outputs,
            graph_name=f"{spec.name}-{img_size}-int8-nms",
            doc=(f"{spec.name} {img_size}px decoded + fused NMS "
                 f"(conf {conf_thres}, iou {iou_thres}, max_det "
                 f"{max_det})" + doc_tail))
        with open(path, "wb") as f:
            f.write(m.SerializeToString())
        return path
    m = trace_to_onnx(
        fn, (qparams, x_spec),
        graph_name=f"{spec.name}-{img_size}-int8",
        doc=(f"{spec.name} {img_size}px "
             f"{'raw heads' if raw_heads else 'decoded'}" + doc_tail))
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    return path


def export_onnx_native(model, variables, spec, path: str, *,
                       img_size: int = 640, batch: int = 1,
                       raw_heads: bool = False,
                       fold_batchnorm: bool = True) -> str:
    """Export the inference forward (uint8 NHWC input, /255 built in —
    the export contract of export_model._build_fn) as a native ONNX
    file.  raw_heads=True emits the per-stride undecoded maps (the
    reference cpp/export.py contract); default emits decoded
    (bs, N, no) predictions (reference models/export.py with grid)."""
    import jax.numpy as jnp

    from face_detection_multi_scale_tpu.models.fuse import fold_bn
    from face_detection_multi_scale_tpu.models.head import decode

    use_vars = fold_bn(variables) if fold_batchnorm else variables

    def fn(params, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        raws = model.apply(params, x, train=False)
        if raw_heads:
            return tuple(raws)
        return decode(raws, spec)

    x_spec = jnp.zeros((batch, img_size, img_size, 3), jnp.uint8)
    m = trace_to_onnx(
        fn, (use_vars, x_spec),
        graph_name=f"{spec.name}-{img_size}",
        doc=(f"{spec.name} {img_size}px "
             f"{'raw heads' if raw_heads else 'decoded'}; input uint8 "
             "NHWC RGB network-input frame; exported natively "
             "(no onnx/tf2onnx) via jaxpr->ONNX"))
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    return path
