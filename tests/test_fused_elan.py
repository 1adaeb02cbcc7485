"""Fused-ELAN serving path: kernel numerics, the pattern matcher, and
the standalone executor vs the flax module graph.

The fused group re-implements reference cfg/yolov7-w6.yaml's E-ELAN
concat groups (each row a Conv = conv+BN+act, models/common.py:85-105)
as one Pallas kernel; parity target is the flax graph itself, which has
its own oracle tests against the reference (test_model_parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.fused import (
    ElanBlock, find_elan_blocks, fused_apply, pack_elan_weights)
from face_detection_multi_scale_tpu.models.model import YoloFace, init_model
from face_detection_multi_scale_tpu.ops.pallas_elan import (
    ElanShape, choose_strip_height, fused_elan, reference_elan)


def _rand_weights(rng, shape: ElanShape):
    def w(*s):
        return jnp.asarray(rng.randn(*s) * 0.2, jnp.float32)

    ws = []
    if shape.has_pre:
        ws += [w(3, 3, shape.pre_cin, shape.cin), w(1, shape.cin)]
    ws += [w(shape.cin, shape.ccv), w(1, shape.ccv),
           w(shape.cin, shape.ccv), w(1, shape.ccv)]
    cin_k = shape.ccv
    for _ in range(shape.n_chain):
        ws += [w(3, 3, cin_k, shape.cch), w(1, shape.cch)]
        cin_k = shape.cch
    ws += [w(shape.concat_width, shape.cout), w(1, shape.cout)]
    return ws


@pytest.mark.parametrize("members,ccv,cch,n_chain,act", [
    (("y4", "y2", "b", "a"), 8, 8, 4, "silu"),          # w6 backbone
    (("y4", "y3", "y2", "y1", "b", "a"), 16, 8, 4, "silu"),  # w6 head
    (("y2", "y1", "b", "a"), 8, 8, 2, "leaky"),         # tiny group
])
def test_kernel_matches_reference(members, ccv, cch, n_chain, act):
    rng = np.random.RandomState(0)
    shape = ElanShape(cin=12, ccv=ccv, cch=cch, cout=16, n_chain=n_chain,
                      members=members, act=act)
    x = jnp.asarray(rng.randn(2, 16, 16, 12), jnp.float32)
    ws = _rand_weights(rng, shape)
    ref = reference_elan(x, ws, shape)
    got = fused_elan(x, ws, shape, th=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_kernel_im2col_variant():
    """im2col=True runs each chain conv as one (M, 9*cch) matmul; the
    numerics must match the 9-tap accumulation bit-for-bit in f32."""
    rng = np.random.RandomState(3)
    base = dict(cin=12, ccv=8, cch=8, cout=16, n_chain=4,
                members=("y4", "y2", "b", "a"), act="silu")
    x = jnp.asarray(rng.randn(2, 16, 16, 12), jnp.float32)
    ws = _rand_weights(rng, ElanShape(**base))
    ref = reference_elan(x, ws, ElanShape(**base))
    got = fused_elan(x, ws, ElanShape(im2col=True, **base), th=8,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_kernel_flat_mm_variant():
    """flat_mm=True collapses every matmul to 2-D (rows*cols16, K);
    numerics must match the 3-D dot path (w=20 exercises both the
    already-aligned b_ext and the per-tap sublane pad-to-16)."""
    rng = np.random.RandomState(4)
    base = dict(cin=12, ccv=8, cch=8, cout=16, n_chain=4,
                members=("y4", "y2", "b", "a"), act="silu",
                pre_cin=6, pre_stride=2)
    x = jnp.asarray(rng.randn(2, 32, 40, 6), jnp.float32)
    ws = _rand_weights(rng, ElanShape(**base))
    ref = reference_elan(x, ws, ElanShape(**base))
    for extra in ({"flat_mm": True},
                  {"flat_mm": True, "im2col": True},
                  {"flat_mm": True, "im2col9": True},
                  {"flat_mm": True, "im2col9": True, "pack_ab": True},
                  {"im2col9": True, "pack_ab": True, "concat_trans": True},
                  {"im2col9": True, "concat_trans": True,
                   "host_pad": False},
                  {"im2col9": True, "concat_trans": True, "group": 2},
                  {"group": 2, "host_pad": False}):
        got = fused_elan(x, ws, ElanShape(**base, **extra), th=8,
                         interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("th", [8, 32])
def test_kernel_no_host_pad(th):
    """host_pad=False DMAs from the unpadded input with clamped border
    copies; th=8 exercises first/MIDDLE/last strips (h=32 gives 4, so
    the nstrips>2 mid descriptor actually runs), th=32 the
    single-strip case."""
    rng = np.random.RandomState(5)
    shape = ElanShape(cin=12, ccv=8, cch=8, cout=16, n_chain=2,
                      members=("y2", "y1", "b", "a"), act="silu",
                      host_pad=False)
    x = jnp.asarray(rng.randn(2, 32, 20, 12), jnp.float32)
    ws = _rand_weights(rng, shape)
    ref = reference_elan(x, ws, shape)
    got = fused_elan(x, ws, shape, th=th, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_kernel_absorbed_pre_conv(stride):
    """has_pre: the kernel runs the feeding 3x3 (SAME pad 1, stride s)
    in VMEM before the group; x is the pre conv's own input."""
    rng = np.random.RandomState(2)
    shape = ElanShape(cin=12, ccv=8, cch=8, cout=16, n_chain=4,
                      members=("y4", "y2", "b", "a"), act="silu",
                      pre_cin=6, pre_stride=stride)
    # w=20 -> ext width 28: also exercises the 16-alignment right-pad
    x = jnp.asarray(rng.randn(2, 16 * stride, 20 * stride, 6), jnp.float32)
    ws = _rand_weights(rng, shape)
    ref = reference_elan(x, ws, shape)
    got = fused_elan(x, ws, shape, th=8, interpret=True)
    assert got.shape == (2, 16, 20, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_kernel_single_strip_and_uneven_members():
    # one strip covering the whole height exercises both borders at once
    rng = np.random.RandomState(1)
    shape = ElanShape(cin=8, ccv=8, cch=8, cout=8, n_chain=4,
                      members=("y3", "b"), act="relu")
    x = jnp.asarray(rng.randn(1, 12, 20, 8), jnp.float32)
    ws = _rand_weights(rng, shape)
    ref = reference_elan(x, ws, shape)
    got = fused_elan(x, ws, shape, th=12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_find_blocks_w6():
    spec = zoo.get_spec("yolov7-w6-face")
    blocks = find_elan_blocks(spec)
    assert len(blocks) == 11
    first = blocks[0]
    assert (first.a, first.b, first.chain, first.concat, first.trans) == \
        (3, 4, (5, 6, 7, 8), 9, 10)
    assert first.shape.members == ("y4", "y2", "b", "a")
    assert first.shape == ElanShape(cin=128, ccv=64, cch=64, cout=128,
                                    n_chain=4,
                                    members=("y4", "y2", "b", "a"))
    heads = [b for b in blocks if len(b.shape.members) == 6]
    assert len(heads) == 6
    assert all(b.shape.act == "silu" for b in blocks)


def test_find_blocks_tiny_leaky_chain2():
    spec = zoo.get_spec("yolov7-tiny-face")
    blocks = find_elan_blocks(spec)
    assert len(blocks) == 8
    assert all(b.shape.n_chain == 2 and b.shape.act == "leaky"
               for b in blocks)


def test_find_blocks_absorb_pre():
    """absorb_pre pulls in exactly the stride-2 3x3 backbone downsamples
    that feed only the group's two 1x1s (w6: nodes 2/11/20/29/38)."""
    blocks = find_elan_blocks(zoo.get_spec("yolov7-w6-face"),
                              absorb_pre=True)
    assert len(blocks) == 11
    pres = {b.pre: b for b in blocks if b.pre is not None}
    assert set(pres) == {2, 11, 20, 29, 38}
    blk = pres[2]
    assert blk.start == 2 and blk.nodes[0] == 2
    assert blk.shape.pre_cin == 64 and blk.shape.pre_stride == 2
    # head groups are fed by concats: never absorbed
    assert all(b.pre is None for b in blocks
               if len(b.shape.members) == 6)
    tiny = find_elan_blocks(zoo.get_spec("yolov7-tiny-face"),
                            absorb_pre=True)
    assert [b.pre for b in tiny if b.pre is not None] == [1]


def test_find_blocks_lite_none():
    assert find_elan_blocks(zoo.get_spec("yolov7-lite-t")) == []


def test_strip_height_rejects_oversize():
    # w6's 512-wide backbone group: chain weights alone exceed VMEM
    shape = ElanShape(cin=1024, ccv=512, cch=512, cout=1024, n_chain=4,
                      members=("y4", "y2", "b", "a"))
    assert choose_strip_height(shape, 20, 20, 2) == 0


@pytest.mark.parametrize("model", ["yolov7-w6-face", "yolov7-tiny-face"])
def test_plain_executor_bit_exact(model):
    """blocks=[] runs every node as its own flax module: must equal the
    monolithic YoloFace apply bit-for-bit (same modules, same params)."""
    spec = zoo.get_spec(model)
    _, variables = init_model(spec, jax.random.PRNGKey(0), img_size=64)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    ref = YoloFace(spec=spec).apply(variables, x, train=False)
    got = fused_apply(spec, variables, x, blocks=[])
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_fused_executor_matches_model():
    spec = zoo.get_spec("yolov7-w6-face")
    _, variables = init_model(spec, jax.random.PRNGKey(0), img_size=64)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    ref = YoloFace(spec=spec).apply(variables, x, train=False)
    got = fused_apply(spec, variables, x, interpret=True)
    for r, g in zip(ref, got):
        scale = float(jnp.max(jnp.abs(r))) + 1e-6
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 1e-5, (err, scale)


def test_fused_executor_absorb_pre_matches_model():
    spec = zoo.get_spec("yolov7-w6-face")
    _, variables = init_model(spec, jax.random.PRNGKey(0), img_size=64)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    ref = YoloFace(spec=spec).apply(variables, x, train=False)
    blocks = find_elan_blocks(spec, absorb_pre=True)
    got = fused_apply(spec, variables, x, blocks=blocks, interpret=True)
    for r, g in zip(ref, got):
        scale = float(jnp.max(jnp.abs(r))) + 1e-6
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 1e-5, (err, scale)


def test_detector_fuse_elan_flag():
    """FaceDetector(fuse_elan=True) serves the same detections as the
    flax path (auto-interpret off-TPU)."""
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector

    kw = dict(model="yolov7-tiny-face", img_sizes=(64,), conf_thres=0.01,
              seed=3, dtype=jnp.float32)
    base = FaceDetector(**kw)
    fused = FaceDetector(fuse_elan=True, **kw)
    assert fused._elan_blocks, "tiny spec should yield fusable blocks"
    img = (np.random.RandomState(0).rand(2, 64, 64, 3) * 255).astype(
        np.uint8)
    d0 = base.run_network(img)
    d1 = fused.run_network(img)
    np.testing.assert_allclose(np.asarray(d0.scores), np.asarray(d1.scores),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d0.boxes), np.asarray(d1.boxes),
                               atol=1e-2)
    # a variant expression selects the measured kernel + absorbed pre
    var = FaceDetector(fuse_elan="pre:flat+im2col9+ab+ct", **kw)
    assert any(b.pre is not None for b in var._elan_blocks)
    assert all(b.shape.im2col9 and b.shape.concat_trans
               for b in var._elan_blocks)
    d2 = var.run_network(img)
    np.testing.assert_allclose(np.asarray(d0.scores),
                               np.asarray(d2.scores), atol=1e-4)


def test_fused_executor_on_folded_variables():
    """fold_bn rewrites BN to scale=1/var=1-eps/mean=0; the packer's
    formula must reduce to identity on it."""
    from face_detection_multi_scale_tpu.models.fuse import fold_bn
    spec = zoo.get_spec("yolov7-w6-face")
    _, variables = init_model(spec, jax.random.PRNGKey(0), img_size=64)
    folded = fold_bn(variables)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3),
                    jnp.float32)
    ref = YoloFace(spec=spec).apply(folded, x, train=False)
    got = fused_apply(spec, folded, x, interpret=True)
    for r, g in zip(ref, got):
        scale = float(jnp.max(jnp.abs(r))) + 1e-6
        assert float(jnp.max(jnp.abs(r - g))) / scale < 1e-5


def test_variant_budget_part_drives_strip_height():
    """apply_variant "bN" raises the per-shape VMEM budget, which
    choose_strip_height uses — bigger budgets pick bigger strips."""
    from face_detection_multi_scale_tpu.models.fused import apply_variant
    from face_detection_multi_scale_tpu.ops.pallas_elan import (
        choose_strip_height)

    shape = ElanShape(cin=128, ccv=64, cch=64, cout=128, n_chain=4,
                      members=("y4", "y2", "b", "a"))  # the elan@3 shape
    th_default = choose_strip_height(shape, 160, 160, 2)
    big = apply_variant(shape, "flat+b28")
    assert big.vmem_budget_mb == 28 and big.flat_mm
    th_big = choose_strip_height(big, 160, 160, 2)
    assert th_big > th_default, (th_big, th_default)
