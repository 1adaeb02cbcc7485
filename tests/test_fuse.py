"""Conv+BN folding parity: fold_bn(variables) must be output-identical to
the unfolded variables at inference (the reference serves fused weights —
attempt_load -> fuse(), models/experimental.py:126, math at
models/yolo.py:441-449)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.fuse import fold_bn
from face_detection_multi_scale_tpu.models.model import init_model


def randomize(variables, seed=0):
    """Make folding non-trivial: noise on params, nonzero running means,
    non-unit running variances."""
    rng = np.random.default_rng(seed)

    def perturb(x):
        x = np.asarray(x)
        return jnp.asarray(
            x + 0.1 * rng.standard_normal(x.shape).astype(x.dtype))

    params = jax.tree.map(perturb, variables["params"])

    def stat(path, x):
        name = path[-1].key
        x = np.asarray(x)
        if name == "mean":
            return jnp.asarray(
                rng.normal(0.0, 0.5, x.shape).astype(x.dtype))
        return jnp.asarray(
            rng.uniform(0.5, 2.0, x.shape).astype(x.dtype))

    stats = jax.tree_util.tree_map_with_path(
        stat, variables["batch_stats"])
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("name,size", [
    ("yolov7-lite-t", 64),      # StemBlock/ShuffleBlock/DWConvblock pairs
    ("yolov7-tiny-face", 64),   # ConvBN everywhere + dw_conv_kpt tower
])
def test_fold_bn_output_identical(name, size):
    spec = zoo.get_spec(name)
    model, variables = init_model(spec, img_size=size)
    variables = randomize(variables)
    folded = fold_bn(variables)

    # structure preserved: same apply, same checkpoints, same jit cache
    assert (jax.tree_util.tree_structure(jax.tree.map(np.asarray, folded))
            == jax.tree_util.tree_structure(
                jax.tree.map(np.asarray, variables)))

    x = jnp.asarray(np.random.default_rng(1).random(
        (2, size, size, 3), np.float32))
    ref = model.apply(variables, x, train=False)
    got = model.apply(folded, x, train=False)
    # randomized (untrained) nets blow activations up to ~1e4, so compare
    # relative to the per-tensor magnitude: the fold itself is exact to
    # fp32 rounding; depth amplifies the reassociated rounding slightly
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        r, g = np.asarray(r), np.asarray(g)
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(g / scale, r / scale, atol=2e-4)


def test_fold_bn_concat_fed_csp_blocks():
    """Standalone (concat-fed) BNs in CSP blocks rewrite to an exact
    affine rather than folding into a kernel."""
    from face_detection_multi_scale_tpu.models.layers_extra import (
        BottleneckCSP2, MixConv2d)

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(2).random(
        (1, 16, 16, 8), np.float32))
    for block in (BottleneckCSP2(c1=8, c2=8, n=1),
                  MixConv2d(c1=8, c2=8, k=(1, 3))):
        variables = block.init(rng, x, train=False)
        variables = randomize(variables, seed=3)
        folded = fold_bn(variables)
        ref = block.apply(variables, x, train=False)
        got = block.apply(folded, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_fold_bn_single_convbn_matches_reference_formula():
    """The folded kernel/bias equal the reference fuse() closed form
    (models/yolo.py:441-449)."""
    from face_detection_multi_scale_tpu.models.layers import ConvBN

    block = ConvBN(c2=4, k=3)
    x = jnp.zeros((1, 8, 8, 3))
    variables = randomize(block.init(jax.random.PRNGKey(0), x,
                                     train=False), seed=4)
    folded = fold_bn(variables)

    k = np.asarray(variables["params"]["conv"]["kernel"], np.float64)
    gamma = np.asarray(variables["params"]["bn"]["scale"], np.float64)
    beta = np.asarray(variables["params"]["bn"]["bias"], np.float64)
    mu = np.asarray(variables["batch_stats"]["bn"]["mean"], np.float64)
    var = np.asarray(variables["batch_stats"]["bn"]["var"], np.float64)
    g = gamma / np.sqrt(var + 1e-3)

    np.testing.assert_allclose(
        np.asarray(folded["params"]["conv"]["kernel"]), k * g, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(folded["params"]["bn"]["bias"]), beta - mu * g,
        rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(folded["params"]["bn"]["scale"]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(folded["batch_stats"]["bn"]["mean"]), 0.0)
