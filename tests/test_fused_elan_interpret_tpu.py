"""Fused-ELAN kernel under the Mosaic SIMULATOR (TPU-interpret mode).

Plain `interpret=True` checks numerics only; `pltpu.InterpretParams`
additionally simulates Mosaic's execution semantics — sequential grid
ordering, DMA start/wait pairing, semaphores — with `detect_races`,
`out_of_bounds_reads="raise"`, and NaN-poisoned uninitialized memory.
That is the strongest pre-silicon evidence available for the kernel's
double-buffered prefetch (no DMA/compute race), the host_pad=False
clamped border copies (no out-of-bounds source rows), and the claim
that the ring masks fence off stale scratch (NaN poison never reaches
the output).

The two fast cases cover the richest interacting feature sets; the
full matrix runs under -m slow.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from face_detection_multi_scale_tpu.ops.pallas_elan import (  # noqa: E402
    ElanShape, fused_elan, reference_elan)
from tests.test_fused_elan import _rand_weights  # noqa: E402

INTERP = pltpu.InterpretParams(
    detect_races=True, out_of_bounds_reads="raise",
    uninitialized_memory="nan", dma_execution_mode="on_wait")

BASE = dict(cin=12, ccv=8, cch=8, cout=16, n_chain=2,
            members=("y2", "y1", "b", "a"), act="silu")

CASES = {
    # name: (shape extras, batch)
    "taps": ({}, 2),
    "variant-stack": (dict(flat_mm=True, im2col9=True, pack_ab=True,
                           concat_trans=True), 2),
    "nopad": (dict(host_pad=False), 2),
    "nopad-pre": (dict(host_pad=False, pre_cin=6, pre_stride=2), 2),
    "group2": (dict(flat_mm=True, group=2), 4),
    "group2-nopad-stack": (dict(group=2, host_pad=False, im2col9=True,
                                concat_trans=True), 4),
}
FAST = ("nopad-pre", "group2-nopad-stack")


def _run(name):
    extra, bsz = CASES[name]
    rng = np.random.RandomState(7)
    shape = ElanShape(**BASE, **extra)
    s = shape.pre_stride if shape.has_pre else 1
    cin_in = shape.pre_cin if shape.has_pre else shape.cin
    x = jnp.asarray(rng.randn(bsz, 32 * s, 20 * s, cin_in), jnp.float32)
    ws = _rand_weights(rng, shape)
    ref = reference_elan(x, ws, shape)
    got = fused_elan(x, ws, shape, th=8, interpret=INTERP)
    assert not bool(jnp.isnan(got).any()), name
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("name", FAST)
def test_mosaic_sim_fast(name):
    _run(name)


@pytest.mark.slow
@pytest.mark.parametrize("name",
                         [n for n in CASES if n not in FAST])
def test_mosaic_sim_full(name):
    _run(name)


def test_mosaic_sim_real_widths():
    """elan@3's real channel widths (cin=128, ccv=cch=64) with the full
    variant stack under the simulator — lane-tile edge cases that toy
    widths (8/12 channels) cannot reach."""
    shape = ElanShape(cin=128, ccv=64, cch=64, cout=128, n_chain=2,
                      members=("y2", "y1", "b", "a"), act="silu",
                      flat_mm=True, im2col9=True, pack_ab=True,
                      concat_trans=True, host_pad=False)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 32, 32, 128) * 0.3, jnp.float32)
    ws = _rand_weights(rng, shape)
    ref = reference_elan(x, ws, shape)
    got = fused_elan(x, ws, shape, th=8, interpret=INTERP)
    assert not bool(jnp.isnan(got).any())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
