"""Smoke + parity checks for the extra (non-face-config) blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models import layers_extra as LX


def apply_block(block, x, **kw):
    variables = block.init(jax.random.PRNGKey(0), x, **kw)
    return block.apply(variables, x, **kw), variables


@pytest.mark.parametrize("cls,kwargs,cin,cout", [
    (LX.CrossConv, dict(k=3, s=1), 16, 16),
    (LX.GhostConv, dict(k=1, s=1), 16, 32),
    (LX.GhostBottleneck, dict(k=3, s=1), 16, 16),
    (LX.GhostBottleneck, dict(k=3, s=2), 16, 32),
    (LX.MixConv2d, dict(k=(1, 3), s=1), 16, 16),
    (LX.C3TR, dict(n=1), 16, 16),
    (LX.BottleneckCSPF, dict(n=2), 16, 16),
    (LX.BottleneckCSP2, dict(n=1), 16, 16),
    (LX.SPPCSP, dict(), 16, 16),
    (LX.ConvFocus, dict(k=1), 16, 32),
])
def test_block_shapes(cls, kwargs, cin, cout):
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, cin)),
                    jnp.float32)
    block = cls(cin, cout, **kwargs)
    y, _ = apply_block(block, x, train=False)
    assert y.shape[-1] == cout
    spatial_div = 2 if kwargs.get("s") == 2 or cls is LX.ConvFocus else 1
    assert y.shape[1] == 16 // spatial_div


def test_contract_expand_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).random((1, 8, 8, 4)))
    c = LX.contract(x, 2)
    assert c.shape == (1, 4, 4, 16)
    back = LX.expand(c, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_contract_matches_reference_channel_order():
    """Contract channel order must match torch Contract
    (models/common.py:384-395)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from oracle import install_torchvision_shim
    install_torchvision_shim()
    import torch
    from models.common import Contract

    x = np.random.default_rng(2).random((1, 4, 8, 8)).astype(np.float32)
    want = Contract(gain=2)(torch.from_numpy(x)).numpy()  # NCHW
    got = LX.contract(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, atol=1e-6)


def test_activations():
    x = jnp.linspace(-3, 3, 32).reshape(1, 4, 4, 2)
    for fn in (LX.silu, LX.hardswish, LX.mish):
        y = fn(x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
    frelu = LX.FReLU(2)
    y, _ = apply_block(frelu, x, train=False)
    assert y.shape == x.shape
    acon = LX.AconC(2)
    v = acon.init(jax.random.PRNGKey(0), x)
    assert acon.apply(v, x).shape == x.shape
    macon = LX.MetaAconC(32)
    xb = jnp.ones((1, 8, 8, 32))
    v = macon.init(jax.random.PRNGKey(0), xb)
    assert macon.apply(v, xb).shape == xb.shape


def test_sum_weighted():
    xs = [jnp.ones((1, 4, 4, 2)) * i for i in (1.0, 2.0, 3.0)]
    s = LX.Sum(3, weight=True)
    v = s.init(jax.random.PRNGKey(0), xs)
    y = s.apply(v, xs)
    assert y.shape == xs[0].shape
