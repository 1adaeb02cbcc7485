"""Building blocks of the YOLOv7-face model family as flax.linen modules.

NHWC layout throughout (TPU-native); conv kernels are HWIO. Submodule names
mirror the reference PyTorch module paths (reference models/common.py) so
that checkpoint conversion (models/convert.py) is a mechanical rename:
torch "model.8.cv1.conv.weight" -> flax ("model_8", "cv1", "conv", "kernel").

Behavioral parity targets (reference file:line):
  Conv/DWConv            models/common.py:85-105
  MP/SP/SPF              models/common.py:28-52
  ImplicitA/ImplicitM    models/common.py:55-74
  ReOrg                  models/common.py:77-82
  SPPF                   models/common.py:335-348
  SPPCSPC                models/common.py:294-312
  SPPFCSPC               models/common.py:314-333
  StemBlock              models/common.py:422-437
  DWConvblock            models/common.py:452-471
  ADD                    models/common.py:473-481
  Shuffle_Block          models/common.py:483-539
  Bottleneck/C3/CSP fam  models/common.py:153-243
  Focus/Contract/Expand  models/common.py:350-409
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def autopad(k: int, p=None) -> int:
    """Same-padding helper (reference models/common.py:22-26)."""
    return k // 2 if p is None else p


def act_fn(name):
    """Resolve an activation spec. True/'silu' -> SiLU, 'leaky' ->
    LeakyReLU(0.1), 'relu' -> ReLU, False/None/'none' -> identity."""
    if name is True or name == "silu":
        return nn.silu
    if name == "leaky":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name == "relu":
        return nn.relu
    if name in (False, None, "none"):
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


def max_pool(x, k: int, s: int, p: int = 0, ceil_mode: bool = False):
    """NHWC max pool matching torch.nn.MaxPool2d(k, s, p, ceil_mode)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = [p, p]
    pad_w = [p, p]
    if ceil_mode:
        # extra right/bottom padding so the last (partial) window is emitted
        out_h = math.ceil((h + 2 * p - k) / s) + 1
        out_w = math.ceil((w + 2 * p - k) / s) + 1
        pad_h[1] += max(0, (out_h - 1) * s + k - h - 2 * p)
        pad_w[1] += max(0, (out_w - 1) * s + k - w - 2 * p)
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=(tuple(pad_h), tuple(pad_w)))


def upsample2x_nearest(x):
    """Nearest-neighbor 2x upsample (torch nn.Upsample(scale_factor=2))."""
    return x.repeat(2, axis=1).repeat(2, axis=2)


def reorg(x):
    """Space-to-depth 2x2, channel order matching reference ReOrg
    (models/common.py:77-82): [even-even, odd-even, even-odd, odd-odd]
    over (h, w).  Written as explicit lax.slice (not `x[:, ::2, ::2]`)
    because jnp's multi-axis strided indexing lowers to a gather, which
    XLA then has to simplify and the ONNX exporter would reject; the
    strided slice is the operation actually meant."""
    b, h, w, c = x.shape
    sl = lambda oy, ox: jax.lax.slice(  # noqa: E731
        x, (0, oy, ox, 0), (b, h, w, c), (1, 2, 2, 1))
    return jnp.concatenate([sl(0, 0), sl(1, 0), sl(0, 1), sl(1, 1)],
                           axis=-1)


def channel_shuffle(x, groups: int = 2):
    """ShuffleNet channel shuffle (reference models/common.py:483-492)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


class ConvBN(nn.Module):
    """conv2d(bias=False) + BatchNorm + activation == reference `Conv`.

    Submodules named `conv` and `bn` to mirror the torch state dict.
    """
    c2: int
    k: int = 1
    s: int = 1
    p: Any = None
    g: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k if isinstance(self.k, (tuple, list)) else (self.k, self.k)
        if self.p is None:
            pads = [(kk // 2, kk // 2) for kk in k]
        elif isinstance(self.p, (tuple, list)):
            pads = [(pp, pp) for pp in self.p]
        else:
            pads = [(self.p, self.p)] * 2
        x = nn.Conv(self.c2, tuple(k), strides=(self.s, self.s),
                    padding=pads, feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return act_fn(self.act)(x)


def DWConvBN(c1: int, c2: int, k: int = 1, s: int = 1, act: Any = True,
             dtype=jnp.float32, name=None) -> ConvBN:
    """Depthwise conv block == reference `DWConv` (groups = gcd(c1, c2))."""
    return ConvBN(c2, k, s, g=math.gcd(c1, c2), act=act, dtype=dtype, name=name)


class SPF(nn.Module):
    """Stacked 3x3 stride-1 max pools equivalent to a k x k pool
    (reference models/common.py:45-52)."""
    k: int = 3
    s: int = 1

    def __call__(self, x, train: bool = False):
        for _ in range((self.k - 1) // 2):
            x = max_pool(x, 3, self.s, 1)
        return x


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (reference models/common.py:335-348)."""
    c1: int
    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool(x, self.k, 1, self.k // 2)
        y2 = max_pool(y1, self.k, 1, self.k // 2)
        y3 = max_pool(y2, self.k, 1, self.k // 2)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(out, train)


class SPPCSPC(nn.Module):
    """CSP SPP with parallel pools (reference models/common.py:294-312)."""
    c2: int
    e: float = 0.5
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        d = self.dtype
        x1 = ConvBN(c_, 1, 1, dtype=d, name="cv1")(x, train)
        x1 = ConvBN(c_, 3, 1, dtype=d, name="cv3")(x1, train)
        x1 = ConvBN(c_, 1, 1, dtype=d, name="cv4")(x1, train)
        pools = [max_pool(x1, k, 1, k // 2) for k in self.k]
        y1 = jnp.concatenate([x1] + pools, axis=-1)
        y1 = ConvBN(c_, 1, 1, dtype=d, name="cv5")(y1, train)
        y1 = ConvBN(c_, 3, 1, dtype=d, name="cv6")(y1, train)
        y2 = ConvBN(c_, 1, 1, dtype=d, name="cv2")(x, train)
        out = jnp.concatenate([y1, y2], axis=-1)
        return ConvBN(self.c2, 1, 1, dtype=d, name="cv7")(out, train)


class SPPFCSPC(nn.Module):
    """CSP SPP with sequential (fast) pools (reference models/common.py:314-333)."""
    c2: int
    e: float = 0.5
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        d = self.dtype
        x1 = ConvBN(c_, 1, 1, dtype=d, name="cv1")(x, train)
        x1 = ConvBN(c_, 3, 1, dtype=d, name="cv3")(x1, train)
        x1 = ConvBN(c_, 1, 1, dtype=d, name="cv4")(x1, train)
        x2 = max_pool(x1, self.k, 1, self.k // 2)
        x3 = max_pool(x2, self.k, 1, self.k // 2)
        x4 = max_pool(x3, self.k, 1, self.k // 2)
        y1 = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        y1 = ConvBN(c_, 1, 1, dtype=d, name="cv5")(y1, train)
        y1 = ConvBN(c_, 3, 1, dtype=d, name="cv6")(y1, train)
        y2 = ConvBN(c_, 1, 1, dtype=d, name="cv2")(x, train)
        out = jnp.concatenate([y1, y2], axis=-1)
        return ConvBN(self.c2, 1, 1, dtype=d, name="cv7")(out, train)


class SPP(nn.Module):
    """Classic SPP, pools emulated by stacked 3x3 (reference models/common.py:246-268)."""
    c1: int
    c2: int
    k: Tuple[int, ...] = (3, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        outs = [x]
        for pk in self.k:
            y = x
            for _ in range(1 + (pk - 3) // 2):
                y = max_pool(y, 3, 1, 1)
            outs.append(y)
        out = jnp.concatenate(outs, axis=-1)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(out, train)


class StemBlock(nn.Module):
    """PeleeNet-style stem (reference models/common.py:422-437)."""
    c2: int
    k: int = 3
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        s1 = ConvBN(self.c2, self.k, self.s, dtype=d, name="stem_1")(x, train)
        s2a = ConvBN(self.c2 // 2, 1, 1, p=0, dtype=d, name="stem_2a")(s1, train)
        s2b = ConvBN(self.c2, 3, 2, p=1, dtype=d, name="stem_2b")(s2a, train)
        s2p = max_pool(s1, 2, 2, 0, ceil_mode=True)
        out = jnp.concatenate([s2b, s2p], axis=-1)
        return ConvBN(self.c2, 1, 1, p=0, dtype=d, name="stem_3")(out, train)


class DWConvblock(nn.Module):
    """Depthwise + pointwise conv pair (reference models/common.py:452-471).

    Torch leaf names: conv1/bn1 (depthwise), conv2/bn2 (pointwise).
    """
    c1: int
    c2: int
    k: int
    s: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        d = self.dtype
        x = nn.Conv(self.c1, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(p, p), (p, p)], feature_group_count=self.c1,
                    use_bias=False, dtype=d, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=d, name="bn1")(x)
        x = nn.silu(x)
        x = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=d, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=d, name="bn2")(x)
        return nn.silu(x)


class ShuffleBlock(nn.Module):
    """ShuffleNetV2 unit (reference models/common.py:494-539).

    Torch leaf indices inside branch1/branch2 Sequentials are flattened to
    `branch1_0`-style names here (conversion merges numeric components).
    """
    c1: int
    c2: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        bf = self.c2 // 2  # branch features

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.97,
                                epsilon=1e-3, dtype=d, name=name)

        if self.stride > 1:
            b1 = nn.Conv(self.c1, (3, 3), strides=(self.stride, self.stride),
                         padding=[(1, 1), (1, 1)], feature_group_count=self.c1,
                         use_bias=False, dtype=d, name="branch1_0")(x)
            b1 = bn("branch1_1")(b1)
            b1 = nn.Conv(bf, (1, 1), use_bias=False, dtype=d, name="branch1_2")(b1)
            b1 = nn.silu(bn("branch1_3")(b1))
            x2 = x
        else:
            b1, x2 = x[..., :bf], x[..., bf:]

        b2 = nn.Conv(bf, (1, 1), use_bias=False, dtype=d, name="branch2_0")(x2)
        b2 = nn.silu(bn("branch2_1")(b2))
        b2 = nn.Conv(bf, (3, 3), strides=(self.stride, self.stride),
                     padding=[(1, 1), (1, 1)], feature_group_count=bf,
                     use_bias=False, dtype=d, name="branch2_3")(b2)
        b2 = bn("branch2_4")(b2)
        b2 = nn.Conv(bf, (1, 1), use_bias=False, dtype=d, name="branch2_5")(b2)
        b2 = nn.silu(bn("branch2_6")(b2))

        out = jnp.concatenate([b1, b2], axis=-1)
        return channel_shuffle(out, 2)


class ConvBnReluMaxpool(nn.Module):
    """conv+bn+silu then 3x3/2 maxpool (reference models/common.py:439-450).

    Torch leaf names: conv.0 (conv), conv.1 (bn) -> conv_0 / conv_1.
    """
    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.c2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="conv_1")(x)
        x = nn.silu(x)
        return max_pool(x, 3, 2, 1)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference models/common.py:153-163)."""
    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.c2, 3, 1, g=self.g, act=self.act, dtype=self.dtype,
                   name="cv2")(y, train)
        return x + y if (self.shortcut and self.c1 == self.c2) else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference models/common.py:223-235)."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        d = self.dtype
        y1 = ConvBN(c_, 1, 1, act=self.act, dtype=d, name="cv1")(x, train)
        for j in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, 1.0, act=self.act,
                            dtype=d, name=f"m_{j}")(y1, train)
        y2 = ConvBN(c_, 1, 1, act=self.act, dtype=d, name="cv2")(x, train)
        out = jnp.concatenate([y1, y2], axis=-1)
        return ConvBN(self.c2, 1, act=self.act, dtype=d, name="cv3")(out, train)


class BottleneckCSP(nn.Module):
    """CSP bottleneck (reference models/common.py:166-182)."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        d = self.dtype
        y1 = ConvBN(c_, 1, 1, dtype=d, name="cv1")(x, train)
        for j in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, 1.0, dtype=d,
                            name=f"m_{j}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=d, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=d, name="cv2")(x)
        out = jnp.concatenate([y1, y2], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                           epsilon=1e-3, dtype=d, name="bn")(out)
        out = nn.silu(out)
        return ConvBN(self.c2, 1, 1, dtype=d, name="cv4")(out, train)


class Focus(nn.Module):
    """Space-to-depth stem (reference models/common.py:350-364)."""
    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Contract(gain=2) channel ordering (models/common.py:384-395):
        # output channel = (sh*2 + sw)*C + c, position-major over the 2x2.
        b, h, w, c = x.shape
        y = x.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return ConvBN(self.c2, self.k, self.s, act=self.act, dtype=self.dtype,
                      name="conv")(y, train)


class ImplicitA(nn.Module):
    """Learned additive prior, torch param shape (1, C, 1, 1)
    (reference models/common.py:55-63). Stored here as (C,)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        imp = self.param("implicit", nn.initializers.normal(stddev=0.02),
                         (self.channels,))
        return x + imp


class ImplicitM(nn.Module):
    """Learned multiplicative prior (reference models/common.py:66-74)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        def init(key, shape, dtype=jnp.float32):
            return 1.0 + nn.initializers.normal(stddev=0.02)(key, shape, dtype)
        imp = self.param("implicit", init, (self.channels,))
        return x * imp
