"""Remaining building blocks: experimental ops, transformer blocks, CSP
variants, and the alternative activation family.

Completes the reference block inventory (SURVEY.md §2.2) beyond what the
face configs use. Reference sources:
  CrossConv / Sum / GhostConv / GhostBottleneck / MixConv2d
      models/experimental.py:11-95
  TransformerLayer / TransformerBlock / C3TR
      models/common.py:107-150, 238-243
  BottleneckCSPF / BottleneckCSP2 / SPPCSP
      models/common.py:185-220, 271-291
  ConvFocus / Contract / Expand / Classify
      models/common.py:366-409, 729-739
  activations (SiLU..MetaAconC)
      utils/activations.py:9-98
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from face_detection_multi_scale_tpu.models.layers import (
    Bottleneck, ConvBN, DWConvBN, max_pool)


class CrossConv(nn.Module):
    """Cross (1xk then kx1) convolution downsample
    (models/experimental.py:11-23)."""
    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, (1, self.k), dtype=self.dtype, name="cv1")(x, train)
        # stride (k-dim only) mirrors Conv((k,1),(s,1))
        y = nn.Conv(self.c2, (self.k, 1), strides=(self.s, 1),
                    padding=[(self.k // 2, self.k // 2), (0, 0)],
                    feature_group_count=self.g, use_bias=False,
                    dtype=self.dtype, name="cv2_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype,
                         name="cv2_bn")(y)
        y = nn.silu(y)
        return x + y if (self.shortcut and self.c1 == self.c2) else y


class Sum(nn.Module):
    """(Weighted) sum of n inputs (models/experimental.py:26-44)."""
    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = xs[0]
        if self.weight:
            w0 = -jnp.arange(1.0, self.n) / 2
            w = jax.nn.sigmoid(self.param(
                "w", lambda key: w0)) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class GhostConv(nn.Module):
    """Ghost convolution (models/experimental.py:47-57)."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBN(c_, self.k, self.s, g=self.g, act=self.act,
                   dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBN(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype,
                    name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (models/experimental.py:60-73)."""
    c1: int
    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        d = self.dtype
        y = GhostConv(self.c1, c_, 1, 1, dtype=d, name="conv_0")(x, train)
        if self.s == 2:
            y = DWConvBN(c_, c_, self.k, self.s, act=False, dtype=d,
                         name="conv_1")(y, train)
        y = GhostConv(c_, self.c2, 1, 1, act=False, dtype=d,
                      name="conv_2")(y, train)
        if self.s == 2:
            sc = DWConvBN(self.c1, self.c1, self.k, self.s, act=False,
                          dtype=d, name="shortcut_0")(x, train)
            sc = ConvBN(self.c2, 1, 1, act=False, dtype=d,
                        name="shortcut_1")(sc, train)
        else:
            sc = x
        return y + sc


class MixConv2d(nn.Module):
    """Mixed depthwise-kernel conv with residual
    (models/experimental.py:76-95, equal_ch grouping)."""
    c1: int
    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = len(self.k)
        idx = jnp.floor(jnp.linspace(0, groups - 1e-6, self.c2))
        c_ = [int((idx == g).sum()) for g in range(groups)]
        outs = []
        for g, kk in enumerate(self.k):
            outs.append(nn.Conv(
                c_[g], (kk, kk), strides=(self.s, self.s),
                padding=[(kk // 2, kk // 2)] * 2, use_bias=False,
                dtype=self.dtype, name=f"m_{g}")(x))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return x + nn.relu(y)


class TransformerLayer(nn.Module):
    """ViT layer without layernorm (models/common.py:107-121)."""
    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (seq, batch, c) to mirror torch MultiheadAttention layout
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        seq, b, c = x.shape
        hd = c // self.num_heads

        def split(t):
            return t.reshape(seq, b * self.num_heads, hd).transpose(1, 0, 2)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jax.nn.softmax(
            qh @ kh.transpose(0, 2, 1) / math.sqrt(hd), axis=-1)
        out = (attn @ vh).transpose(1, 0, 2).reshape(seq, b, c)
        out = nn.Dense(self.c, dtype=self.dtype, name="ma_out")(out)
        x = out + x
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype,
                     name="fc1")(x)
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype,
                     name="fc2")(y)
        return y + x


class TransformerBlock(nn.Module):
    """ViT block over a feature map (models/common.py:124-150)."""
    c1: int
    c2: int
    num_heads: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.c1 != self.c2:
            x = ConvBN(self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c).transpose(1, 0, 2)  # (seq, b, c)
        e = nn.Dense(self.c2, dtype=self.dtype, name="linear")(p)
        y = p + e
        for i in range(self.num_layers):
            y = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype,
                                 name=f"tr_{i}")(y)
        return y.transpose(1, 0, 2).reshape(b, h, w, self.c2)


class C3TR(nn.Module):
    """C3 with a transformer block core (models/common.py:238-243)."""
    c1: int
    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        d = self.dtype
        y1 = ConvBN(c_, 1, 1, dtype=d, name="cv1")(x, train)
        y1 = TransformerBlock(c_, c_, 4, self.n, dtype=d, name="m")(y1,
                                                                    train)
        y2 = ConvBN(c_, 1, 1, dtype=d, name="cv2")(x, train)
        out = jnp.concatenate([y1, y2], axis=-1)
        return ConvBN(self.c2, 1, dtype=d, name="cv3")(out, train)


class BottleneckCSPF(nn.Module):
    """CSP variant without cv3 (models/common.py:185-201)."""
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
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=d, name="cv2")(x)
        out = jnp.concatenate([y1, y2], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                           epsilon=1e-3, dtype=d, name="bn")(out)
        out = nn.silu(out)
        return ConvBN(self.c2, 1, 1, dtype=d, name="cv4")(out, train)


class BottleneckCSP2(nn.Module):
    """CSP2 variant (models/common.py:204-220)."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2)
        d = self.dtype
        x1 = ConvBN(c_, 1, 1, dtype=d, name="cv1")(x, train)
        y1 = x1
        for j in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, 1.0, dtype=d,
                            name=f"m_{j}")(y1, train)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=d, name="cv2")(x1)
        out = jnp.concatenate([y1, y2], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                           epsilon=1e-3, dtype=d, name="bn")(out)
        out = nn.silu(out)
        return ConvBN(self.c2, 1, 1, dtype=d, name="cv3")(out, train)


class SPPCSP(nn.Module):
    """CSP SPP with BN-fused cross path (models/common.py:271-291)."""
    c1: int
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
        pools = [max_pool(x1, kk, 1, kk // 2) for kk in self.k]
        y1 = jnp.concatenate([x1] + pools, axis=-1)
        y1 = ConvBN(c_, 1, 1, dtype=d, name="cv5")(y1, train)
        y1 = ConvBN(c_, 3, 1, dtype=d, name="cv6")(y1, train)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=d, name="cv2")(x)
        out = jnp.concatenate([y1, y2], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                           epsilon=1e-3, dtype=d, name="bn")(out)
        out = nn.silu(out)
        return ConvBN(self.c2, 1, 1, dtype=d, name="cv7")(out, train)


class ConvFocus(nn.Module):
    """Conv-based focus stem (models/common.py:366-381)."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c1 * 4, 3, 2, act=self.act, dtype=self.dtype,
                   name="conv_slice")(x, train)
        return ConvBN(self.c2, self.k, self.s, act=self.act,
                      dtype=self.dtype, name="conv")(y, train)


def contract(x, gain: int = 2):
    """Space-to-channel (models/common.py:384-395): out channel
    (sh*gain + sw)*C + c."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // gain, gain, w // gain, gain, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // gain, w // gain, gain * gain * c)


def expand(x, gain: int = 2):
    """Channel-to-space (models/common.py:398-409), inverse of contract."""
    b, h, w, c = x.shape
    y = x.reshape(b, h, w, gain, gain, c // gain ** 2)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h * gain, w * gain, c // gain ** 2)


class Classify(nn.Module):
    """Classification head (models/common.py:729-739): global average
    pool -> 1x1 conv -> flatten."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = x if isinstance(x, list) else [x]
        pooled = [v.mean(axis=(1, 2), keepdims=True) for v in xs]
        z = jnp.concatenate(pooled, axis=-1)
        z = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding="SAME", dtype=self.dtype, name="conv")(z)
        return z.reshape(z.shape[0], -1)


# ---------------------------------------------------------------------------
# alternative activations (utils/activations.py:9-98)
# ---------------------------------------------------------------------------

def silu(x):
    return x * jax.nn.sigmoid(x)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


# jax recomputes activations cheaply under remat; MemoryEfficientMish's
# custom backward is unnecessary — alias for API completeness
memory_efficient_mish = mish


class FReLU(nn.Module):
    """Funnel activation: max(x, depthwise-conv-bn(x))
    (utils/activations.py:62-71)."""
    c1: int
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c1, (self.k, self.k), padding="SAME",
                    feature_group_count=self.c1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return jnp.maximum(x, y)


class AconC(nn.Module):
    """ACON-C activation with learnable p1/p2/beta
    (utils/activations.py:75-89)."""
    c1: int

    @nn.compact
    def __call__(self, x):
        p1 = self.param("p1", nn.initializers.normal(1.0), (self.c1,))
        p2 = self.param("p2", nn.initializers.normal(1.0), (self.c1,))
        beta = self.param("beta", nn.initializers.ones, (self.c1,))
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x


class MetaAconC(nn.Module):
    """ACON with beta generated by a squeeze-excite MLP
    (utils/activations.py:92-98)."""
    c1: int
    r: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c2 = max(self.r, self.c1 // self.r)
        p1 = self.param("p1", nn.initializers.normal(1.0), (self.c1,))
        p2 = self.param("p2", nn.initializers.normal(1.0), (self.c1,))
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(c2, (1, 1), dtype=self.dtype, name="fc1")(y)
        beta = jax.nn.sigmoid(
            nn.Conv(self.c1, (1, 1), dtype=self.dtype, name="fc2")(y))
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x
