"""Shared layers with exact reference numerics on static shapes.

These exist so that weights imported from the reference checkpoint
(``best_improved_model.pth``) produce bit-comparable activations: torch-style
explicit conv padding (not XLA 'SAME', whose asymmetric pads differ for even
inputs at stride 2) and torch's adaptive-average-pool index algorithm.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def from_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B, T, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def to_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, C, T, H, W)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))


class Conv3dTorch(nn.Module):
    """3D conv over (B, T, H, W, C) with torch-style symmetric padding.

    Matches ``nn.Conv3d(cin, cout, k, stride=s, padding=p)`` numerics
    (e.g. ``avenue_training_script2.py:19-21``) while keeping the
    channels-last layout XLA tiles best onto the MXU.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Any = None  # computation dtype (params stay float32)
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = [(p, p) for p in self.padding]
        kw = {}
        if self.kernel_init is not None:
            kw["kernel_init"] = self.kernel_init
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
            **kw,
        )(x)


class ConvTranspose3dTorch(nn.Module):
    """Transposed 3D conv matching ``nn.ConvTranspose3d(k=4, s=2, p=1)``
    used by the family-B decoder (``causal_anomaly_detection1.py:156-179``)."""

    features: int
    kernel: Tuple[int, int, int] = (4, 4, 4)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch output size = (in-1)*s - 2p + k ; lax transposed conv with
        # padding ((k-1-p, k-1-p),...) reproduces it for these shapes.
        pad = [(self.kernel[i] - 1 - self.padding[i],) * 2 for i in range(3)]
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pad,
            name="conv",
        )(x)


def _adaptive_slices(in_size: int, out_size: int) -> Sequence[Tuple[int, int]]:
    """torch AdaptiveAvgPool index ranges: [floor(i*in/out), ceil((i+1)*in/out))."""
    return [
        (math.floor(i * in_size / out_size), math.ceil((i + 1) * in_size / out_size))
        for i in range(out_size)
    ]


def adaptive_avg_pool3d(x: jnp.ndarray, out: Tuple[int, int, int]) -> jnp.ndarray:
    """Adaptive average pool over (B, T, H, W, C) matching torch semantics,
    including output sizes *larger* than input (duplicated windows), which the
    reference hits: pool (2,8,8)->(4,4,4) at ``avenue_training_script2.py:23``.

    Shapes are static, so the window arithmetic happens at trace time; when the
    output evenly divides the input this lowers to a single strided
    reduce-window, which XLA fuses with the surrounding conv stack.
    """
    b, t, h, w, c = x.shape
    ot, oh, ow = out
    if t % ot == 0 and h % oh == 0 and w % ow == 0:
        kt, kh, kw = t // ot, h // oh, w // ow
        y = x.reshape(b, ot, kt, oh, kh, ow, kw, c)
        return y.mean(axis=(2, 4, 6))
    # General path: gather per-axis window means (tiny static loops).
    def pool_axis(arr, axis, in_size, out_size):
        slices = _adaptive_slices(in_size, out_size)
        parts = [
            jax.lax.slice_in_dim(arr, s, e, axis=axis).mean(axis=axis, keepdims=True)
            for s, e in slices
        ]
        return jnp.concatenate(parts, axis=axis)

    y = pool_axis(x, 1, t, ot)
    y = pool_axis(y, 2, h, oh)
    y = pool_axis(y, 3, w, ow)
    return y


def adaptive_avg_pool2d(x: jnp.ndarray, out: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) adaptive average pool (family-A backbone,
    ``causal_anomaly_detection.py:125`` AdaptiveAvgPool2d((4, 6)))."""
    y = adaptive_avg_pool3d(x[:, None], (1, *out))
    return y[:, 0]


def max_pool3d(x: jnp.ndarray, kernel: Tuple[int, int, int],
               stride: Tuple[int, int, int] | None = None) -> jnp.ndarray:
    """Max pool over (B, T, H, W, C) matching ``nn.MaxPool3d`` (no padding)."""
    stride = stride or kernel
    return nn.max_pool(x, window_shape=kernel, strides=stride, padding="VALID")


class MLP(nn.Module):
    """Dense stack with ReLU between layers; optional final activation.

    Replaces the reference's many ``nn.Sequential(Linear, ReLU, ...)`` heads.
    """

    features: Sequence[int]
    final_activation: str | None = None  # None | 'sigmoid' | 'softmax' | 'tanh' | 'relu'
    dropout: float = 0.0
    dropout_after: Tuple[int, ...] = ()  # layer indices followed by dropout
    # optional per-position rates aligned with dropout_after (the reference
    # heads mix rates, e.g. Dropout(0.3) then Dropout(0.2) in
    # causal_anomaly_detection.py:166-175); falls back to `dropout`
    dropout_rates: Tuple[float, ...] | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        n = len(self.features)
        rate = {idx: (self.dropout_rates[j] if self.dropout_rates is not None
                      else self.dropout)
                for j, idx in enumerate(self.dropout_after)}
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}")(x)
            if i < n - 1:
                x = nn.relu(x)
            if rate.get(i, 0.0) > 0:
                x = nn.Dropout(rate[i], deterministic=deterministic)(x)
        if self.final_activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.final_activation == "softmax":
            x = nn.softmax(x, axis=-1)
        elif self.final_activation == "tanh":
            x = nn.tanh(x)
        elif self.final_activation == "relu":
            x = nn.relu(x)
        return x


class MaskedBatchNorm(nn.Module):
    """Drop-in ``nn.BatchNorm`` whose train-mode batch statistics can exclude
    rows masked out by `valid` (DP remainder padding), making padded batches
    gradient-identical to their unpadded counterparts even through BN.

    Same parameter/collection names as ``nn.BatchNorm`` ("scale"/"bias" in
    params, "mean"/"var" in batch_stats), and bit-identical math when
    `valid is None` (mean-of-squares fast variance, running update
    ``m*ra + (1-m)*batch``), so torch checkpoint import maps unchanged.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            if valid is None:
                mean = jnp.mean(x, axes)
                mean2 = jnp.mean(x * x, axes)
            else:
                w = valid.reshape((-1,) + (1,) * (x.ndim - 1))
                cnt = jnp.maximum(valid.sum() * (x[..., 0].size / x.shape[0]),
                                  1.0)
                mean = jnp.sum(x * w, axes) / cnt
                mean2 = jnp.sum(x * x * w, axes) / cnt
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x - mean) * mul + bias


class BatchNorm(nn.Module):
    """Torch-default BatchNorm (eps 1e-5, momentum 0.1) over the last axis.

    The reference uses BatchNorm2d/3d throughout families A/B/C; running
    statistics live in the 'batch_stats' collection like standard flax.
    """

    momentum: float = 0.9  # flax convention: running = m*running + (1-m)*batch
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
        )(x)
