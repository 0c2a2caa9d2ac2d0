"""Temporal attention: fused flash-attention path for long clip windows.

The reference's temporal encoders are an LSTM (``causal_anomaly_detection1.py
:182-188``) and a GRU (``causal_anomaly_detection.py:284``) over 8-16 frames.
For the "larger temporal windows" configuration (BASELINE.json config 5) the
framework offers a temporal transformer whose attention runs on the official
Pallas TPU flash-attention kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) when shapes qualify —
O(T) memory via online softmax, MXU-tiled QK^T/PV — and a plain jnp softmax
attention otherwise (short windows, CPU, tests).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# flash kernel tiling constraints (guide §6: block sizes divide T; lane=128)
_FLASH_MIN_T = 128
_FLASH_HEAD_DIM = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def flash_eligible(t: int, head_dim: int) -> bool:
    return (_on_tpu() and t >= _FLASH_MIN_T and t % _FLASH_MIN_T == 0
            and head_dim % _FLASH_HEAD_DIM == 0)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                         causal: bool = False,
                         use_flash: Optional[bool] = None) -> jnp.ndarray:
    """Attention over (B, H, T, Dh) tensors; flash kernel when eligible."""
    t, dh = q.shape[2], q.shape[3]
    scale = dh ** -0.5
    if use_flash is None:
        use_flash = flash_eligible(t, dh)
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        return flash_attention(q, k, v, causal=causal, sm_scale=scale)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(mask, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


class TemporalAttentionBlock(nn.Module):
    """Pre-LN transformer block over frame latents (B, T, D)."""

    num_heads: int = 4
    mlp_ratio: int = 4
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        assert d % h == 0, f"dim {d} not divisible by heads {h}"

        y = nn.LayerNorm(name="ln1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return jnp.transpose(z.reshape(b, t, h, dh), (0, 2, 1, 3))

        out = multi_head_attention(heads(q), heads(k), heads(v),
                                   causal=self.causal)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, d)
        x = x + nn.Dense(d, name="proj")(out)

        y = nn.LayerNorm(name="ln2")(x)
        y = nn.gelu(nn.Dense(self.mlp_ratio * d, name="mlp_0")(y))
        return x + nn.Dense(d, name="mlp_2")(y)


class TemporalAttentionEncoder(nn.Module):
    """Drop-in temporal encoder: (B, T, D) frame latents -> (B, D) sequence
    feature (mean-pooled), replacing the reference's LSTM final-hidden for
    long windows.  With temporal sharding (cvad_tpu.parallel) plus the flash
    kernel, window lengths far beyond the reference's 8-16 frames are
    practical on TPU."""

    num_layers: int = 2
    num_heads: int = 4
    max_len: int = 4096
    causal: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        b, t, d = z.shape
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, d))
        x = z + pos[:t][None]
        for i in range(self.num_layers):
            x = TemporalAttentionBlock(self.num_heads, causal=self.causal,
                                       name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_out")(x)
        return x.mean(axis=1)
