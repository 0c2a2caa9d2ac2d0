"""Temporal attention: jnp path numerics + model integration (the flash
kernel path itself is TPU-only; validated on-chip by bench/TPU drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import FamilyBConfig
from cvad_tpu.models import MemoryVideoAutoEncoder
from cvad_tpu.models.family_b import init_memory
from cvad_tpu.ops.attention import (TemporalAttentionEncoder, flash_eligible,
                                    multi_head_attention)


def _qkv(b=2, h=2, t=16, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
                 for _ in range(3))


def test_attention_matches_manual_softmax():
    q, k, v = _qkv()
    out = multi_head_attention(q, k, v, use_flash=False)
    scale = q.shape[-1] ** -0.5
    ref = jnp.einsum("bhqk,bhkd->bhqd",
                     jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale,
                                    axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_causal_masking():
    q, k, v = _qkv(t=8)
    out = multi_head_attention(q, k, v, causal=True, use_flash=False)
    # position 0 attends only to itself -> equals v[..., 0, :]
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               np.asarray(v[:, :, 0]), rtol=1e-5, atol=1e-6)


def test_flash_eligibility_rules():
    # CPU default backend in tests -> never eligible; shape rules still apply
    assert not flash_eligible(8, 64)
    assert not flash_eligible(256, 64)  # head dim not 128-multiple


def test_temporal_encoder_shapes(rng):
    enc = TemporalAttentionEncoder(num_layers=1, num_heads=4)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16, 64)),
                    jnp.float32)
    v = enc.init(rng, z)
    out = enc.apply(v, z)
    assert out.shape == (3, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_family_b_attention_variant(rng):
    cfg = FamilyBConfig(temporal_encoder="attention", attn_layers=1)
    m = MemoryVideoAutoEncoder(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 8, 64, 64, 1)),
                    jnp.float32)
    mem = init_memory(cfg.memory_size, cfg.latent_dim)
    v = m.init(rng, x, mem)
    out = m.apply(v, x, mem)
    assert out["reconstructed"].shape == x.shape
    assert out["sequence_feature"].shape == (2, 64)
    # long-window forward works (T=64 frames, far beyond the reference's 8)
    x_long = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 64, 1)), jnp.float32)
    out_long = m.apply(v, x_long, mem)
    assert out_long["sequence_feature"].shape == (1, 64)
