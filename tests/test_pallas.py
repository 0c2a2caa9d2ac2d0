"""Pallas kernels vs jnp references (interpreter mode on CPU; the same
kernels compile on the real chip — exercised by bench/TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.models.family_b import (MemoryBankState, init_memory,
                                      memory_anomaly_score, update_memory)
from cvad_tpu.ops.pallas_kernels import (memory_min_cosine_distance,
                                         pairwise_l1_mean)


@pytest.mark.parametrize("b,m,d", [(4, 32, 64), (7, 500, 64), (16, 512, 128)])
def test_memory_kernel_matches_xla(b, m, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    mem = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    fill = jnp.asarray(m // 2, jnp.int32)
    ref = memory_min_cosine_distance(q, mem, fill, use_pallas=False)
    got = memory_min_cosine_distance(q, mem, fill, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_memory_kernel_respects_fill():
    q = jnp.ones((2, 8))
    mem = jnp.concatenate([jnp.ones((4, 8)), -jnp.ones((4, 8))])
    # fill=4: only the identical rows are searchable -> distance 0
    d0 = memory_min_cosine_distance(q, mem, jnp.asarray(4), interpret=True)
    assert float(d0.max()) < 1e-6
    # the anti-parallel rows, were they visible, would still not beat min=0,
    # but with memory reversed and fill=4 only anti-parallel rows are seen
    d1 = memory_min_cosine_distance(q, mem[::-1], jnp.asarray(4),
                                    interpret=True)
    assert float(d1.min()) > 0.99  # distance (1-(-1))/2 = 1


def test_memory_kernel_agrees_with_model_score():
    rng = np.random.default_rng(1)
    mem = init_memory(64, 32)
    feats = jnp.asarray(rng.normal(size=(20, 32)), jnp.float32)
    mem = update_memory(mem, feats)
    q = jnp.asarray(rng.normal(size=(5, 32)), jnp.float32)
    ref = memory_anomaly_score(mem, q, min_fill=10)
    got = memory_min_cosine_distance(q, mem.memory, mem.fill, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b,n", [(6, 256), (12, 36), (9, 300)])
def test_pairwise_kernel_matches_xla(b, n):
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=b) > 0.4, jnp.float32)
    ref_avg, ref_n = pairwise_l1_mean(flat, mask, use_pallas=False)
    got_avg, got_n = pairwise_l1_mean(flat, mask, interpret=True)
    assert float(ref_n) == float(got_n)
    np.testing.assert_allclose(float(got_avg), float(ref_avg),
                               rtol=1e-5, atol=1e-7)


def test_pairwise_kernel_no_pairs():
    flat = jnp.ones((4, 16))
    avg, n = pairwise_l1_mean(flat, jnp.zeros(4), interpret=True)
    assert float(avg) == 0.0 and float(n) == 0.0
    avg1, n1 = pairwise_l1_mean(flat, jnp.array([1.0, 0, 0, 0]),
                                interpret=True)
    assert float(avg1) == 0.0 and float(n1) == 0.0


def test_pairwise_matches_loss_consistency_term():
    """The kernel reproduces the loss module's vectorized consistency core."""
    from cvad_tpu.config import LossConfig
    from cvad_tpu.ops.losses import improved_loss

    rng = np.random.default_rng(3)
    b = 8
    adj = jnp.asarray(rng.uniform(0, 1, (b, 16, 16)), jnp.float32)
    targets = jnp.asarray((rng.uniform(size=b) > 0.5), jnp.float32)
    scores = jnp.full((b, 1), 0.5)
    cfg = LossConfig()
    _, comps = improved_loss(scores, adj, targets, cfg)
    flat = adj.reshape(b, -1)
    avg, n_pairs = pairwise_l1_mean(flat, 1.0 - targets, interpret=True)
    expect = jnp.where(n_pairs > 0,
                       jnp.abs(avg - cfg.consistency_target), 0.0)
    np.testing.assert_allclose(float(comps["consistency_loss"]),
                               float(expect), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("b,t,h,w,cin,cout", [
    (2, 8, 16, 16, 3, 16),   # family-D conv1 shape family
    (1, 4, 8, 12, 2, 8),     # odd sizes exercise the block/grid math
])
def test_tfold_conv1_kernel_matches_xla(b, t, h, w, cin, cout):
    """The fused Pallas folded-conv1 (ops/pallas_conv.py) computes exactly
    the XLA folded conv — same im2col contraction, one MXU matmul."""
    from cvad_tpu.ops.pallas_conv import (fold_input, fold_kernel,
                                          tfold_conv1_matmul)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, t, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)), jnp.float32)
    xf, wd = fold_input(x), fold_kernel(k, t)
    ref = tfold_conv1_matmul(xf, wd, use_pallas=False)
    got = tfold_conv1_matmul(xf, wd, interpret=True)
    assert got.shape == (b, h // 2, w // 2, t * cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tfold_conv1_kernel_grad_matches():
    """custom_vjp backward (XLA folded expressions) equals autodiff through
    the reference lowering, for both operands."""
    from cvad_tpu.ops.pallas_conv import (fold_input, fold_kernel,
                                          tfold_conv1_matmul)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)), jnp.float32)
    xf, wd = fold_input(x), fold_kernel(k, 4)

    def loss(fn):
        return lambda xf, wd: (fn(xf, wd) ** 2).sum()

    g_ref = jax.grad(loss(lambda a, b: tfold_conv1_matmul(
        a, b, use_pallas=False)), argnums=(0, 1))(xf, wd)
    g_got = jax.grad(loss(lambda a, b: tfold_conv1_matmul(
        a, b, interpret=True)), argnums=(0, 1))(xf, wd)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-4)


def test_tfold_pallas_mode_in_model():
    """conv1_mode='tfold_pallas' is the same function as native (dispatch
    resolves to XLA off-TPU; the kernel itself is covered above)."""
    from cvad_tpu.models.layers import Conv3dTorch

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16, 3)), jnp.float32)
    native = Conv3dTorch(16, stride=(1, 2, 2), mode="native")
    pallas = Conv3dTorch(16, stride=(1, 2, 2), mode="tfold_pallas")
    params = native.init(jax.random.key(0), x)
    y0 = native.apply(params, x)
    y1 = pallas.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)
