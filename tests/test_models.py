"""Forward-pass shape/range tests for all five model families.

Formalizes the reference's inline smoke checks
(``minicausal_vad_complete3.py:458-501`` test_simple_model: build, forward on
random input, assert shape/range/finiteness) as a real suite, per SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import (FamilyAConfig, FamilyBConfig, FamilyCConfig,
                             FamilyDConfig, FamilyEConfig)
from cvad_tpu.models import (BBoxVizDetector, CausalAnomalyDetector,
                             CausalPipelineDetector, MemoryVideoAutoEncoder,
                             Simple3DCNNDetector, build_model)
from cvad_tpu.models.family_b import (init_memory, memory_anomaly_score,
                                      update_memory)


def _clips(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape),
                       jnp.float32)


def test_family_d_forward(rng):
    m = CausalAnomalyDetector()
    x = _clips((2, 8, 64, 64, 3))
    v = m.init(rng, x)
    scores, adj, feats = m.apply(v, x)
    assert scores.shape == (2, 1)
    assert adj.shape == (2, 16, 16)
    assert feats.shape == (2, 16)
    assert jnp.all((scores >= 0) & (scores <= 1))
    assert jnp.all((adj >= 0) & (adj <= 1))
    # no self-loops (avenue_training_script2.py:57-58)
    assert jnp.allclose(jnp.diagonal(adj, axis1=1, axis2=2), 0.0)
    assert np.isfinite(np.asarray(scores)).all()


def test_family_d_param_count(rng):
    # exact parity with the shipped checkpoint: 188,849 params (BASELINE.md)
    m = CausalAnomalyDetector()
    v = m.init(rng, _clips((1, 8, 64, 64, 3)))
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 188_849


def test_family_c_forward(rng):
    m = Simple3DCNNDetector()
    x = _clips((2, 8, 64, 64, 1))
    v = m.init(rng, x, train=False)
    s = m.apply(v, x)
    assert s.shape == (2, 1)
    assert jnp.all((s >= 0) & (s <= 1))


def test_family_c_batchnorm_updates(rng):
    m = Simple3DCNNDetector()
    x = _clips((2, 8, 32, 32, 1))
    v = m.init(rng, x, train=True)
    _, mutated = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": rng})
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_family_b_forward_and_memory(rng):
    m = MemoryVideoAutoEncoder()
    x = _clips((3, 8, 64, 64, 1))
    mem = init_memory(500, 64)
    v = m.init(rng, x, mem)
    out = m.apply(v, x, mem)
    assert out["reconstructed"].shape == x.shape
    assert out["sequence_feature"].shape == (3, 64)
    assert out["frame_features"].shape == (3, 8, 64)
    # memory below min fill -> zero scores (causal_anomaly_detection1.py:266-268)
    assert jnp.allclose(out["anomaly_score"], 0.0)

    mem = update_memory(mem, out["sequence_feature"])
    assert int(mem.fill) == 3 and int(mem.ptr) == 3
    # fill past threshold: scores become meaningful and bounded
    for i in range(4):
        mem = update_memory(mem, out["sequence_feature"] + 0.1 * i)
    assert int(mem.fill) == 15
    s = memory_anomaly_score(mem, out["sequence_feature"])
    assert s.shape == (3,)
    assert jnp.all((s >= 0) & (s <= 1))
    # exact features now in memory -> near-zero distance
    assert float(s.max()) < 1e-3


def test_family_b_memory_wraparound():
    mem = init_memory(8, 4)
    feats = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    mem = update_memory(mem, feats)
    assert int(mem.ptr) == 6 and int(mem.fill) == 6
    mem = update_memory(mem, feats)  # wraps: writes slots 6,7,0,1,2,3
    assert int(mem.ptr) == 4 and int(mem.fill) == 8
    np.testing.assert_allclose(np.asarray(mem.memory[6]), np.asarray(feats[0]))
    np.testing.assert_allclose(np.asarray(mem.memory[0]), np.asarray(feats[2]))


def test_family_a_forward(rng):
    cfg = FamilyAConfig(frame_hw=(48, 64))
    m = CausalPipelineDetector(cfg)
    x = _clips((2, 4, 48, 64, 1))
    v = m.init(rng, x)
    out = m.apply(v, x, rng=jax.random.key(1))
    assert out["anomaly_scores"].shape == (2,)
    assert out["adjacency_matrices"].shape == (2, 6, 6)
    assert out["detections"].shape == (2, 4, 5, 4)
    assert out["detection_mask"].shape == (2, 4, 5)
    assert out["kl_losses"].shape == (2,)
    assert out["direct_predictions"].shape == (2, 2)
    np.testing.assert_allclose(
        np.asarray(out["direct_predictions"]).sum(-1), 1.0, rtol=1e-5)
    # every frame has at least one valid detection (fallback-box guarantee,
    # causal_anomaly_detection.py:221-226)
    assert bool(out["detection_mask"].any(axis=-1).all())
    # adjacency diagonal zeroed (:390)
    assert jnp.allclose(jnp.diagonal(out["adjacency_matrices"], axis1=1, axis2=2), 0.0)
    # scores are the reference blend (:574)
    expect = 0.6 * out["causal_anomaly_scores"] + 0.4 * out["direct_predictions"][:, 1]
    np.testing.assert_allclose(np.asarray(out["anomaly_scores"]),
                               np.asarray(expect), rtol=1e-5)


def test_family_e_forward(rng):
    m = BBoxVizDetector()
    x = _clips((2, 8, 64, 64, 3))
    v = m.init(rng, x)
    s, adj, feats = m.apply(v, x)
    assert s.shape == (2,)
    assert adj.shape == (2, 16, 16)
    assert feats.shape == (2, 1024)


def test_registry_builds_all():
    for cfg in (FamilyAConfig(frame_hw=(48, 64)), FamilyBConfig(),
                FamilyCConfig(), FamilyDConfig(), FamilyEConfig()):
        m = build_model(cfg)
        assert m is not None


@pytest.mark.parametrize("mode", ["tfold", "tfold2", "tfold3", "tpair",
                                  "s2d", "cpad"])
def test_conv1_mode_exact(rng, mode):
    """Every conv1 relowering is the same function as the native conv: same
    parameter tree, same forward, same gradients (up to f32 accumulation
    order).  These modes exist purely to repack conv1's degenerate im2col
    matmul (K=81, N=16) onto fuller MXU tiles — see models/layers.py."""
    from cvad_tpu.models.layers import Conv3dTorch

    x = _clips((2, 8, 16, 16, 3), seed=3)
    native = Conv3dTorch(16, stride=(1, 2, 2), mode="native")
    other = Conv3dTorch(16, stride=(1, 2, 2), mode=mode)
    params = native.init(rng, x)
    y0 = native.apply(params, x)
    y1 = other.apply(params, x)  # identical tree -> params interchange
    assert y1.shape == y0.shape == (2, 8, 8, 8, 16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-6, atol=2e-6)

    def loss(fn, p):
        return (fn.apply(p, x) ** 2).sum()

    g0 = jax.grad(lambda p: loss(native, p))(params)
    g1 = jax.grad(lambda p: loss(other, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-5)


def test_conv1_mode_integer_bitexact(rng):
    """On small-integer inputs (where every partial sum is exactly
    representable) the relowerings are bit-identical to native — the zero
    blocks in the packed kernels are structural, not approximate."""
    from cvad_tpu.models.layers import Conv3dTorch

    r = np.random.default_rng(0)
    x = jnp.asarray(r.integers(0, 4, (1, 8, 16, 16, 3)), jnp.float32)
    native = Conv3dTorch(16, stride=(1, 2, 2), mode="native")
    params = native.init(rng, x)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.integers(-3, 4, p.shape), jnp.float32), params)
    y0 = np.asarray(native.apply(params, x))
    for mode in ("tfold", "tpair", "s2d", "cpad"):
        y1 = np.asarray(Conv3dTorch(16, stride=(1, 2, 2), mode=mode)
                        .apply(params, x))
        np.testing.assert_array_equal(y1, y0, err_msg=mode)


def test_family_d_param_count_all_conv1_modes(rng):
    """conv1 relowerings must not change the parameter tree: the flagship
    188,849 count (avenue_training_script2.py best_improved_model.pth) holds
    for every mode, and torch checkpoint import stays valid."""
    x = _clips((1, 8, 64, 64, 3))
    for mode in ("native", "tfold", "tpair"):
        m = CausalAnomalyDetector(FamilyDConfig(conv1_mode=mode))
        v = m.init(rng, x)
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v))
        assert n == 188_849, (mode, n)


def test_folded_stack_exact(rng):
    """conv_stack='folded' (transpose-free T-folded conv chain) is the same
    function as the default stack: same params, same outputs, same grads."""
    x = _clips((2, 8, 64, 64, 3), seed=5)
    m0 = CausalAnomalyDetector(FamilyDConfig(conv_stack="ndhwc",
                                             conv1_mode="native"))
    m1 = CausalAnomalyDetector(FamilyDConfig(conv_stack="folded"))
    v = m0.init(rng, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m1.init(rng, x))
    s0, adj0, f0 = m0.apply(v, x)
    s1, adj1, f1 = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(adj1), np.asarray(adj0),
                               rtol=1e-5, atol=1e-6)

    def loss(m, p):
        s, adj, feats = m.apply(p, x)
        return s.sum() + (adj * adj).sum() + jnp.abs(feats).sum()

    g0 = jax.grad(lambda p: loss(m0, p))(v)
    g1 = jax.grad(lambda p: loss(m1, p))(v)
    for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert k0 == k1
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(k0))


def test_tfold_grouped_long_window_exact(rng):
    """Long-window T-fold: T=16 with cout=16 exceeds the 128-lane budget,
    so the fold runs group-wise (windows of g=8 with 2-tap halos) — must be
    the same function as native, in both unfold and folded-output layouts."""
    from cvad_tpu.models.layers import Conv3dTorch
    from cvad_tpu.ops.pallas_conv import fold_group_size

    assert fold_group_size(16, 16) == 8
    assert fold_group_size(8, 16) == 8
    assert fold_group_size(64, 16) == 8

    x = _clips((2, 16, 16, 16, 3), seed=7)
    native = Conv3dTorch(16, stride=(1, 2, 2), mode="native")
    tfold = Conv3dTorch(16, stride=(1, 2, 2), mode="tfold")
    params = native.init(rng, x)
    y0 = native.apply(params, x)
    y1 = tfold.apply(params, x)
    assert y1.shape == y0.shape == (2, 16, 8, 8, 16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-6, atol=2e-6)
    # folded-output layout path
    y2 = Conv3dTorch(16, stride=(1, 2, 2), mode="tfold",
                     unfold=False).apply(params, x)
    np.testing.assert_allclose(np.asarray(jnp.transpose(y2, (0, 3, 1, 2, 4))),
                               np.asarray(y0), rtol=2e-6, atol=2e-6)

    g0 = jax.grad(lambda p: (native.apply(p, x) ** 2).sum())(params)
    g1 = jax.grad(lambda p: (tfold.apply(p, x) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-5)


def test_family_d_folded_long_window_exact(rng):
    """Family-D with conv_stack='folded' at T=64: the gate falls back to the
    native stack (grouped folding traced slower than native for long
    windows) and the function stays identical to ndhwc/native."""
    x = _clips((1, 64, 16, 16, 3), seed=9)
    m0 = CausalAnomalyDetector(FamilyDConfig(conv_stack="ndhwc",
                                             conv1_mode="native"))
    m1 = CausalAnomalyDetector(FamilyDConfig(conv_stack="folded"))
    v = m0.init(rng, x)
    s0, adj0, _ = m0.apply(v, x)
    s1, adj1, _ = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(adj1), np.asarray(adj0),
                               rtol=1e-5, atol=1e-6)


def test_tfold_stride1_exact(rng):
    """Stride-1 T-fold (the family-C conv stack lowering) is the same
    function as the native conv: T*Cout <= 128 folds whole-T with full
    MXU lane occupancy at (T+2)/3 the MACs."""
    from cvad_tpu.models.layers import Conv3dTorch

    x = _clips((2, 8, 12, 12, 3), seed=11)
    native = Conv3dTorch(8, stride=(1, 1, 1), mode="native")
    tfold = Conv3dTorch(8, stride=(1, 1, 1), mode="tfold")
    params = native.init(rng, x)
    y0 = native.apply(params, x)
    y1 = tfold.apply(params, x)
    assert y1.shape == y0.shape == (2, 8, 12, 12, 8)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-6, atol=2e-6)
    g0 = jax.grad(lambda p: (native.apply(p, x) ** 2).sum())(params)
    g1 = jax.grad(lambda p: (tfold.apply(p, x) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-5)


def test_family_c_tfold_exact(rng):
    """Family-C with conv_mode='tfold' (all three stride-1 convs folded)
    matches conv_mode='native' on the same params, through BN/pool/head."""
    x = _clips((2, 8, 64, 64, 1), seed=12)
    m0 = Simple3DCNNDetector(FamilyCConfig(conv_mode="native"))
    m1 = Simple3DCNNDetector(FamilyCConfig(conv_mode="tfold"))
    v = m0.init(rng, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m1.init(rng, x, train=False))
    y0 = m0.apply(v, x)
    y1 = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)


def test_tfold_fuse_relu_exact(rng):
    """`fuse_relu=True` (bias+relu inside the folded (…, T*C) domain and on
    every fallthrough path) equals relu(conv(x)) exactly — the flag only
    moves the elementwise tail, never the math.  Measured SLOWER than the
    outer relu in the production family-D step (1740 vs 1226 us/step at
    B=256 — layout assignment materializes the relu mask), so nothing
    enables it in production; the flag + this test preserve the variant."""
    from cvad_tpu.models.layers import Conv3dTorch

    x = _clips((2, 8, 16, 16, 3), seed=9)
    for mode, kw in (("tfold", {"unfold": False}), ("tfold", {}),
                     ("native", {})):
        plain = Conv3dTorch(16, stride=(1, 2, 2), mode=mode, **kw)
        fused = Conv3dTorch(16, stride=(1, 2, 2), mode=mode, fuse_relu=True,
                            **kw)
        params = plain.init(rng, x)
        y0 = jax.nn.relu(plain.apply(params, x))
        y1 = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-6, atol=2e-6)


def test_halo_variants_reject_group_fold():
    """tfold2/tfold3 are whole-T-fold only: on a long-T shape that folds
    group-wise they must raise instead of silently computing the full-halo
    variant (which would invalidate any variant-vs-variant measurement)."""
    from cvad_tpu.models.layers import Conv3dTorch

    x = _clips((1, 16, 8, 8, 3), seed=11)
    for mode in ("tfold2", "tfold3"):
        m = Conv3dTorch(16, stride=(1, 2, 2), mode=mode)
        params = m.init(jax.random.PRNGKey(0), _clips((1, 8, 8, 8, 3)))
        with pytest.raises(ValueError, match="whole-T folds only"):
            m.apply(params, x)


def test_group_fold_gconv_exact(rng):
    """The single-grouped-conv long-T fold (group_impl='gconv') equals the
    native conv in forward and gradients, like every other relowering.
    Measured at T=64/B=32 bf16 on v5e: conv1 fwd+wgrad drop 3027 -> 790 us
    (the (M,270)x(270,128) per-group tiles work) but XLA layout assignment
    inserts ~4.5 ms of round-trip copies around the unfolded tensor, so the
    full step loses (7.2 vs 5.9 ms native) and the auto paths keep native
    for long T.  The variant + this test record the frontier for future
    compiler versions."""
    from cvad_tpu.models.layers import Conv3dTorch

    x = _clips((2, 16, 12, 12, 3), seed=13)
    native = Conv3dTorch(16, stride=(1, 2, 2), mode="native")
    gconv = Conv3dTorch(16, stride=(1, 2, 2), mode="tfold",
                        group_impl="gconv")
    params = native.init(rng, x)
    np.testing.assert_allclose(np.asarray(gconv.apply(params, x)),
                               np.asarray(native.apply(params, x)),
                               rtol=2e-6, atol=2e-6)

    def loss(fn, p):
        return (fn.apply(p, x) ** 2).sum()

    g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(native, p))(params))
    g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(gconv, p))(params))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)
