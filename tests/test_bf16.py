"""bf16 compute-path equivalence: same params, bf16 activations, f32 outputs.

Every family's `dtype='bfloat16'` knob keeps params/BN statistics in float32
and casts scores back to float32 before the loss (the contract documented on
each FamilyXConfig.dtype).  These tests apply the *float32-initialized*
variables through the bf16 module and bound the drift — guarding both the
dtype plumbing (a missed cast shows up as a dtype assertion) and numeric
sanity (a wrong-precision accumulation shows up as drift far above bf16 eps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import (ExperimentConfig, FamilyAConfig, FamilyBConfig,
                             FamilyCConfig, FamilyDConfig)
from cvad_tpu.models import build_model


def _forward_pair(cfg, x, rng, **apply_kw):
    m32 = build_model(cfg)
    m16 = build_model(cfg.replace(dtype="bfloat16"))
    v = m32.init(rng, x, **apply_kw.get("init_kw", {}))
    kw = {k: w for k, w in apply_kw.items() if k != "init_kw"}
    return m32.apply(v, x, **kw), m16.apply(v, x, **kw)


@pytest.mark.slow
def test_family_a_bf16_forward_close(rng):
    cfg = FamilyAConfig(frame_hw=(48, 72))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 8, 48, 72, 1)),
                    jnp.float32)
    out32, out16 = _forward_pair(cfg, x, rng, train=False, deterministic=True)
    for k in ("anomaly_scores", "causal_anomaly_scores", "kl_losses"):
        assert out16[k].dtype == jnp.float32, k
        np.testing.assert_allclose(np.asarray(out32[k]), np.asarray(out16[k]),
                                   atol=0.05)
    assert out16["direct_predictions"].dtype == jnp.float32


@pytest.mark.slow
def test_family_a_task_flips_dtype():
    ec = ExperimentConfig(model=FamilyAConfig())
    ec = ec.replace(train=ec.train.replace(dtype="bfloat16"))
    from cvad_tpu.train.tasks import build_task

    task = build_task(ec)
    assert task.model.cfg.dtype == "bfloat16"
    # params stay f32: the init contract all families share
    x = jnp.zeros((1, 8, 48, 72, 1), jnp.float32)
    st = task.init_state(jax.random.PRNGKey(0),
                         {"clips": x, "labels": jnp.zeros((1,), jnp.int32)})
    leaf_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(st.params)}
    assert leaf_dtypes == {jnp.dtype(jnp.float32)}


@pytest.mark.parametrize("cfg,shape", [
    (FamilyDConfig(), (2, 8, 64, 64, 3)),
    (FamilyCConfig(), (2, 8, 64, 64, 3)),
])
def test_scorer_families_bf16_forward_close(cfg, shape, rng):
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, shape), jnp.float32)
    out32, out16 = _forward_pair(cfg, x, rng)
    s32 = out32[0] if isinstance(out32, tuple) else out32
    s16 = out16[0] if isinstance(out16, tuple) else out16
    assert s16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(s32), np.asarray(s16), atol=0.05)


def test_family_d_production_lowering_on_shipped_checkpoint():
    """The full production serving chain on the REAL weights: shipped
    `best_improved_model.pth` -> bulk scorer with the lowering TPU actually
    runs (folded conv stack + tfold conv1 + bf16 compute, uint8 ingest) ==
    the f32 native-stack scores (themselves 2e-4 of torch,
    tests/test_torch_parity.py).  Random-init closeness (tests above) can't
    catch a lowering bug that only bites trained weight magnitudes; this
    composes checkpoint + fold + dtype + u8 path in one assertion.
    Measured drift at this size: scores max|d| 3.6e-4, adjacency 4.9e-3,
    edge agreement 1.0."""
    import os

    import pytest as _pytest

    from cvad_tpu.evaluation.scoring import (make_family_d_bulk_score_fn,
                                             make_family_d_score_fn)
    from cvad_tpu.runtime.checkpoint import import_torch_family_d

    ckpt = "/root/reference/best_improved_model.pth"
    if not os.path.exists(ckpt):
        _pytest.skip("shipped reference checkpoint unavailable")
    v = import_torch_family_d(ckpt)
    u8 = np.random.default_rng(7).integers(0, 256, (32, 8, 64, 64, 3),
                                           dtype=np.uint8)
    ref = make_family_d_score_fn(
        v, model=build_model(FamilyDConfig()))
    s_ref, adj_ref = ref((u8 / 255.0).astype(np.float32))
    prod = make_family_d_bulk_score_fn(
        v, model=build_model(FamilyDConfig(dtype="bfloat16",
                                           conv1_mode="tfold",
                                           conv_stack="folded")),
        batch=16, chunks_per_call=2)
    s_prod, adj_prod = prod(u8)
    np.testing.assert_allclose(s_prod, s_ref, atol=2e-3)
    np.testing.assert_allclose(adj_prod, adj_ref, atol=2e-2)
    assert ((adj_prod > 0.1) == (adj_ref > 0.1)).mean() >= 0.999


def test_family_b_bf16_forward_close(rng):
    from cvad_tpu.models.family_b import init_memory

    cfg = FamilyBConfig()
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2, 8, 64, 64, 3)),
                    jnp.float32)
    mem = init_memory(cfg.memory_size, cfg.latent_dim)
    m32 = build_model(cfg)
    m16 = build_model(cfg.replace(dtype="bfloat16"))
    v = m32.init(rng, x, mem)
    out32 = m32.apply(v, x, mem)
    out16 = m16.apply(v, x, mem)
    assert out16["reconstructed"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out32["reconstructed"]),
                               np.asarray(out16["reconstructed"]), atol=0.05)
