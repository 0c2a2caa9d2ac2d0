"""Temporal-sharding equivalence: the halo-exchange sharded forward must be
numerically identical to the unsharded model on the same weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import FamilyDConfig
from cvad_tpu.models import CausalAnomalyDetector
from cvad_tpu.parallel.temporal import (temporal_sharded_forward,
                                        temporal_shards_valid)
from cvad_tpu.runtime.mesh import create_mesh


@pytest.mark.parametrize("mesh_shape,t", [((2, 4), 16), ((4, 2), 16),
                                          ((1, 8), 32)])
def test_sharded_forward_matches_unsharded(cpu_devices, mesh_shape, t):
    nd, nt = mesh_shape
    mesh = create_mesh(data_axis=nd, temporal_axis=nt,
                       devices=cpu_devices[:nd * nt])
    cfg = FamilyDConfig()
    model = CausalAnomalyDetector(cfg)
    clips = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (nd * 2, t, 32, 32, 3)),
        jnp.float32)
    variables = model.init(jax.random.key(0), clips)

    ref_s, ref_adj, ref_f = model.apply(variables, clips, deterministic=True)
    s, adj, f = temporal_sharded_forward(variables, clips, mesh, cfg)

    np.testing.assert_allclose(np.asarray(f), np.asarray(ref_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adj), np.asarray(ref_adj),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s).reshape(-1),
                               np.asarray(ref_s).reshape(-1),
                               rtol=1e-4, atol=1e-5)


def test_shard_validity():
    assert temporal_shards_valid(16, 2)
    assert temporal_shards_valid(32, 4)
    assert not temporal_shards_valid(16, 3)
    assert not temporal_shards_valid(8, 4)  # local T=2 breaks stride-2 convs


def test_invalid_shape_raises(cpu_devices):
    mesh = create_mesh(data_axis=2, temporal_axis=4, devices=cpu_devices)
    model = CausalAnomalyDetector()
    clips = jnp.ones((2, 8, 16, 16, 3))  # T=8 over 4 time shards -> local 2
    v = model.init(jax.random.key(0), clips)
    with pytest.raises(ValueError):
        temporal_sharded_forward(v, clips, mesh)


def test_sharded_gradients_match_unsharded(cpu_devices):
    """Training through the temporally-sharded forward: grads match the
    unsharded model (shard_map differentiates through halos/collectives)."""
    from cvad_tpu.parallel.temporal import temporal_sharded_forward

    mesh = create_mesh(data_axis=2, temporal_axis=4, devices=cpu_devices)
    cfg = FamilyDConfig()
    model = CausalAnomalyDetector(cfg)
    clips = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (4, 16, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), clips)

    def loss_ref(params):
        s, _, _ = model.apply({"params": params}, clips, deterministic=True)
        return jnp.sum(s ** 2)

    def loss_sharded(params):
        s, _, _ = temporal_sharded_forward({"params": params}, clips, mesh, cfg)
        return jnp.sum(s ** 2)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_sh = jax.grad(loss_sharded)(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_trainer_long_window_t64(cpu_devices, tmp_path):
    """The north-star long-window config: N train steps at T=64 on a
    (2 data x 4 time) mesh — each device holds only 16 of the 64 frames —
    with per-epoch loss equal to the unsharded (1x1 mesh) steps.  This is
    the temporal-scaling capability the reference lacks entirely (it only
    ever slides 8/16-frame windows on the host,
    ``causal_anomaly_detection.py:57``)."""
    from cvad_tpu.config import preset
    from cvad_tpu.train.engine import Trainer

    cfg = preset("family_d")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=4, frame_size=(16, 16), clip_len=64),
        train=cfg.train.replace(num_epochs=1, eval_every=1, save_interval=0,
                                log_every=10**9, out_dir=str(tmp_path)))
    rng = np.random.default_rng(1)
    batches = [{"clips": rng.uniform(0, 1, (4, 64, 16, 16, 3)).astype(np.float32),
                "labels": np.zeros(4, np.float32)} for _ in range(3)]

    results = {}
    for name, (d, t) in (("unsharded", (1, 1)), ("dp_x_sp", (2, 4))):
        mesh = create_mesh(data_axis=d, temporal_axis=t,
                           devices=cpu_devices[:d * t])
        tr = Trainer(cfg.replace(train=cfg.train.replace(
            out_dir=str(tmp_path / name))), mesh=mesh)
        tr.init_state(batches[0])
        avg = tr.train_epoch(batches, epoch=1)
        results[name] = (avg["loss"], jax.device_get(tr.state.params))

    assert np.isfinite(results["unsharded"][0])
    np.testing.assert_allclose(results["dp_x_sp"][0], results["unsharded"][0],
                               rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(results["unsharded"][1]),
                    jax.tree_util.tree_leaves(results["dp_x_sp"][1])):
        # atol 1e-5: Adam's sqrt(v) normalization amplifies f32
        # accumulation-order noise on near-zero gradient entries
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_trainer_with_time_axis_matches_data_only(cpu_devices, tmp_path):
    """End-to-end training on a (2 data x 4 time) mesh equals a (2 data)
    mesh: GSPMD's automatic temporal partitioning does not change numerics."""
    from cvad_tpu.config import preset
    from cvad_tpu.train.engine import Trainer

    cfg = preset("family_d")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=4, frame_size=(16, 16), clip_len=16),
        train=cfg.train.replace(num_epochs=1, eval_every=1, save_interval=0,
                                log_every=10**9, out_dir=str(tmp_path)))
    rng = np.random.default_rng(0)
    batches = [{"clips": rng.uniform(0, 1, (4, 16, 16, 16, 3)).astype(np.float32),
                "labels": np.zeros(4, np.float32)} for _ in range(2)]

    params = {}
    for name, (d, t) in (("data_only", (2, 1)), ("data_time", (2, 4))):
        mesh = create_mesh(data_axis=d, temporal_axis=t,
                           devices=cpu_devices[:d * t])
        tr = Trainer(cfg.replace(train=cfg.train.replace(
            out_dir=str(tmp_path / name))), mesh=mesh)
        tr.init_state(batches[0])
        tr.train_epoch(batches, epoch=1)
        params[name] = jax.device_get(tr.state.params)

    for a, b in zip(jax.tree_util.tree_leaves(params["data_only"]),
                    jax.tree_util.tree_leaves(params["data_time"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
