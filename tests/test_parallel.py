"""Data-parallel correctness on the 8-device CPU mesh.

The key invariant: a train step over a batch sharded across 8 devices must
produce the same parameter update as the same batch on 1 device (XLA's
gradient psum over the mesh == single-device gradient), so scaling out never
changes numerics (SURVEY.md §7 step 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import preset
from cvad_tpu.runtime.mesh import (batch_sharding, create_mesh,
                                   pad_to_multiple, replicated, shard_batch)
from cvad_tpu.train.tasks import build_task


def _cfg(tmp_path):
    cfg = preset("family_d")
    return cfg.replace(
        data=cfg.data.replace(batch_size=16, frame_size=(16, 16)),
        train=cfg.train.replace(out_dir=str(tmp_path)))


def _batch(n=16, hw=(16, 16)):
    rng = np.random.default_rng(0)
    return {
        "clips": rng.uniform(0, 1, (n, 8, *hw, 3)).astype(np.float32),
        "labels": np.zeros(n, np.float32),
    }


def test_dp_step_matches_single_device(tmp_path, cpu_devices):
    cfg = _cfg(tmp_path)
    task = build_task(cfg)
    host = _batch()
    state = task.init_state(jax.random.key(0), jax.tree.map(jnp.asarray, host))
    rng = jax.random.key(42)

    results = {}
    for n in (1, 8):
        mesh = create_mesh(devices=cpu_devices[:n])
        rep = replicated(mesh)
        st = jax.device_put(state, rep)
        step = jax.jit(task.train_step,
                       in_shardings=(rep, batch_sharding(mesh), rep))
        new_state, metrics = step(st, shard_batch(mesh, host),
                                  jax.device_put(rng, rep))
        results[n] = (jax.device_get(new_state.params),
                      float(jax.device_get(metrics["loss"])))

    p1, l1 = results[1]
    p8, l8 = results[8]
    assert abs(l1 - l8) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_batch_padding():
    batch = _batch(n=13)
    padded, valid = pad_to_multiple(batch, 8)
    assert valid == 13
    assert padded["clips"].shape[0] == 16
    np.testing.assert_array_equal(padded["clips"][13], batch["clips"][12])


def test_mesh_shapes(cpu_devices):
    m = create_mesh(devices=cpu_devices)
    assert m.shape == {"data": 8, "time": 1}
    m2 = create_mesh(temporal_axis=2, devices=cpu_devices)
    assert m2.shape == {"data": 4, "time": 2}


def test_eval_sharded_outputs(tmp_path, cpu_devices):
    cfg = _cfg(tmp_path)
    task = build_task(cfg)
    host = _batch()
    mesh = create_mesh(devices=cpu_devices)
    rep = replicated(mesh)
    state = jax.device_put(
        task.init_state(jax.random.key(0), jax.tree.map(jnp.asarray, host)), rep)
    ev = jax.jit(task.eval_step, in_shardings=(rep, batch_sharding(mesh)))
    out = jax.device_get(ev(state, shard_batch(mesh, host)))
    assert out["predictions"].shape == (16,)
    assert out["causal_graphs"].shape == (16, 16, 16)
    assert np.isfinite(out["predictions"]).all()


@pytest.mark.slow
def test_graft_entry_dryrun(cpu_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    # hermeticity (MULTICHIP_r01 failure mode): the dryrun must never create
    # an array on a non-CPU backend, even when an accelerator plugin is
    # registered — every live array it left behind must be CPU-resident
    for arr in jax.live_arrays():
        for d in arr.devices():
            assert d.platform == "cpu", f"dryrun leaked array to {d}"


def test_host_local_slice():
    from cvad_tpu.runtime.mesh import host_local_slice

    # single process: full range
    assert host_local_slice(100, 0, 1) == slice(0, 100)
    # 4 hosts: contiguous shards, last takes the remainder
    slices = [host_local_slice(103, i, 4) for i in range(4)]
    assert slices[0] == slice(0, 25)
    assert slices[3] == slice(75, 103)
    covered = sum(s.stop - s.start for s in slices)
    assert covered == 103


def test_family_b_dp_memory_state_matches(cpu_devices, tmp_path):
    """Hard part #2 (SURVEY §7): the functional memory bank under DP — an
    8-device step must produce the same params AND the same memory-bank
    state (pointer, fill, contents) as a single device."""
    import jax.numpy as jnp

    cfg = preset("family_b")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=8, frame_size=(64, 64), channels=1),
        optim=cfg.optim.replace(lr=1e-4),
        train=cfg.train.replace(out_dir=str(tmp_path)))
    task = build_task(cfg)
    rng = np.random.default_rng(0)
    host = {"clips": rng.uniform(0, 1, (8, 8, 64, 64, 1)).astype(np.float32),
            "labels": np.asarray([0, 0, 1, 0, 1, 0, 0, 0], np.float32)}
    state = task.init_state(jax.random.key(0), jax.tree.map(jnp.asarray, host))

    results = {}
    for n in (1, 8):
        mesh = create_mesh(devices=cpu_devices[:n])
        rep = replicated(mesh)
        st = jax.device_put(state, rep)
        step = jax.jit(task.train_step,
                       in_shardings=(rep, batch_sharding(mesh), rep))
        new_state, _ = step(st, shard_batch(mesh, host),
                            jax.device_put(jax.random.key(1), rep))
        results[n] = jax.device_get(new_state)

    s1, s8 = results[1], results[8]
    assert int(s1.extra.ptr) == int(s8.extra.ptr) == 6  # 6 normal samples
    assert int(s1.extra.fill) == int(s8.extra.fill) == 6
    np.testing.assert_allclose(np.asarray(s1.extra.memory),
                               np.asarray(s8.extra.memory), rtol=1e-4,
                               atol=1e-5)
    # Adam normalizes the first update to ~lr scale, amplifying the
    # cross-shard reduction-order noise in BN statistics; compare at
    # update scale (lr=1e-4) rather than weight scale
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_family_c_dp_step_matches(cpu_devices, tmp_path):
    """Family C under DP (completes the per-family DP matrix: D, B, A,
    serving already have one): 8-device step == 1-device step — BCE loss,
    conditional-clip optimizer, BN stats."""
    cfg = preset("family_c")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=8, frame_size=(32, 32)),
        train=cfg.train.replace(out_dir=str(tmp_path)))
    task = build_task(cfg)
    rng = np.random.default_rng(0)
    host = {"clips": rng.uniform(0, 1, (8, 8, 32, 32, 1)).astype(np.float32),
            "labels": np.asarray([0, 1, 0, 1, 1, 0, 0, 1], np.float32)}
    state = task.init_state(jax.random.key(0), jax.tree.map(jnp.asarray, host))

    results = {}
    for n in (1, 8):
        mesh = create_mesh(devices=cpu_devices[:n])
        rep = replicated(mesh)
        st = jax.device_put(state, rep)
        step = jax.jit(task.train_step,
                       in_shardings=(rep, batch_sharding(mesh), rep))
        new_state, metrics = step(st, shard_batch(mesh, host),
                                  jax.device_put(jax.random.key(1), rep))
        results[n] = (jax.device_get(new_state),
                      float(jax.device_get(metrics["loss"])))

    (s1, l1), (s8, l8) = results[1], results[8]
    assert abs(l1 - l8) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_family_a_dp_step_matches(cpu_devices, tmp_path):
    """Family A under DP: masked pipeline + VAE rng + BN stats match
    across mesh sizes."""
    import jax.numpy as jnp

    cfg = preset("causal_pipeline")
    cfg = cfg.replace(
        model=cfg.model.replace(frame_hw=(32, 48)),
        data=cfg.data.replace(batch_size=8, frame_size=(32, 48), clip_len=4,
                              channels=1),
        train=cfg.train.replace(out_dir=str(tmp_path)))
    task = build_task(cfg)
    rng = np.random.default_rng(0)
    host = {"clips": rng.uniform(0, 1, (8, 4, 32, 48, 1)).astype(np.float32),
            "labels": np.asarray([0, 1, 0, 1, 0, 1, 0, 1], np.float32)}
    state = task.init_state(jax.random.key(0), jax.tree.map(jnp.asarray, host))

    results = {}
    for n in (1, 8):
        mesh = create_mesh(devices=cpu_devices[:n])
        rep = replicated(mesh)
        st = jax.device_put(state, rep)
        step = jax.jit(task.train_step,
                       in_shardings=(rep, batch_sharding(mesh), rep))
        new_state, metrics = step(st, shard_batch(mesh, host),
                                  jax.device_put(jax.random.key(1), rep))
        results[n] = (jax.device_get(new_state),
                      float(jax.device_get(metrics["loss"])))

    (s1, l1), (s8, l8) = results[1], results[8]
    assert abs(l1 - l8) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_score_matches_single(rng):
    """DP serving: an 8-device sharded scoring call equals the plain
    single-device forward, including the non-multiple-batch trim."""
    import jax

    from cvad_tpu.evaluation.scoring import (make_family_d_score_fn,
                                             make_sharded_score_fn)
    from cvad_tpu.models import CausalAnomalyDetector

    m = CausalAnomalyDetector()
    x = np.random.default_rng(2).uniform(
        0, 1, (13, 8, 64, 64, 3)).astype(np.float32)  # 13 % 8 != 0
    v = m.init(rng, x[:1])
    sharded = make_sharded_score_fn(v, model=m)
    s8, adj8 = sharded(x)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        s1, adj1 = make_family_d_score_fn(v, model=m)(x)
    assert s8.shape == (13,) and adj8.shape == (13, 16, 16)
    np.testing.assert_allclose(s8, s1, atol=2e-5)
    np.testing.assert_allclose(adj8, adj1, atol=2e-5)
