"""Checkpoint/resume: training can stop and continue exactly where it left
off — params, optimizer state, history, scheduler (a capability the
reference never had; SURVEY.md §5)."""

import jax
import numpy as np
import pytest

from cvad_tpu.config import preset
from cvad_tpu.runtime.mesh import create_mesh
from cvad_tpu.train.engine import Trainer, make_loaders


def _cfg(tmp_path, epochs):
    cfg = preset("family_d")
    return cfg.replace(
        data=cfg.data.replace(batch_size=8, frame_size=(16, 16)),
        train=cfg.train.replace(num_epochs=epochs, eval_every=10**9,
                                save_interval=1, log_every=10**9,
                                out_dir=str(tmp_path)))


def _mesh1():
    return create_mesh(devices=jax.devices("cpu")[:1])


@pytest.mark.slow
def test_resume_continues_training(tmp_path):
    cfg2 = _cfg(tmp_path, 2)
    tr1 = Trainer(cfg2, mesh=_mesh1())
    train_loader, _ = make_loaders(cfg2, n_synthetic=16)
    tr1.fit(train_loader)
    assert tr1.history.last_epoch == 2
    params_after_2 = jax.device_get(tr1.state.params)

    # new trainer restores epoch-2 checkpoint and continues to epoch 4
    cfg4 = _cfg(tmp_path, 4)
    tr2 = Trainer(cfg4, mesh=_mesh1())
    sample = next(iter(train_loader))
    restored = tr2.restore(sample)
    assert restored is not None
    assert tr2.history.last_epoch == 2
    # restored params identical to the saved ones
    for a, b in zip(jax.tree_util.tree_leaves(params_after_2),
                    jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    hist = tr2.fit(train_loader)
    assert hist["epochs"] == [1, 2, 3, 4]
    # params actually moved in epochs 3-4
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params_after_2),
                        jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))))
    assert moved


def test_restore_without_checkpoint_returns_none(tmp_path):
    cfg = _cfg(tmp_path / "empty", 1)
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, _ = make_loaders(cfg, n_synthetic=8)
    assert tr.restore(next(iter(train_loader))) is None


def test_anchor_variant_forward(tmp_path):
    """Earlier family-A variant: anchor detector + single-head scorer, no
    direct classifier — final score equals causal score."""
    import jax.numpy as jnp

    from cvad_tpu.models import CausalPipelineDetector

    cfg = preset("causal_pipeline_v0").model.replace(frame_hw=(32, 48))
    m = CausalPipelineDetector(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 4, 32, 48, 1)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x, rng=jax.random.key(1))
    assert out["detections"].shape == (2, 4, 3, 4)  # 3 anchors
    np.testing.assert_allclose(np.asarray(out["anomaly_scores"]),
                               np.asarray(out["causal_anomaly_scores"]),
                               rtol=1e-6)
    assert bool(out["detection_mask"].any(axis=-1).all())


def test_checkpoint_gc_keeps_max(tmp_path):
    """CheckpointManager prunes old step checkpoints (max_to_keep)."""
    import jax.numpy as jnp

    from cvad_tpu.runtime.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    state = {"w": jnp.arange(4.0)}
    for step in (1, 2, 3, 4):
        mgr.save(step, {"w": jnp.arange(4.0) + step}, wait=True)
    steps = sorted(int(p.name.split("_")[1]) for p in tmp_path.glob("step_*"))
    assert steps == [3, 4]
    assert mgr.latest_step() == 4
    restored = mgr.restore(4, state)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.arange(4.0) + 4)
    # named checkpoints ('best') are never GC'd
    mgr.save("best", state, wait=True)
    mgr.save(5, state, wait=True)
    assert (tmp_path / "best").exists()


def test_restore_keeps_best_watermark(tmp_path):
    """Regression (self-review finding): the best-metric watermark must
    survive restore — otherwise the first eval after a resume overwrites
    the 'best' checkpoint with a possibly-worse model."""
    cfg = _cfg(tmp_path, 1)
    tr1 = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=16)
    tr1.fit(train_loader, eval_loader)
    assert tr1._best is not None

    tr2 = Trainer(_cfg(tmp_path, 2), mesh=_mesh1())
    tr2.restore(next(iter(train_loader)))
    assert tr2._best == tr1._best


def test_restore_keeps_early_stop_counter(tmp_path):
    """The early-stop counter checkpoints with the best watermark: restarting
    it at 0 on resume would make the resumed run stop LATER than the
    uninterrupted one under early_stop_patience."""
    cfg = _cfg(tmp_path, 1)
    tr1 = Trainer(cfg, mesh=_mesh1())
    loader, _ = make_loaders(cfg, n_synthetic=16)
    tr1.fit(loader)
    tr1._best, tr1._since_best = 0.5, 3
    tr1.ckpt.save(2, tr1.state, history=tr1._ckpt_payload())
    tr2 = Trainer(_cfg(tmp_path, 2), mesh=_mesh1())
    assert tr2.restore(loader.sample_batch()) is not None
    assert tr2._best == 0.5
    assert tr2._since_best == 3


def test_checkpoint_overwrite_atomic_and_crash_tolerant(tmp_path):
    """Overwriting a checkpoint (the rolling 'mid' snapshot) serializes to a
    tmp dir and swaps — and recovers from leftover _tmp./_old. dirs of a
    crashed earlier save; the rename prefixes must stay invisible to
    latest_step()/the step_* GC."""
    import jax.numpy as jnp

    from cvad_tpu.runtime.checkpoint import CheckpointManager

    ckpt = CheckpointManager(tmp_path / "ck")
    state = {"w": jnp.arange(4.0)}
    ckpt.save("mid", state, history={"epochs": [1]})
    # simulate a crashed prior overwrite: stale tmp/old leftovers on disk
    (tmp_path / "ck" / "_tmp.mid").mkdir()
    (tmp_path / "ck" / "_old.mid").mkdir()
    ckpt.save("mid", {"w": jnp.arange(4.0) * 2}, history={"epochs": [1, 2]})
    restored = ckpt.restore("mid", {"w": np.zeros(4, np.float32)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), [0, 2, 4, 6])
    assert ckpt.restore_history("mid")["epochs"] == [1, 2]
    assert not (tmp_path / "ck" / "_tmp.mid").exists()
    assert not (tmp_path / "ck" / "_old.mid").exists()
    # prefix names never pollute the step_* namespace
    ckpt.save(3, state)
    ckpt.save(3, state, history={"epochs": [3]})  # int-step overwrite too
    assert ckpt.latest_step() == 3


class _Interrupted(Exception):
    pass


class _InterruptingLoader:
    """Delegate to a BatchLoader but raise after yielding `fail_after`
    batches in total (across epochs) — simulates a preemption mid-epoch."""

    def __init__(self, inner, fail_after):
        self.inner = inner
        self.left = fail_after

    def __getattr__(self, name):  # set_epoch / sample_batch / iter_from ...
        return getattr(self.inner, name)

    def __iter__(self):
        for b in self.inner:
            if self.left <= 0:
                raise _Interrupted()
            self.left -= 1
            yield b


def test_midepoch_resume_bit_identical(tmp_path):
    """`save_every_steps` preemption checkpointing: a run killed mid-epoch
    and resumed from the rolling 'mid' checkpoint finishes with params,
    optimizer state, and history BIT-IDENTICAL to the uninterrupted run —
    deterministic shuffle replay (`BatchLoader.set_epoch`/`iter_from`) plus
    the restored partial metric accumulator make the step sequence exact."""
    import pytest

    cfg_a = _cfg(tmp_path / "a", 2)
    cfg_a = cfg_a.replace(data=cfg_a.data.replace(batch_size=4))
    tr_a = Trainer(cfg_a, mesh=_mesh1())
    loader_a, _ = make_loaders(cfg_a, n_synthetic=24)  # 6 batches/epoch
    hist_a = tr_a.fit(loader_a)

    cfg_b = cfg_a.replace(train=cfg_a.train.replace(
        out_dir=str(tmp_path / "b"), save_every_steps=2))
    tr_b = Trainer(cfg_b, mesh=_mesh1())
    loader_b, _ = make_loaders(cfg_b, n_synthetic=24)
    # dies while pulling epoch 2's 4th batch; last 'mid' save was at step 2
    with pytest.raises(_Interrupted):
        tr_b.fit(_InterruptingLoader(loader_b, 9))

    tr_b2 = Trainer(cfg_b, mesh=_mesh1())
    assert tr_b2.restore(loader_b.sample_batch()) is not None
    assert tr_b2._mid_resume is not None
    assert int(tr_b2._mid_resume["epoch"]) == 2
    hist_b = tr_b2.fit(loader_b)

    assert hist_b["epochs"] == hist_a["epochs"]
    np.testing.assert_array_equal(hist_b["train_losses"],
                                  hist_a["train_losses"])
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr_a.state)),
                    jax.tree_util.tree_leaves(jax.device_get(tr_b2.state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_midepoch_resume_scanned_multistep(tmp_path):
    """Same preemption/resume contract on the `steps_per_call>1` scanned
    path: mid saves land on chunk boundaries, the resumed run re-chunks the
    remaining batches, and the final state is bit-identical to the
    uninterrupted scanned run (scan lowers differently from single steps,
    so the oracle must be the same-k run — test_train.py equivalence is
    only ~5e-4)."""
    import pytest

    cfg_a = _cfg(tmp_path / "a", 2)
    cfg_a = cfg_a.replace(data=cfg_a.data.replace(batch_size=4),
                          train=cfg_a.train.replace(steps_per_call=2))
    tr_a = Trainer(cfg_a, mesh=_mesh1())
    loader_a, _ = make_loaders(cfg_a, n_synthetic=24)
    tr_a.fit(loader_a)

    cfg_b = cfg_a.replace(train=cfg_a.train.replace(
        out_dir=str(tmp_path / "b"), save_every_steps=2))
    tr_b = Trainer(cfg_b, mesh=_mesh1())
    loader_b, _ = make_loaders(cfg_b, n_synthetic=24)
    # 11 = epoch 1's 6 batches + 5 more: epoch 2 steps chunk [1,2] (mid save
    # at count=2) and dies while chunk [5,6] is being prefetched
    with pytest.raises(_Interrupted):
        tr_b.fit(_InterruptingLoader(loader_b, 11))

    tr_b2 = Trainer(cfg_b, mesh=_mesh1())
    assert tr_b2.restore(loader_b.sample_batch()) is not None
    assert tr_b2._mid_resume is not None
    assert int(tr_b2._mid_resume["epoch"]) == 2
    tr_b2.fit(loader_b)

    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr_a.state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr_b2.state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


@pytest.mark.slow
def test_midepoch_resume_on_dp_sp_mesh(tmp_path):
    """Preemption/resume on the 4x2 DP x SP mesh (clips' T axis sharded
    over 'time', GSPMD halo exchanges): the resumed sharded run must be
    bit-identical to the uninterrupted sharded run."""
    import pytest

    def _mesh():
        return create_mesh(data_axis=4, temporal_axis=2,
                           devices=jax.devices("cpu")[:8])

    cfg_a = _cfg(tmp_path / "a", 2)
    cfg_a = cfg_a.replace(data=cfg_a.data.replace(batch_size=8))
    tr_a = Trainer(cfg_a, mesh=_mesh())
    loader_a, _ = make_loaders(cfg_a, n_synthetic=24)  # 3 batches/epoch
    tr_a.fit(loader_a)

    cfg_b = cfg_a.replace(train=cfg_a.train.replace(
        out_dir=str(tmp_path / "b"), save_every_steps=1))
    tr_b = Trainer(cfg_b, mesh=_mesh())
    loader_b, _ = make_loaders(cfg_b, n_synthetic=24)
    # epoch 1's 3 batches + 2: epoch 2 steps batch 1 (mid save), dies
    # while batch 3 is being prefetched
    with pytest.raises(_Interrupted):
        tr_b.fit(_InterruptingLoader(loader_b, 5))

    tr_b2 = Trainer(cfg_b, mesh=_mesh())
    assert tr_b2.restore(loader_b.sample_batch()) is not None
    assert tr_b2._mid_resume is not None
    tr_b2.fit(loader_b)

    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr_a.state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr_b2.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_midepoch_resume_family_b_memory_bank(tmp_path):
    """Mid-epoch preemption with NON-PARAMETER step state: the family-B
    memory bank (TrainState.extra ring buffer, SURVEY.md §7 hard part #2)
    must come back from the 'mid' snapshot and the resumed run must end with
    bit-identical params AND bank contents/pointer/fill."""
    import pytest

    base = preset("family_b")  # decoder renders fixed 64x64: keep frame_size
    cfg_a = base.replace(
        data=base.data.replace(batch_size=4),
        train=base.train.replace(num_epochs=2, eval_every=10**9,
                                 save_interval=1, log_every=10**9,
                                 out_dir=str(tmp_path / "a")))
    tr_a = Trainer(cfg_a, mesh=_mesh1())
    loader_a, _ = make_loaders(cfg_a, n_synthetic=24)
    tr_a.fit(loader_a)

    cfg_b = cfg_a.replace(train=cfg_a.train.replace(
        out_dir=str(tmp_path / "b"), save_every_steps=2))
    tr_b = Trainer(cfg_b, mesh=_mesh1())
    loader_b, _ = make_loaders(cfg_b, n_synthetic=24)
    with pytest.raises(_Interrupted):
        tr_b.fit(_InterruptingLoader(loader_b, 9))

    tr_b2 = Trainer(cfg_b, mesh=_mesh1())
    assert tr_b2.restore(loader_b.sample_batch()) is not None
    assert tr_b2._mid_resume is not None
    tr_b2.fit(loader_b)

    ex_a = jax.device_get(tr_a.state.extra)
    ex_b = jax.device_get(tr_b2.state.extra)
    np.testing.assert_array_equal(np.asarray(ex_a.memory),
                                  np.asarray(ex_b.memory))
    assert int(ex_a.ptr) == int(ex_b.ptr)
    assert int(ex_a.fill) == int(ex_b.fill)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr_a.state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr_b2.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stale_mid_checkpoint_ignored(tmp_path):
    """A completed fit removes the rolling 'mid' snapshot, and even a
    leftover one from an epoch that later completed must NOT win over the
    newer epoch checkpoint on restore."""
    cfg = _cfg(tmp_path, 2)
    cfg = cfg.replace(data=cfg.data.replace(batch_size=4),
                      train=cfg.train.replace(save_every_steps=3))
    tr = Trainer(cfg, mesh=_mesh1())
    loader, _ = make_loaders(cfg, n_synthetic=16)
    tr.fit(loader)  # mid saves happen, but the completed run removes them
    assert not (tr.out_dir / "checkpoints" / "mid").exists()

    # plant a stale mid (as if a crash left one from epoch 2's interior)
    tr._save_mid(2, 1, np.zeros(len(tr._metric_keys), np.float32))
    tr2 = Trainer(cfg, mesh=_mesh1())
    assert tr2.restore(loader.sample_batch()) is not None
    assert tr2._mid_resume is None  # epoch ckpt (2) >= mid's epoch
    assert tr2.history.last_epoch == 2


def test_family_b_resume_restores_memory_bank(tmp_path):
    """The family-B train step carries the memory bank as TrainState.extra
    (functional ring buffer, SURVEY.md §7 hard part #2); a resume must bring
    back the exact bank contents, write pointer, and fill count."""
    cfg = preset("family_b")  # decoder renders fixed 64x64: keep frame_size
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=8),
        train=cfg.train.replace(num_epochs=1, eval_every=10**9,
                                save_interval=1, log_every=10**9,
                                out_dir=str(tmp_path / "b")))
    tr1 = Trainer(cfg, mesh=_mesh1())
    train_loader, _ = make_loaders(cfg, n_synthetic=16)
    tr1.fit(train_loader)
    extra1 = jax.device_get(tr1.state.extra)
    assert int(extra1.fill) > 0  # normal samples were written to the bank

    tr2 = Trainer(cfg.replace(train=cfg.train.replace(num_epochs=2)),
                  mesh=_mesh1())
    assert tr2.restore(train_loader.sample_batch()) is not None
    extra2 = jax.device_get(tr2.state.extra)
    np.testing.assert_array_equal(np.asarray(extra1.memory),
                                  np.asarray(extra2.memory))
    assert int(extra1.ptr) == int(extra2.ptr)
    assert int(extra1.fill) == int(extra2.fill)
