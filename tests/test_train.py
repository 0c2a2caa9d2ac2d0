"""Training-engine tests: scheduler parity with torch, NaN-skip guard,
short end-to-end runs per family, history contract."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cvad_tpu.config import OptimConfig, preset
from cvad_tpu.data.batcher import BatchLoader
from cvad_tpu.data.datasets import SyntheticClipDataset
from cvad_tpu.runtime.mesh import create_mesh
from cvad_tpu.train.engine import Trainer, make_loaders
from cvad_tpu.train.optim import HostScheduler, build_optimizer, get_lr, set_lr
from cvad_tpu.train.tasks import build_task


def _small(cfg, tmp_path, epochs=2, batch=8, hw=(24, 24)):
    return cfg.replace(
        data=cfg.data.replace(batch_size=batch, frame_size=hw),
        train=cfg.train.replace(num_epochs=epochs, eval_every=1,
                                save_interval=0, log_every=10**9,
                                out_dir=str(tmp_path)),
    )


def _mesh1():
    return create_mesh(devices=jax.devices("cpu")[:1])


# -- schedulers --------------------------------------------------------------


def test_family_c_optimizer_matches_torch():
    """The full family-C update rule vs torch: Adam with COUPLED weight
    decay (optim.Adam(weight_decay=1e-5)) plus the reference's conditional
    clip — rescale to 1.0 only when the global grad norm exceeds 10
    (minicausal_vad_complete3.py:227-233, 307-309)."""
    import torch

    from cvad_tpu.config import OptimConfig
    from cvad_tpu.train.optim import build_optimizer

    cfg = OptimConfig(optimizer="adam", lr=1e-3, weight_decay=1e-5,
                      grad_clip=1.0, clip_trigger=10.0)
    tx = build_optimizer(cfg)
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (4, 3)).astype(np.float32)
    # alternate small / large gradients across the trigger boundary
    grads = [rng.normal(0, s, (4, 3)).astype(np.float32)
             for s in (0.1, 1.0, 5.0, 0.3)]

    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=1e-3, weight_decay=1e-5, eps=1e-8)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        gn = float(torch.linalg.vector_norm(tw.grad))
        if gn > 10.0:
            torch.nn.utils.clip_grad_norm_([tw], 1.0)
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), atol=2e-6)


def test_plateau_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = OptimConfig(lr=0.1, schedule="plateau", plateau_factor=0.5,
                      plateau_patience=2)
    ours = HostScheduler(cfg)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2)
    losses = [1.0, 0.9, 0.9, 0.9, 0.9, 0.9, 0.5, 0.5, 0.5, 0.5, 0.6, 0.7]
    for loss in losses:
        ours.step(loss)
        sch.step(loss)
        assert abs(ours.lr - opt.param_groups[0]["lr"]) < 1e-12, (
            ours.lr, opt.param_groups[0]["lr"])


def test_step_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = OptimConfig(lr=1e-3, schedule="step", step_size=3, step_gamma=0.7)
    ours = HostScheduler(cfg)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-3)
    sch = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.7)
    for _ in range(10):
        ours.step(None)
        sch.step()
        assert abs(ours.lr - opt.param_groups[0]["lr"]) < 1e-15


def test_cosine_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = OptimConfig(lr=1e-2, schedule="cosine", cosine_steps=10)
    ours = HostScheduler(cfg, total_epochs=10)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-2)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10)
    for _ in range(10):
        ours.step(None)
        sch.step()
        assert abs(ours.lr - opt.param_groups[0]["lr"]) < 1e-9


def test_injected_lr_roundtrip():
    cfg = OptimConfig(lr=5e-4)
    tx = build_optimizer(cfg)
    params = {"w": jnp.zeros((3,))}
    st = tx.init(params)
    assert abs(get_lr(st) - 5e-4) < 1e-9
    st2 = set_lr(st, 1e-5)
    assert abs(get_lr(st2) - 1e-5) < 1e-9
    # updated state still usable
    updates, _ = tx.update({"w": jnp.ones((3,))}, st2, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


# -- NaN guard ---------------------------------------------------------------


def test_nan_batch_skipped(tmp_path):
    cfg = _small(preset("family_d"), tmp_path, hw=(16, 16))
    task = build_task(cfg)
    batch = {"clips": jnp.ones((4, 8, 16, 16, 3)) * 0.5,
             "labels": jnp.zeros(4)}
    state = task.init_state(jax.random.key(0), batch)
    bad = {"clips": batch["clips"].at[0, 0, 0, 0, 0].set(jnp.nan),
           "labels": batch["labels"]}
    new_state, metrics = task.train_step(state, bad, jax.random.key(1))
    # params unchanged on NaN loss (reference skip-batch semantics)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == 1  # step counter still advances


# -- end-to-end short runs ---------------------------------------------------


def test_family_d_fit_and_history_contract(tmp_path):
    cfg = _small(preset("family_d"), tmp_path)
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=16)
    hist = tr.fit(train_loader, eval_loader)
    # history JSON contract (improved_training_history.json schema)
    with open(tmp_path / "improved_training_history.json") as f:
        on_disk = json.load(f)
    assert set(on_disk) == {"train_losses", "loss_components",
                            "evaluation_metrics", "epochs", "learning_rates"}
    assert on_disk["epochs"] == [1, 2]
    assert len(on_disk["evaluation_metrics"]) == 2
    assert set(on_disk["evaluation_metrics"][0]) >= {
        "mean_score", "std_score", "min_score", "max_score", "score_range",
        "avg_edges", "avg_sparsity", "unique_graphs"}
    assert all(np.isfinite(l) for l in on_disk["train_losses"])
    # best checkpoint written
    assert (tmp_path / "checkpoints" / "best").exists()


def test_family_c_learns_synthetic(tmp_path):
    cfg = _small(preset("family_c"), tmp_path, epochs=5, hw=(24, 24))
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=48)
    hist = tr.fit(train_loader, eval_loader)
    evals = hist["evaluation_metrics"]
    # supervised 3D CNN separates synthetic normal/anomalous: AUC > chance
    assert evals[-1]["auc"] > 0.6, evals[-1]


def test_family_b_fit(tmp_path):
    cfg = preset("family_b")
    cfg = _small(cfg, tmp_path, epochs=2, batch=6, hw=(64, 64))
    cfg = cfg.replace(optim=cfg.optim.replace(lr=1e-4))
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=12)
    hist = tr.fit(train_loader, eval_loader)
    assert len(hist["train_losses"]) == 2
    assert all(np.isfinite(l) for l in hist["train_losses"])
    # memory bank accumulated normal features during training
    assert int(tr.state.extra.fill) > 0
    ev = hist["evaluation_metrics"][-1]
    assert "auc" in ev and "normal_mean" in ev


def test_family_b_bn_absorbed_biases(tmp_path):
    """Conv biases immediately followed by BatchNorm have analytically-zero
    training gradients (the batch-mean subtraction absorbs them,
    causal_anomaly_detection1.py:129-178) — the step must leave them
    bit-unchanged while live biases (deconv_out, fc) keep training."""
    cfg = preset("family_b")
    cfg = _small(cfg, tmp_path, epochs=1, batch=6, hw=(64, 64))
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=6)
    batch = next(iter(train_loader))
    tr.init_state(batch)
    p0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.fit(train_loader, eval_loader)
    p1 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    for i in range(4):
        np.testing.assert_array_equal(p0["encoder"][f"conv_{i}"]["bias"],
                                      p1["encoder"][f"conv_{i}"]["bias"])
    for i in range(3):
        np.testing.assert_array_equal(p0["decoder"][f"deconv_{i}"]["bias"],
                                      p1["decoder"][f"deconv_{i}"]["bias"])
    assert not np.array_equal(p0["decoder"]["deconv_out"]["bias"],
                              p1["decoder"]["deconv_out"]["bias"])
    assert not np.array_equal(p0["encoder"]["conv_0"]["kernel"],
                              p1["encoder"]["conv_0"]["kernel"])


def test_family_c_bn_absorbed_biases(tmp_path):
    """Family C's conv_{i} -> BatchNorm3d biases likewise have analytically
    zero gradients; head biases (cls_*) keep training."""
    cfg = preset("family_c")
    cfg = _small(cfg, tmp_path, epochs=1, batch=6, hw=(32, 32))
    # wd=0 isolates the structural zero: with the reference's coupled
    # wd=1e-5 the dead biases still drift at lr scale (Adam normalizes the
    # decay term — torch behaves identically on its noise-level grads)
    cfg = cfg.replace(data=cfg.data.replace(channels=1, clip_len=4),
                      optim=cfg.optim.replace(weight_decay=0.0))
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=6)
    batch = next(iter(train_loader))
    tr.init_state(batch)
    p0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.fit(train_loader, eval_loader)
    p1 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    for i in range(3):
        np.testing.assert_array_equal(p0[f"conv_{i}"]["conv"]["bias"],
                                      p1[f"conv_{i}"]["conv"]["bias"])
    assert not np.array_equal(p0["cls_6"]["bias"], p1["cls_6"]["bias"])


def test_family_b_loss_sufficient_stats_exact():
    """The train loss's sufficient-statistics form equals the naive
    mean((repeat(frame,T) - flat)^2) per-sample error to f32 roundoff."""
    rng = np.random.default_rng(1)
    b, t, h, w, c = 3, 5, 8, 8, 3
    flat = jnp.asarray(rng.uniform(0, 1, (b * t, h, w, c)).astype(np.float32))
    frame = jnp.asarray(rng.uniform(0, 1, (b, h, w, c)).astype(np.float32))
    diff = jnp.repeat(frame, t, axis=0) - flat
    naive = jnp.mean(diff * diff, axis=(1, 2, 3)).reshape(b, t).mean(axis=1)
    xf = flat.reshape((b, t, h, w, c))
    xbar = xf.mean(axis=1)
    x2m = jnp.mean(xf * xf, axis=(1, 2, 3, 4))
    err = (jnp.mean(frame * frame, axis=(1, 2, 3))
           - 2.0 * jnp.mean(frame * xbar, axis=(1, 2, 3)) + x2m)
    np.testing.assert_allclose(np.asarray(err), np.asarray(naive),
                               rtol=0, atol=5e-6)


@pytest.mark.slow
def test_family_a_fit(tmp_path):
    cfg = preset("family_a")
    cfg = cfg.replace(model=cfg.model.replace(frame_hw=(32, 48)),
                      data=cfg.data.replace(frame_size=(32, 48), clip_len=4,
                                            batch_size=4))
    cfg = _small(cfg, tmp_path, epochs=1, batch=4, hw=(32, 48))
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=8)
    hist = tr.fit(train_loader, eval_loader)
    assert np.isfinite(hist["train_losses"][0])
    assert "val_acc" in hist["evaluation_metrics"][0]


@pytest.mark.slow
def test_family_a_stem_frozen(tmp_path):
    """backbone conv1/bn1 params must not move (reference
    apply_memory_efficient_training, causal_anomaly_detection.py:592-607)."""
    import jax.numpy as jnp

    cfg = preset("causal_pipeline")
    cfg = cfg.replace(model=cfg.model.replace(frame_hw=(32, 48)),
                      data=cfg.data.replace(frame_size=(32, 48), clip_len=4,
                                            batch_size=4))
    cfg = _small(cfg, tmp_path, epochs=1, batch=4, hw=(32, 48))
    task = build_task(cfg)
    batch = {"clips": jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (4, 4, 32, 48, 1)), jnp.float32),
        "labels": jnp.zeros(4)}
    state = task.init_state(jax.random.key(0), batch)
    new_state, _ = task.train_step(state, batch, jax.random.key(1))
    stem_before = state.params["backbone"]["conv1"]["kernel"]
    stem_after = new_state.params["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(stem_before), np.asarray(stem_after))
    bn_b = state.params["backbone"]["bn1"]["scale"]
    bn_a = new_state.params["backbone"]["bn1"]["scale"]
    np.testing.assert_array_equal(np.asarray(bn_b), np.asarray(bn_a))
    # a non-frozen layer did move
    l1_b = state.params["backbone"]["layer1_conv0"]["kernel"]
    l1_a = new_state.params["backbone"]["layer1_conv0"]["kernel"]
    assert not np.allclose(np.asarray(l1_b), np.asarray(l1_a))


def test_family_a_frozen_stem_grads_are_zero():
    """requires_grad=False parity: no gradient is computed for conv1/bn1, so
    grad-norm consumers (the NaN-skip guard's optax.global_norm) see only
    trainable params — torch never has a .grad on no-grad params — and XLA
    dead-code-eliminates the stem backward."""
    import jax.numpy as jnp

    from cvad_tpu.config import FamilyAConfig
    from cvad_tpu.models import build_model
    from cvad_tpu.ops.losses import family_a_loss
    from cvad_tpu.train.tasks import stop_frozen_stem

    cfg = FamilyAConfig(frame_hw=(32, 48))
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (2, 4, 32, 48, 1)),
                    jnp.float32)
    labels = jnp.array([0, 1])
    v = model.init(jax.random.key(0), x, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": stop_frozen_stem(params),
             "batch_stats": v["batch_stats"]},
            x, train=True, deterministic=False, rng=jax.random.key(1),
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
        return family_a_loss(out, labels)[0]

    grads = jax.grad(loss_fn)(v["params"])
    assert np.all(np.asarray(grads["backbone"]["conv1"]["kernel"]) == 0.0)
    assert np.all(np.asarray(grads["backbone"]["bn1"]["scale"]) == 0.0)
    assert np.any(np.asarray(grads["backbone"]["layer1_conv0"]["kernel"]) != 0.0)


def test_torch_init_statistics():
    """Initializer schemes match torch statistics (std within tolerance)."""
    import jax.numpy as jnp

    from cvad_tpu.models.init import (kaiming_normal_fan_out, normal_std,
                                      xavier_normal)

    key = jax.random.key(0)
    w = kaiming_normal_fan_out("relu")(key, (3, 3, 3, 8, 16))
    fan_out = 16 * 27
    assert abs(float(jnp.std(w)) - (2.0 / fan_out) ** 0.5) < 0.002
    w2 = xavier_normal(0.5)(key, (64, 32))
    assert abs(float(jnp.std(w2)) - 0.5 * (2.0 / 96) ** 0.5) < 0.005
    w3 = normal_std(0.01)(key, (100, 100))
    assert abs(float(jnp.std(w3)) - 0.01) < 0.001


def test_early_stopping_and_reload_best(tmp_path):
    """Family-B style early stop: patience exhausts, best state reloaded."""
    cfg = _small(preset("family_d"), tmp_path, epochs=8, hw=(16, 16))
    cfg = cfg.replace(train=cfg.train.replace(
        early_stop_patience=2, reload_best=True, best_metric="mean_score",
        best_mode="max", eval_every=1))
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=16)
    hist = tr.fit(train_loader, eval_loader)
    # either it stopped early or ran through; in both cases best exists
    assert (tmp_path / "checkpoints" / "best").exists()
    assert tr._best is not None


def test_detector_bias_init(tmp_path):
    """Family-A detector head bias initialized to the reference's plausible
    pedestrian positions (causal_anomaly_detection.py:183-192)."""
    import jax.numpy as jnp

    from cvad_tpu.models.family_a import MaskedPedestrianDetector

    cfg = preset("causal_pipeline").model
    det = MaskedPedestrianDetector(cfg)
    v = det.init(jax.random.key(0), jnp.ones((1, 2, 6144)))
    bias = np.asarray(v["params"]["detector_out"]["bias"])
    np.testing.assert_array_equal(bias, np.asarray(
        MaskedPedestrianDetector._BIAS, np.float32))


def test_train_epoch_skip_batches_generic_iterable(tmp_path):
    """`skip_batches` on a loader WITHOUT iter_from (plain list) drops the
    leading batches via islice — state must equal feeding the tail only."""
    cfg = _small(preset("family_d"), tmp_path, epochs=1, batch=8, hw=(16, 16))
    rng = np.random.default_rng(7)
    batches = [{"clips": rng.uniform(0, 1, (8, 8, 16, 16, 3)).astype(np.float32),
                "labels": np.zeros(8, np.float32)} for _ in range(4)]

    tr1 = Trainer(cfg, mesh=_mesh1())
    tr1.init_state(batches[0])
    tr1.train_epoch(list(batches), epoch=1, skip_batches=2)

    tr2 = Trainer(cfg.replace(train=cfg.train.replace(
        out_dir=str(tmp_path / "tail"))), mesh=_mesh1())
    tr2.init_state(batches[0])
    tr2.train_epoch(list(batches[2:]), epoch=1)

    assert int(jax.device_get(tr1.state.step)) == 2
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr1.state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_steps_per_call_equivalence(tmp_path):
    """K scanned steps in one jit call == K sequential single-step calls."""
    cfg = _small(preset("family_d"), tmp_path, epochs=1, batch=8, hw=(16, 16))
    rng = np.random.default_rng(0)
    batches = [{"clips": rng.uniform(0, 1, (8, 8, 16, 16, 3)).astype(np.float32),
                "labels": np.zeros(8, np.float32)} for _ in range(4)]

    class _ListLoader(list):
        pass

    results = {}
    for k in (1, 4):
        cfgk = cfg.replace(train=cfg.train.replace(
            steps_per_call=k, out_dir=str(tmp_path / f"k{k}")))
        tr = Trainer(cfgk, mesh=_mesh1())
        tr.init_state(batches[0])
        avg = tr.train_epoch(_ListLoader(batches), epoch=1)
        results[k] = (jax.device_get(tr.state.params), avg)

    p1, avg1 = results[1]
    p4, avg4 = results[4]
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)
    assert abs(avg1["loss"] - avg4["loss"]) < 1e-4


def test_steps_per_call_remainder(tmp_path):
    """Batch count not divisible by K: remainder runs single-step."""
    cfg = _small(preset("family_d"), tmp_path, epochs=1, batch=4, hw=(16, 16))
    cfg = cfg.replace(train=cfg.train.replace(steps_per_call=3))
    rng = np.random.default_rng(1)
    batches = [{"clips": rng.uniform(0, 1, (4, 8, 16, 16, 3)).astype(np.float32),
                "labels": np.zeros(4, np.float32)} for _ in range(5)]
    tr = Trainer(cfg, mesh=_mesh1())
    tr.init_state(batches[0])
    avg = tr.train_epoch(batches, epoch=1)
    assert np.isfinite(avg["loss"])
    assert int(jax.device_get(tr.state.step)) == 5


@pytest.mark.slow
def test_steps_per_call_logging(tmp_path):
    """The scanned multi-step path emits the same train_batch JSONL
    observability as the single-step path (per-dispatch tick, log_every
    boundary crossings, steps_per_s in optimizer-step units)."""
    cfg = _small(preset("family_d"), tmp_path, epochs=1, batch=4, hw=(16, 16))
    cfg = cfg.replace(train=cfg.train.replace(steps_per_call=3, log_every=2))
    rng = np.random.default_rng(2)
    batches = [{"clips": rng.uniform(0, 1, (4, 8, 16, 16, 3)).astype(np.float32),
                "labels": np.zeros(4, np.float32)} for _ in range(7)]
    tr = Trainer(cfg, mesh=_mesh1())
    tr.init_state(batches[0])
    tr.train_epoch(batches, epoch=1)
    recs = [json.loads(line)
            for line in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    tb = [r for r in recs if r["kind"] == "train_batch"]
    # 7 batches at k=3 -> dispatches end at counts 3, 6, 7; the chunk
    # dispatches cross log_every=2 boundaries (2; 4+6), the remainder
    # single step (6 -> 7) crosses none
    assert [r["batch"] for r in tb] == [3, 6]
    for r in tb:
        assert r["steps_per_s"] > 0
        assert np.isfinite(r["loss"])


def test_lr_update_preserves_masked_opt_state(tmp_path):
    """Regression: set_lr must not flatten NamedTuple optimizer states
    (family A wraps its tx in optax.masked for stem freezing; a cosine
    schedule fires set_lr every epoch and the next step must still run)."""
    import jax.numpy as jnp

    from cvad_tpu.train.optim import get_lr, set_lr

    cfg = preset("causal_pipeline")
    cfg = cfg.replace(model=cfg.model.replace(frame_hw=(32, 48)),
                      data=cfg.data.replace(frame_size=(32, 48), clip_len=4,
                                            batch_size=4))
    cfg = _small(cfg, tmp_path, epochs=1, batch=4, hw=(32, 48))
    task = build_task(cfg)
    batch = {"clips": jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (4, 4, 32, 48, 1)), jnp.float32),
        "labels": jnp.zeros(4)}
    state = task.init_state(jax.random.key(0), batch)
    state, _ = task.train_step(state, batch, jax.random.key(1))
    new_opt = set_lr(state.opt_state, 1e-5)
    assert abs(get_lr(new_opt) - 1e-5) < 1e-9
    # structure preserved: another step runs on the updated state
    state = state.replace(opt_state=new_opt)
    state2, metrics = task.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_family_a_multiepoch_cosine(tmp_path):
    """Two epochs with the cosine schedule (lr changes between epochs)."""
    cfg = preset("causal_pipeline")
    cfg = cfg.replace(model=cfg.model.replace(frame_hw=(32, 48)),
                      data=cfg.data.replace(frame_size=(32, 48), clip_len=4,
                                            batch_size=4))
    cfg = _small(cfg, tmp_path, epochs=2, batch=4, hw=(32, 48))
    tr = Trainer(cfg, mesh=_mesh1())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=8)
    hist = tr.fit(train_loader, eval_loader)
    assert len(hist["train_losses"]) == 2
    assert all(np.isfinite(l) for l in hist["train_losses"])
    # cosine actually moved the lr
    assert hist["learning_rates"][0] != tr.scheduler.lr


@pytest.mark.slow
def test_steps_per_call_remainder_masked(tmp_path):
    """Regression (self-review finding): on the 8-device mesh, a
    non-multiple remainder batch through the steps_per_call>1 path must be
    gradient-identical to the single-step path.  The multi-step put_fn
    previously re-padded the already-padded batch, rebuilding 'valid' as
    all-ones so the duplicate rows entered the gradient."""
    cfg = _small(preset("family_d"), tmp_path, epochs=1, batch=8, hw=(16, 16))
    rng = np.random.default_rng(3)
    batches = [{"clips": rng.uniform(0, 1, (n, 8, 16, 16, 3)).astype(np.float32),
                "labels": np.zeros(n, np.float32)} for n in (8, 8, 3)]

    results = {}
    for k in (1, 2):
        cfgk = cfg.replace(train=cfg.train.replace(
            steps_per_call=k, out_dir=str(tmp_path / f"rk{k}")))
        tr = Trainer(cfgk)  # full 8-device CPU mesh: nd=8, remainder pads
        tr.init_state(batches[0])
        tr.train_epoch(list(batches), epoch=1)
        results[k] = jax.device_get(tr.state.params)

    for a, b in zip(jax.tree_util.tree_leaves(results[1]),
                    jax.tree_util.tree_leaves(results[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_family_d_pseudo_target_injection(tmp_path):
    """An injected batch["pseudo_targets"] stream replaces the family-D
    task's own pseudo-label draw (dynamics-parity studies feed the torch
    reference and this engine one shared stream — scripts/dyn_parity_d.py).
    Injection is deterministic and actually consumed by the anomaly term."""
    cfg = _small(preset("family_d"), tmp_path)
    task = build_task(cfg)
    rng = np.random.default_rng(0)
    host = {"clips": rng.uniform(0, 1, (8, 8, 24, 24, 3)).astype(np.float32),
            "labels": np.zeros(8, np.float32)}
    state = task.init_state(jax.random.key(0), jax.tree.map(jnp.asarray, host))
    key = jax.random.key(1)

    def step(targets):
        b = dict(host)
        if targets is not None:
            b["pseudo_targets"] = np.asarray(targets, np.float32)
        _, m = jax.jit(task.train_step)(state, jax.tree.map(jnp.asarray, b),
                                        key)
        return {k: float(v) for k, v in m.items()}

    zeros = step(np.zeros(8))
    zeros2 = step(np.zeros(8))
    ones = step(np.ones(8))
    assert zeros == zeros2  # deterministic under injection
    assert zeros["anomaly_loss"] != ones["anomaly_loss"]  # consumed
    # graph terms are label-independent — identical under any injection
    assert zeros["acyclicity_loss"] == ones["acyclicity_loss"]
