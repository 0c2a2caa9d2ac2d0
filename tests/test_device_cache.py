"""Device-resident epoch clip cache (cvad_tpu.data.device_cache).

The cache must be a pure transport optimization: batch composition, padding,
valid masks, and chunk grouping all bit-identical to the uncached
``BatchLoader`` -> ``DevicePrefetcher`` path, so a cached fit produces the
exact same parameters and history as an uncached one.
"""

import jax
import numpy as np
import pytest

from cvad_tpu.config import preset
from cvad_tpu.data.batcher import BatchLoader
from cvad_tpu.data.datasets import SyntheticClipDataset
from cvad_tpu.data.device_cache import DeviceClipCache, cache_eligible
from cvad_tpu.runtime.mesh import create_mesh
from cvad_tpu.train.engine import Trainer


def _cfg(tmp_path, mode, epochs=2, batch=8, steps_per_call=1, n_train=0):
    cfg = preset("family_c")
    return cfg.replace(
        data=cfg.data.replace(batch_size=batch, frame_size=(16, 16),
                              transfer_dtype="uint8"),
        train=cfg.train.replace(num_epochs=epochs, eval_every=10**9,
                                save_interval=0, log_every=10**9,
                                out_dir=str(tmp_path / mode),
                                device_cache=mode,
                                steps_per_call=steps_per_call),
    )


def _loader(cfg, n=19, shuffle=True):
    # n=19 with batch 8: two full batches + a remainder that pads — the
    # composition edge cases all exercised
    ds = SyntheticClipDataset(cfg.data, n=n, split="Train")
    return BatchLoader(ds, cfg.data.batch_size, shuffle=shuffle, seed=3,
                       transfer_dtype="uint8")


def _fit(cfg, mesh, n=19):
    trainer = Trainer(cfg, mesh=mesh)
    loader = _loader(cfg, n=n)
    hist = trainer.fit(loader)
    params = jax.device_get(trainer.state.params)
    return trainer, hist, params


def _assert_bit_identical(p_a, p_b, hist_a, hist_b):
    flat_a = jax.tree_util.tree_leaves(p_a)
    flat_b = jax.tree_util.tree_leaves(p_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert hist_a["train_losses"] == hist_b["train_losses"]


@pytest.mark.parametrize("steps_per_call", [
    pytest.param(1, marks=pytest.mark.slow), 3])
def test_cached_fit_bit_identical(tmp_path, steps_per_call):
    mesh = create_mesh(devices=jax.devices("cpu")[:1])
    t_on, hist_on, p_on = _fit(
        _cfg(tmp_path, "on", steps_per_call=steps_per_call), mesh)
    t_off, hist_off, p_off = _fit(
        _cfg(tmp_path, "off", steps_per_call=steps_per_call), mesh)
    assert any(c is not None for _, c in t_on._device_caches.values())
    assert all(c is None for _, c in t_off._device_caches.values())
    _assert_bit_identical(p_on, p_off, hist_on, hist_off)


def test_cached_fit_bit_identical_dp8(tmp_path):
    """Cache correctness under the 8-device data-parallel mesh (the gather
    lands pre-sharded over 'data'; remainder batches pad + mask)."""
    mesh = create_mesh(devices=jax.devices("cpu"))
    _, hist_on, p_on = _fit(_cfg(tmp_path, "on"), mesh)
    _, hist_off, p_off = _fit(_cfg(tmp_path, "off"), mesh)
    _assert_bit_identical(p_on, p_off, hist_on, hist_off)


@pytest.mark.slow
def test_cached_skip_batches_matches_uncached(tmp_path):
    """Mid-epoch resume composition: cached epoch with skip_batches equals
    the uncached one batch-for-batch."""
    mesh = create_mesh(devices=jax.devices("cpu")[:1])
    results = {}
    for mode in ("on", "off"):
        cfg = _cfg(tmp_path, mode)
        trainer = Trainer(cfg, mesh=mesh)
        loader = _loader(cfg)
        trainer.init_state(loader.sample_batch())
        avg = trainer.train_epoch(loader, epoch=1, record=False,
                                  skip_batches=1)
        results[mode] = (avg, jax.device_get(trainer.state.params))
    assert results["on"][0] == results["off"][0]
    for a, b in zip(jax.tree_util.tree_leaves(results["on"][1]),
                    jax.tree_util.tree_leaves(results["off"][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_skips_float32_loader(tmp_path):
    cfg = _cfg(tmp_path, "auto")
    ds = SyntheticClipDataset(cfg.data, n=8, split="Train")
    loader = BatchLoader(ds, 8, transfer_dtype="float32")
    assert not cache_eligible(loader, 0.5)
    trainer = Trainer(cfg, mesh=create_mesh(devices=jax.devices("cpu")[:1]))
    trainer.init_state(loader.sample_batch())
    assert trainer._clip_cache(loader) is None


def test_on_raises_for_ineligible_loader(tmp_path):
    cfg = _cfg(tmp_path, "on")
    ds = SyntheticClipDataset(cfg.data, n=8, split="Train")
    loader = BatchLoader(ds, 8, transfer_dtype="float32")
    trainer = Trainer(cfg, mesh=create_mesh(devices=jax.devices("cpu")[:1]))
    with pytest.raises(ValueError, match="ineligible"):
        trainer._clip_cache(loader)


def test_budget_gate(tmp_path):
    """A split bigger than the HBM fraction stays uncached under 'auto'."""
    cfg = _cfg(tmp_path, "auto")
    loader = _loader(cfg, n=8)
    assert cache_eligible(loader, 0.5)
    assert not cache_eligible(loader, 1e-12)


def test_gather_matches_host_batches(tmp_path):
    """The cache's device batches equal the host loader's collated batches
    value-for-value (clips uint8, labels, valid) for a shuffled epoch."""
    cfg = _cfg(tmp_path, "auto")
    mesh = create_mesh(devices=jax.devices("cpu")[:1])
    loader = _loader(cfg)
    cache = DeviceClipCache(loader, mesh)
    dev_batches = list(cache.device_batches(epoch=1, k=1, nd=1))

    from cvad_tpu.runtime.mesh import pad_with_valid

    ref_loader = _loader(cfg)  # fresh: same dataset seed, same shuffle
    ref_loader.set_epoch(1)
    host_batches = [pad_with_valid(b, 1) for b in ref_loader]
    assert len(dev_batches) == len(host_batches)
    for dev, host in zip(dev_batches, host_batches):
        np.testing.assert_array_equal(np.asarray(dev["clips"]), host["clips"])
        np.testing.assert_array_equal(np.asarray(dev["labels"]),
                                      host["labels"])
        np.testing.assert_array_equal(np.asarray(dev["valid"]), host["valid"])


def test_cached_evaluate_matches_uncached(tmp_path):
    """evaluate() through the HBM cache (unshuffled eval loader) produces
    bit-identical metrics/outputs to the uncached host path."""
    mesh = create_mesh(devices=jax.devices("cpu")[:1])
    results = {}
    for mode in ("on", "off"):
        cfg = _cfg(tmp_path, mode)
        trainer = Trainer(cfg, mesh=mesh)
        train_loader = _loader(cfg, n=16)
        eval_ds = SyntheticClipDataset(cfg.data, n=11, split="Test")
        eval_loader = BatchLoader(eval_ds, cfg.data.batch_size,
                                  shuffle=False, transfer_dtype="uint8")
        trainer.init_state(train_loader.sample_batch())
        m = trainer.evaluate(eval_loader)
        results[mode] = m
        if mode == "on":
            assert trainer._device_caches[id(eval_loader)][1] is not None
    on, off = results["on"], results["off"]
    assert set(on) == set(off)
    for k in on:
        np.testing.assert_array_equal(np.asarray(on[k]), np.asarray(off[k]))


def test_on_mode_eval_falls_back_uncached(tmp_path):
    """device_cache='on' demands the cache for TRAIN loaders only: an
    ineligible eval loader (float32 transfer here) falls back to the
    uncached path instead of killing the run at its first eval."""
    cfg = _cfg(tmp_path, "on")
    mesh = create_mesh(devices=jax.devices("cpu")[:1])
    trainer = Trainer(cfg, mesh=mesh)
    train_loader = _loader(cfg, n=16)
    eval_ds = SyntheticClipDataset(cfg.data, n=6, split="Test")
    eval_loader = BatchLoader(eval_ds, cfg.data.batch_size, shuffle=False,
                              transfer_dtype="float32")  # ineligible
    trainer.init_state(train_loader.sample_batch())
    metrics = trainer.evaluate(eval_loader)  # must not raise
    assert trainer._device_caches[id(eval_loader)][1] is None
    assert "predictions" in metrics


def test_budget_counts_reserved_bytes(tmp_path):
    """The HBM budget covers caches already held: a second split that fits
    alone but not alongside the first stays uncached."""
    cfg = _cfg(tmp_path, "auto")
    loader = _loader(cfg, n=8)
    clip_bytes = 8 * int(np.prod(loader.dataset.get_uint8(0)[0].shape))
    from cvad_tpu.data.device_cache import device_bytes_limit

    frac = 1.5 * clip_bytes / device_bytes_limit()
    assert cache_eligible(loader, frac)
    assert not cache_eligible(loader, frac, reserved_bytes=clip_bytes)
