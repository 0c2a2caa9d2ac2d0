"""DP remainder batches are gradient-exact (VERDICT r1 item 6).

Edge-mode padding keeps shapes static for the mesh, and the "valid" mask
carried by `pad_with_valid` removes the padded rows from every loss term, so
a 13-row batch on an 8-device mesh produces the same update as the same 13
rows unpadded — the reference simply ran the small batch on its one device
(e.g. ``avenue_training_script2.py:207-263`` iterates whatever the loader
yields).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import preset
from cvad_tpu.runtime.mesh import pad_with_valid
from cvad_tpu.train.tasks import build_task


def _batch(rng, n, t=8, hw=16, c=3):
    return {
        "clips": rng.uniform(0, 1, (n, t, hw, hw, c)).astype(np.float32),
        "labels": (rng.uniform(size=n) > 0.7).astype(np.float32),
    }


def _garbage_pad(batch, total, rng):
    """Pad axis 0 to `total` rows with random garbage + a valid mask."""
    n = batch["labels"].shape[0]
    out = {}
    for k, v in batch.items():
        pad_shape = (total - n,) + v.shape[1:]
        out[k] = np.concatenate([v, rng.uniform(0, 1, pad_shape).astype(v.dtype)])
    out["valid"] = (np.arange(total) < n).astype(np.float32)
    return out


@pytest.mark.parametrize("family", [
    "family_d", "family_c", "family_b",
    pytest.param("causal_pipeline", marks=pytest.mark.slow)])
def test_padded_rows_do_not_affect_update(family, np_rng):
    """Same real rows + different garbage padding -> identical new params."""
    cfg = preset(family)
    # family B's decoder output is fixed at its configured 64x64x1 frames
    hw, c = (64, 1) if family == "family_b" else (16, 3)
    cfg = cfg.replace(data=cfg.data.replace(batch_size=16, frame_size=(hw, hw)))
    task = build_task(cfg)
    batch = _batch(np_rng, 13, hw=hw, c=c)
    rng2 = np.random.default_rng(1)
    rng3 = np.random.default_rng(2)
    padded_a = jax.tree.map(jnp.asarray, _garbage_pad(batch, 16, rng2))
    padded_b = jax.tree.map(jnp.asarray, _garbage_pad(batch, 16, rng3))

    state = task.init_state(jax.random.key(0), padded_a)
    step = jax.jit(task.train_step)
    rng = jax.random.key(1)
    new_a, metrics_a = step(state, padded_a, rng)
    new_b, metrics_b = step(state, padded_b, rng)

    for la, lb in zip(jax.tree.leaves(new_a.params), jax.tree.leaves(new_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-6, rtol=1e-5)
    assert np.isclose(float(metrics_a["loss"]), float(metrics_b["loss"]),
                      atol=1e-6)


def test_remainder_batch_matches_unpadded_loss(np_rng):
    """Family-C: padded+masked loss == unpadded loss (no batch-size-dependent
    randomness on this path)."""
    cfg = preset("family_c")
    cfg = cfg.replace(data=cfg.data.replace(batch_size=16, frame_size=(16, 16)))
    task = build_task(cfg)
    batch = _batch(np_rng, 13, c=1)
    padded = pad_with_valid(batch, 8)
    assert padded["clips"].shape[0] == 16
    assert padded["valid"].sum() == 13

    state = task.init_state(jax.random.key(0), jax.tree.map(jnp.asarray, batch))
    rng = jax.random.key(1)
    # dropout rng draws differ by batch size, so compare the deterministic
    # eval losses row-for-row instead of the stochastic train loss
    out_unpadded = task.eval_step(state, jax.tree.map(jnp.asarray, batch))
    out_padded = task.eval_step(state, jax.tree.map(jnp.asarray, dict(padded)))
    np.testing.assert_allclose(np.asarray(out_padded["loss"])[:13],
                               np.asarray(out_unpadded["loss"]),
                               atol=1e-5, rtol=1e-5)


def test_engine_epoch_with_remainder(cpu_devices, tmp_path, np_rng):
    """A loader whose last batch is a remainder trains through the 8-device
    mesh without shape errors and with finite masked metrics."""
    from cvad_tpu.runtime.mesh import create_mesh
    from cvad_tpu.train.engine import Trainer

    cfg = preset("family_d")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=16, frame_size=(16, 16)),
        train=cfg.train.replace(out_dir=str(tmp_path), log_every=10**9),
    )
    mesh = create_mesh(devices=cpu_devices)
    trainer = Trainer(cfg, mesh=mesh)
    batches = [_batch(np_rng, 16), _batch(np_rng, 13)]  # remainder last
    trainer.init_state(batches[0])
    avg = trainer.train_epoch(iter(batches), epoch=1)
    assert np.isfinite(avg["loss"])


def test_family_b_padding_does_not_pollute_memory(np_rng):
    """Padded rows must not be written into the family-B memory bank."""
    cfg = preset("family_b")
    cfg = cfg.replace(data=cfg.data.replace(batch_size=8, frame_size=(64, 64)))
    task = build_task(cfg)
    batch = _batch(np_rng, 5, t=8, hw=64, c=1)
    batch["labels"] = np.zeros(5, np.float32)  # all normal -> all memorized
    padded = jax.tree.map(jnp.asarray, _garbage_pad(batch, 8, np.random.default_rng(3)))
    padded["labels"] = jnp.zeros(8)  # garbage rows also labeled normal ...
    state = task.init_state(jax.random.key(0), padded)
    new_state, _ = jax.jit(task.train_step)(state, padded, jax.random.key(1))
    # ... but only the 5 valid rows may reach the bank
    assert int(new_state.extra.fill) == 5
