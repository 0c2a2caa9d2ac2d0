"""Score parity against the reference PyTorch implementation.

BASELINE.md north star: "reproduce frame-level anomaly scores within
tolerance of best_improved_model.pth behavior".  The torch reference is
imported from the read-only checkout as an *oracle* (never copied); parity is
defined on the deterministic eval path (SURVEY.md §7 hard parts).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from cvad_tpu.models import CausalAnomalyDetector  # noqa: E402
from cvad_tpu.models.layers import from_torch_layout  # noqa: E402
from cvad_tpu.runtime.checkpoint import (export_family_d_torch_state,  # noqa: E402
                                         import_torch_family_d,
                                         load_torch_state_dict)
from tests.conftest import load_reference_module, requires_reference  # noqa: E402

CKPT = "/root/reference/best_improved_model.pth"


@pytest.fixture(scope="module")
def torch_model():
    ref = load_reference_module("avenue_training_script2")
    m = ref.CausalAnomalyDetector()
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
    m.load_state_dict(ckpt["model_state_dict"])
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_variables():
    return import_torch_family_d(CKPT)


@requires_reference
def test_checkpoint_import_shapes(jax_variables):
    n = sum(int(np.asarray(p).size)
            for p in jax.tree_util.tree_leaves(jax_variables))
    assert n == 188_849


@requires_reference
def test_forward_score_parity(torch_model, jax_variables):
    x = np.random.default_rng(0).uniform(0, 1, (8, 3, 8, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ts, tadj, tf = torch_model(torch.from_numpy(x))

    model = CausalAnomalyDetector()
    with jax.default_matmul_precision("highest"):
        js, jadj, jf = model.apply(jax_variables, from_torch_layout(jnp.asarray(x)))

    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jadj), tadj.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(js).ravel(), ts.numpy().ravel(), atol=2e-4)


@requires_reference
def test_checkpoint_roundtrip(jax_variables):
    sd = export_family_d_torch_state(jax_variables)
    orig = load_torch_state_dict(CKPT)
    assert set(sd) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(sd[k], orig[k])


@requires_reference
def test_checkpoint_eval_metrics_provenance():
    """The shipped checkpoint records epoch 0 and eval metrics equal to the
    history's first eval entry (BASELINE.md provenance row)."""
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 0
    import json

    with open("/root/reference/improved_training_history.json") as f:
        hist = json.load(f)
    first = hist["evaluation_metrics"][0]
    for k, v in ckpt["eval_metrics"].items():
        assert abs(first[k] - v) < 1e-9
