"""Family-E numeric parity vs the reference bbox-viz torch model.

The reference ships no checkpoint that matches this architecture (its loader
silently falls back to random weights, ``avenue_training_script_bbox.py:150-155``),
so parity is proven on a randomly initialized torch oracle: share its weights
into :class:`BBoxVizDetector` via ``import_torch_family_e`` and compare the
deterministic forward within float32 tolerance, plus an export round-trip the
reference's ``load_trained_model`` formats accept.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from cvad_tpu.models import BBoxVizDetector  # noqa: E402
from cvad_tpu.models.layers import from_torch_layout  # noqa: E402
from cvad_tpu.runtime.checkpoint import (export_family_e_torch_state,  # noqa: E402
                                         import_torch_family_e)
from tests.conftest import load_reference_module, requires_reference  # noqa: E402


@pytest.fixture(scope="module")
def torch_model():
    ref = load_reference_module("avenue_training_script_bbox")
    torch.manual_seed(7)
    m = ref.CausalAnomalyDetector()
    m.eval()
    return m


@requires_reference
def test_family_e_forward_parity(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = import_torch_family_e(sd)

    x = np.random.default_rng(1).uniform(0, 1, (4, 3, 8, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ts, tadj, tf = torch_model(torch.from_numpy(x))

    model = BBoxVizDetector()
    with jax.default_matmul_precision("highest"):
        js, jadj, jf = model.apply(variables, from_torch_layout(jnp.asarray(x)))

    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jadj), tadj.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(js), ts.numpy(), atol=2e-4)


@requires_reference
def test_family_e_export_roundtrip(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = import_torch_family_e(sd)
    back = export_family_e_torch_state(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
    # the reference loader accepts {'model_state_dict': ...} wrappers
    # (avenue_training_script_bbox.py:131-141); the exported dict loads
    # straight into a fresh torch module
    ref = load_reference_module("avenue_training_script_bbox")
    fresh = ref.CausalAnomalyDetector()
    fresh.load_state_dict({k: torch.from_numpy(np.asarray(v))
                           for k, v in back.items()})
