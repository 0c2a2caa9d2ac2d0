"""Numeric parity for the EARLIER family-A pipeline (anchor variant) vs the
``video_anomaly_detection.py`` torch oracle.

Same contract as tests/test_torch_parity_a.py: share random torch weights via
``import_torch_family_a(..., variant='anchor')``, pin the oracle's VAE to its
mean path, and compare the deterministic forward on the validity patterns the
reference actually produces.  The anchor detector keeps boxes whose sigmoid
confidence exceeds 0.5 (``video_anomaly_detection.py:156-161``), so the
patterns are pinned through the confidence head's bias:

- 'none'  — every confidence < 0.5: each frame gets the dummy zero box
  (``:160-161``), one trajectory per sample;
- 'all3'  — all three anchors pass with strictly descending confidences, so
  torch's topk ordering equals slot order and its packed rows align with our
  slot-identity masked layout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from conftest import load_reference_module, requires_reference  # noqa: E402

from cvad_tpu.config import preset  # noqa: E402
from cvad_tpu.models import build_model  # noqa: E402
from cvad_tpu.runtime.checkpoint import import_torch_family_a  # noqa: E402

B, T, H, W = 2, 4, 240, 360


@pytest.fixture(scope="module")
def ref():
    return load_reference_module("video_anomaly_detection")


def _make_oracle(ref, detector_mode, seed=0):
    torch.manual_seed(seed)
    model = ref.CausalAnomalyDetector(num_factors=6, reid_dim=64)
    model.eval()
    ref.CausalFactorExtractor.reparameterize = lambda self, mu, logvar: mu
    with torch.no_grad():
        model.detector.conf_head.weight.data.zero_()
        bias = (torch.tensor([2.1, 2.0, 1.9]) if detector_mode == "all3"
                else torch.tensor([-2.0, -2.0, -2.0]))
        model.detector.conf_head.bias.data = bias
    return model


def _run_both(ref, detector_mode):
    model_t = _make_oracle(ref, detector_mode)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    variables = import_torch_family_a(sd, variant="anchor")

    cfg = preset("causal_pipeline_v0")
    model_j = build_model(cfg.model)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (B, T, H, W, 1)).astype(np.float32)
    x_t = torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)))

    with torch.no_grad():
        out_t = model_t(x_t)
    with jax.default_matmul_precision("highest"):
        out_j = model_j.apply(variables, jnp.asarray(x), train=False,
                              deterministic=True)
    return out_t, out_j


@requires_reference
@pytest.mark.parametrize("detector_mode", ["none", "all3"])
def test_anchor_forward_parity(ref, detector_mode):
    out_t, out_j = _run_both(ref, detector_mode)

    boxes = np.asarray(out_j["detections"])      # (B, T, K, 4)
    mask = np.asarray(out_j["detection_mask"])   # (B, T, K)
    expected_n = 3 if detector_mode == "all3" else 1
    for b in range(B):
        for t in range(T):
            ref_rows = out_t["detections"][b][t].numpy()
            ours = boxes[b, t][mask[b, t]]
            assert ours.shape == ref_rows.shape == (expected_n, 4)
            np.testing.assert_allclose(ours, ref_rows, rtol=2e-4, atol=2e-4)

    factors = np.asarray(out_j["causal_factors"])     # (B, K, F)
    traj_mask = np.asarray(out_j["trajectory_mask"])  # (B, K)
    for b in range(B):
        ref_f = out_t["causal_factors"][b].numpy()
        np.testing.assert_allclose(factors[b][traj_mask[b]], ref_f,
                                   rtol=5e-4, atol=5e-4)
        assert np.all(factors[b][~traj_mask[b]] == 0.0)

    adj_t = np.stack([a.numpy() for a in out_t["adjacency_matrices"]])
    np.testing.assert_allclose(np.asarray(out_j["adjacency_matrices"]), adj_t,
                               rtol=5e-4, atol=5e-4)

    kl_t = np.asarray([k.item() for k in out_t["kl_losses"]])
    np.testing.assert_allclose(np.asarray(out_j["kl_losses"]), kl_t,
                               rtol=5e-4, atol=5e-4)

    np.testing.assert_allclose(np.asarray(out_j["anomaly_scores"]),
                               out_t["anomaly_scores"].numpy(),
                               rtol=5e-4, atol=5e-4)


@requires_reference
def test_anchor_variant_param_tree_loads(ref):
    """The imported anchor tree initializes apply() without unused or missing
    parameters (flax raises on tree mismatch)."""
    model_t = _make_oracle(ref, "all3")
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    variables = import_torch_family_a(sd, variant="anchor")
    model_j = build_model(preset("causal_pipeline_v0").model)
    init_tree = model_j.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 2, H, W, 1), jnp.float32))
    flat_a = set(map("/".join, _paths(init_tree["params"])))
    flat_b = set(map("/".join, _paths(variables["params"])))
    assert flat_a == flat_b


def _paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _paths(v, prefix + (k,))
    else:
        yield prefix
