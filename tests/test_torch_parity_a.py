"""Family-A numeric parity vs the reference torch oracle.

The reference ``CausalAnomalyDetector`` (``causal_anomaly_detection.py:508-586``)
runs stages 2-8 as ragged Python loops; our redesign replaces them with
fixed-shape masked ops (``cvad_tpu/models/family_a.py``).  These tests share
random torch weights both ways (``import_torch_family_a``) and compare the
deterministic eval forward per stage.

Where masked semantics legitimately diverge from ragged (documented contract):

- The reference's VAE head *samples* even in eval (``:328-331`` uses
  ``torch.randn_like`` unconditionally); parity is defined on the
  deterministic path (z = mu), so the oracle's ``reparameterize`` is pinned
  to mu for comparison (SURVEY.md §7 hard part #3).
- The reference packs valid boxes compactly per frame before stacking
  (``:207-229``); our masked layout keeps slot identity.  The two coincide
  exactly when validity is a prefix of the slots — which covers both paths
  the reference actually produces at/near init: all-invalid -> fallback box
  (sigmoid(bias≈180) saturates x to 360 > 350) and all/prefix-valid.  Both
  scenarios are asserted below; non-prefix patterns are the documented
  divergence (slot-k trajectory vs packed-k trajectory).
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
    return load_reference_module("causal_anomaly_detection")


def _make_oracle(ref, seed=0, detector_mode="init"):
    """Reference model in eval mode with the VAE pinned to its mean path."""
    torch.manual_seed(seed)
    model = ref.CausalAnomalyDetector(num_factors=6, reid_dim=64)
    model.eval()
    ref.CausalFactorExtractor.reparameterize = lambda self, mu, logvar: mu
    if detector_mode == "prefix3":
        # slots 0-2 always valid (raw ~ 0 -> x~180, y~120, w~55, h~85),
        # slots 3-4 always invalid (raw ~ +20 -> sigmoid saturates, x~360)
        with torch.no_grad():
            head = model.detector.detector_net[-1]
            head.weight.data *= 1e-2
            bias = torch.zeros(20)
            bias[12:] = 20.0
            head.bias.data = bias
    return model


def _run_both(ref, detector_mode):
    model_t = _make_oracle(ref, detector_mode=detector_mode)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    variables = import_torch_family_a(sd)

    cfg = preset("family_a")
    model_j = build_model(cfg.model)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (B, T, H, W, 1)).astype(np.float32)
    x_t = torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)))  # (B,T,C,H,W)

    with torch.no_grad():
        out_t = model_t(x_t)
    with jax.default_matmul_precision("highest"):
        out_j = model_j.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False, deterministic=True)
    return model_t, variables, x, x_t, out_t, out_j


@requires_reference
def test_backbone_parity(ref):
    """Stage 1 alone: conv/BN/pool tower matches torch to fp32 tolerance."""
    from cvad_tpu.models.family_a import ResNetBackbone

    model_t = _make_oracle(ref)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    variables = import_torch_family_a(sd)
    cfg = preset("family_a").model

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (B, T, H, W, 1)).astype(np.float32)
    with torch.no_grad():
        feats_t = model_t.backbone(
            torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)))).numpy()
    with jax.default_matmul_precision("highest"):
        feats_j = ResNetBackbone(cfg).apply(
            {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]},
            jnp.asarray(x), False, None)
    # the framework flattens in natural (h, w, c) order (no per-step
    # transpose); torch flattens channel-major — compare through the same
    # permutation the importer applies to consumer weights
    from cvad_tpu.runtime.checkpoint import family_a_feature_permutation

    perm = family_a_feature_permutation()
    np.testing.assert_allclose(np.asarray(feats_j), feats_t[:, :, perm],
                               rtol=2e-4, atol=2e-4)


@requires_reference
@pytest.mark.parametrize("detector_mode", ["init", "prefix3"])
def test_full_forward_parity(ref, detector_mode):
    """Stages 1-10 end to end on both reference-reachable validity patterns."""
    model_t, variables, x, x_t, out_t, out_j = _run_both(ref, detector_mode)

    # detections: every valid slot matches a reference row, in order
    boxes = np.asarray(out_j["detections"])      # (B, T, K, 4)
    mask = np.asarray(out_j["detection_mask"])   # (B, T, K)
    expected_n = 1 if detector_mode == "init" else 3
    for b in range(B):
        for t in range(T):
            ref_rows = out_t["detections"][b][t].numpy()
            ours = boxes[b, t][mask[b, t]]
            assert ours.shape == ref_rows.shape == (expected_n, 4)
            np.testing.assert_allclose(ours, ref_rows, rtol=2e-4, atol=2e-3)

    # causal factors: valid slots == reference rows (invalid slots are zero)
    factors = np.asarray(out_j["causal_factors"])    # (B, K, F)
    traj_mask = np.asarray(out_j["trajectory_mask"])  # (B, K)
    for b in range(B):
        ref_f = out_t["causal_factors"][b].numpy()
        np.testing.assert_allclose(factors[b][traj_mask[b]], ref_f,
                                   rtol=5e-4, atol=5e-4)
        assert np.all(factors[b][~traj_mask[b]] == 0.0)

    # adjacency + KL + the three score surfaces
    adj_t = np.stack([a.numpy() for a in out_t["adjacency_matrices"]])
    np.testing.assert_allclose(np.asarray(out_j["adjacency_matrices"]), adj_t,
                               rtol=5e-4, atol=5e-4)
    kl_t = np.asarray([k.item() for k in out_t["kl_losses"]])
    np.testing.assert_allclose(np.asarray(out_j["kl_losses"]), kl_t,
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_j["direct_predictions"]),
                               out_t["direct_predictions"].numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_j["causal_anomaly_scores"]),
                               out_t["causal_anomaly_scores"].numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_j["anomaly_scores"]),
                               out_t["anomaly_scores"].numpy(),
                               rtol=5e-4, atol=5e-4)


@requires_reference
def test_structure_params_roundtrip(ref):
    model_t = _make_oracle(ref)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    variables = import_torch_family_a(sd)
    np.testing.assert_array_equal(
        variables["params"]["structure_learner"]["structure_params"],
        model_t.structure_learner.structure_params.detach().numpy())
