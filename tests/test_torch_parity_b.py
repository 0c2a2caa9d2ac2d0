"""Family-B numerical parity: the framework autoencoder with imported torch
weights reproduces the reference ``VideoAutoEncoder`` forward (reconstruction,
sequence feature via LSTM, frame features, and memory anomaly scores)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from cvad_tpu.models import MemoryVideoAutoEncoder  # noqa: E402
from cvad_tpu.runtime.checkpoint import import_torch_family_b  # noqa: E402
from tests.conftest import load_reference_module, requires_reference  # noqa: E402


@requires_reference
def test_family_b_forward_parity(tmp_path):
    ref = load_reference_module("causal_anomaly_detection1")
    torch.manual_seed(0)
    tm = ref.VideoAutoEncoder()
    # populate the memory bank so the scoring path is exercised
    with torch.no_grad():
        tm.normal_memory[:50] = torch.randn(50, 64)
        tm.memory_ptr[0] = 50
    tm.eval()

    ckpt = tmp_path / "b.pth"
    torch.save(tm.state_dict(), ckpt)
    variables, memory = import_torch_family_b(str(ckpt))
    assert int(memory.fill) == 50

    rng = np.random.default_rng(0)
    x = rng.uniform(0.01, 0.99, (2, 8, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x))

    model = MemoryVideoAutoEncoder()
    xj = jnp.transpose(jnp.asarray(x), (0, 1, 3, 4, 2))  # (B,T,C,H,W)->(B,T,H,W,C)
    with jax.default_matmul_precision("highest"):
        jout = model.apply(variables, xj, memory, train=False)

    np.testing.assert_allclose(
        np.asarray(jout["sequence_feature"]),
        tout["sequence_feature"].numpy(), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(jout["frame_features"]),
        tout["frame_features"].numpy(), atol=3e-4)
    # ours is (B,T,H,W,C); torch (B,T,C,H,W)
    recon_j = np.transpose(np.asarray(jout["reconstructed"]), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(recon_j, tout["reconstructed"].numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(jout["anomaly_score"]),
                               tout["anomaly_score"].numpy(), atol=3e-4)
