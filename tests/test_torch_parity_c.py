"""Family-C numerical parity: framework 3D-CNN with imported torch weights
reproduces the reference ``SimpleVideoAnomalyDetector`` eval forward."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from cvad_tpu.models import Simple3DCNNDetector  # noqa: E402
from cvad_tpu.models.layers import from_torch_layout  # noqa: E402
from cvad_tpu.runtime.checkpoint import import_torch_family_c  # noqa: E402
from tests.conftest import load_reference_module, requires_reference  # noqa: E402


@requires_reference
def test_family_c_forward_parity(tmp_path):
    ref = load_reference_module("minicausal_vad_complete3")
    torch.manual_seed(0)
    tm = ref.SimpleVideoAnomalyDetector()
    tm.eval()
    ckpt = tmp_path / "c.pth"
    torch.save(tm.state_dict(), ckpt)

    variables = import_torch_family_c(str(ckpt))
    model = Simple3DCNNDetector()

    x = np.random.default_rng(0).uniform(0, 1, (3, 1, 8, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ts = tm(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        js = model.apply(variables, from_torch_layout(jnp.asarray(x)),
                         train=False, deterministic=True)
    np.testing.assert_allclose(np.asarray(js), ts, atol=3e-5)
