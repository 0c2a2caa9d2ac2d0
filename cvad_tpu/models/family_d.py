"""Family D — flagship Avenue causal anomaly detector (parity anchor).

TPU-native rebuild of the checkpoint-producing model in
``avenue_training_script2.py:15-101`` (``CompactFeatureExtractor`` +
``DifferentiableCausalDiscovery`` + ``CausalAnomalyDetector``): a 3D-CNN clip
encoder produces 16 "causal variables", a NOTEARS-inspired head predicts a
per-sample 16x16 adjacency, a graph encoder embeds the flattened adjacency,
and a predictor scores cat[features, graph-embedding].

Differences from the reference are layout-only: channels-last ``(B,T,H,W,C)``
inputs, and the pooled feature map is transposed to channel-major before
flattening so imported torch ``fc`` weights apply unchanged.  Weights from
``best_improved_model.pth`` load via
``cvad_tpu.runtime.checkpoint.import_torch_family_d`` and reproduce reference
scores (see tests/test_torch_parity.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvad_tpu.config import FamilyDConfig
from cvad_tpu.models.layers import Conv3dTorch, adaptive_avg_pool3d


def _resolve_lowering(cfg) -> tuple:
    """Resolve 'auto' conv lowerings by target backend at trace time.

    The T-folded lowerings trade 10/3 the MACs for full MXU tile occupancy
    (PARITY.md hot-op table) — a win on accelerators with 128x128 tiles,
    a pure slowdown on CPU, so 'auto' picks per platform.  CVAD_PLATFORM=cpu
    (the repo-wide CPU pin used by tests/dryrun) counts as CPU even when an
    accelerator plugin is registered.
    """
    import os

    import jax

    stack = getattr(cfg, "conv_stack", "auto")
    conv1 = getattr(cfg, "conv1_mode", "auto")
    if "auto" in (stack, conv1):
        on_cpu = (os.environ.get("CVAD_PLATFORM") == "cpu"
                  or jax.default_backend() == "cpu")
        if stack == "auto":
            stack = "ndhwc" if on_cpu else "folded"
        if conv1 == "auto":
            conv1 = "native" if on_cpu else "tfold"
    return stack, conv1


class CompactFeatureExtractor(nn.Module):
    """3D CNN clip encoder -> `causal_dim` features.

    Reference: ``avenue_training_script2.py:15-35`` (convs 3->16->32->64 with
    strides (1,2,2)/(2,2,2)/(2,2,2), AdaptiveAvgPool3d(4,4,4), fc 4096->16,
    dropout 0.3 *after* fc).
    """

    cfg: FamilyDConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.dtype)
        x = x.astype(dtype)
        c1, c2, c3 = self.cfg.conv_channels
        stack, conv1_mode = _resolve_lowering(self.cfg)
        from cvad_tpu.models.layers import _useful_fold

        from cvad_tpu.ops.pallas_conv import fold_group_size

        gi = getattr(self.cfg, "conv_group_impl", "stack")
        folded = (stack in ("folded", "folded2", "folded3")
                  and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0
                  # whole-T fold at T=8; group-wise fold (windows of g=8)
                  # for long T (see layers._TFoldConv) — inflation pinned
                  # at (g+2)/3 either way.  Long T stays on the native
                  # stack unless the gconv group fold is requested.
                  and (_useful_fold(x.shape[1], c1)
                       or (gi in ("gconv", "s2d")
                           and fold_group_size(x.shape[1], c1) >= 2)))
        if folded:
            # transpose-free stack: conv1 T-folds into ONE well-shaped 2-D
            # conv (models/layers.py::_TFoldConv) and convs 2-3 consume the
            # resulting (B, H, W, T, C) layout directly via custom
            # dimension_numbers; the only layout op left is the tiny final
            # transpose before the pool.  Exact same math/params as the
            # ndhwc stack (tests/test_models.py::test_folded_stack_exact).
            # NOT fuse_relu=True: folded-domain relu measured 1740 vs
            # 1226 us/step (B=256) — layout assignment reacts by
            # materializing the relu mask + larger copies.  See layers.py
            # _TFoldConv.fuse_relu for the (exact) variant and CLAUDE.md.
            c1_mode = {"folded2": "tfold2", "folded3": "tfold3"}.get(stack,
                                                                     "tfold")
            x = nn.relu(Conv3dTorch(c1, stride=(1, 2, 2), dtype=dtype,
                                    mode=c1_mode, unfold=False,
                                    group_impl=gi, name="conv3d_1")(x))
            x = nn.relu(Conv3dTorch(c2, stride=(2, 2, 2), dtype=dtype,
                                    layout="hwtc", name="conv3d_2")(x))
            x = nn.relu(Conv3dTorch(c3, stride=(2, 2, 2), dtype=dtype,
                                    layout="hwtc", name="conv3d_3")(x))
            x = jnp.transpose(x, (0, 3, 1, 2, 4))
        else:
            if (conv1_mode in ("tfold", "tfold_pallas")
                    and not _useful_fold(x.shape[1], c1)
                    and gi not in ("gconv", "s2d")):
                conv1_mode = "native"  # long windows: native measures faster
            x = nn.relu(Conv3dTorch(c1, stride=(1, 2, 2), dtype=dtype,
                                    mode=conv1_mode, group_impl=gi,
                                    name="conv3d_1")(x))
            x = nn.relu(Conv3dTorch(c2, stride=(2, 2, 2), dtype=dtype,
                                    name="conv3d_2")(x))
            x = nn.relu(Conv3dTorch(c3, stride=(2, 2, 2), dtype=dtype,
                                    name="conv3d_3")(x))
        x = adaptive_avg_pool3d(x, self.cfg.pool_out)
        # channel-major flatten to match torch's view(B, C*T*H*W)
        x = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(x.shape[0], -1)
        x = nn.Dense(self.cfg.causal_dim, dtype=dtype, name="fc")(x)
        x = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(x)
        # heads and losses accumulate in float32 (fp32 loss accumulation,
        # SURVEY.md §2.9 mixed-precision row)
        return x.astype(jnp.float32)


class DifferentiableCausalDiscovery(nn.Module):
    """NOTEARS-inspired adjacency head.

    Reference: ``avenue_training_script2.py:37-67``.  One batched MLP
    (16 -> 32 -> 256, sigmoid) reshaped to (B, 16, 16) with the diagonal
    masked to forbid self-loops.
    """

    cfg: FamilyDConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        d = self.cfg.causal_dim
        h = nn.relu(nn.Dense(self.cfg.causal_hidden, name="net_0")(features))
        adj = nn.sigmoid(nn.Dense(d * d, name="net_2")(h))
        adj = adj.reshape(features.shape[0], d, d)
        return adj * (1.0 - jnp.eye(d, dtype=adj.dtype))


def acyclicity_constraint(adj: jnp.ndarray) -> jnp.ndarray:
    """tr((batch-mean adjacency)^2) — the stabilized NOTEARS surrogate the
    reference trains with (``avenue_training_script2.py:151-153``)."""
    m = adj.mean(axis=0)
    return jnp.trace(m @ m)


class CausalAnomalyDetector(nn.Module):
    """Full family-D model: clip -> (scores, adjacency, features).

    Reference assembly: ``avenue_training_script2.py:69-101``.
    Input: (B, T=8, H=64, W=64, C=3) channels-last clips in [0, 1].
    """

    cfg: FamilyDConfig = FamilyDConfig()

    @nn.compact
    def __call__(
        self, clips: jnp.ndarray, *, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        features = CompactFeatureExtractor(cfg, name="feature_extractor")(
            clips, deterministic=deterministic)
        adj = DifferentiableCausalDiscovery(cfg, name="causal_discovery")(features)

        flat = adj.reshape(adj.shape[0], -1)
        g = nn.relu(nn.Dense(cfg.hidden_dim, name="graph_encoder_0")(flat))
        g = nn.Dropout(cfg.dropout, deterministic=deterministic)(g)
        g = nn.Dense(cfg.graph_embed_dim, name="graph_encoder_3")(g)

        combined = jnp.concatenate([features, g], axis=-1)
        s = nn.relu(nn.Dense(32, name="anomaly_predictor_0")(combined))
        s = nn.sigmoid(nn.Dense(1, name="anomaly_predictor_2")(s))
        return s, adj, features
