"""Family E — bbox-visualization stand-in model.

TPU-native rebuild of the simplified ``CausalAnomalyDetector`` in
``avenue_training_script_bbox.py:51-101``: Conv3d 3->32 (+ReLU+MaxPool3d(2)),
Conv3d 32->64 (+ReLU), AdaptiveAvgPool3d(1,4,4) -> 1024 features, a causal
head producing a 16x16 sigmoid adjacency, and a sigmoid classifier.

In the reference this architecture cannot load the shipped family-D checkpoint
(module names differ; its loader silently falls back to random weights,
``:150-155``).  Here the inference/visualization pipeline
(`cvad_tpu.evaluation.bbox`) takes *any* registered model, so the shipped
checkpoint is actually usable end-to-end — the stand-in remains for surface
parity.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cvad_tpu.config import FamilyEConfig
from cvad_tpu.models.layers import Conv3dTorch, adaptive_avg_pool3d, max_pool3d


class BBoxVizDetector(nn.Module):
    """Clip (B, 8, 64, 64, 3) -> (scores (B,), adjacency (B,16,16), features (B,1024))."""

    cfg: FamilyEConfig = FamilyEConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        c1, c2 = self.cfg.conv_channels
        x = nn.relu(Conv3dTorch(c1, name="enc_conv0")(x))
        x = max_pool3d(x, (2, 2, 2))
        x = nn.relu(Conv3dTorch(c2, name="enc_conv3")(x))
        x = adaptive_avg_pool3d(x, (1, 4, 4))
        feats = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(x.shape[0], -1)  # (B, 1024)

        d = self.cfg.causal_dim
        h = nn.relu(nn.Dense(self.cfg.hidden, name="causal_0")(feats))
        adj = nn.sigmoid(nn.Dense(d * d, name="causal_2")(h)).reshape(-1, d, d)

        c = nn.relu(nn.Dense(128, name="cls_0")(feats))
        c = nn.Dropout(0.3, deterministic=deterministic)(c)
        score = nn.sigmoid(nn.Dense(1, name="cls_3")(c))[..., 0]
        return score, adj, feats
