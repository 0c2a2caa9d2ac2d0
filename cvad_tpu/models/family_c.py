"""Family C — minimal stable 3D-CNN anomaly classifier.

TPU-native rebuild of ``minicausal_vad_complete3.py:25-102``
(``SimpleVideoAnomalyDetector``): three Conv3d+BN+ReLU+MaxPool blocks
(1->8->16->32, temporal pooling from block 2), global average pool, and a
dropout MLP classifier 32->16->8->1 with sigmoid.

Channels-last (B, T, H, W, C) input; BN running stats live in the standard
flax 'batch_stats' collection (the torch model's running_mean/var import into
it via the checkpoint converter).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvad_tpu.config import FamilyCConfig
from cvad_tpu.models.init import kaiming_normal_fan_out, normal_std
from cvad_tpu.models.layers import Conv3dTorch, MaskedBatchNorm, max_pool3d


class Simple3DCNNDetector(nn.Module):
    """Clip (B, 8, 64, 64, 1) -> anomaly score (B, 1) in [0, 1].

    Weight init matches the reference's explicit scheme (:76-88): kaiming
    fan_out convs, normal(0, 0.01) dense, zero biases.
    """

    cfg: FamilyCConfig = FamilyCConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 deterministic: bool = True,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        conv_init = kaiming_normal_fan_out("relu")
        dense_init = normal_std(0.01)
        dtype = jnp.dtype(getattr(self.cfg, "dtype", "float32"))
        x = x.astype(dtype)
        mode = getattr(self.cfg, "conv_mode", "auto")
        if mode == "auto":
            from cvad_tpu.models.family_d import _resolve_lowering

            # same per-backend policy as family D: fold on accelerators
            mode = "tfold" if _resolve_lowering(self.cfg)[0] == "folded" \
                else "native"
        c1, c2, c3 = self.cfg.conv_channels
        pools = [(1, 2, 2), (2, 2, 2), (2, 2, 2)]  # minicausal_vad_complete3.py:41,47,53
        for i, (c, pool) in enumerate(zip((c1, c2, c3), pools)):
            x = Conv3dTorch(c, kernel_init=conv_init, dtype=dtype,
                            mode=mode, name=f"conv_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(x, train=train, valid=valid)
            x = nn.relu(x)
            x = max_pool3d(x, pool)
        # classifier head and loss accumulate in float32
        x = x.astype(jnp.float32).mean(axis=(1, 2, 3))  # AdaptiveAvgPool3d((1,1,1)) + flatten (:56,96-97)

        m1, m2 = self.cfg.mlp_dims
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(m1, kernel_init=dense_init, name="cls_1")(x))
        x = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(m2, kernel_init=dense_init, name="cls_4")(x))
        x = nn.sigmoid(nn.Dense(1, kernel_init=dense_init, name="cls_6")(x))
        return x
