"""Temporal (sequence) sharding with halo exchange for 3D conv stacks.

The reference handles long videos only by host-side sliding windows
(``causal_anomaly_detection.py:57``, ``avenue_training_script_bbox.py:392``);
one clip never spans devices.  This module shards the clip's T axis across
the mesh's 'time' axis so much larger temporal windows fit and compute scales:
each device holds T/nt frames, temporal convolutions exchange 1-frame halos
with neighbors over ICI (`lax.ppermute`, which zero-fills at the edges —
exactly matching the torch zero padding), and the tiny post-conv feature map
is `all_gather`ed to finish pooling identically everywhere.

Halo rules for the reference's k=3, pad=1 temporal convs
(``avenue_training_script2.py:19-21``):
- stride 1: halo (left 1, right 1), windows start at -1 .. T-2;
- stride 2: halo (left 1, right 0), windows start at -1, 1, ... (local T even
  keeps shard output aligned at T/2).

Numerically identical to the unsharded forward (tests/test_temporal.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cvad_tpu.config import FamilyDConfig
from cvad_tpu.models.layers import adaptive_avg_pool3d

_DN = ("NTHWC", "THWIO", "NTHWC")


def temporal_shards_valid(t: int, n_time: int) -> bool:
    """Global T must split evenly and each local shard must stay stride-even
    through both stride-2 convs."""
    return t % n_time == 0 and (t // n_time) % 4 == 0


def _halo_exchange(x: jnp.ndarray, axis_name: str, left: int, right: int
                   ) -> jnp.ndarray:
    """Concatenate `left` frames from the left neighbor and `right` frames
    from the right neighbor onto the local T axis.  Edge shards receive
    zeros (ppermute's out-of-range fill), matching global zero padding."""
    n = jax.lax.axis_size(axis_name)
    parts = []
    if left:
        send_right = [(i, i + 1) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[:, -left:], axis_name, send_right))
    parts.append(x)
    if right:
        send_left = [(i + 1, i) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[:, :right], axis_name, send_left))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _conv_block(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                t_stride: int, axis_name: str) -> jnp.ndarray:
    """One temporal-halo conv + bias + relu with spatial torch padding."""
    left, right = (1, 1) if t_stride == 1 else (1, 0)
    x = _halo_exchange(x, axis_name, left, right)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(t_stride, 2, 2),
        padding=[(0, 0), (1, 1), (1, 1)], dimension_numbers=_DN)
    return jax.nn.relu(y + bias)


def _sharded_extractor(fe_params: Dict[str, Any], clips: jnp.ndarray,
                       cfg: FamilyDConfig, axis_name: str) -> jnp.ndarray:
    """Family-D CompactFeatureExtractor with the T axis sharded on
    `axis_name`.  `clips` is the local shard (B_local, T_local, H, W, C)."""
    x = clips
    for i, t_stride in enumerate((1, 2, 2)):
        layer = fe_params[f"conv3d_{i + 1}"]["conv"]
        x = _conv_block(x, layer["kernel"], layer["bias"], t_stride, axis_name)
    # conv output is tiny (T/4 x H/8 x W/8 x 64); gather the full T axis so
    # the adaptive pool sees the global sequence (identical on all shards)
    x = jax.lax.all_gather(x, axis_name, axis=1, tiled=True)
    x = adaptive_avg_pool3d(x, cfg.pool_out)
    x = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(x.shape[0], -1)
    fc = fe_params["fc"]
    return x @ fc["kernel"] + fc["bias"]


def temporal_sharded_forward(variables: Dict[str, Any], clips, mesh,
                             cfg: FamilyDConfig = FamilyDConfig()
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full family-D forward with clips sharded (batch over 'data', time over
    'time').  Returns (scores, adjacency, features) like the model's
    __call__; eval-mode (deterministic) semantics.

    The graph heads run on the time-replicated features inside the same
    shard_map, so the whole forward is one compiled SPMD program.
    """
    t = clips.shape[1]
    nt = mesh.shape["time"]
    if not temporal_shards_valid(t, nt):
        raise ValueError(
            f"T={t} not shardable over {nt} time devices (need T%({nt}*4)==0)")
    params = variables["params"]

    def fn(p, local_clips):
        feats = _sharded_extractor(p["feature_extractor"], local_clips, cfg,
                                   "time")
        d = cfg.causal_dim
        cd = p["causal_discovery"]
        h = jax.nn.relu(feats @ cd["net_0"]["kernel"] + cd["net_0"]["bias"])
        adj = jax.nn.sigmoid(h @ cd["net_2"]["kernel"] + cd["net_2"]["bias"])
        adj = adj.reshape(-1, d, d) * (1.0 - jnp.eye(d, dtype=adj.dtype))

        flat = adj.reshape(adj.shape[0], -1)
        g = jax.nn.relu(flat @ p["graph_encoder_0"]["kernel"]
                        + p["graph_encoder_0"]["bias"])
        g = g @ p["graph_encoder_3"]["kernel"] + p["graph_encoder_3"]["bias"]
        combined = jnp.concatenate([feats, g], axis=-1)
        s = jax.nn.relu(combined @ p["anomaly_predictor_0"]["kernel"]
                        + p["anomaly_predictor_0"]["bias"])
        s = jax.nn.sigmoid(s @ p["anomaly_predictor_2"]["kernel"]
                           + p["anomaly_predictor_2"]["bias"])
        return s, adj, feats

    shard_fn = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P("data", "time")),
        out_specs=(P("data"), P("data"), P("data")),
        # outputs are replicated over 'time' by the all_gather inside the
        # extractor; the static VMA checker cannot infer that, so disable it
        # (equivalence is asserted numerically in tests/test_temporal.py)
        check_vma=False,
    )
    clips = jax.device_put(clips, NamedSharding(mesh, P("data", "time")))
    return jax.jit(shard_fn)(params, clips)
