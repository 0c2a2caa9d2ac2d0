"""Family B — memory-bank video autoencoder.

TPU-native rebuild of ``causal_anomaly_detection1.py:124-321``
(``VideoAutoEncoder``): per-frame conv encoder to a 64-d tanh latent, LSTM
temporal encoder over the frame latents, a conv-transpose decoder re-rendering
frames from the sequence feature, and a 500-slot ring-buffer memory bank of
normal patterns scored by min cosine distance.

TPU-first redesign (SURVEY.md §3.3 note, §7 step 6):

- The reference encodes/decodes frames in Python loops
  (``:227-231``, ``:253-257``); here time folds into the batch for the encoder
  (one big conv over (B*T, H, W, C) — MXU-friendly) and the decoder runs
  **once** (the reference decodes the same sequence feature T times, producing
  T identical frames; one decode + broadcast is mathematically identical).
- The LSTM is a `flax` LSTMCell driven by `lax.scan` instead of cuDNN.
- The memory bank is **explicit functional state** (`MemoryBankState`)
  threaded through the jitted train step — the reference mutates registered
  buffers in-place (``:201-219``), which cannot exist under jit.  The
  reference's `memory_ptr` doubles as its fill counter, so its effective
  memory shrinks after wraparound; we track `fill` separately (capability
  superset, noted for the parity record).
- Min-cosine-distance scoring (``:262-301``) is a single (B, M) matmul with a
  fill mask; `cvad_tpu.ops.pallas_kernels.memory_min_cosine_distance` is the
  fused Pallas kernel for large memory banks.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvad_tpu.config import FamilyBConfig
from cvad_tpu.models.init import kaiming_normal_fan_out, xavier_normal
from cvad_tpu.models.layers import MaskedBatchNorm

# reference init_weights scheme (causal_anomaly_detection1.py:29-42)
_CONV_INIT = kaiming_normal_fan_out("leaky_relu", a=0.0)
_DENSE_INIT = xavier_normal(0.5)


class MemoryBankState(NamedTuple):
    """Functional ring buffer of normal-pattern latents."""

    memory: jnp.ndarray  # (M, D)
    ptr: jnp.ndarray  # () int32 — next write slot
    fill: jnp.ndarray  # () int32 — number of valid slots (<= M)


def init_memory(size: int, dim: int, dtype=jnp.float32) -> MemoryBankState:
    return MemoryBankState(
        memory=jnp.zeros((size, dim), dtype),
        ptr=jnp.zeros((), jnp.int32),
        fill=jnp.zeros((), jnp.int32),
    )


def update_memory(state: MemoryBankState, feats: jnp.ndarray) -> MemoryBankState:
    """FIFO write with wraparound (reference ``update_memory`` ``:201-219``),
    as a pure scatter so it jits and donates."""
    m = state.memory.shape[0]
    b = feats.shape[0]
    idx = (state.ptr + jnp.arange(b, dtype=jnp.int32)) % m
    memory = state.memory.at[idx].set(jax.lax.stop_gradient(feats.astype(state.memory.dtype)))
    ptr = (state.ptr + b) % m
    fill = jnp.minimum(state.fill + b, m)
    return MemoryBankState(memory, ptr, fill)


def memory_anomaly_score(state: MemoryBankState, feats: jnp.ndarray,
                         min_fill: int = 10) -> jnp.ndarray:
    """Min cosine distance to populated memory, scaled to [0, 1]
    (reference ``compute_anomaly_score`` ``:262-301``): L2-normalize both
    sides, similarities clamped to [-1, 1], distance = 1 - sim, min over
    memory, clamp [0, 2], /2.  Returns zeros until `min_fill` slots exist.

    Dispatches to the fused Pallas kernel
    (`cvad_tpu.ops.pallas_kernels.memory_min_cosine_distance`) on TPU — one
    VMEM-resident normalize+matmul+mask+min pass — and plain XLA elsewhere;
    equivalence is covered in tests/test_pallas.py."""
    from cvad_tpu.ops.pallas_kernels import memory_min_cosine_distance

    score = memory_min_cosine_distance(feats, state.memory, state.fill)
    return jnp.where(state.fill >= min_fill, score, jnp.zeros_like(score))


class _FrameEncoder(nn.Module):
    """64x64 frame -> latent (reference encoder ``:129-153``)."""

    cfg: FamilyBConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        dtype = jnp.dtype(getattr(self.cfg, "dtype", "float32"))
        x = x.astype(dtype)
        for i, c in enumerate(self.cfg.conv_channels):
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        kernel_init=_CONV_INIT, dtype=dtype,
                        name=f"conv_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(x, train=train, valid=valid)
            x = nn.leaky_relu(x, negative_slope=self.cfg.leaky_slope)
        # channel-major flatten to mirror torch nn.Flatten on (B, 128, 4, 4)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        z = nn.Dense(self.cfg.latent_dim, kernel_init=_DENSE_INIT, dtype=dtype,
                     name="fc")(x)
        # latent/memory path stays float32 (cosine search + LSTM carry)
        return nn.tanh(z).astype(jnp.float32)


class _FrameDecoder(nn.Module):
    """latent -> 64x64 frame (reference decoder ``:156-179``)."""

    cfg: FamilyBConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray, *, train: bool = False,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        ch = self.cfg.conv_channels  # (32, 64, 128, 128)
        dtype = jnp.dtype(getattr(self.cfg, "dtype", "float32"))
        z = z.astype(dtype)
        x = nn.leaky_relu(nn.Dense(ch[-1] * 4 * 4, kernel_init=_DENSE_INIT,
                                   dtype=dtype, name="fc")(z),
                          negative_slope=self.cfg.leaky_slope)
        x = x.reshape(x.shape[0], ch[-1], 4, 4)  # torch Unflatten (C, H, W)
        x = jnp.transpose(x, (0, 2, 3, 1))  # -> (B, 4, 4, C)
        outs = (ch[2], ch[1], ch[0])
        for i, c in enumerate(outs):
            x = nn.ConvTranspose(c, (4, 4), strides=(2, 2),
                                 padding=[(2, 2), (2, 2)], transpose_kernel=True,
                                 kernel_init=_CONV_INIT, dtype=dtype,
                                 name=f"deconv_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(x, train=train, valid=valid)
            x = nn.leaky_relu(x, negative_slope=self.cfg.leaky_slope)
        x = nn.ConvTranspose(self.cfg.in_channels, (4, 4), strides=(2, 2),
                             padding=[(2, 2), (2, 2)], transpose_kernel=True,
                             kernel_init=_CONV_INIT, dtype=dtype,
                             name="deconv_out")(x)
        # reconstruction loss accumulates in float32
        return nn.sigmoid(x).astype(jnp.float32)


class MemoryVideoAutoEncoder(nn.Module):
    """Clip (B, T, H, W, C) -> dict of reconstruction/features/scores.

    Memory state is passed in and scored against; updating it is the train
    step's job (`update_memory`), keeping this module pure.
    """

    cfg: FamilyBConfig = FamilyBConfig()

    def setup(self):
        self.cfg_encoder = self.cfg.temporal_encoder
        self.encoder = _FrameEncoder(self.cfg)
        self.decoder = _FrameDecoder(self.cfg)
        if self.cfg.temporal_encoder == "attention":
            from cvad_tpu.ops.attention import TemporalAttentionEncoder

            self.temporal = TemporalAttentionEncoder(
                num_layers=self.cfg.attn_layers, num_heads=self.cfg.attn_heads)
        else:
            self.lstm = nn.OptimizedLSTMCell(features=self.cfg.lstm_hidden)

    def encode_sequence(self, frames: jnp.ndarray, *, train: bool = False,
                        valid: jnp.ndarray | None = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T, H, W, C) -> (sequence_feature (B, D), frame_features (B, T, D)).

        Reference ``encode_sequence`` ``:221-246``: per-frame encode then LSTM,
        final hidden state is the sequence feature.  Time folds into batch for
        the encoder; the LSTM runs as a `scan` over T.
        """
        b, t = frames.shape[0], frames.shape[1]
        flat = frames.reshape((b * t,) + frames.shape[2:])
        fvalid = None if valid is None else jnp.repeat(valid, t)
        z = self.encoder(flat, train=train, valid=fvalid).reshape(b, t, -1)
        return self._temporal_feature(z), z

    def _temporal_feature(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, T, D) frame latents -> (B, D) sequence feature."""
        if self.cfg.temporal_encoder == "attention":
            return self.temporal(z)
        carry = self.lstm.initialize_carry(jax.random.key(0), z[:, 0].shape)
        scan = nn.scan(
            lambda cell, c, x: cell(c, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        (c_n, h_n), _ = scan(self.lstm, carry, z)
        return h_n

    def folded_forward(self, flat: jnp.ndarray, memory: MemoryBankState, *,
                       t: int, train: bool = False,
                       valid: jnp.ndarray | None = None
                       ) -> Dict[str, jnp.ndarray]:
        """Training-path forward over pre-folded frames (B*T, H, W, C).

        Identical math to ``__call__`` minus the broadcast reconstruction:
        no 5-D float tensor is ever traced, so the step does not rely on XLA
        cancelling the unfold/refold reshape pair (it did — the lowering is
        measured graph-identical — but the folded contract makes that
        guaranteed rather than lucky; PARITY.md family-B trace note).
        """
        b = flat.shape[0] // t
        fvalid = None if valid is None else jnp.repeat(valid, t)
        z = self.encoder(flat, train=train, valid=fvalid).reshape(b, t, -1)
        seq = self._temporal_feature(z)
        frame = self.decoder(seq, train=train, valid=valid)  # (B, H, W, C)
        score = memory_anomaly_score(memory, seq, self.cfg.memory_min_fill)
        return {
            "recon_frame": frame,
            "sequence_feature": seq,
            "frame_features": z,
            "anomaly_score": score,
        }

    def __call__(self, frames: jnp.ndarray, memory: MemoryBankState, *,
                 train: bool = False,
                 valid: jnp.ndarray | None = None) -> Dict[str, jnp.ndarray]:
        seq, per_frame = self.encode_sequence(frames, train=train, valid=valid)
        # one decode, broadcast over T (identical to the reference's T
        # redundant decodes of the same feature, ``:248-260``)
        frame = self.decoder(seq, train=train, valid=valid)  # (B, H, W, C)
        recon = jnp.broadcast_to(
            frame[:, None], (frame.shape[0], frames.shape[1]) + frame.shape[1:])
        score = memory_anomaly_score(memory, seq, self.cfg.memory_min_fill)
        return {
            "reconstructed": recon,
            "sequence_feature": seq,
            "frame_features": per_frame,
            "anomaly_score": score,
        }
