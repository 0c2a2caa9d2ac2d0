"""Typed configuration system.

The reference has no config system at all — every knob is a hard-coded literal
(SURVEY.md §5 "Config / flag system": e.g. config dict at
``minicausal_vad_complete3.py:516-526``, loss weights as attributes at
``avenue_training_script2.py:122-125``, magic resize/threshold constants
inline).  Here every one of those constants becomes a named, typed field, and
each entry point takes exactly one config object.  Configs are plain frozen
dataclasses so they hash (usable as jit static args) and serialize to JSON.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Tuple


def _asdict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: _asdict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [_asdict(v) for v in cfg]
    return cfg


class _Base:
    """JSON round-trip + `replace` for all configs."""

    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self, **kw) -> str:
        return json.dumps(self.to_dict(), indent=2, **kw)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            sub = f.type if isinstance(f.type, type) else None
            if dataclasses.is_dataclass(sub) and isinstance(v, Mapping):
                v = sub.from_dict(v)  # type: ignore[union-attr]
            elif isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
        return cls(**kwargs)  # type: ignore[call-arg]

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DataConfig(_Base):
    """Clip-windowing / decode parameters.

    Defaults mirror the checkpoint-producing Avenue pipeline: 8-frame RGB
    clips at 64x64 (``avenue_training_script2.py:357-365`` call-site contract
    for the missing ``create_avenue_dataloaders`` module, SURVEY.md §2.1).
    """

    dataset: str = "synthetic"  # synthetic | avenue | ucsd_ped2 | ucsd_ped2_simple
    root: str = ""
    clip_len: int = 8
    frame_size: Tuple[int, int] = (64, 64)  # (H, W)
    channels: int = 3
    stride: int = 4  # reference: seq_len//2, //4, or 4 depending on variant
    max_clips_per_video: int = 0  # 0 = unlimited (minicausal_vad_complete3.py:156-174)
    grayscale: bool = False
    normalize_clamp: Tuple[float, float] = (0.0, 1.0)  # family B used (0.001, 0.999)
    # Synthetic-label policy name; these are observable reference behavior
    # (SURVEY.md §4 "Synthetic data in place of fixtures").
    label_policy: str = "none"  # none | heuristic_v1 | hardcoded_v2 | split_binary | mixed_simple
    batch_size: int = 32
    shuffle_buffer: int = 2048
    prefetch: int = 2
    num_decode_threads: int = 4
    decode_backend: str = "auto"  # auto | native | pil | cv2 | npy
    cache_decoded: bool = True  # memoize decoded clips (epochs 2+ skip decode)
    # host->device transfer dtype: uint8 sends 4x fewer bytes; the jitted
    # step normalizes on device (float32 = decode-side normalize)
    transfer_dtype: str = "float32"  # float32 | uint8
    # synthetic-generator difficulty: 'easy' = the original separable fixture
    # recipe; 'hard' = identical appearance stats both classes, motion
    # coherence the only signal (data/synthetic.py::_render_video)
    synthetic_profile: str = "easy"
    seed: int = 0


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FamilyDConfig(_Base):
    """Flagship Avenue causal model (checkpoint parity anchor).

    Shapes per ``avenue_training_script2.py:15-101``: 3D CNN 3->16->32->64,
    adaptive pool (4,4,4), 16 causal variables, 16x16 adjacency, 128-hidden
    graph encoder -> 64, predictor 80->32->1 sigmoid.
    """

    name: str = "family_d"
    in_channels: int = 3
    causal_dim: int = 16
    hidden_dim: int = 128
    graph_embed_dim: int = 64
    causal_hidden: int = 32
    dropout: float = 0.3
    pool_out: Tuple[int, int, int] = (4, 4, 4)
    conv_channels: Tuple[int, int, int] = (16, 32, 64)
    # computation dtype ('float32' | 'bfloat16'); params stay float32 — the
    # TPU analog of the reference's CUDA AMP (no loss scaling needed on TPU)
    dtype: str = "float32"
    # conv1 lowering — mathematically exact relowerings of the same conv
    # (same parameter tree; tests/test_models.py::test_conv1_mode_exact):
    #   'native' plain lax conv: im2col matmul (M,81)x(81,16), 7.9% of an
    #            MXU tile (traced at 12 TF/s fwd / 8 TF/s wgrad)
    #   'tfold'  T axis folded into channels, ONE 2-D conv with matmul
    #            (M,270)x(270,128) — full lane occupancy; cuts the traced
    #            B=256 bf16 step 2170 -> 1563 us (conv1 matmuls 1086 -> 268)
    #   'tfold_pallas' the folded conv1 as a fused Pallas kernel
    #   'tpair'/'s2d'/'cpad' earlier probe lowerings, kept for comparison
    # 'auto' = 'tfold' on accelerators, 'native' on CPU (the fold trades
    # 10/3 the MACs for MXU tile occupancy — a win only where tiles exist)
    conv1_mode: str = "auto"
    # conv-stack layout: 'ndhwc' runs convs 2-3 on (B,T,H,W,C) tensors;
    # 'folded' chains them on conv1's T-folded (B,H,W,T,C) output via custom
    # dimension_numbers — no unfold/refold between conv1 and conv2 (same
    # math/params; tests/test_models.py::test_folded_stack_exact).  Traced
    # B=256 bf16 step: native 2170 us -> tfold 1563 -> folded 1361 (~1.6x).
    # 'auto' = 'folded' on accelerators, 'ndhwc' on CPU.
    conv_stack: str = "auto"
    # long-T (T > 128/c1) group-fold lowering when conv1_mode='tfold':
    # 'stack' legacy window stack (measured 2.6x slower than native at
    # T=64 — auto paths fall back to native), or 'gconv' one
    # feature_group_count conv over a channel-halo gather (layers.py
    # _TFoldConv.group_impl); 'gconv' also disables the native fallback so
    # long-T folds can be measured end-to-end
    conv_group_impl: str = "stack"


@dataclass(frozen=True)
class FamilyCConfig(_Base):
    """Minimal stable 3D-CNN classifier (``minicausal_vad_complete3.py:25-102``)."""

    name: str = "family_c"
    # computation dtype; params/BN-stats stay float32 (same contract as
    # families B/D; train.dtype='bfloat16' flips this automatically)
    dtype: str = "float32"
    # conv lowering: 'native' | 'tfold' | 'auto' (tfold on accelerators) —
    # every family-C conv is stride-1 k3 with T*Cout <= 128, so the T-fold
    # fills the MXU lanes exactly (models/layers.py::_TFoldConv, stride-1)
    conv_mode: str = "auto"
    in_channels: int = 1
    conv_channels: Tuple[int, int, int] = (8, 16, 32)
    mlp_dims: Tuple[int, int] = (16, 8)
    dropout: float = 0.3


@dataclass(frozen=True)
class FamilyBConfig(_Base):
    """Memory-bank video autoencoder (``causal_anomaly_detection1.py:124-321``)."""

    name: str = "family_b"
    in_channels: int = 1
    latent_dim: int = 64
    conv_channels: Tuple[int, int, int, int] = (32, 64, 128, 128)
    memory_size: int = 500
    memory_min_fill: int = 10
    lstm_hidden: int = 64
    leaky_slope: float = 0.1
    # temporal encoder: 'lstm' (reference parity) or 'attention' (flash-
    # attention transformer for long windows, BASELINE.json config 5)
    temporal_encoder: str = "lstm"
    attn_heads: int = 4
    attn_layers: int = 2
    # computation dtype ('float32' | 'bfloat16'); params stay float32 and
    # BatchNorm statistics always accumulate in float32 (the TPU AMP analog,
    # same contract as FamilyDConfig.dtype).  train.dtype='bfloat16' flips
    # this automatically, like family D.
    dtype: str = "float32"


@dataclass(frozen=True)
class FamilyAConfig(_Base):
    """12-stage causal pipeline (``causal_anomaly_detection.py:508-586``),
    redesigned with fixed-shape masked ops (SURVEY.md §7a)."""

    name: str = "family_a"
    frame_hw: Tuple[int, int] = (240, 360)  # reference resizes to 360x240 (W,H)
    backbone_channels: Tuple[int, int, int, int, int] = (32, 32, 64, 128, 256)
    backbone_pool: Tuple[int, int] = (4, 6)
    max_boxes: int = 5  # fixed-K masked detector instead of ragged lists
    num_factors: int = 6
    reid_dim: int = 64
    gru_hidden: int = 64
    traj_latent: int = 32
    direct_variant: bool = True  # enhanced version w/ direct classifier + 0.6/0.4 blend
    anchor_variant: bool = False  # earlier video_anomaly_detection.py detector head
    freeze_stem: bool = True  # freeze backbone conv1/bn1 (apply_memory_efficient_training, :592-607)
    remat: bool = False  # jax.checkpoint the backbone: trade FLOPs for HBM on large frames
    score_blend: Tuple[float, float] = (0.6, 0.4)  # causal vs direct (:574)
    scorer_blend: Tuple[float, float, float] = (0.5, 0.3, 0.2)  # causal/motion/temporal (:497)
    # computation dtype ('float32' | 'bfloat16'); params/BN-stats stay float32
    # and the score/KL outputs are cast back to float32 before the loss (same
    # contract as families B/C/D).  train.dtype='bfloat16' flips this
    # automatically.  The backbone dominates the step, and its activations at
    # 240x360 frames are the HBM-bandwidth hot spot — bf16 halves the bytes.
    dtype: str = "float32"


@dataclass(frozen=True)
class FamilyEConfig(_Base):
    """Bbox-visualization stand-in model (``avenue_training_script_bbox.py:51-101``)."""

    name: str = "family_e"
    in_channels: int = 3
    conv_channels: Tuple[int, int] = (32, 64)
    causal_dim: int = 16
    hidden: int = 256


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LossConfig(_Base):
    """Multi-objective loss weights.

    Defaults = family-D recipe (``avenue_training_script2.py:122-125,135-205``):
    focal anomaly 1.0, acyclicity 0.01, sparsity 0.001, consistency 0.01,
    structure 0.01; focal alpha/gamma 0.25/2.0; pseudo-label anomaly rate 5%;
    sparsity target 0.3 at edge threshold 0.1; structure band [10, 40] edges.
    """

    anomaly_weight: float = 1.0
    causal_weight: float = 0.01
    sparsity_weight: float = 0.001
    consistency_weight: float = 0.01
    structure_weight: float = 0.01
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    pseudo_anomaly_rate: float = 0.05
    edge_threshold: float = 0.1
    target_sparsity: float = 0.3
    consistency_target: float = 0.1
    min_edges: int = 10
    max_edges: int = 40
    # family A (causal_anomaly_detection.py:661-662): 0.4 CE + 0.3 score MSE +
    # 0.2 causal-score MSE + 0.1 KL
    a_ce: float = 0.4
    a_score_mse: float = 0.3
    a_causal_mse: float = 0.2
    a_kl: float = 0.1
    # family B reconstruction loss fallback chain handled in ops.losses
    b_recon_weight: float = 1.0
    # combined inference score (causal_anomaly_detection1.py:552)
    b_score_recon: float = 0.7
    b_score_memory: float = 0.3


@dataclass(frozen=True)
class OptimConfig(_Base):
    """Optimizer + schedule. Defaults = family-D AdamW recipe
    (``avenue_training_script2.py:115-130``)."""

    optimizer: str = "adamw"  # adamw | adam
    lr: float = 5e-4
    weight_decay: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 0.5  # family D clip (:236); A=1.0, B=0.1, C=1.0/10.0
    # conditional clip (family C, minicausal_vad_complete3.py:307-309): clip
    # to grad_clip ONLY when the global norm exceeds this trigger; 0 = torch
    # clip_grad_norm_ semantics (always rescale norms above grad_clip)
    clip_trigger: float = 0.0
    schedule: str = "plateau"  # plateau | cosine | step | constant
    plateau_factor: float = 0.5
    plateau_patience: int = 5
    cosine_steps: int = 0
    step_size: int = 15
    step_gamma: float = 0.7


@dataclass(frozen=True)
class ParallelConfig(_Base):
    """Mesh layout. The reference is single-device (SURVEY.md §2.9); this is
    the TPU-native addition: DP over clips, optional temporal sharding."""

    data_axis: int = 0  # 0 = use all devices on 'data'
    temporal_axis: int = 1  # >1 shards clip T dim with halo exchange
    mesh_axis_names: Tuple[str, ...] = ("data", "time")


@dataclass(frozen=True)
class TrainConfig(_Base):
    num_epochs: int = 80
    eval_every: int = 5  # reference evals every 5 epochs (avenue_training_script2.py:424)
    save_interval: int = 10
    log_every: int = 20  # batch debug print cadence (:246)
    seed: int = 0
    dtype: str = "float32"  # float32 | bfloat16 compute
    nan_guard: bool = True  # skip non-finite updates (reference NaN-skip behavior)
    normal_only: bool = False  # family B trains on normal samples only (:374-378)
    best_metric: str = "score_range"  # best-model criterion varies per family (SURVEY.md §5)
    best_mode: str = "max"
    early_stop_patience: int = 0  # 0 = off; family B uses 10 (causal_anomaly_detection1.py:506-515)
    reload_best: bool = False  # reload best checkpoint after training (:518-522)
    out_dir: str = "results"
    history_name: str = "improved_training_history.json"
    donate_state: bool = True
    # >1: run K train steps per jit call via lax.scan over K pre-staged
    # batches — amortizes per-dispatch latency (one device call instead of K)
    steps_per_call: int = 1
    # >0: preemption-safe mid-epoch checkpointing — save a rolling 'mid'
    # checkpoint (state + partial metric accumulator + batch index) every N
    # steps; Trainer.restore resumes the interrupted epoch at the exact batch
    # (deterministic shuffle replay), bit-identical to the uninterrupted run
    save_every_steps: int = 0
    # device-resident epoch clip cache (cvad_tpu.data.device_cache): 'auto'
    # keeps the train split's uint8 clips in HBM when they fit
    # `device_cache_hbm_frac` of device memory — one bulk H2D fill, then
    # every epoch feeds from device-side gathers (host ships indices only).
    # Bit-identical to the uncached path (tests/test_device_cache.py).
    # 'on' forces it (errors if ineligible), 'off' disables.
    device_cache: str = "auto"
    device_cache_hbm_frac: float = 0.5


@dataclass(frozen=True)
class ExperimentConfig(_Base):
    """One config per entry point (replaces each reference script's inline knobs)."""

    model: Any = field(default_factory=FamilyDConfig)
    data: DataConfig = field(default_factory=DataConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# Canonical presets mirroring the five reference entry scripts -----------------


def preset(name: str) -> ExperimentConfig:
    """Named presets, one per reference entry point (BASELINE.json configs)."""
    if name in ("avenue_improved", "family_d", "avenue_training_script2"):
        return ExperimentConfig()
    if name in ("mini3d", "family_c", "minicausal_vad_complete3"):
        return ExperimentConfig(
            model=FamilyCConfig(),
            data=DataConfig(channels=1, grayscale=True, label_policy="mixed_simple",
                            stride=4, max_clips_per_video=50, batch_size=8),
            optim=OptimConfig(optimizer="adam", lr=1e-3, weight_decay=1e-5,
                              schedule="step", step_size=15, step_gamma=0.7,
                              grad_clip=1.0, clip_trigger=10.0),
            train=TrainConfig(num_epochs=40, best_metric="auc", best_mode="max",
                              eval_every=1),
        )
    if name in ("memory_ae", "family_b", "causal_anomaly_detection1"):
        return ExperimentConfig(
            model=FamilyBConfig(),
            data=DataConfig(channels=1, grayscale=True, clip_len=8, stride=2,
                            normalize_clamp=(0.001, 0.999), batch_size=4,
                            label_policy="hardcoded_v2"),
            optim=OptimConfig(optimizer="adam", lr=1e-6, weight_decay=1e-6,
                              schedule="plateau", grad_clip=0.1),
            train=TrainConfig(num_epochs=50, normal_only=True,
                              best_metric="val_loss", best_mode="min",
                              eval_every=1, early_stop_patience=10,
                              reload_best=True),
        )
    if name in ("causal_pipeline", "family_a", "causal_anomaly_detection"):
        return ExperimentConfig(
            model=FamilyAConfig(),
            data=DataConfig(channels=1, grayscale=True, clip_len=16, stride=8,
                            frame_size=(240, 360), label_policy="heuristic_v1",
                            batch_size=4),
            optim=OptimConfig(optimizer="adamw", lr=3e-4, weight_decay=1e-5,
                              schedule="cosine", grad_clip=1.0),
            train=TrainConfig(num_epochs=20, best_metric="val_acc", best_mode="max",
                              eval_every=1),
        )
    if name in ("causal_pipeline_v0", "family_a_anchor", "video_anomaly_detection"):
        # earlier pipeline variant: anchor detector, single-head scorer, no
        # direct classifier; loss = MSE(score, label) + 0.001*KL
        # (video_anomaly_detection.py:528)
        base = preset("causal_pipeline")
        return base.replace(
            model=base.model.replace(anchor_variant=True, direct_variant=False),
            data=base.data.replace(label_policy="split_binary"),
            loss=base.loss.replace(a_ce=0.0, a_score_mse=1.0,
                                   a_causal_mse=0.0, a_kl=0.001),
            # the earlier script trains at lr=1e-4 for 10 epochs
            # (video_anomaly_detection.py:1034-1037)
            optim=base.optim.replace(lr=1e-4),
            train=base.train.replace(num_epochs=10),
        )
    if name in ("bbox_viz", "family_e", "avenue_training_script_bbox"):
        return ExperimentConfig(model=FamilyEConfig())
    raise KeyError(f"unknown preset: {name!r}")
