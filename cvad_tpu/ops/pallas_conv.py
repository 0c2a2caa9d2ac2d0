"""Pallas TPU kernel for the T-folded conv1 (family-D hot op).

The family-D conv stack's first layer (``avenue_training_script2.py:19``,
Conv3d(3, 16, 3, stride=(1,2,2), padding=1)) is the step's hot op: its native
im2col matmul is (M, 81) x (81, 16) — 7.9% of an MXU tile.  The framework's
production fix is algebraic: fold the T axis into channels so ONE 2-D conv
computes every T output with matmul shape (M, 270) x (270, 128)
(``cvad_tpu.models.layers._TFoldConv``).  This module implements that folded
conv as a single fused Pallas kernel — per batch block: strided im2col
gather, one MXU matmul, bias add — so the whole folded conv1 is one
VMEM-resident pass.

Measured on the TPU v5 lite chip, XLA's own conv emitter for the folded
2-D conv runs at ~151 us (B=256 bf16 fwd, near the folded formulation's
~131 us tile roofline), so the jnp lowering stays the production default;
the kernel is the dispatchable alternative (`conv1_mode='pallas'`) and the
exactness contract lives in tests/test_pallas.py.  Backward follows the
repo's kernel convention (``ops/pallas_kernels.py``): `jax.custom_vjp`
re-derives gradients through the XLA folded expression, whose weight-grad
matmul already has the well-packed (270, 128) output shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_group_size(t: int, cout: int) -> int:
    """Largest T-group size g (dividing t) whose folded outputs g*cout still
    fit the MXU's 128 lanes.  Whole-T folding (g == t) has MAC inflation
    (t+2)/3, which grows unboundedly with t; group-wise folding pins it at
    (g+2)/3 while keeping full lane occupancy.  Returns 1 when no useful
    fold exists (callers fall back to the native conv)."""
    best = 1
    for g in range(1, t + 1):
        if t % g == 0 and g * cout <= 128:
            best = g
    return best


def fold_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> folded, spatially padded (B, H+2, W+2, (T+2)*C).

    Pad-then-fold, deliberately: the fold-first order (T pad as a channel
    pad, one fusable producer) measures ~180 us faster on its own ops but
    perturbs XLA's downstream fusion/layout choices enough to cost +110 us
    net on the full family-D step (traced 1361 vs 1470 us at B=256 bf16).
    """
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return jnp.transpose(xp, (0, 2, 3, 1, 4)).reshape(
        b, h + 2, w + 2, (t + 2) * c)


def fold_kernel(kernel: jnp.ndarray, t: int) -> jnp.ndarray:
    """(3, 3, 3, C, O) -> block-banded dense (3, 3, (T+2)*C, T*O).

    Output column block t carries the real kernel at folded rows
    [t*C, (t+3)*C) and exact zeros elsewhere (zero rows multiply activations
    that belong to other T outputs, contributing exact zeros).
    """
    _, _, _, cin, cout = kernel.shape
    kf = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * cin, cout)
    wd = jnp.zeros((3, 3, (t + 2) * cin, t * cout), kernel.dtype)
    for ti in range(t):
        wd = wd.at[:, :, ti * cin:(ti + 3) * cin,
                   ti * cout:(ti + 1) * cout].set(kf)
    return wd


def fold_input_nohalo(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> folded, UNPADDED (B, H, W, T*C).

    Halo-free companion to :func:`fold_input`: a pure transpose+reshape the
    producer fusion can emit directly — no 130 MB pad materialization.  The
    T zero-pad semantics move into the edge-clipped kernel bands
    (:func:`fold_kernel_nohalo`) and the spatial halo into the conv's own
    padding config.
    """
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)


def fold_input_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> folded, spatially padded (B, H+2, W+2, T*C).

    Middle ground: same pad-then-fold graph shape as :func:`fold_input`
    (the pad op is still the relayout producer, so XLA's downstream
    fusion/layout choices see the familiar structure) but WITHOUT the T
    halo — the T zero-pad lives in the edge-clipped kernel bands
    (:func:`fold_kernel_nohalo`), shrinking both the pad (10/8 less data)
    and the contraction (270 -> 216 for T=8, C=3).
    """
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.transpose(xp, (0, 2, 3, 1, 4)).reshape(b, h + 2, w + 2, t * c)


def fold_kernel_nohalo(kernel: jnp.ndarray, t: int) -> jnp.ndarray:
    """(3, 3, 3, C, O) -> edge-clipped block-banded dense (3, 3, T*C, T*O).

    Output column block t carries T-tap kt of the real kernel at folded rows
    [(t-1+kt)*C, (t+kt)*C) when that source frame exists; taps falling off
    either T edge are simply absent (all-zero rows), which IS the conv's
    zero-padding in T.  Contraction length 9*T*C (=216 for T=8, C=3) vs the
    halo fold's 9*(T+2)*C (=270): 20% fewer MACs for the same outputs.
    """
    _, _, _, cin, cout = kernel.shape
    wd = jnp.zeros((3, 3, t * cin, t * cout), kernel.dtype)
    for ti in range(t):
        for kt in range(3):
            src = ti - 1 + kt
            if 0 <= src < t:
                wd = wd.at[:, :, src * cin:(src + 1) * cin,
                           ti * cout:(ti + 1) * cout].set(kernel[kt])
    return wd


def _xla_folded(xf: jnp.ndarray, wd: jnp.ndarray, stride: int = 2,
                padding="VALID") -> jnp.ndarray:
    """Reference lowering: one stride-(s,s) 2-D conv (VALID over pre-padded
    input for the halo fold; explicit ((1,1),(1,1)) for the halo-free one)."""
    dn = jax.lax.conv_dimension_numbers(xf.shape, wd.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(xf, wd, (stride, stride), padding,
                                        dimension_numbers=dn)


def _make_fwd(interpret: bool):
    def fwd(xf: jnp.ndarray, wd: jnp.ndarray) -> jnp.ndarray:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b, hp, wp, kc = xf.shape           # (B, H+2, W+2, (T+2)*C)
        k_full = 9 * kc                    # im2col contraction length
        ho, wo = (hp - 3) // 2 + 1, (wp - 3) // 2 + 1
        n = wd.shape[-1]
        wf = wd.reshape(k_full, n)

        # batch block: keep the im2col matrix + slab comfortably in VMEM
        bb = 1
        for cand in (8, 4, 2, 1):
            if b % cand == 0:
                bytes_needed = cand * (hp * wp * kc + ho * wo * k_full
                                       + ho * wo * n) * 2
                if bytes_needed < 10 * 1024 * 1024:
                    bb = cand
                    break

        # stride-2 windows via phase-split reshapes + static slices — Mosaic
        # rejects strided slicing on >2-D values ("only 2D gather"), but
        # handles reshape relayouts and static slices
        hp2, wp2 = hp // 2, wp // 2  # 66 -> 33 phase pairs

        def kernel(xf_ref, wf_ref, y_ref):
            xb = xf_ref[:]                  # (bb, hp, wp*kc) lanes-merged
            xr = xb.reshape(bb, hp2, 2, wp, kc)
            parts = []
            for kh in range(3):
                p, a0 = kh % 2, kh // 2
                rows = xr[:, a0:a0 + ho, p]             # (bb, ho, wp, kc)
                rw = rows.reshape(bb, ho, wp2, 2, kc)
                for kw in range(3):
                    q, b0 = kw % 2, kw // 2
                    parts.append(rw[:, :, b0:b0 + wo, q])  # (bb, ho, wo, kc)
            a = jnp.concatenate(parts, axis=-1)         # (bb, ho, wo, 9*kc)
            am = a.reshape(bb * ho * wo, 9 * kc)
            y = jnp.dot(am, wf_ref[:], preferred_element_type=jnp.float32)
            y_ref[:] = y.reshape(bb, ho, wo * n).astype(y_ref.dtype)

        out = pl.pallas_call(
            kernel,
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((bb, hp, wp * kc), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * kc, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, ho, wo * n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, ho, wo * n), xf.dtype),
            interpret=interpret,
        )(xf.reshape(b, hp, wp * kc), wf)
        return out.reshape(b, ho, wo, n)

    return fwd


def _make_custom(interpret: bool):
    pallas_fwd = _make_fwd(interpret)

    @jax.custom_vjp
    def f(xf, wd):
        return pallas_fwd(xf, wd)

    def fwd_rule(xf, wd):
        return f(xf, wd), (xf, wd)

    def bwd_rule(res, ct):
        xf, wd = res
        _, vjp = jax.vjp(_xla_folded, xf, wd)
        return vjp(ct)

    f.defvjp(fwd_rule, bwd_rule)
    return f


_PALLAS = _make_custom(False)
_INTERP = _make_custom(True)


def tfold_conv1_matmul(xf: jnp.ndarray, wd: jnp.ndarray, *,
                       use_pallas: Optional[bool] = None,
                       interpret: bool = False,
                       stride: int = 2,
                       padding="VALID") -> jnp.ndarray:
    """Folded conv core: xf (B, H+2, W+2, (T+2)*C) x wd (3, 3, (T+2)*C, T*O)
    -> (B, H/s, W/s, T*O) for spatial stride s in {1, 2} (family-D conv1 is
    s=2; the family-C stride-1 conv stack folds with s=1).  Bias/relu stay
    with the caller (XLA fuses them into the consumer either way).

    Dispatch note (measured, round 2): `use_pallas=None` resolves to the
    XLA conv emitter on every backend.  The fused kernel is semantically
    exact (interpret-mode tests) but Mosaic cannot currently lower its
    im2col construction on real TPUs — stride-2 window extraction needs
    either >2-D strided gathers ("Only 2D gather is supported") or
    lane-retiling reshapes ("infer-vector-layout: unsupported shape cast"),
    both rejected by the Mosaic compiler as of jax 0.8.  Re-probed on
    jax 0.9 (round 3, real v5e): still fails, and the remote-compile
    tunnel now hides the Mosaic diagnostic (HTTP 500).  What DOES lower
    on-chip in jax 0.9: stride-1 im2col as accumulated per-tap matmuls —
    4-D VMEM blocks with channels kept in lanes, static slices on
    sublane/outer dims only, one (M, C) x (C, O) dot per kernel tap
    (measured exact vs lax.conv).  A stride-2 phase-split 6-D reshape
    inside the kernel sends Mosaic into a >10-min compile hang — do not
    retry that shape.  The accumulated-matmul form caps the contraction
    at K=C per tap, so it cannot reach the XLA emitter's K=270 single
    im2col matmul efficiency for these small-C convs; it becomes useful
    only where K_tap >= 128 (e.g. C >= 128 stride-1 stacks).  XLA's conv
    emitter, which owns privileged im2col/layout machinery, runs the folded
    conv at ~151 us fwd (B=256 bf16) vs the formulation's ~131 us tile
    roofline, so there is nothing left for a kernel to win even if the
    lowering existed.  `use_pallas=True` forces the kernel (compiles in
    interpret mode everywhere; raises the Mosaic error on real TPUs) and
    exists for tests and for future Mosaic releases."""
    if stride == 2 and padding == "VALID":
        if interpret:
            return _INTERP(xf, wd)
        if use_pallas is True:
            return _PALLAS(xf, wd)
    return _xla_folded(xf, wd, stride, padding)
