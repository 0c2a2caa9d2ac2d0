"""Space-to-depth + grouped-T-fold lowering of conv1 for LONG temporal
windows (T > 128/C_out), with a Pallas TPU kernel for the core.

The long-window ("larger temporal windows", SURVEY.md §5 long-context row;
reference conv ``avenue_training_script2.py:19``) grouped T-fold has a real
MXU win (T=64/B=32 traces: conv1 fwd 1322->398 us, wgrad 1705->392) that XLA
lowering leaves uncollected — its grouped-conv emitter inserts ~4.5 ms/step
of layout round-trips (PARITY.md per-family trace table).  Mosaic can't
lower the stride-2 im2col a fused kernel of that form needs
(ops/pallas_conv.py dispatch note).

This module removes the stride instead: space-to-depth (the exact
``models/layers._S2DConv`` identity) turns the spatial stride-2 (3,3) taps
into stride-1 (2,2) taps over 2x2 pixel cells (4x channels, one dead phase
per axis), and the T-group fold (group g, halo 1 frame each side) densifies
the output to g*C_out lanes.  The composed core is a stride-1 (2,2)-tap
conv with per-tap contraction (g+2)*4*C_in — for the reference conv1 at
g=8 that is K=120 x N=128 per tap: precisely the "stride-1 im2col as
accumulated per-tap matmuls" form the jax-0.9 re-probe measured lowering
on-chip (static slices on sublane/outer dims, channels kept in lanes, one
(M,K)x(K,N) dot per tap).

Exactness: pure relowering of the same conv (same parameter tree); zero
phase/band weights multiply activations belonging to other outputs.
tests/test_s2d_fold.py checks fwd+grads against ``lax.conv`` on CPU and the
Pallas kernels in interpret mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def s2d_fold_input(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*n, H/2+1, W/2+1, (g+2)*4C), n = T/g groups.

    Spatial+temporal zero-pad, 2x2 space-to-depth cells (channel order
    ph, pw, c), then overlapping (g+2)-frame group windows folded into
    channels (frame-major: local t index is the slowest channel block).
    """
    b, t, h, w, c = x.shape
    assert t % g == 0, (t, g)
    n = t // g
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2
    xs = xp.reshape(b, t + 2, hp // 2, 2, wp // 2, 2, c)
    xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5, 6)).reshape(
        b, t + 2, hp // 2, wp // 2, 4 * c)
    wins = jnp.stack([jax.lax.slice_in_dim(xs, i * g, i * g + g + 2, axis=1)
                      for i in range(n)], 1)     # (b, n, g+2, h2, w2, 4c)
    return jnp.transpose(wins, (0, 1, 3, 4, 2, 5)).reshape(
        b * n, hp // 2, wp // 2, (g + 2) * 4 * c)


def s2d_fold_kernel(kernel: jnp.ndarray, g: int) -> jnp.ndarray:
    """(3, 3, 3, C, O) -> (2, 2, (g+2)*4C, g*O) block-banded s2d kernel.

    Spatial tap (kh, kw) lives at cell tap (dh, dw) = (kh//2, kw//2) in
    phase channels (ph, pw) = (kh%2, kw%2); the padded kh=3/kw=3 phase row
    is exactly zero (the dead phase).  Column block (ti, o) carries T-tap
    kt at folded rows [(ti+kt)*4C, (ti+kt+1)*4C) — ti+kt indexes the
    group's halo'd local frames, and the window edges land outside only
    for frames the T zero-pad supplies.
    """
    _, _, _, cin, cout = kernel.shape
    kp = jnp.pad(kernel, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
    ks = kp.reshape(3, 2, 2, 2, 2, cin, cout)     # kt, dh, ph, dw, pw, c, o
    ks = jnp.transpose(ks, (0, 1, 3, 2, 4, 5, 6)).reshape(
        3, 2, 2, 4 * cin, cout)                   # kt, dh, dw, (ph,pw,c), o
    wd = jnp.zeros((2, 2, (g + 2) * 4 * cin, g * cout), kernel.dtype)
    for ti in range(g):
        for kt in range(3):
            wd = wd.at[:, :, (ti + kt) * 4 * cin:(ti + kt + 1) * 4 * cin,
                       ti * cout:(ti + 1) * cout].set(ks[kt])
    return wd


def s2d_foldT_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H/2+1, W/2+1, (T+2)*4C): whole-T s2d fold.

    ONE relayout (the cell transpose); the T halo is a channel zero-pad the
    producer fusion emits directly.  Group g's halo'd slab is then the
    CONTIGUOUS channel range [g·i·4C, (g·i+g+2)·4C) — adjacent groups
    overlap by 2·4C channels, which the Pallas kernel feeds via two
    BlockSpec operands (main g·4C block + halo 2·4C block at index
    (i+1)·g/2) so the overlapping windows never materialize in XLA.  This
    removed the v1 per-group window stack + unfold transposes that traced
    at ~14 ms/step of 6-D relayout copies (T=64 B=128, round-3 trace).
    """
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2
    xs = xp.reshape(b, t, hp // 2, 2, wp // 2, 2, c)
    xs = jnp.transpose(xs, (0, 2, 4, 1, 3, 5, 6)).reshape(
        b, hp // 2, wp // 2, t * 4 * c)
    return jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (4 * c, 4 * c)))


def _xla_groups_core(xt: jnp.ndarray, wd: jnp.ndarray, g: int) -> jnp.ndarray:
    """XLA reference of the grouped whole-T core: per-group channel slab ->
    stride-1 (2,2) conv -> channel-concat (t-major folded output)."""
    b, hc, wc, ktot = xt.shape
    kc = wd.shape[2]
    cs = kc // (g + 2)
    n = ktot // cs - 2
    assert n % g == 0, (n, g)
    outs = []
    for i in range(n // g):
        slab = jax.lax.slice_in_dim(xt, i * g * cs, (i * g + g + 2) * cs,
                                    axis=3)
        outs.append(_xla_core(slab, wd))
    return jnp.concatenate(outs, axis=-1)


def _xla_core(xf: jnp.ndarray, wd: jnp.ndarray) -> jnp.ndarray:
    """Reference lowering: one stride-1 VALID (2,2) conv."""
    dn = jax.lax.conv_dimension_numbers(xf.shape, wd.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(xf, wd, (1, 1), "VALID",
                                        dimension_numbers=dn)


def _xla_dot_core(xf: jnp.ndarray, wd: jnp.ndarray) -> jnp.ndarray:
    """XLA per-tap dot lowering (no conv emitter): 4 static tap slices,
    each contracted against its (K, N) kernel slab, accumulated in f32."""
    bn, hc, wc, kc = xf.shape
    ho, wo = hc - 1, wc - 1
    acc = None
    for dh in range(2):
        for dw in range(2):
            tap = jax.lax.slice(xf, (0, dh, dw, 0),
                                (bn, dh + ho, dw + wo, kc))
            d = jnp.einsum("bhwk,kn->bhwn", tap, wd[dh, dw],
                           preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc.astype(xf.dtype)


def _pick_bb(b: int, per_item_bytes: int, budget: int = 8 << 20) -> int:
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and cand * per_item_bytes < budget:
            return cand
    return 1


def _make_fwd(interpret: bool):
    def fwd(xf: jnp.ndarray, wd: jnp.ndarray) -> jnp.ndarray:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bn, hc, wc, kc = xf.shape
        ho, wo = hc - 1, wc - 1
        n = wd.shape[-1]
        wf = wd.reshape(4, kc, n)
        itemsize = jnp.dtype(xf.dtype).itemsize
        bb = _pick_bb(bn, (hc * wc * kc + ho * wo * n) * itemsize
                      + ho * wo * n * 4)

        def kernel(x_ref, w_ref, y_ref):
            acc = None
            for dh in range(2):
                for dw in range(2):
                    tap = x_ref[:, dh:dh + ho, dw:dw + wo, :]
                    a = tap.reshape(bb * ho * wo, kc)
                    d = jnp.dot(a, w_ref[2 * dh + dw],
                                preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
            y_ref[:] = acc.reshape(bb, ho, wo, n).astype(y_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(bn // bb,),
            in_specs=[
                pl.BlockSpec((bb, hc, wc, kc), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, kc, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, ho, wo, n), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bn, ho, wo, n), xf.dtype),
            interpret=interpret,
        )(xf, wf)

    return fwd


def _make_dgrad(interpret: bool):
    def dgrad(ct: jnp.ndarray, wd: jnp.ndarray, out_dtype) -> jnp.ndarray:
        """d(xf): full correlation of ct with the flipped kernel taps."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bn, ho, wo, n = ct.shape
        hc, wc = ho + 1, wo + 1
        kc = wd.shape[2]
        # (4, N, K) transposed slabs, tap-major
        wt = jnp.transpose(wd.reshape(4, kc, n), (0, 2, 1))
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        hp, wp = ho + 2, wo + 2
        itemsize = jnp.dtype(ct.dtype).itemsize
        bb = _pick_bb(bn, (hp * wp * n + hc * wc * kc) * itemsize
                      + hc * wc * kc * 4)

        def kernel(c_ref, w_ref, y_ref):
            acc = None
            for dh in range(2):
                for dw in range(2):
                    tap = c_ref[:, 1 - dh:1 - dh + hc, 1 - dw:1 - dw + wc, :]
                    a = tap.reshape(bb * hc * wc, n)
                    d = jnp.dot(a, w_ref[2 * dh + dw],
                                preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
            y_ref[:] = acc.reshape(bb, hc, wc, kc).astype(y_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(bn // bb,),
            in_specs=[
                pl.BlockSpec((bb, hp, wp, n), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n, kc), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, hc, wc, kc), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bn, hc, wc, kc), out_dtype),
            interpret=interpret,
        )(ctp, wt)

    return dgrad


def _make_wgrad(interpret: bool):
    def wgrad(xf: jnp.ndarray, ct: jnp.ndarray, out_dtype) -> jnp.ndarray:
        """d(wd): per-tap (K, M) x (M, N) contractions accumulated over the
        batch grid (f32 accumulator revisited across grid steps)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bn, hc, wc, kc = xf.shape
        ho, wo = hc - 1, wc - 1
        n = ct.shape[-1]
        itemsize = jnp.dtype(xf.dtype).itemsize
        bb = _pick_bb(bn, (hc * wc * kc + ho * wo * n) * itemsize)

        def kernel(x_ref, c_ref, y_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)

            cm = c_ref[:].reshape(bb * ho * wo, n)
            for dh in range(2):
                for dw in range(2):
                    tap = x_ref[:, dh:dh + ho, dw:dw + wo, :]
                    a = tap.reshape(bb * ho * wo, kc)
                    d = jax.lax.dot_general(
                        a, cm, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y_ref[2 * dh + dw] += d

        out = pl.pallas_call(
            kernel,
            grid=(bn // bb,),
            in_specs=[
                pl.BlockSpec((bb, hc, wc, kc), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, ho, wo, n), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, kc, n), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, kc, n), jnp.float32),
            interpret=interpret,
        )(xf, ct)
        return out.reshape(2, 2, kc, n).astype(out_dtype)

    return wgrad


def _make_custom(interpret: bool):
    pallas_fwd = _make_fwd(interpret)
    pallas_dgrad = _make_dgrad(interpret)
    pallas_wgrad = _make_wgrad(interpret)

    @jax.custom_vjp
    def f(xf, wd):
        return pallas_fwd(xf, wd)

    def fwd_rule(xf, wd):
        return f(xf, wd), (xf, wd)

    def bwd_rule(res, ct):
        xf, wd = res
        # both grads stay in Pallas-controlled layouts — the XLA-fallback
        # bwd would reintroduce exactly the grouped-conv layout copies this
        # lowering exists to avoid
        dx = pallas_dgrad(ct.astype(xf.dtype), wd, xf.dtype)
        dw = pallas_wgrad(xf, ct.astype(xf.dtype), wd.dtype)
        return dx, dw

    f.defvjp(fwd_rule, bwd_rule)
    return f


_PALLAS = _make_custom(False)
_INTERP = _make_custom(True)


def s2d_fold_matmul(xf: jnp.ndarray, wd: jnp.ndarray, *,
                    use_pallas: Optional[bool] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Core: xf (B*n, H/2+1, W/2+1, (g+2)*4C) x wd (2, 2, ..., g*O)
    -> (B*n, H/2, W/2, g*O).

    `use_pallas=None` resolves to the fused kernel on TPU backends and the
    XLA conv emitter elsewhere (CPU has no MXU tiles to occupy; the
    whole lowering is long-T-only so there is no measured-faster XLA
    default to defend here — dispatch follows the T=64 full-step traces in
    PARITY.md).
    """
    if interpret:
        return _INTERP(xf, wd)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _PALLAS(xf, wd)
    return _xla_core(xf, wd)


# ---------------------------------------------------------------------------
# Whole-T grouped kernels (production long-window path)
# ---------------------------------------------------------------------------
#
# Mosaic requires kernel lane-dim blocks divisible by 128 (or the full dim),
# so the halo'd 120-channel group slabs cannot be BlockSpec'd out of the
# whole-T fold directly (round-3 probe: "block shape (…, 96) … must be
# divisible by 128").  Instead the slabs are gathered ONCE in XLA with each
# slab zero-padded to the 128 lane tile — 6.7% extra MACs, but every kernel
# operand is then a perfectly aligned (…, 128) block and fwd/wgrad pipeline
# through the standard Pallas machinery with zero layout copies.


def _slab_pad(kc: int) -> int:
    return _round_up(kc, 128)


def s2d_fold_groups(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H/2+1, W/2+1, (T/g)·pad128((g+2)·4C)):
    whole-T s2d fold + per-group halo'd channel slabs, each padded to the
    128 lane tile.  One transpose + one gather fusion in XLA."""
    b, t, h, w, c = x.shape
    xt = s2d_foldT_input(x)
    cs = 4 * c
    kc = (g + 2) * cs
    pad = _slab_pad(kc) - kc
    n = t // g
    slabs = [jnp.pad(jax.lax.slice_in_dim(xt, i * g * cs, i * g * cs + kc,
                                          axis=3),
                     ((0, 0), (0, 0), (0, 0), (0, pad)))
             for i in range(n)]
    return jnp.concatenate(slabs, axis=-1)


def _pad_wd(wd: jnp.ndarray) -> jnp.ndarray:
    """(2, 2, kc, no) -> (4, pad128(kc), no): zero rows multiply the slab's
    zero pad channels, contributing exact zeros."""
    kc, no = wd.shape[2], wd.shape[3]
    return jnp.pad(wd.reshape(4, kc, no),
                   ((0, 0), (0, _slab_pad(kc) - kc), (0, 0)))


def _xla_slabs_core(xg: jnp.ndarray, wdp: jnp.ndarray, n: int) -> jnp.ndarray:
    """XLA reference on the gathered-slab layout (dgrad fallback + CPU)."""
    kp = wdp.shape[1]
    w4 = wdp.reshape(2, 2, kp, wdp.shape[-1])
    outs = []
    for i in range(n):
        slab = jax.lax.slice_in_dim(xg, i * kp, (i + 1) * kp, axis=3)
        outs.append(_xla_core(slab, w4))
    return jnp.concatenate(outs, axis=-1)


def _make_group_fwd(interpret: bool):
    def fwd(xg: jnp.ndarray, wdp: jnp.ndarray) -> jnp.ndarray:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bn, hc, wc, ktot = xg.shape
        ho, wo = hc - 1, wc - 1
        kp = wdp.shape[1]
        n_groups = ktot // kp
        no = wdp.shape[-1]
        itemsize = jnp.dtype(xg.dtype).itemsize
        bb = _pick_bb(bn, (hc * wc * kp + ho * wo * no) * itemsize
                      + ho * wo * no * 4)

        def kernel(x_ref, w_ref, y_ref):
            acc = None
            for dh in range(2):
                for dw in range(2):
                    tap = x_ref[:, dh:dh + ho, dw:dw + wo, :]
                    d = jnp.dot(tap.reshape(bb * ho * wo, kp),
                                w_ref[2 * dh + dw],
                                preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
            y_ref[:] = acc.reshape(bb, ho, wo, no).astype(y_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(bn // bb, n_groups),
            in_specs=[
                pl.BlockSpec((bb, hc, wc, kp), lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, kp, no), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, ho, wo, no),
                                   lambda b, i: (b, 0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bn, ho, wo, n_groups * no),
                                           xg.dtype),
            interpret=interpret,
        )(xg, wdp)

    return fwd


def _make_group_wgrad(interpret: bool):
    def wgrad(xg: jnp.ndarray, ct: jnp.ndarray, kp: int, out_dtype
              ) -> jnp.ndarray:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bn, hc, wc, ktot = xg.shape
        ho, wo = hc - 1, wc - 1
        n_groups = ktot // kp
        no = ct.shape[-1] // n_groups
        itemsize = jnp.dtype(xg.dtype).itemsize
        bb = _pick_bb(bn, (hc * wc * kp + ho * wo * no) * itemsize)

        def kernel(x_ref, c_ref, y_ref):
            first = jnp.logical_and(pl.program_id(0) == 0,
                                    pl.program_id(1) == 0)

            @pl.when(first)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)

            cm = c_ref[:].reshape(bb * ho * wo, no)
            for dh in range(2):
                for dw in range(2):
                    tap = x_ref[:, dh:dh + ho, dw:dw + wo, :]
                    y_ref[2 * dh + dw] += jax.lax.dot_general(
                        tap.reshape(bb * ho * wo, kp), cm,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        out = pl.pallas_call(
            kernel,
            grid=(bn // bb, n_groups),
            in_specs=[
                pl.BlockSpec((bb, hc, wc, kp), lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, ho, wo, no), lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, kp, no), lambda b, i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, kp, no), jnp.float32),
            interpret=interpret,
        )(xg, ct)
        return out.astype(out_dtype)

    return wgrad


def _make_group_custom(interpret: bool):
    group_fwd = _make_group_fwd(interpret)
    group_wgrad = _make_group_wgrad(interpret)

    @jax.custom_vjp
    def f(xg, wdp):
        return group_fwd(xg, wdp)

    def fwd_rule(xg, wdp):
        return f(xg, wdp), (xg, wdp)

    def bwd_rule(res, ct):
        xg, wdp = res
        # wgrad stays a Pallas kernel (the folded (K, N) contraction is the
        # measured MXU win); dgrad routes through the XLA reference — conv1
        # is the model's FIRST layer, so the input cotangent is dead code in
        # every training graph (verified DCE'd in the round-3 trace) and
        # only exists for grad-of-input tests
        n_groups = xg.shape[-1] // wdp.shape[1]
        dw = group_wgrad(xg, ct.astype(xg.dtype), wdp.shape[1], wdp.dtype)
        _, vjp = jax.vjp(lambda a: _xla_slabs_core(a, wdp, n_groups), xg)
        (dx,) = vjp(ct.astype(xg.dtype))
        return dx, dw

    f.defvjp(fwd_rule, bwd_rule)
    return f


_GROUP_PALLAS = _make_group_custom(False)
_GROUP_INTERP = _make_group_custom(True)


def s2d_group_conv(xg: jnp.ndarray, wd: jnp.ndarray, g: int, *,
                   use_pallas: Optional[bool] = None,
                   interpret: bool = False) -> jnp.ndarray:
    """Whole-T grouped s2d-fold conv1: xg = :func:`s2d_fold_groups` output,
    wd = :func:`s2d_fold_kernel` (group-invariant banded kernel) ->
    (B, H/2, W/2, T*cout), t-major folded channels — exactly the hwtc folded
    layout convs 2-3 consume, so the long-window stack needs NO unfold."""
    wdp = _pad_wd(wd)
    if interpret:
        return _GROUP_INTERP(xg, wdp)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _GROUP_PALLAS(xg, wdp)
    n_groups = xg.shape[-1] // wdp.shape[1]
    return _xla_slabs_core(xg, wdp, n_groups)
