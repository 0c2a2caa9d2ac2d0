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
