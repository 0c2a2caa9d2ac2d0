"""Shared layers with exact reference numerics on static shapes.

These exist so that weights imported from the reference checkpoint
(``best_improved_model.pth``) produce bit-comparable activations: torch-style
explicit conv padding (not XLA 'SAME', whose asymmetric pads differ for even
inputs at stride 2) and torch's adaptive-average-pool index algorithm.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def from_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B, T, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def to_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, C, T, H, W)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))


class _TPairConv(nn.Module):
    """T-pair-packed equivalent of a k=(3,3,3), stride=(1,2,2), pad=1 conv.

    Emits consecutive T-output pairs as one stride-(2,2,2) conv with kernel
    (4,3,3) and 2x output channels (even-T outputs in channels [:C], odd-T in
    [C:]), then unpacks.  Same MACs, same parameter tree ("kernel"/"bias" in
    the torch-import shapes) — but the conv's matmuls double their MXU tile
    occupancy: the im2col contraction grows 81 -> 108 of 128 lanes and the
    output width 16 -> 32, which matters most for the weight-gradient matmul
    (the single hottest op of the family-D train step at C_out=16; measured
    via jax.profiler, see README perf notes).  Numerically exact vs the
    native lowering up to f32 add reordering
    (tests/test_models.py::test_conv1_mode_exact).
    """

    features: int
    dtype: Any = None
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout = x.shape[-1], self.features
        kinit = self.kernel_init or nn.linear.default_kernel_init
        kernel = self.param("kernel", kinit, (3, 3, 3, cin, cout))
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        wp = jnp.zeros((4, 3, 3, cin, 2 * cout), kernel.dtype)
        wp = wp.at[0:3, ..., :cout].set(kernel)  # even T: taps t-1..t+1
        wp = wp.at[1:4, ..., cout:].set(kernel)  # odd T: taps t..t+2
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            xp, wp, (2, 2, 2), "VALID", dimension_numbers=dn)
        b, t2, h, w, _ = y.shape
        y = y.reshape(b, t2, h, w, 2, cout)
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, 2 * t2, h, w, cout)
        return y + bias


class _TFoldConv(nn.Module):
    """T-folded lowering of a k=(3,3,3), stride=(1,2,2), pad=1 conv.

    The native conv1's im2col matmuls are (M, 81) x (81, 16) — 7.9% of a
    128x128 MXU tile; the family-D step trace shows it running at 12 TF/s
    forward / 8 TF/s weight-grad while conv2 (K=432) runs ~100 TF/s.  This
    lowering folds the whole (padded) T axis into channels: input
    (B, H+2, W+2, (T+2)*C), dense block-banded kernel
    (3, 3, (T+2)*C, T*Cout) whose (t, o) column block carries the real
    kernel at folded rows [t*C, (t+3)*C) and exact zeros elsewhere, then ONE
    stride-(2,2) VALID 2-D conv emits every T output at once.  For T=8 the
    matmul becomes (M, 270) x (270, 128): full lane occupancy, 70% sublane
    occupancy, at 10/3 the MACs — a ~3x net win on the tile arithmetic, and
    the weight-gradient inherits the same well-packed shape via autodiff.
    Zero rows contribute exact zeros, so the math matches the native
    lowering up to f32 accumulation order
    (tests/test_models.py::test_conv1_mode_exact).
    """

    features: int
    dtype: Any = None
    kernel_init: Any = None
    # False -> return (B, H', W', T, C) without the big transpose back to
    # NDHWC, for consumers that read the folded layout directly (the
    # 'folded' conv stack below)
    unfold: bool = True
    # False/None -> XLA conv emitter (production: measured near the folded
    # roofline, and Mosaic cannot lower the kernel's im2col on real TPUs —
    # see ops/pallas_conv.py dispatch note); True -> force the Pallas kernel
    use_pallas: bool | None = False
    # spatial stride (1 or 2): family-D conv1 is (1,2,2); family-C's
    # stride-1 conv stack folds with spatial stride 1
    spatial_stride: int = 2
    # apply bias+relu on the FOLDED (…, T*C) matmul output instead of the
    # unfolded 5-D tensor (identical math — relu is elementwise and commutes
    # with the reshape).  Keeps the relu-backward mask in the layout the
    # folded weight-gradient consumes, so layout assignment has no reason to
    # insert a (B,H',W',T,C) relayout copy between relu-bwd and wgrad
    fuse_relu: bool = False
    # 'full' (default): halo fold — pre-padded (H+2, W+2, (T+2)*C) input,
    # VALID conv.  'spatial': spatially padded (H+2, W+2, T*C) input with
    # edge-clipped kernel bands carrying the T zero-pad — same pad-then-fold
    # graph shape, 20% fewer MACs.  'none': unpadded (H, W, T*C) input (a
    # pure transpose the producer fusion emits), spatial halo via the conv's
    # own padding.  All exact; whole-T fold only — the group-wise path
    # needs the cross-group halo.
    halo: str = "full"
    # long-T group-fold lowering: 'stack' (legacy window stack + transpose)
    # or 'gconv' (single pad -> static channel halo gather -> ONE
    # feature_group_count=n conv with the banded kernel tiled per group)
    group_impl: str = "stack"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cvad_tpu.ops.pallas_conv import (fold_group_size, fold_input,
                                              fold_input_nohalo,
                                              fold_input_spatial, fold_kernel,
                                              fold_kernel_nohalo,
                                              tfold_conv1_matmul)

        cin, cout = x.shape[-1], self.features
        b, t, h, w, _ = x.shape
        kinit = self.kernel_init or nn.linear.default_kernel_init
        kernel = self.param("kernel", kinit, (3, 3, 3, cin, cout))
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        g = fold_group_size(t, cout)
        s = self.spatial_stride

        def post(y):  # folded matmul output (…, g*cout)
            if self.fuse_relu:
                return jax.nn.relu(y + jnp.tile(bias, y.shape[-1] // cout))
            return y

        def tail(y):  # unfolded output with cout as the last axis
            return y if self.fuse_relu else y + bias

        if g == t:
            if self.halo == "full":
                y = tfold_conv1_matmul(fold_input(x), fold_kernel(kernel, g),
                                       use_pallas=self.use_pallas, stride=s)
            elif self.halo == "spatial":
                y = tfold_conv1_matmul(fold_input_spatial(x),
                                       fold_kernel_nohalo(kernel, g),
                                       use_pallas=False, stride=s)
            else:  # 'none'
                y = tfold_conv1_matmul(fold_input_nohalo(x),
                                       fold_kernel_nohalo(kernel, g),
                                       use_pallas=False, stride=s,
                                       padding=((1, 1), (1, 1)))
            y = post(y)
            y = y.reshape(b, h // s, w // s, t, cout)
            if not self.unfold:
                return tail(y)
            return tail(jnp.transpose(y, (0, 3, 1, 2, 4)))
        # long windows: fold T group-wise (windows of g+2 overlapping taps)
        # so the MAC inflation stays (g+2)/3 instead of growing with T
        if self.halo != "full":
            # the group-wise path inherently needs the cross-group halo;
            # silently computing the full-halo variant would make any
            # tfold2/tfold3-vs-tfold measurement at long T meaningless
            raise ValueError(
                f"halo={self.halo!r} supports whole-T folds only; "
                f"T={t} folds group-wise (g={g}) and requires halo='full'")
        n = t // g
        if self.group_impl == "s2d":
            # space-to-depth composed with the group fold: spatial stride 2
            # becomes stride 1 over 2x2 cells (4x channels, dead phases
            # exactly zero), so the core is 4 stride-1 taps of
            # (M, (g+2)*4C) x (·, g*cout) — the form Mosaic lowers on-chip.
            # Whole-T fold input + per-group BlockSpec slabs: the halo'd
            # group windows never materialize in XLA, and the t-major folded
            # output IS the hwtc layout convs 2-3 consume (no unfold) —
            # fwd/wgrad run as Pallas kernels with controlled layouts
            # (ops/pallas_s2d.py), collecting the T=64 MXU win the XLA
            # grouped-conv emitter loses to layout copies
            from cvad_tpu.ops.pallas_s2d import (s2d_fold_groups,
                                                 s2d_fold_kernel,
                                                 s2d_group_conv)

            if s != 2:
                raise ValueError("group_impl='s2d' requires spatial stride 2")
            y = s2d_group_conv(s2d_fold_groups(x, g), s2d_fold_kernel(kernel, g),
                               g, use_pallas=self.use_pallas or None)
            y = post(y)  # t-major folded channels: tile(bias) matches
            y = y.reshape(b, h // s, w // s, t, cout)
            if not self.unfold:
                return tail(y)
            return tail(jnp.transpose(y, (0, 3, 1, 2, 4)))
        wd = fold_kernel(kernel, g)
        if self.group_impl == "gconv":
            # ONE grouped conv instead of n window stacks: fold the whole
            # padded T axis like the T=8 path (single pad op = the
            # layout-friendly producer), give every group its 2-frame halo
            # by a static channel gather, then feature_group_count=n with
            # the banded kernel tiled across groups — each group's matmul
            # is the same well-shaped (M, (g+2)*3C) x (·, g*Cout) tile as
            # the whole-T fold
            from cvad_tpu.ops.pallas_conv import fold_input

            xf = fold_input(x)  # (B, H+2, W+2, (T+2)*C)
            # per-group halo channels via static slices (NOT a fancy-index
            # gather: XLA lowers the minor-dim gather as a serial while loop
            # plus relayout copies — traced 7.9 vs 5.9 ms/step at T=64)
            xg = jnp.concatenate(
                [jax.lax.slice_in_dim(xf, i * g * cin,
                                      (i * g + g + 2) * cin, axis=3)
                 for i in range(n)], axis=3)  # (B, H+2, W+2, n*(g+2)*C)
            wg = jnp.tile(wd, (1, 1, 1, n))  # (3,3,(g+2)*C, n*g*cout)
            dn = jax.lax.conv_dimension_numbers(
                xg.shape, wg.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                xg, wg, (s, s), "VALID", dimension_numbers=dn,
                feature_group_count=n)  # (B, H', W', T*cout), T-major blocks
            y = post(y)
            y = y.reshape(b, h // s, w // s, t, cout)
            if not self.unfold:
                return tail(y)
            return tail(jnp.transpose(y, (0, 3, 1, 2, 4)))
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        wins = jnp.stack([jax.lax.slice_in_dim(xp, i * g, i * g + g + 2,
                                               axis=1) for i in range(n)], 1)
        xf = jnp.transpose(wins, (0, 1, 3, 4, 2, 5)).reshape(
            b * n, h + 2, w + 2, (g + 2) * cin)
        y = post(tfold_conv1_matmul(xf, wd, use_pallas=self.use_pallas,
                                    stride=s))
        y = y.reshape(b, n, h // s, w // s, g, cout)
        if not self.unfold:
            y = jnp.transpose(y, (0, 2, 3, 1, 4, 5))  # (b,h',w',n,g,c)
            return tail(y.reshape(b, h // s, w // s, t, cout))
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5))      # (b,n,g,h',w',c)
        return tail(y.reshape(b, t, h // s, w // s, cout))


class _S2DConv(nn.Module):
    """Space-to-depth lowering of a k=(3,3,3), stride=(1,2,2), pad=1 conv.

    Folds 2x2 spatial blocks of the (padded-to-66) input into 12 channels and
    runs an equivalent stride-1 conv with kernel (3,2,2): output pixel o's
    taps 2o-1..2o+1 live in s2d cells o..o+1 across the 2 phases, so the
    3-tap/stride-2 window becomes a 2-cell/stride-1 window with one dead
    phase slot (weights exactly zero).  Same math (probe-validated, bf16
    round-off only); C_in grows 3 -> 12, moving conv1 off XLA's slow
    small-channel conv emitters.  Same parameter tree as nn.Conv.
    """

    features: int
    dtype: Any = None
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout = x.shape[-1], self.features
        kinit = self.kernel_init or nn.linear.default_kernel_init
        kernel = self.param("kernel", kinit, (3, 3, 3, cin, cout))
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        # weights: tap t = 2j + p (j cell offset, p phase); tap 3 is dead
        wp = jnp.pad(kernel, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
        ws = wp.reshape(3, 2, 2, 2, 2, cin, cout)  # kt, jh, ph, jw, pw, c, o
        ws = jnp.transpose(ws, (0, 1, 3, 2, 4, 5, 6)).reshape(
            3, 2, 2, 4 * cin, cout)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        b, t, h, w, c = xp.shape
        xs = xp.reshape(b, t, h // 2, 2, w // 2, 2, c)
        xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5, 6)).reshape(
            b, t, h // 2, w // 2, 4 * c)
        dn = jax.lax.conv_dimension_numbers(xs.shape, ws.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(xs, ws, (1, 1, 1), "VALID",
                                         dimension_numbers=dn,
                                         preferred_element_type=x.dtype)
        return y + bias


class _CPadConv(nn.Module):
    """Conv with input channels zero-padded to 8 (probe: recover the fast
    XLA conv path for tiny C_in). Same parameter tree as nn.Conv."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = None
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout = x.shape[-1], self.features
        kinit = self.kernel_init or nn.linear.default_kernel_init
        kernel = self.param("kernel", kinit, self.kernel + (cin, cout))
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        cpad = 8 - cin
        xp = jnp.pad(x, ((0, 0),) + tuple((p, p) for p in self.padding)
                     + ((0, cpad),))
        wp = jnp.pad(kernel, ((0, 0),) * 3 + ((0, cpad), (0, 0)))
        dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(xp, wp, self.stride, "VALID",
                                         dimension_numbers=dn,
                                         preferred_element_type=x.dtype)
        return y + bias


def _useful_fold(t: int, cout: int) -> bool:
    """Whole-T fold only: grouped folding (T > 128/cout) is exact and kept
    reachable via explicit mode='tfold', but traced 2.6x SLOWER than the
    native conv at T=64/B=128 on v5e (the group windows' 6-D stack/unstack
    triggers ~12 ms/step of XLA layout copies), so the auto paths never
    pick it."""
    from cvad_tpu.ops.pallas_conv import fold_group_size

    return t >= 2 and fold_group_size(t, cout) == t


class _HWTCConv(nn.Module):
    """3D conv over (B, H, W, T, C) data via custom dimension_numbers.

    Same parameter tree and math as the NDHWC path (kernel stays
    (kT, kH, kW, I, O)); only the conv's lhs/out specs change, so chaining
    after a non-unfolded :class:`_TFoldConv` needs no layout copies — XLA's
    layout assignment then keeps the whole stack transpose-free.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout = x.shape[-1], self.features
        kinit = self.kernel_init or nn.linear.default_kernel_init
        kernel = self.param("kernel", kinit, self.kernel + (cin, cout))
        args = [x, kernel]
        if self.use_bias:
            args.append(self.param("bias", nn.initializers.zeros, (cout,)))
        promoted = nn.dtypes.promote_dtype(*args, dtype=self.dtype)
        x, kernel = promoted[0], promoted[1]
        pt, ph, pw = self.padding
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (pt, pt), (0, 0)))
        dn = jax.lax.ConvDimensionNumbers(
            lhs_spec=(0, 4, 3, 1, 2),   # N, C, spatial (T, H, W)
            rhs_spec=(4, 3, 0, 1, 2),   # O, I, (kT, kH, kW)
            out_spec=(0, 4, 3, 1, 2),
        )
        y = jax.lax.conv_general_dilated(xp, kernel, self.stride, "VALID",
                                         dimension_numbers=dn)
        return y + promoted[2] if self.use_bias else y


class Conv3dTorch(nn.Module):
    """3D conv over (B, T, H, W, C) with torch-style symmetric padding.

    Matches ``nn.Conv3d(cin, cout, k, stride=s, padding=p)`` numerics
    (e.g. ``avenue_training_script2.py:19-21``) while keeping the
    channels-last layout XLA tiles best onto the MXU.  ``mode='tpair'``
    switches to the T-pair-packed lowering (exact same math; see
    :class:`_TPairConv`) when the shape qualifies.
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Any = None  # computation dtype (params stay float32)
    kernel_init: Any = None
    # 'native' | 'tfold' | 'tpair' | 's2d' | 'cpad' — mathematically exact
    # relowerings of the same conv (same parameter tree); non-native modes
    # apply only when the shape qualifies, else fall through to native
    mode: str = "native"
    # 'ndhwc' (default) or 'hwtc': accept/produce (B, H, W, T, C) tensors
    # without transposing the data — the conv runs with custom
    # dimension_numbers (spatial dims (3, 1, 2)), so a T-folded producer
    # can chain into this conv with zero layout copies.  Parameter tree and
    # math are identical to the ndhwc path.
    layout: str = "ndhwc"
    # with mode='tfold': emit (B, H', W', T, C) instead of transposing back
    # to NDHWC (consumers use layout='hwtc')
    unfold: bool = True
    # fold the trailing relu into the conv: on the tfold path the bias+relu
    # run in the folded (…, T*C) domain (_TFoldConv.fuse_relu — same math,
    # avoids a relu-bwd relayout copy); every other path applies relu to the
    # output.  Callers setting this must NOT apply relu again.
    fuse_relu: bool = False
    # long-T group-fold lowering for the tfold path (see _TFoldConv)
    group_impl: str = "stack"

    def _tpair_applicable(self, x) -> bool:
        return (self.mode == "tpair" and self.kernel == (3, 3, 3)
                and self.stride == (1, 2, 2) and self.padding == (1, 1, 1)
                and self.use_bias and x.shape[1] % 2 == 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cvad_tpu.ops.pallas_conv import fold_group_size

        act = jax.nn.relu if self.fuse_relu else (lambda v: v)
        if self._tpair_applicable(x):
            return act(_TPairConv(self.features, dtype=self.dtype,
                                  kernel_init=self.kernel_init, name="conv")(x))
        if (self.mode in ("tfold", "tfold2", "tfold3", "tfold_pallas")
                and self.kernel == (3, 3, 3)
                and self.stride in ((1, 2, 2), (1, 1, 1))
                and self.padding == (1, 1, 1)
                and self.use_bias
                and (self.stride[1] == 1 or (x.shape[2] % 2 == 0
                                             and x.shape[3] % 2 == 0))
                # whole-T fold when T*Cout fits the MXU's 128 lanes; longer
                # T folds group-wise (_TFoldConv) — exact, but measured
                # slower than native at T=64, hence only on explicit request
                and fold_group_size(x.shape[1], self.features) >= 2):
            return _TFoldConv(self.features, dtype=self.dtype,
                              kernel_init=self.kernel_init,
                              unfold=self.unfold,
                              use_pallas=(None if self.mode == "tfold_pallas"
                                          else False),
                              spatial_stride=self.stride[1],
                              fuse_relu=self.fuse_relu,
                              halo={"tfold2": "none",
                                    "tfold3": "spatial"}.get(self.mode,
                                                             "full"),
                              group_impl=self.group_impl,
                              name="conv")(x)
        if (self.mode == "s2d" and self.kernel == (3, 3, 3)
                and self.stride == (1, 2, 2) and self.padding == (1, 1, 1)
                and self.use_bias and x.shape[2] % 2 == 0
                and x.shape[3] % 2 == 0):
            return act(_S2DConv(self.features, dtype=self.dtype,
                                kernel_init=self.kernel_init, name="conv")(x))
        if self.mode == "cpad" and x.shape[-1] < 8:
            # zero-pad input channels to 8 so XLA's conv lowering gets a
            # im2col contraction with full sublane occupancy (C=3 convs fall
            # off the fast MXU path); exact same math — padded kernel rows
            # multiply zero activations
            return act(_CPadConv(self.features, kernel=self.kernel,
                                 stride=self.stride, padding=self.padding,
                                 dtype=self.dtype,
                                 kernel_init=self.kernel_init,
                                 name="conv")(x))
        if self.layout == "hwtc":
            return act(_HWTCConv(self.features, kernel=self.kernel,
                                 stride=self.stride, padding=self.padding,
                                 use_bias=self.use_bias, dtype=self.dtype,
                                 kernel_init=self.kernel_init,
                                 name="conv")(x))
        pad = [(p, p) for p in self.padding]
        kw = {}
        if self.kernel_init is not None:
            kw["kernel_init"] = self.kernel_init
        return act(nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
            **kw,
        )(x))


class ConvTranspose3dTorch(nn.Module):
    """Transposed 3D conv matching ``nn.ConvTranspose3d(k=4, s=2, p=1)``
    used by the family-B decoder (``causal_anomaly_detection1.py:156-179``)."""

    features: int
    kernel: Tuple[int, int, int] = (4, 4, 4)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch output size = (in-1)*s - 2p + k ; lax transposed conv with
        # padding ((k-1-p, k-1-p),...) reproduces it for these shapes.
        pad = [(self.kernel[i] - 1 - self.padding[i],) * 2 for i in range(3)]
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pad,
            name="conv",
        )(x)


def _adaptive_slices(in_size: int, out_size: int) -> Sequence[Tuple[int, int]]:
    """torch AdaptiveAvgPool index ranges: [floor(i*in/out), ceil((i+1)*in/out))."""
    return [
        (math.floor(i * in_size / out_size), math.ceil((i + 1) * in_size / out_size))
        for i in range(out_size)
    ]


def adaptive_avg_pool3d(x: jnp.ndarray, out: Tuple[int, int, int]) -> jnp.ndarray:
    """Adaptive average pool over (B, T, H, W, C) matching torch semantics,
    including output sizes *larger* than input (duplicated windows), which the
    reference hits: pool (2,8,8)->(4,4,4) at ``avenue_training_script2.py:23``.

    Shapes are static, so the window arithmetic happens at trace time; when the
    output evenly divides the input this lowers to a single strided
    reduce-window, which XLA fuses with the surrounding conv stack.
    """
    b, t, h, w, c = x.shape
    ot, oh, ow = out
    if t % ot == 0 and h % oh == 0 and w % ow == 0:
        kt, kh, kw = t // ot, h // oh, w // ow
        y = x.reshape(b, ot, kt, oh, kh, ow, kw, c)
        return y.mean(axis=(2, 4, 6))
    # General path: gather per-axis window means (tiny static loops).
    # (A jnp.repeat fast path for exact-factor oversampling was probed and
    # reverted: it traced ~20 us slower inside the family-D step — XLA
    # fuses the slice-concat form better there.)
    def pool_axis(arr, axis, in_size, out_size):
        slices = _adaptive_slices(in_size, out_size)
        parts = [
            jax.lax.slice_in_dim(arr, s, e, axis=axis).mean(axis=axis, keepdims=True)
            for s, e in slices
        ]
        return jnp.concatenate(parts, axis=axis)

    y = pool_axis(x, 1, t, ot)
    y = pool_axis(y, 2, h, oh)
    y = pool_axis(y, 3, w, ow)
    return y


def adaptive_avg_pool2d(x: jnp.ndarray, out: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) adaptive average pool (family-A backbone,
    ``causal_anomaly_detection.py:125`` AdaptiveAvgPool2d((4, 6)))."""
    y = adaptive_avg_pool3d(x[:, None], (1, *out))
    return y[:, 0]


def max_pool3d(x: jnp.ndarray, kernel: Tuple[int, int, int],
               stride: Tuple[int, int, int] | None = None) -> jnp.ndarray:
    """Max pool over (B, T, H, W, C) matching ``nn.MaxPool3d`` (no padding)."""
    stride = stride or kernel
    return nn.max_pool(x, window_shape=kernel, strides=stride, padding="VALID")


class MLP(nn.Module):
    """Dense stack with ReLU between layers; optional final activation.

    Replaces the reference's many ``nn.Sequential(Linear, ReLU, ...)`` heads.
    """

    features: Sequence[int]
    final_activation: str | None = None  # None | 'sigmoid' | 'softmax' | 'tanh' | 'relu'
    dropout: float = 0.0
    dropout_after: Tuple[int, ...] = ()  # layer indices followed by dropout
    # optional per-position rates aligned with dropout_after (the reference
    # heads mix rates, e.g. Dropout(0.3) then Dropout(0.2) in
    # causal_anomaly_detection.py:166-175); falls back to `dropout`
    dropout_rates: Tuple[float, ...] | None = None
    dtype: Any = None  # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        n = len(self.features)
        rate = {idx: (self.dropout_rates[j] if self.dropout_rates is not None
                      else self.dropout)
                for j, idx in enumerate(self.dropout_after)}
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)(x)
            if i < n - 1:
                x = nn.relu(x)
            if rate.get(i, 0.0) > 0:
                x = nn.Dropout(rate[i], deterministic=deterministic)(x)
        if self.final_activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.final_activation == "softmax":
            x = nn.softmax(x, axis=-1)
        elif self.final_activation == "tanh":
            x = nn.tanh(x)
        elif self.final_activation == "relu":
            x = nn.relu(x)
        return x


class MaskedBatchNorm(nn.Module):
    """Drop-in ``nn.BatchNorm`` whose train-mode batch statistics can exclude
    rows masked out by `valid` (DP remainder padding), making padded batches
    gradient-identical to their unpadded counterparts even through BN.

    Same parameter/collection names as ``nn.BatchNorm`` ("scale"/"bias" in
    params, "mean"/"var" in batch_stats), and bit-identical math when
    `valid is None` (mean-of-squares fast variance, running update
    ``m*ra + (1-m)*batch``), so torch checkpoint import maps unchanged.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        # statistics always accumulate in float32 (bf16 compute reads bf16
        # activations at half the HBM bytes but sums exactly) — identical
        # math for float32 inputs
        xf = x.astype(jnp.float32)
        if not train:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            if valid is None:
                mean = jnp.mean(xf, axes)
                mean2 = jnp.mean(xf * xf, axes)
            else:
                w = valid.reshape((-1,) + (1,) * (x.ndim - 1))
                cnt = jnp.maximum(valid.sum() * (x[..., 0].size / x.shape[0]),
                                  1.0)
                mean = jnp.sum(xf * w, axes) / cnt
                mean2 = jnp.sum(xf * xf * w, axes) / cnt
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((xf - mean) * mul + bias).astype(x.dtype)


class BatchNorm(nn.Module):
    """Torch-default BatchNorm (eps 1e-5, momentum 0.1) over the last axis.

    The reference uses BatchNorm2d/3d throughout families A/B/C; running
    statistics live in the 'batch_stats' collection like standard flax.
    """

    momentum: float = 0.9  # flax convention: running = m*running + (1-m)*batch
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
        )(x)
