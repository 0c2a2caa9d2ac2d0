"""Probe the MXU scheduling model on this chip.

Questions:
1. rows/cycle: M=2.1M K=128 N=128 matmul — 1 row/cycle => ~2.2ms.
2. does time scale with K-tiles and N-tiles as the row model predicts?
3. does the T-pair-packed conv1 reformulation (K 81->108, N 16->32,
   M halved — mathematically the same conv) beat XLA's native conv1?
Context only — not part of the bench contract.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
K_ITERS = 8
REPS = 4
B = 256


def bench(name, f, x, flops=None):
    xs = x[None] * (1.0 + jnp.arange(K_ITERS, dtype=x.dtype)[
        (slice(None),) + (None,) * x.ndim] * 1e-6)

    @jax.jit
    def run(xs):
        def body(acc, xi):
            return acc + f(xi), None
        acc, _ = jax.lax.scan(body, jnp.zeros_like(f(x)), xs)
        return acc[(0,) * acc.ndim]

    np.asarray(run(xs))
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        best = min(best, (time.perf_counter() - t0) / K_ITERS)
    extra = f"  {flops / best / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:44s} {best*1e6:9.1f} us{extra}", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)

    # 1. row-rate probes: same M, varying K/N tile counts
    for mm, kk, nn in ((2_097_152, 128, 128), (2_097_152, 128, 16),
                       (1_048_576, 128, 32), (262_144, 512, 32)):
        a = jnp.asarray(rng.normal(0, 0.1, (mm, kk)), DT)
        w = jnp.asarray(rng.normal(0, 0.1, (kk, nn)), DT)
        bench(f"matmul M={mm//1024}k K={kk} N={nn}",
              lambda x, w=w: jnp.dot(x, w, preferred_element_type=DT), a,
              flops=2 * mm * kk * nn)

    # 2. conv1 native vs T-pair packed
    x = jnp.asarray(rng.uniform(0, 1, (B, 8, 64, 64, 3)), DT)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 3, 16)), DT)
    b1 = jnp.zeros(16, DT)
    F1 = 2 * B * 8 * 32 * 32 * 16 * 81

    def conv(x, w, stride, pad):
        xp = jnp.pad(x, ((0, 0), *[(p, p) for p in pad], (0, 0)))
        dn = jax.lax.conv_dimension_numbers(xp.shape, w.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(xp, w, stride, "VALID",
                                            dimension_numbers=dn,
                                            preferred_element_type=DT)

    c1 = lambda x: jax.nn.relu(conv(x, w1, (1, 2, 2), (1, 1, 1)) + b1)
    bench("conv1 native", c1, x, flops=F1)

    # T-pair packing: one (4,3,3)/s(2,2,2) conv emitting 32 channels =
    # [even-T out 16ch | odd-T out 16ch]; exact same MACs.
    w_pair = jnp.zeros((4, 3, 3, 3, 32), DT)
    w_pair = w_pair.at[0:3, :, :, :, :16].set(w1)   # even output: taps 0..2
    w_pair = w_pair.at[1:4, :, :, :, 16:].set(w1)   # odd output: taps 1..3

    def c1_tpair(x):
        y = conv(x, w_pair, (2, 2, 2), (1, 1, 1))  # (B, 4, 32, 32, 32)
        y = jax.nn.relu(y + jnp.tile(b1, 2))
        b_, t2, h, w, _ = y.shape
        y = y.reshape(b_, t2, h, w, 2, 16)
        return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b_, 2 * t2, h, w, 16)

    y_ref = np.asarray(c1(x), np.float32)
    y_tp = np.asarray(c1_tpair(x), np.float32)
    print("t-pair max err:", np.abs(y_ref - y_tp).max(), flush=True)
    bench("conv1 T-pair packed", c1_tpair, x, flops=F1)

    # 3. conv1 as explicit im2col matmul in XLA (patches stay virtual?)
    def c1_im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        # gather 27 shifted strided views, concat on channel: (B,8,32,32,81)
        parts = []
        for kt in range(3):
            for kh in range(3):
                for kw in range(3):
                    parts.append(jax.lax.slice(
                        xp, (0, kt, kh, kw, 0),
                        (B, kt + 8, kh + 63 + 1, kw + 63 + 1, 3),
                        (1, 1, 2, 2, 1)))
        p = jnp.concatenate(parts, axis=-1)
        y = jnp.dot(p.reshape(-1, 81), w1.reshape(81, 16).astype(DT),
                    preferred_element_type=DT)
        return jax.nn.relu(y + b1).reshape(B, 8, 32, 32, 16)

    y_i2c = np.asarray(c1_im2col(x), np.float32)
    print("im2col max err:", np.abs(y_ref - y_i2c).max(), flush=True)
    bench("conv1 im2col-XLA", c1_im2col, x, flops=F1)


if __name__ == "__main__":
    main()
