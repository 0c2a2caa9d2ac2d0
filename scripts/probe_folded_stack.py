"""Probe: family-D conv-stack lowerings on the real TPU.

Times fwd+bwd of the 3-conv stack (avenue_training_script2.py:19-21 shapes)
under three lowerings:

  native  - plain NDHWC convs (what nn.Conv emits)
  tfold1  - conv1 T-folded (one 2-D conv, matmul (M,270)x(270,128)),
            unfold transpose back to NDHWC for conv2/conv3
  folded  - conv1 T-folded; conv2/conv3 consume the folded layout directly
            via conv dimension_numbers with spatial dims (3,1,2) — zero
            large transposes anywhere in the stack

Timing per CLAUDE.md: accumulate a data-dependent scalar and fetch it once
(block_until_ready via the axon relay returns at enqueue, not completion).

Usage: PYTHONPATH=. python scripts/probe_folded_stack.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
DT = jnp.bfloat16


def make_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "k1": jax.random.normal(k1, (3, 3, 3, 3, 16), jnp.float32) * 0.1,
        "k2": jax.random.normal(k2, (3, 3, 3, 16, 32), jnp.float32) * 0.05,
        "k3": jax.random.normal(k3, (3, 3, 3, 32, 64), jnp.float32) * 0.03,
    }


def conv3d(x, k, stride):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(xp, k.astype(x.dtype), stride,
                                        "VALID", dimension_numbers=dn)


def conv3d_hwt(x, k, stride):
    """Conv over (B, H, W, T, C) layout without transposing the data:
    spatial dims are (T=3, H=1, W=2) via dimension_numbers."""
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(0, 4, 3, 1, 2),   # N, C, (T, H, W)
        rhs_spec=(4, 3, 0, 1, 2),   # O, I, (kT, kH, kW)
        out_spec=(0, 4, 3, 1, 2),
    )
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    kt = jnp.transpose(k.astype(x.dtype), (1, 2, 0, 3, 4))  # kH,kW,kT,I,O
    st, sh, sw = stride
    return jax.lax.conv_general_dilated(xp, kt, (st, sh, sw),
                                        "VALID", dimension_numbers=dn)


def tfold_conv1(x, k1):
    """(B,T,H,W,3) -> folded (B,H/2,W/2,T,16) via one 2-D conv."""
    b, t, h, w, cin = x.shape
    cout = k1.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xf = jnp.transpose(xp, (0, 2, 3, 1, 4)).reshape(b, h + 2, w + 2,
                                                    (t + 2) * cin)
    kf = jnp.transpose(k1, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * cin, cout)
    wd = jnp.zeros((3, 3, (t + 2) * cin, t * cout), k1.dtype)
    for ti in range(t):
        wd = wd.at[:, :, ti * cin:(ti + 3) * cin,
                   ti * cout:(ti + 1) * cout].set(kf)
    dn = jax.lax.conv_dimension_numbers(xf.shape, wd.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xf, wd.astype(x.dtype), (2, 2), "VALID",
                                     dimension_numbers=dn)
    return y.reshape(b, h // 2, w // 2, t, cout)


def stack_native(p, x):
    y = jax.nn.relu(conv3d(x, p["k1"], (1, 2, 2)))
    y = jax.nn.relu(conv3d(y, p["k2"], (2, 2, 2)))
    y = jax.nn.relu(conv3d(y, p["k3"], (2, 2, 2)))
    return y


def stack_tfold1(p, x):
    y = jax.nn.relu(tfold_conv1(x, p["k1"]))          # (B,32,32,8,16)
    y = jnp.transpose(y, (0, 3, 1, 2, 4))             # unfold -> NDHWC
    y = jax.nn.relu(conv3d(y, p["k2"], (2, 2, 2)))
    y = jax.nn.relu(conv3d(y, p["k3"], (2, 2, 2)))
    return y


def stack_folded(p, x):
    y = jax.nn.relu(tfold_conv1(x, p["k1"]))          # (B,32,32,8,16)
    y = jax.nn.relu(conv3d_hwt(y, p["k2"], (2, 2, 2)))  # (B,16,16,4,32)
    y = jax.nn.relu(conv3d_hwt(y, p["k3"], (2, 2, 2)))  # (B,8,8,2,64)
    return jnp.transpose(y, (0, 3, 1, 2, 4))          # tiny unfold at the end

def check_equiv(p, x):
    f32 = x.astype(jnp.float32)
    ref = np.asarray(stack_native(p, f32), np.float32)
    for name, fn in (("tfold1", stack_tfold1), ("folded", stack_folded)):
        out = np.asarray(fn(p, f32), np.float32)
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"  {name} max rel err vs native (f32): {err:.2e}")


def bench(name, fn, p, x):
    def loss(p):
        return (fn(p, x.astype(DT)).astype(jnp.float32) ** 2).mean()

    step = jax.jit(jax.grad(loss))
    g = step(p)
    total = jnp.float32(0)
    for _ in range(3):
        g = step(p)
        total = total + g["k1"][0, 0, 0, 0, 0]
    np.asarray(total)  # sync
    t0 = time.perf_counter()
    total = jnp.float32(0)
    for _ in range(ITERS):
        g = step(p)
        total = total + g["k1"][0, 0, 0, 0, 0]
    np.asarray(total)  # data-dependent fetch: real completion
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {name:8s} {dt*1e6:8.0f} us/iter (fwd+bwd), "
          f"{B/dt:9.0f} clips/s")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    p = make_params(key)
    x = jax.random.uniform(key, (B, 8, 64, 64, 3), jnp.float32)
    print(f"devices: {jax.devices()}")
    print(f"B={B} iters={ITERS} dtype={DT.__name__}")
    if "--equiv" in sys.argv:  # covered by tests/test_models.py on CPU
        check_equiv(p, jax.device_put(x))
    x = jax.device_put(x)
    for name, fn in (("native", stack_native), ("tfold1", stack_tfold1),
                     ("folded", stack_folded)):
        bench(name, fn, p, x)


if __name__ == "__main__":
    main()
