"""Microbenchmark: where does the family-D train step spend its time?

Methodology: K=16 iterations inside ONE jit dispatch via lax.scan over K
pre-perturbed copies of the input (so nothing hoists), accumulating the raw
output (so nothing DCEs, and no in-loop scalar reductions serialize the VPU).
One data-dependent fetch at the end. Also calibrates achievable MXU FLOP/s
and HBM bandwidth. Context only — not part of the bench contract.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 256
DT = jnp.bfloat16
K = 16
REPS = 4


def bench(name, f, x, flops=None, nbytes=None, clips=B):
    """Time K scanned iterations of f over K perturbed copies of x."""
    xs = x[None] * (1.0 + jnp.arange(K, dtype=x.dtype)[
        (slice(None),) + (None,) * x.ndim] * 1e-6)

    @jax.jit
    def run(xs):
        def body(acc, xi):
            return acc + f(xi), None
        acc, _ = jax.lax.scan(body, jnp.zeros_like(f(x)), xs)
        return acc[(0,) * acc.ndim]

    np.asarray(run(xs))  # compile + warm
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        best = min(best, (time.perf_counter() - t0) / K)
    extra = ""
    if flops:
        extra += f"  {flops / best / 1e12:6.1f} TF/s"
    if nbytes:
        extra += f"  {nbytes / best / 1e9:6.0f} GB/s"
    print(f"{name:38s} {best*1e6:9.1f} us  ({clips/best:>9,.0f} clips/s){extra}",
          flush=True)
    return best


def conv3d(x, w, b, stride, padding="torch"):
    if padding == "torch":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        padding = "VALID"
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(x, w, stride, padding,
                                     dimension_numbers=dn,
                                     preferred_element_type=DT)
    return jax.nn.relu(y + b)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, 8, 64, 64, 3)), DT)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 3, 16)), DT)
    b1 = jnp.zeros(16, DT)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 16, 32)), DT)
    b2 = jnp.zeros(32, DT)
    w3 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 32, 64)), DT)
    b3 = jnp.zeros(64, DT)

    # --- calibration --------------------------------------------------------
    m = jnp.asarray(rng.normal(0, 0.01, (4096, 4096)), DT)
    bench("calib matmul 4096^3 bf16",
          lambda a: jnp.dot(a, m, preferred_element_type=DT), m,
          flops=2 * 4096**3)
    big = jnp.asarray(rng.normal(0, 1, (8192, 8192)), DT)  # 128MB
    bench("calib scale 128MB (r+w)", lambda a: a * 1.5, big,
          nbytes=2 * big.size * 2)

    # --- pieces -------------------------------------------------------------
    c1 = lambda x: conv3d(x, w1, b1, (1, 2, 2))
    c2 = lambda h: conv3d(h, w2, b2, (2, 2, 2))
    c3 = lambda h: conv3d(h, w3, b3, (2, 2, 2))
    h1, h2 = c1(x), c2(c1(x))
    F1 = 2 * B * 8 * 32 * 32 * 16 * 81
    F2 = 2 * B * 4 * 16 * 16 * 32 * 432
    F3 = 2 * B * 2 * 8 * 8 * 64 * 864
    bench("conv1 fwd (3->16, s122)", c1, x, flops=F1,
          nbytes=2 * (x.size + 256 * 8 * 32 * 32 * 16))
    bench("conv2 fwd (16->32, s222)", c2, h1, flops=F2,
          nbytes=2 * (h1.size + 256 * 4 * 16 * 16 * 32))
    bench("conv3 fwd (32->64, s222)", c3, h2, flops=F3,
          nbytes=2 * (h2.size + 256 * 2 * 8 * 8 * 64))
    bench("stack fwd", lambda x: c3(c2(c1(x))), x, flops=F1 + F2 + F3)

    def stack_bwd(x):
        def f(ws):
            a, b_, c = ws
            return jnp.sum(conv3d(conv3d(conv3d(x, a, b1, (1, 2, 2)),
                                         b_, b2, (2, 2, 2)),
                                  c, b3, (2, 2, 2)).astype(jnp.float32) ** 2)
        g = jax.grad(f)((w1, w2, w3))
        return jnp.stack([g[0].astype(jnp.float32).sum(),
                          g[1].astype(jnp.float32).sum(),
                          g[2].astype(jnp.float32).sum()])
    bench("stack fwd+bwd(w1,w2,w3)", stack_bwd, x, flops=3 * (F1 + F2 + F3))

    # --- conv1 via space-to-depth ------------------------------------------
    w1p = jnp.pad(w1, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))  # taps 3->4
    w1s = w1p.reshape(3, 2, 2, 2, 2, 3, 16)  # kt, jh, ph_h, jw, ph_w, cin, co
    w1s = jnp.transpose(w1s, (0, 1, 3, 2, 4, 5, 6)).reshape(3, 2, 2, 12, 16)

    def c1_s2d(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        b_, t, h, w, c = xp.shape
        xs = xp.reshape(b_, t, h // 2, 2, w // 2, 2, c)
        xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5, 6)).reshape(
            b_, t, h // 2, w // 2, 4 * c)
        return conv3d(xs, w1s, b1, (1, 1, 1), padding="VALID")

    y_ref = np.asarray(c1(x), np.float32)
    y_s2d = np.asarray(c1_s2d(x), np.float32)
    print("s2d max err:", np.abs(y_ref - y_s2d).max(), flush=True)
    bench("conv1 s2d fwd", c1_s2d, x, flops=F1)
    bench("stack fwd (s2d conv1)", lambda x: c3(c2(c1_s2d(x))), x,
          flops=F1 + F2 + F3)

    # --- rest of the model --------------------------------------------------
    import sys
    sys.path.insert(0, "/root/repo")
    from cvad_tpu.config import preset
    from cvad_tpu.models import build_model

    cfg = preset("family_d")
    model = build_model(cfg.model.replace(dtype="bfloat16"))
    xf = jnp.asarray(rng.uniform(0, 1, (B, 8, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), xf)

    def full_fwd(x):
        s, adj, feats = model.apply(variables, x, deterministic=True)
        return s
    bench("full model fwd", full_fwd, xf)

    def full_bwd(x):
        def f(p):
            s, adj, feats = model.apply({"params": p}, x, deterministic=True)
            return (jnp.sum(s) + jnp.sum(adj.astype(jnp.float32))
                    + jnp.sum(feats ** 2))
        g = jax.grad(f)(variables["params"])
        return jnp.stack([l.astype(jnp.float32).sum()
                          for l in jax.tree_util.tree_leaves(g)])
    bench("full model fwd+bwd", full_bwd, xf)


if __name__ == "__main__":
    main()
