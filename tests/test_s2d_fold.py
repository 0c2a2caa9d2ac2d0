"""s2d + grouped-T-fold conv1 lowering (ops/pallas_s2d.py): exactness of the
fold transforms, the XLA lowerings, and the Pallas kernels (interpret mode)
against ``lax.conv``, plus the family-D model integration.

Reference conv: ``avenue_training_script2.py:19`` (Conv3d 3->16, k3,
stride (1,2,2), pad 1) at the long-window config (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.ops.pallas_s2d import (_xla_core, _xla_dot_core, s2d_fold_input,
                                     s2d_fold_kernel, s2d_fold_matmul)


def _ref_conv(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 2, 2),
                                        ((1, 1), (1, 1), (1, 1)),
                                        dimension_numbers=dn)


def _unfold(y, b, t, g, h, w, o):
    n = t // g
    y = y.reshape(b, n, h // 2, w // 2, g, o)
    return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, t, h // 2, w // 2, o)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    B, T, H, W, C, O, g = 2, 16, 16, 16, 3, 16, 4
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32))
    k = jnp.asarray(0.1 * rng.normal(size=(3, 3, 3, C, O)).astype(np.float32))
    return x, k, g


@pytest.mark.parametrize("core", ["conv", "dot", "interp"])
def test_s2d_fold_forward_exact(case, core):
    x, k, g = case
    B, T, H, W, C = x.shape
    O = k.shape[-1]
    xf = s2d_fold_input(x, g)
    wd = s2d_fold_kernel(k, g)
    assert xf.shape == (B * T // g, H // 2 + 1, W // 2 + 1, (g + 2) * 4 * C)
    assert wd.shape == (2, 2, (g + 2) * 4 * C, g * O)
    fn = {"conv": _xla_core, "dot": _xla_dot_core,
          "interp": lambda a, b: s2d_fold_matmul(a, b, interpret=True)}[core]
    out = _unfold(fn(xf, wd), B, T, g, H, W, O)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_conv(x, k)),
                               atol=5e-6)


def test_s2d_fold_grads_exact(case):
    """custom_vjp (Pallas dgrad + wgrad, interpret mode) == autodiff through
    the reference conv."""
    x, k, g = case
    B, T, H, W, C = x.shape
    O = k.shape[-1]

    def loss_ref(x, k):
        return jnp.sum(jnp.sin(_ref_conv(x, k)))

    def loss_s2d(x, k):
        y = s2d_fold_matmul(s2d_fold_input(x, g), s2d_fold_kernel(k, g),
                            interpret=True)
        return jnp.sum(jnp.sin(_unfold(y, B, T, g, H, W, O)))

    gr = jax.grad(loss_ref, (0, 1))(x, k)
    gs = jax.grad(loss_s2d, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gr[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gr[1]),
                               atol=1e-3, rtol=1e-5)


def test_dead_phase_and_band_zeros(case):
    """The folded kernel's dead s2d phases and off-band rows are exact
    zeros — the exactness argument, checked structurally."""
    _, k, g = case
    C, O = k.shape[-2], k.shape[-1]
    wd = np.asarray(s2d_fold_kernel(k, g))
    # dead phase: cell tap (1,1) phase (1,1) corresponds to kh=kw=3 (padded)
    for ti in range(g):
        for kt in range(3):
            rows = slice((ti + kt) * 4 * C + 3 * C, (ti + kt) * 4 * C + 4 * C)
            assert np.all(wd[1, 1, rows, ti * O:(ti + 1) * O] == 0)
    # off-band: column block ti has zero rows outside its 3-frame window
    for ti in range(g):
        band = np.zeros(g + 2, bool)
        band[ti:ti + 3] = True
        for fr in np.nonzero(~band)[0]:
            rows = slice(fr * 4 * C, (fr + 1) * 4 * C)
            assert np.all(wd[:, :, rows, ti * O:(ti + 1) * O] == 0)


@pytest.mark.parametrize("core", ["xla_groups", "xla_slabs", "interp"])
def test_whole_t_group_conv_exact(case, core):
    """Production long-window path: whole-T fold input + padded-slab gather
    + grouped kernel against ``lax.conv``, fwd + both grads."""
    from cvad_tpu.ops.pallas_s2d import (_xla_groups_core, s2d_fold_groups,
                                         s2d_foldT_input, s2d_group_conv)

    x, k, g = case
    B, T, H, W, C = x.shape
    O = k.shape[-1]
    xt = s2d_foldT_input(x)
    assert xt.shape == (B, H // 2 + 1, W // 2 + 1, (T + 2) * 4 * C)
    wd = s2d_fold_kernel(k, g)
    fn = {"xla_groups": lambda: _xla_groups_core(xt, wd, g),
          "xla_slabs": lambda: s2d_group_conv(s2d_fold_groups(x, g), wd, g,
                                              use_pallas=False),
          "interp": lambda: s2d_group_conv(s2d_fold_groups(x, g), wd, g,
                                           interpret=True)}[core]

    def unfold(y):  # t-major folded -> NDHWC
        y = y.reshape(B, H // 2, W // 2, T, O)
        return jnp.transpose(y, (0, 3, 1, 2, 4))

    np.testing.assert_allclose(np.asarray(unfold(fn())),
                               np.asarray(_ref_conv(x, k)), atol=5e-6)
    if core != "interp":
        return

    def loss_ref(x, k):
        return jnp.sum(jnp.sin(_ref_conv(x, k)))

    def loss_s2d(x, k):
        return jnp.sum(jnp.sin(unfold(s2d_group_conv(
            s2d_fold_groups(x, g), s2d_fold_kernel(k, g), g,
            interpret=True))))

    gr = jax.grad(loss_ref, (0, 1))(x, k)
    gs = jax.grad(loss_s2d, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gr[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gr[1]),
                               atol=1e-3, rtol=1e-5)


def test_family_d_s2d_group_impl_exact():
    """Full family-D forward with conv_group_impl='s2d' matches the native
    stack bit-for-bit at the score level (CPU f32)."""
    from cvad_tpu.config import FamilyDConfig
    from cvad_tpu.models import CausalAnomalyDetector

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 64, 64, 3)).astype(np.float32))
    m_ref = CausalAnomalyDetector(FamilyDConfig(conv_stack="ndhwc",
                                                conv1_mode="native"))
    v = m_ref.init(jax.random.PRNGKey(0), x, deterministic=True)
    s_ref, _, f_ref = m_ref.apply(v, x, deterministic=True)
    for stack in ("folded", "ndhwc"):
        m = CausalAnomalyDetector(FamilyDConfig(
            conv_stack=stack, conv1_mode="tfold", conv_group_impl="s2d"))
        s, _, f = m.apply(v, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   atol=1e-6, err_msg=stack)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                                   atol=1e-5, err_msg=stack)


def test_s2d_requires_stride2():
    from cvad_tpu.models.layers import Conv3dTorch

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 8, 3)).astype(np.float32))
    m = Conv3dTorch(16, stride=(1, 1, 1), mode="tfold", group_impl="s2d")
    with pytest.raises(ValueError, match="stride 2"):
        m.init(jax.random.PRNGKey(0), x)
