import jax
import jax.numpy as jnp
import numpy as np

from holocron_tpu.kernels.add2d import add2d_matmul, add2d_matmul_ad
from holocron_tpu.nn import functional as F


def test_add2d_kernel_parity_interpret():
    # Pallas interpreter vs the XLA broadcast reference, non-aligned shapes
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.normal(size=(50, 36)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(36, 10)).astype(np.float32))
    expected = -jnp.sum(jnp.abs(patches[:, :, None] - weight[None, :, :]), axis=1)
    got = add2d_matmul(patches, weight, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_add2d_kernel_grads():
    rng = np.random.default_rng(1)
    patches = jnp.asarray(rng.normal(size=(8, 12)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(12, 4)).astype(np.float32))

    def loss_pallas(p, w):
        return jnp.sum(add2d_matmul_ad(p, w, True) ** 2)

    def loss_ref(p, w):
        return jnp.sum((-jnp.sum(jnp.abs(p[:, :, None] - w[None]), axis=1)) ** 2)

    gp, gw = jax.grad(loss_pallas, argnums=(0, 1))(patches, weight)
    rp, rw = jax.grad(loss_ref, argnums=(0, 1))(patches, weight)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-4)


def test_functional_add2d_pallas_dispatch():
    # use_pallas plumbing in the functional op (interpret path not used on CPU: force off/on)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    ref = F.add2d(x, w, padding=1, use_pallas=False)
    assert ref.shape == (1, 6, 6, 4)


def test_add2d_backward_chunked_matches_dense():
    """The chunked backward must equal the dense sign contraction (small shape)."""
    from holocron_tpu.kernels.add2d import add2d_matmul_ad

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(37, 19)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(19, 23)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(37, 23)).astype(np.float32))

    def loss(p_, w_):
        return jnp.sum(add2d_matmul_ad(p_, w_, True) * g)

    dp, dw = jax.grad(loss, argnums=(0, 1))(p, w)
    sign = np.sign(np.asarray(p)[:, :, None] - np.asarray(w)[None, :, :])
    dp_ref = -np.einsum("lo,ldo->ld", np.asarray(g), sign)
    dw_ref = np.einsum("lo,ldo->do", np.asarray(g), sign)
    np.testing.assert_allclose(np.asarray(dp), dp_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), dw_ref, atol=1e-5)


def test_add2d_backward_realistic_shape_no_oom():
    """AdderNet layer-sized backward: L=12544, D=576, O=128 — the dense (L, D, O)
    sign tensor would be 3.7 GB; the chunked scan must stay in budget and match a
    low-memory numpy oracle."""
    from holocron_tpu.kernels.add2d import add2d_matmul_ad

    rng = np.random.default_rng(1)
    l_dim, d_dim, o_dim = 12544, 576, 128
    p = jnp.asarray(rng.normal(size=(l_dim, d_dim)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(d_dim, o_dim)).astype(np.float32))
    g_np = rng.normal(size=(l_dim, o_dim)).astype(np.float32)
    g = jnp.asarray(g_np)

    def loss(p_, w_):
        return jnp.sum(add2d_matmul_ad(p_, w_, True) * g)

    dp, dw = jax.grad(loss, argnums=(0, 1))(p, w)
    dp, dw = np.asarray(dp), np.asarray(dw)
    assert np.isfinite(dp).all() and np.isfinite(dw).all()
    # numpy oracle over small O-chunks (keeps the oracle itself low-memory)
    p_np, w_np = np.asarray(p), np.asarray(w)
    dp_ref = np.zeros_like(p_np)
    dw_ref = np.zeros_like(w_np)
    for start in range(0, o_dim, 8):
        sl = slice(start, start + 8)
        sign = np.sign(p_np[:, :, None] - w_np[None, :, sl])
        dp_ref -= np.einsum("lo,ldo->ld", g_np[:, sl], sign)
        dw_ref[:, sl] = np.einsum("lo,ldo->do", g_np[:, sl], sign)
    np.testing.assert_allclose(dp, dp_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(dw, dw_ref, rtol=1e-4, atol=1e-3)


def test_involution_stencil_matches_naive():
    """Pallas involution stencil == the naive per-tap expansion (forward + grads)."""
    from holocron_tpu.kernels.involution import involution_stencil_ad

    rng = np.random.default_rng(0)
    n, h, w, c, g, k = 2, 6, 7, 8, 4, 3
    cg = c // g
    xp = jnp.asarray(rng.normal(size=(n, h + k - 1, w + k - 1, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(n, h, w, k * k * g)).astype(np.float32))

    out = involution_stencil_ad(xp, kern, k, g, True)
    expected = np.zeros((n, h, w, c), np.float32)
    xn, kn = np.asarray(xp), np.asarray(kern)
    for idx in range(k * k):
        dy, dx = divmod(idx, k)
        expected += np.repeat(kn[:, :, :, idx * g : (idx + 1) * g], cg, axis=-1) * xn[:, dy : dy + h, dx : dx + w]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    # gradients vs autodiff through an equivalent XLA formulation
    def naive(xp_, kern_):
        acc = jnp.zeros((n, h, w, c))
        for idx in range(k * k):
            dy, dx = divmod(idx, k)
            win = jax.lax.dynamic_slice(xp_, (0, dy, dx, 0), (n, h, w, c))
            ktap = jax.lax.dynamic_slice(kern_, (0, 0, 0, idx * g), (n, h, w, g))
            acc = acc + jnp.repeat(ktap, cg, axis=-1) * win
        return acc

    gcot = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    dp1, dk1 = jax.grad(lambda a, b: jnp.sum(involution_stencil_ad(a, b, k, g, True) * gcot), argnums=(0, 1))(xp, kern)
    dp2, dk2 = jax.grad(lambda a, b: jnp.sum(naive(a, b) * gcot), argnums=(0, 1))(xp, kern)
    np.testing.assert_allclose(np.asarray(dp1), np.asarray(dp2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk2), atol=1e-4)


def test_involution_module_pallas_equals_fallback():
    """The module's Pallas fast path and XLA fallback agree at a realistic config."""
    from holocron_tpu import nn as hnn

    x = jax.random.normal(jax.random.key(0), (2, 12, 12, 16))
    module = hnn.Involution2d(kernel_size=3, padding=1, groups=4, reduction_ratio=2)
    variables = module.init(jax.random.key(1), x)
    out_fast = module.apply(variables, x)  # CPU -> interpret-mode Pallas path

    # force the fallback by making the VMEM estimate enormous via monkeypatching
    import holocron_tpu.kernels.involution as inv_mod

    orig = inv_mod.vmem_estimate
    inv_mod.vmem_estimate = lambda *a: 1 << 40
    try:
        out_slow = module.apply(variables, x)
    finally:
        inv_mod.vmem_estimate = orig
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_slow), atol=1e-5)
