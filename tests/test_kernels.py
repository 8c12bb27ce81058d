import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
