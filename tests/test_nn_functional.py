import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu.nn import functional as F


def test_hard_mish():
    x = jnp.asarray([-3.0, -2.0, -1.0, 0.0, 1.0, 2.0])
    out = F.hard_mish(x)
    # closed form: x/2 * clamp(x+2, 0, 2)
    expected = jnp.asarray([0.0, 0.0, -0.5, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(out, expected, atol=1e-7)


def test_nl_relu():
    x = jnp.asarray([-2.0, 0.0, 1.0, 3.0])
    np.testing.assert_allclose(F.nl_relu(x), jnp.log1p(jnp.maximum(x, 0)), atol=1e-7)
    np.testing.assert_allclose(F.nl_relu(x, beta=2.0), jnp.log1p(2 * jnp.maximum(x, 0)), atol=1e-7)


def test_concat_downsample2d():
    # channel ordering must match the reference permutation (sh, sw, c)
    n, h, w, c = 2, 4, 4, 3
    x = jnp.arange(n * h * w * c, dtype=jnp.float32).reshape(n, h, w, c)
    out = F.concat_downsample2d(x, 2)
    assert out.shape == (n, 2, 2, 12)
    # torch parity on the same data (NCHW reference semantics)
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    bt, ct, ht, wt = xt.shape
    xt2 = xt.view(bt, ct, ht // 2, 2, wt // 2, 2).permute(0, 3, 5, 1, 2, 4).contiguous()
    expected = xt2.reshape(bt, ct * 4, ht // 2, wt // 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), expected)

    with pytest.raises(AssertionError):
        F.concat_downsample2d(x, 3)


def test_z_pool():
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 8))
    out = F.z_pool(x, -1)
    assert out.shape == (2, 4, 4, 2)
    np.testing.assert_allclose(out[..., 0], jnp.max(x, axis=-1), atol=1e-7)
    np.testing.assert_allclose(out[..., 1], jnp.mean(x, axis=-1), atol=1e-6)


def test_dropblock2d():
    x = jnp.ones((2, 8, 8, 3))
    # eval / p=0 passthrough
    np.testing.assert_array_equal(F.dropblock2d(x, jax.random.key(0), 0.5, 3, training=False), x)
    np.testing.assert_array_equal(F.dropblock2d(x, jax.random.key(0), 0.0, 3, training=True), x)
    out = F.dropblock2d(x, jax.random.key(42), 0.9, 3, training=True)
    assert out.shape == x.shape
    # renormalization keeps the non-dropped scale >= 1 and the expected mean close to 1
    mask_zero = np.asarray(out) == 0
    assert mask_zero.any()
    nonzero = np.asarray(out)[~mask_zero]
    assert np.allclose(nonzero, nonzero.flat[0])
    assert nonzero.flat[0] > 1.0
    # dropped blocks are identical across channels (mask is (N, H, W))
    assert (mask_zero[..., 0] == mask_zero[..., 1]).all()


def test_extract_patches2d():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 7, 6, 3)).astype(np.float32)
    for stride, padding, dilation, k in [(1, 0, 1, 3), (2, 1, 1, 3), (1, 2, 2, 3), (2, 0, 1, 1)]:
        patches = F.extract_patches2d(jnp.asarray(x), (k, k), stride, padding, dilation)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        unf = torch.nn.functional.unfold(xt, (k, k), dilation=dilation, padding=padding, stride=stride)
        # torch: (N, C*k*k, L) ordered (c, kh, kw); ours: (N, H', W', k*k*C) ordered (kh, kw, c)
        n, _, length = unf.shape
        ours = np.asarray(patches).reshape(n, length, k * k, x.shape[-1]).transpose(0, 1, 3, 2)
        theirs = unf.numpy().transpose(0, 2, 1).reshape(n, length, x.shape[-1], k * k)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_norm_conv2d_parity():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)  # HWIO
    b = rng.normal(size=(8,)).astype(np.float32)
    out = F.norm_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=1)

    # expected via the reference's unfold-normalize-matmul recipe in torch
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
    unf = torch.nn.functional.unfold(xt, (3, 3), padding=1).transpose(1, 2)
    scale = (unf.var(-1, unbiased=False, keepdim=True) + 1e-14).rsqrt()
    unf = (unf - unf.mean(-1, keepdim=True)) * scale
    res = unf @ wt.reshape(8, -1).t() + torch.from_numpy(b)
    expected = res.transpose(1, 2).reshape(2, 8, 5, 5).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_add2d_parity():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    out = F.add2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    unf = torch.nn.functional.unfold(xt, (3, 3), padding=1, stride=2).transpose(1, 2)
    res = -(unf.unsqueeze(2) - wt.reshape(6, -1)).abs().sum(-1)
    expected = res.transpose(1, 2).reshape(2, 6, 3, 3).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)
