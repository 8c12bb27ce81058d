import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu import nn


def _init_and_apply(module, x, train=False, rngs=None, **kwargs):
    variables = module.init(jax.random.key(0), x, **kwargs)
    mutable = ["batch_stats"] if (train and "batch_stats" in variables) else False
    out = module.apply(variables, x, train=train, rngs=rngs, mutable=mutable, **kwargs) if _takes_train(
        module
    ) else module.apply(variables, x, rngs=rngs, mutable=mutable, **kwargs)
    if mutable:
        out = out[0]
    return out, variables


def _takes_train(module):
    import inspect

    return "train" in inspect.signature(type(module).__call__).parameters


@pytest.fixture
def x():
    return jax.random.normal(jax.random.key(7), (2, 8, 8, 8))


def test_hard_mish_module(x):
    out, _ = _init_and_apply(nn.HardMish(), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(0.5 * x * jnp.clip(x + 2, 0, 2)), atol=1e-6)


def test_nl_relu_module(x):
    out, _ = _init_and_apply(nn.NLReLU(beta=2.0), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.log1p(2.0 * jax.nn.relu(x))), atol=1e-6)


def test_frelu(x):
    module = nn.FReLU(kernel_size=3)
    out, variables = _init_and_apply(module, x, train=False)
    assert out.shape == x.shape
    # depthwise conv kernel: (3, 3, 1, C)
    assert variables["params"]["conv"]["kernel"].shape == (3, 3, 1, 8)
    # funnel condition: out >= x
    assert bool(jnp.all(out >= x - 1e-6))
    # train mode updates batch stats
    out2, mut = module.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_sam(x):
    out, variables = _init_and_apply(nn.SAM(), x)
    assert out.shape == x.shape
    assert variables["params"]["conv"]["kernel"].shape == (1, 1, 8, 1)


def test_triplet_attention(x):
    out, _ = _init_and_apply(nn.TripletAttention(), x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dim_attention_axes(x):
    for axis in [1, 2, 3]:
        out, _ = _init_and_apply(nn.DimAttention(axis=axis), x)
        assert out.shape == x.shape


def test_concat_downsample_module(x):
    out, _ = _init_and_apply(nn.ConcatDownsample2d(scale_factor=2), x)
    assert out.shape == (2, 4, 4, 32)


def test_global_pools(x):
    out, _ = _init_and_apply(nn.GlobalAvgPool2d(flatten=True), x)
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.mean(x, axis=(1, 2))), atol=1e-6)
    out, _ = _init_and_apply(nn.GlobalAvgPool2d(flatten=False), x)
    assert out.shape == (2, 1, 1, 8)
    out, _ = _init_and_apply(nn.GlobalMaxPool2d(flatten=True), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.max(x, axis=(1, 2))), atol=1e-6)
    out, _ = _init_and_apply(nn.GlobalMaxPool2d(flatten=False), x)
    assert out.shape == (2, 1, 1, 8)


def test_blurpool(x):
    torch = pytest.importorskip("torch")
    out, _ = _init_and_apply(nn.BlurPool2d(kernel_size=3, stride=2), x)
    assert out.shape == (2, 4, 4, 8)
    # parity vs explicit torch computation of the binomial blur
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    coeffs = torch.tensor([0.25, 0.5, 0.25])
    filt = (coeffs[:, None] * coeffs[None, :])[None, None].repeat(8, 1, 1, 1)
    padded = torch.nn.functional.pad(xt, (1, 1, 1, 1), mode="reflect")
    expected = torch.nn.functional.conv2d(padded, filt, stride=2, groups=8)
    np.testing.assert_allclose(np.asarray(out), expected.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_spp(x):
    torch = pytest.importorskip("torch")
    out, _ = _init_and_apply(nn.SPP(kernel_sizes=[3, 5]), x)
    assert out.shape == (2, 8, 8, 24)
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    pools = [xt] + [torch.nn.functional.max_pool2d(xt, k, stride=1, padding=k // 2) for k in (3, 5)]
    expected = torch.cat(pools, dim=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_spp_cascade_matches_direct():
    """The cascade decomposition (mp_b(mp_a(x)) == mp_{a+b-1}(x), the yolov4 SPP
    backward win — see downsample.py docstring) is exact in forward and matches the
    direct form's gradient up to accumulation order; non-increasing kernel lists
    fall back to direct pooling."""
    x = jax.random.normal(jax.random.key(0), (2, 13, 13, 8))
    direct = nn.SPP(kernel_sizes=(5, 9, 13), cascade=False)
    cascade = nn.SPP(kernel_sizes=(5, 9, 13), cascade=True)
    assert jnp.array_equal(direct.apply({}, x), cascade.apply({}, x))
    gd = jax.grad(lambda a: (direct.apply({}, a) ** 2).sum())(x)
    gc = jax.grad(lambda a: (cascade.apply({}, a) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gc), rtol=1e-5, atol=1e-5)
    # fallback: non-increasing list can't cascade — still must equal direct
    assert jnp.array_equal(
        nn.SPP(kernel_sizes=(9, 5), cascade=True).apply({}, x),
        nn.SPP(kernel_sizes=(9, 5), cascade=False).apply({}, x),
    )


def test_zpool_module(x):
    out, _ = _init_and_apply(nn.ZPool(), x)
    assert out.shape == (2, 8, 8, 2)


def test_dropblock_module(x):
    # block_size=1 makes the effective rate exactly p (the reference's double division
    # by block_size**2 — see the module docstring — is a no-op at size 1)
    module = nn.DropBlock2d(p=0.5, block_size=1)
    variables = module.init(jax.random.key(0), x)
    # eval: identity
    out = module.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # train: needs dropout rng, changes values
    out = module.apply(variables, x, train=True, rngs={"dropout": jax.random.key(3)})
    assert out.shape == x.shape
    assert not np.array_equal(np.asarray(out), np.asarray(x))
    assert (np.asarray(out) == 0).any()


def test_norm_conv2d_module(x):
    module = nn.NormConv2d(out_channels=6, kernel_size=3, padding=1)
    out, variables = _init_and_apply(module, x)
    assert out.shape == (2, 8, 8, 6)
    assert variables["params"]["kernel"].shape == (3, 3, 8, 6)
    # reflect padding mode runs
    module = nn.NormConv2d(out_channels=6, kernel_size=3, padding=1, padding_mode="reflect")
    out, _ = _init_and_apply(module, x)
    assert out.shape == (2, 8, 8, 6)


def test_add2d_module(x):
    module = nn.Add2d(out_channels=6, kernel_size=3, padding=1, stride=2, normalize_slices=True)
    out, _ = _init_and_apply(module, x)
    assert out.shape == (2, 4, 4, 6)
    # gradients flow
    variables = module.init(jax.random.key(0), x)

    def loss_fn(params):
        return jnp.sum(module.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    assert float(jnp.max(jnp.abs(grads["kernel"]))) > 0


def test_slim_conv2d(x):
    module = nn.SlimConv2d(kernel_size=3, padding=1, r=32, L=2)
    out, _ = _init_and_apply(module, x)
    # out channels: C/2 + C/4
    assert out.shape == (2, 8, 8, 6)


def test_pyconv2d(x):
    for levels, expected_c in [(1, 16), (2, 16), (3, 16), (4, 16)]:
        module = nn.PyConv2d(out_channels=16, kernel_size=3, num_levels=levels, padding=1)
        out, _ = _init_and_apply(module, x)
        assert out.shape == (2, 8, 8, expected_c), levels
    with pytest.raises(ValueError):
        _init_and_apply(nn.PyConv2d(out_channels=16, kernel_size=3, num_levels=2, padding=1, groups=[1, 2, 4]), x)


def test_pyconv2d_masked_dense_matches_grouped():
    """The MXU-friendly block-diagonal dense execution of grouped levels must be
    numerically identical to XLA's native grouped lowering, on the SAME parameter
    tree (the fix for the measured grouped-conv cliff, docs/PERF.md)."""
    x = jax.random.normal(jax.random.key(3), (2, 17, 17, 64))
    for groups in ([1, 4, 8, 16], [1, 4]):
        nl = len(groups)
        dense = nn.PyConv2d(64, 3, num_levels=nl, padding=1, groups=groups, dense_groups=True)
        native = nn.PyConv2d(64, 3, num_levels=nl, padding=1, groups=groups, dense_groups=False)
        v = dense.init(jax.random.key(1), x)
        vn = native.init(jax.random.key(1), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vn)
        assert all(a.shape == b.shape for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(vn)))
        np.testing.assert_allclose(
            np.asarray(dense.apply(v, x)), np.asarray(native.apply(v, x)), atol=2e-5
        )


def test_involution(x):
    module = nn.Involution2d(kernel_size=3, padding=1, reduction_ratio=2)
    out, _ = _init_and_apply(module, x)
    assert out.shape == x.shape
    module = nn.Involution2d(kernel_size=3, padding=1, stride=2, groups=2)
    out, _ = _init_and_apply(module, x)
    assert out.shape == (2, 4, 4, 8)


def test_involution_naive_parity():
    # groups=1, reduction=1: check the unfold multiply-add against a naive loop
    x = jax.random.normal(jax.random.key(0), (1, 5, 5, 2))
    module = nn.Involution2d(kernel_size=3, padding=1, reduction_ratio=1)
    variables = module.init(jax.random.key(1), x)
    out = module.apply(variables, x)

    # naive: kernel = span(reduce(x)); out[p] = sum_k kernel[p, k] * patch[p, k, c]
    params = variables["params"]
    red = jnp.einsum("nhwc,co->nhwo", x, params["reduce"]["kernel"][0, 0]) + params["reduce"]["bias"]
    kern = jnp.einsum("nhwc,co->nhwo", red, params["span"]["kernel"][0, 0]) + params["span"]["bias"]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    expected = np.zeros_like(np.asarray(out))
    for i in range(5):
        for j in range(5):
            patch = np.asarray(xp[0, i : i + 3, j : j + 3, :]).reshape(9, 2)
            expected[0, i, j] = (np.asarray(kern[0, i, j]).reshape(9, 1) * patch).sum(0)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_lambda_layer(x):
    module = nn.LambdaLayer(out_channels=8, dim_k=4, r=3, num_heads=4, dim_u=1)
    out, _ = _init_and_apply(module, x)
    assert out.shape == (2, 8, 8, 8)
    # positional-embedding variant
    module = nn.LambdaLayer(out_channels=8, dim_k=4, n=64, num_heads=4, dim_u=1)
    out, _ = _init_and_apply(module, x)
    assert out.shape == (2, 8, 8, 8)
    with pytest.raises(AssertionError):
        _init_and_apply(nn.LambdaLayer(out_channels=6, dim_k=4, r=3, num_heads=4), x)
    with pytest.raises(AssertionError):
        _init_and_apply(nn.LambdaLayer(out_channels=8, dim_k=4, r=4, num_heads=4), x)
    with pytest.raises(AssertionError):
        _init_and_apply(nn.LambdaLayer(out_channels=8, dim_k=4, num_heads=4), x)
