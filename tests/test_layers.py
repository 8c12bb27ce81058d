import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu.models.layers import BatchNorm2d, FrozenBatchNorm2d, act_fn, avg_pool2d, max_pool2d


def test_batchnorm_matches_torch_train_and_eval():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(4, 6, 6, 3)).astype(np.float32)
    x2 = rng.normal(1.0, 2.0, size=(4, 6, 6, 3)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(3)
    bn = BatchNorm2d()
    variables = bn.init(jax.random.key(0), jnp.asarray(x1), train=False)

    # two training steps: normalized outputs AND running stats must match (incl. the
    # unbiased running-variance estimator)
    for x in (x1, x2):
        with torch.no_grad():
            t_out = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        out, updates = bn.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], **updates}
        np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]), tbn.running_var.numpy(), atol=1e-5
    )

    # eval uses the running stats
    tbn.eval()
    with torch.no_grad():
        t_out = tbn(torch.from_numpy(x1.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = bn.apply(variables, jnp.asarray(x1), train=False)
    np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-5)


def test_batchnorm_one_pass_conditioning():
    """The shifted one-pass variance must stay accurate when mean >> std (the raw
    E[x2]-E[x]2 form loses ~all precision at mean/std ~ 1e4 in f32) once the running
    mean has tracked the activation mean — the steady-training regime."""
    rng = np.random.default_rng(0)
    x = (1e4 + rng.normal(size=(8, 6, 6, 3))).astype(np.float32)
    bn = BatchNorm2d()
    variables = bn.init(jax.random.key(0), jnp.asarray(x), train=False)
    # steady state: running mean has converged to the activation mean
    variables = {
        "params": variables["params"],
        "batch_stats": {
            "mean": jnp.full((3,), 1e4, jnp.float32),
            "var": variables["batch_stats"]["var"],
        },
    }
    out, _ = bn.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    out = np.asarray(out)
    # two-pass reference in float64
    x64 = x.astype(np.float64)
    mean = x64.mean(axis=(0, 1, 2))
    var = x64.var(axis=(0, 1, 2))
    ref = (x64 - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(out, ref, atol=1e-2)
    assert abs(out.std() - 1.0) < 0.05  # unshifted one-pass collapses this to ~0 or blows up


def test_frozen_batchnorm_ignores_train():
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
    fbn = FrozenBatchNorm2d()
    variables = fbn.init(jax.random.key(1), x)
    out_train = fbn.apply(variables, x, train=True)
    out_eval = fbn.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_eval))
    assert "params" not in variables  # nothing trainable


def test_pool_parity_with_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 9, 11, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    out = max_pool2d(jnp.asarray(x), 3, 2, 1)
    ref = torch.nn.functional.max_pool2d(xt, 3, 2, 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    out = avg_pool2d(jnp.asarray(x), 3, 2, padding=1)
    ref = torch.nn.functional.avg_pool2d(xt, 3, 2, 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    # ResNet-D shortcut pooling: ceil_mode + count_include_pad=False
    out = avg_pool2d(jnp.asarray(x), 2, 2, ceil_mode=True, count_include_pad=False)
    ref = torch.nn.functional.avg_pool2d(xt, 2, 2, ceil_mode=True, count_include_pad=False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_act_registry():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    for name in ("relu", "silu", "mish", "hard_mish", "leaky_relu", "relu6", "gelu", "sigmoid"):
        out = act_fn(name)(x)
        assert out.shape == x.shape
    with pytest.raises(ValueError):
        act_fn("nope")


def test_find_image_size():
    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from holocron_tpu.utils import find_image_size

    rng = np.random.default_rng(0)
    dataset = [(rng.integers(0, 255, (64, 96, 3)).astype(np.uint8), 0) for _ in range(8)]
    h, w = find_image_size(dataset, block=False)
    assert abs(h / w - 64 / 96) < 0.1
