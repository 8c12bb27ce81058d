import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu import models


@pytest.mark.parametrize(
    "arch,expected_params",
    [
        # from the reference torch models (num_classes=10 defaults); unet_rexnet13 is
        # the README's 9.34M (references/segmentation/README.md:37-45)
        ("unet", 18107082),
        ("unetp", 28283850),
        ("unetpp", 29537226),
        ("unet3p", 26927370),
        ("unet2", 19507221),
    ],
)
def test_segmentation_num_params_parity(arch, expected_params):
    m = getattr(models, arch)()
    m.init((1, 32, 32, 3))
    assert m.num_params == expected_params


@pytest.mark.parametrize("arch", ["unet", "unetp", "unetpp", "unet3p", "unet2"])
def test_segmentation_output_shape(arch):
    # output map must match the input spatial size (reference
    # tests/test_models_segmentation.py:9-39)
    m = getattr(models, arch)(num_classes=7)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    out = m(x)
    assert out.shape == (2, 32, 32, 7)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dynamic_unet_encoders():
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    for fn in (models.unet_tvvgg11, models.unet_tvresnet34):
        m = fn(pretrained_backbone=False, num_classes=4)
        out = m(x)
        assert out.shape == (1, 32, 32, 4)


def test_unet_rexnet13():
    m = models.unet_rexnet13(pretrained_backbone=False)
    m.init((1, 32, 32, 3))
    assert m.num_params == 9342782  # README: 9.34M
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    assert m(x).shape == (1, 32, 32, 21)


def test_unet_valid_padding():
    # same_padding=False reproduces the original U-Net's shrinking maps
    m = models.unet(same_padding=False)
    x = jax.random.normal(jax.random.key(0), (1, 124, 124, 3))
    out = m(x)
    assert out.shape[1] < 124 and out.shape[-1] == 10


def test_segmentation_grads():
    m = models.unet3p(num_classes=3)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    m(x)

    def loss_fn(params):
        out = m.module.apply({"params": params, **m.state}, x, train=False)
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn)(m.params)
    gmax = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gmax > 0


def test_segmentation_learns_bright_squares():
    """End-to-end segmentation learning: a tiny UNet must reach >0.8 mIoU segmenting
    bright squares within 3 epochs."""
    import numpy as np

    from holocron_tpu import optim
    from holocron_tpu.models.core import Model
    from holocron_tpu.models.segmentation.unet import UNet
    from holocron_tpu.nn.functional import cross_entropy
    from holocron_tpu.trainer import SegmentationTrainer

    def make(n, seed):
        r = np.random.default_rng(seed)
        out = []
        for _ in range(n):
            mask = np.zeros((4, 32, 32), np.int32)
            x = r.normal(size=(4, 32, 32, 3)).astype(np.float32) * 0.3
            for b in range(4):
                cy, cx = r.integers(8, 24, 2)
                mask[b, cy - 6 : cy + 6, cx - 6 : cx + 6] = 1
                x[b, cy - 6 : cy + 6, cx - 6 : cx + 6, 0] += 3.0
            out.append((x, mask))
        return out

    class Loader(list):
        pass

    trainer = SegmentationTrainer(
        Model(UNet([8, 16], num_classes=2)), Loader(make(6, 0)), Loader(make(2, 1)),
        cross_entropy, lambda lr: optim.adabelief(lr=lr), num_classes=2,
    )
    trainer.fit_n_epochs(3, lr=3e-3, sched_type="constant")
    metrics = trainer.evaluate()
    assert metrics["mean_iou"] > 0.8, metrics
