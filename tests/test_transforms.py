import numpy as np
import pytest

from holocron_tpu.transforms import RandomZoomOut, Resize, ResizeMethod


@pytest.fixture
def img():
    return np.random.default_rng(0).integers(0, 255, size=(60, 40, 3)).astype(np.uint8)


def test_resize_squish(img):
    out = Resize((32, 32))(img)
    assert out.shape == (32, 32, 3)


def test_resize_pad(img):
    out = Resize((32, 32), mode=ResizeMethod.PAD)(img)
    assert out.shape == (32, 32, 3)
    # aspect preserved: 60x40 -> 32x21(ish), width padded symmetrically with zeros
    assert (out[:, :5] == 0).all() and (out[:, -5:] == 0).all()
    assert out[:, 16].any()


def test_resize_pil(img):
    pytest.importorskip("PIL.Image")
    import PIL.Image
    pil_img = PIL.Image.fromarray(img)
    out = Resize((32, 32), mode=ResizeMethod.PAD)(pil_img)
    assert out.size == (32, 32)
    out = Resize((32, 32))(pil_img)
    assert out.size == (32, 32)


def test_resize_validation():
    with pytest.raises(ValueError):
        Resize((32,))
    with pytest.raises(ValueError):
        Resize((32, 32), mode="pad")  # must be a ResizeMethod
    with pytest.raises(TypeError):
        Resize((32, 32))("not an image")


def test_random_zoom_out(img):
    tf = RandomZoomOut((32, 32), scale=(0.3, 0.9), seed=0)
    out = tf(img)
    assert out.shape == (32, 32, 3)
    # degenerate scale -> passthrough
    tf = RandomZoomOut((32, 32), scale=(1.0, 1.0))
    assert tf(img) is img
    with pytest.raises(ValueError):
        RandomZoomOut((32, 32), scale=(0.9, 0.3))


def test_mixup():
    from holocron_tpu.utils.data import Mixup

    x = np.random.default_rng(0).normal(size=(8, 4, 4, 3)).astype(np.float32)
    y = np.arange(8) % 5
    mix = Mixup(num_classes=5, alpha=0.2, seed=0)
    xm, ym = mix(x, y)
    assert xm.shape == x.shape
    assert ym.shape == (8, 5)
    # soft targets sum to 1
    np.testing.assert_allclose(ym.sum(-1), 1.0, atol=1e-6)
    # alpha=0: one-hot passthrough
    mix0 = Mixup(num_classes=5, alpha=0.0)
    xm, ym = mix0(x, y)
    np.testing.assert_array_equal(xm, x)
    np.testing.assert_array_equal(ym.argmax(-1), y)
    with pytest.raises(ValueError):
        Mixup(num_classes=5, alpha=-1.0)


def test_parallel():
    from holocron_tpu.utils import parallel

    out = parallel(lambda x: x**2, list(range(10)))
    assert list(out) == [x**2 for x in range(10)]
    out = parallel(lambda x: x + 1, list(range(5)), num_threads=1)
    assert list(out) == [1, 2, 3, 4, 5]
