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


# ---------------------------------------------------------------------------
# training-recipe augmentations (reference references/classification/train.py:100-108)
# ---------------------------------------------------------------------------


def _pil_image(h=48, w=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def test_random_resized_crop_shapes_and_coverage():
    from holocron_tpu.transforms import RandomResizedCrop

    tf = RandomResizedCrop(32, scale=(0.3, 1.0), seed=0)
    img = _pil_image()
    out = tf(img)
    assert out.size == (32, 32)
    arr = np.random.default_rng(0).integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    out_np = tf(arr)
    assert out_np.shape == (32, 32, 3) and out_np.dtype == np.uint8
    # crop params stay in-bounds and span the configured areas
    areas = []
    for _ in range(200):
        top, left, h, w = tf.get_params(arr)
        assert 0 <= top <= 48 - h and 0 <= left <= 64 - w
        areas.append(h * w / (48 * 64))
    assert min(areas) < 0.5 and max(areas) > 0.7  # scale=(0.3, 1.0) gets exercised
    with pytest.raises(ValueError):
        RandomResizedCrop(32, scale=(1.0, 0.3))


def test_random_horizontal_flip():
    from holocron_tpu.transforms import RandomHorizontalFlip

    arr = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    always = RandomHorizontalFlip(p=1.0, seed=0)
    np.testing.assert_array_equal(always(arr), arr[:, ::-1])
    never = RandomHorizontalFlip(p=0.0, seed=0)
    np.testing.assert_array_equal(never(arr), arr)
    out = always(_pil_image(4, 6))
    assert out.size == (6, 4)


def test_trivial_augment_wide_shapes_and_op_coverage():
    from holocron_tpu.transforms import TrivialAugmentWide

    tf = TrivialAugmentWide(seed=0)
    img = _pil_image()
    arr = np.asarray(img)
    seen_change = 0
    for _ in range(60):
        out = tf(img)
        assert out.size == img.size
        out_np = tf(arr)
        assert out_np.shape == arr.shape and out_np.dtype == np.uint8
        if not np.array_equal(out_np, arr):
            seen_change += 1
    # with 13/14 non-identity ops, the vast majority of draws must alter the image
    assert seen_change > 40


def test_trivial_augment_magnitude_tables():
    from holocron_tpu.transforms import TrivialAugmentWide

    tf = TrivialAugmentWide(seed=0)
    mags = {op: [tf._magnitude(op) for _ in range(300)] for op in tf._ops}
    assert max(mags["ShearX"]) <= 0.99 and min(mags["ShearX"]) >= 0.0
    assert max(mags["TranslateX"]) <= 32.0
    assert max(mags["Rotate"]) <= 135.0
    assert set(mags["Posterize"]) <= set(range(2, 9))
    assert max(mags["Solarize"]) <= 255.0 and min(mags["Solarize"]) >= 0.0


def test_random_erasing_area_distribution():
    from holocron_tpu.transforms import RandomErasing

    tf = RandomErasing(p=1.0, scale=(0.02, 0.2), seed=0)
    img = np.zeros((64, 64, 3), np.float32)
    fracs = []
    for _ in range(100):
        out = tf(img)
        changed = np.any(out != 0, axis=-1)
        fracs.append(changed.mean())
        assert out.shape == img.shape
    # erased fraction stays within the configured scale range (rounding slack)
    assert all(0.01 <= f <= 0.25 for f in fracs)
    assert 0.02 <= np.mean(fracs) <= 0.2
    # p=0 is the identity
    same = RandomErasing(p=0.0, seed=0)(img)
    np.testing.assert_array_equal(same, img)
    with pytest.raises(TypeError):
        tf(_pil_image())


def test_compose_chains():
    from holocron_tpu.transforms import Compose, RandomHorizontalFlip, RandomResizedCrop

    tf = Compose([RandomResizedCrop(16, seed=0), RandomHorizontalFlip(p=1.0, seed=0)])
    out = tf(_pil_image())
    assert out.size == (16, 16)
