import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "references" / "detection"))
from transforms import (  # noqa: E402
    CenterCrop,
    Compose,
    RandomHorizontalFlip,
    Resize,
    VOCTargetTransform,
    convert_to_relative,
)


@pytest.fixture
def sample():
    img = np.zeros((100, 200, 3), dtype=np.uint8)
    target = {"boxes": np.asarray([[20.0, 10.0, 60.0, 50.0]]), "labels": np.asarray([1])}
    return img, target


def test_voc_target_transform():
    tf = VOCTargetTransform(["cat", "dog"])
    ann = {"annotation": {"object": [
        {"name": "dog", "bndbox": {"xmin": "1", "ymin": "2", "xmax": "30", "ymax": "40"}},
    ]}}
    _, target = tf(None, ann)
    np.testing.assert_array_equal(target["boxes"], [[1, 2, 30, 40]])
    np.testing.assert_array_equal(target["labels"], [1])


def test_resize_boxes(sample):
    img, target = sample
    out, t = Resize((50, 100))(img, target)
    assert out.shape[:2] == (50, 100)
    np.testing.assert_allclose(t["boxes"], [[10, 5, 30, 25]])


def test_center_crop(sample):
    img, target = sample
    out, t = CenterCrop((100, 100))(img, target)
    assert out.shape[:2] == (100, 100)
    # x crop offset is 50: the box [20, 60] clamps to [50, 60] then shifts to [0, 10]
    np.testing.assert_allclose(t["boxes"], [[0, 10, 10, 50]])


def test_hflip(sample):
    img, target = sample
    tf = RandomHorizontalFlip(p=1.0)
    out, t = tf(img, target)
    # x coords mirror and stay ordered xmin < xmax
    np.testing.assert_allclose(t["boxes"], [[140, 10, 180, 50]])
    assert (t["boxes"][:, 0] <= t["boxes"][:, 2]).all()
    out2, t2 = RandomHorizontalFlip(p=0.0)(img, target)
    np.testing.assert_allclose(t2["boxes"], target["boxes"])


def test_convert_to_relative_and_compose(sample):
    img, target = sample
    tf = Compose([Resize((50, 100)), convert_to_relative])
    out, t = tf(img, target)
    assert (t["boxes"] >= 0).all() and (t["boxes"] <= 1).all()
    np.testing.assert_allclose(t["boxes"], [[0.1, 0.1, 0.3, 0.5]])
