import math

import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu import ops


@pytest.fixture
def boxes():
    return jnp.asarray(
        [[0, 0, 100, 100], [50, 50, 100, 100], [50, 50, 150, 150], [100, 100, 200, 200]], dtype=jnp.float32
    )


def test_iou_penalty(boxes):
    penalty = ops.boxes.iou_penalty(boxes, boxes)
    assert penalty.shape == (4, 4)
    for idx in range(4):
        assert float(penalty[idx, idx]) == 0
    assert float(penalty[0, 1]) == 25**2 / 100**2
    assert float(penalty[0, 3]) == 100**2 / 200**2
    assert float(penalty[0, 2]) == float(penalty[2, 3])


def test_diou_loss(boxes):
    diou = ops.diou_loss(boxes, boxes)
    assert diou.shape == (4, 4)
    for idx in range(4):
        assert float(diou[idx, idx]) == 0.0
    assert float(diou[0, 1]) == 1 - 0.25 + 25**2 / 100**2
    assert float(diou[0, 3]) == 1 + 100**2 / 200**2
    assert float(diou[0, 2]) == float(diou[2, 3])


def test_box_giou(boxes):
    giou = ops.box_giou(boxes, boxes)
    assert giou.shape == (4, 4)
    for idx in range(4):
        assert float(giou[idx, idx]) == 1.0
    assert float(giou[0, 1]) == 0.25
    assert float(giou[0, 3]) == -(200**2 - 2 * 100**2) / 200**2
    assert float(giou[0, 2]) == float(giou[2, 3])
    # degenerate boxes raise eagerly
    with pytest.raises(AssertionError):
        ops.box_giou(jnp.asarray([[10.0, 10.0, 0.0, 0.0]]), boxes)


def test_aspect_ratio(boxes):
    np.testing.assert_allclose(np.asarray(ops.boxes.aspect_ratio(boxes)), math.pi / 4 * np.ones(4))
    np.testing.assert_allclose(np.asarray(ops.boxes.aspect_ratio_consistency(boxes, boxes)), np.zeros((4, 4)))
    # degenerate boxes: zero height stays finite (NaN-gradient guard), and a
    # negative-height box keeps the sign atan(w/h) would produce — the epsilon
    # clamp preserves sign instead of snapping to +pi/2 (advisor r4)
    degen = jnp.asarray([[0.0, 0.0, 10.0, 0.0], [0.0, 5.0, 10.0, 0.0]])
    ar = np.asarray(ops.boxes.aspect_ratio(degen))
    assert np.isfinite(ar).all()
    np.testing.assert_allclose(ar[0], math.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(ar[1], math.atan(10.0 / -5.0), rtol=1e-6)


def test_ciou_loss(boxes):
    ciou = ops.ciou_loss(boxes, boxes)
    assert ciou.shape == (4, 4)
    for idx in range(4):
        assert float(ciou[idx, idx]) == 0.0
    assert float(ciou[0, 2]) == float(ciou[2, 3])


def test_ciou_aspect_term():
    # differing aspect ratios must add the alpha*v term (the paper's formula; the
    # reference's masked addcdiv_ is a no-op on a copy, see holocron_tpu/ops/boxes.py)
    b1 = jnp.asarray([[0.0, 0.0, 100.0, 50.0]])
    b2 = jnp.asarray([[0.0, 0.0, 50.0, 100.0]])
    iou = float(ops.box_iou(b1, b2)[0, 0])
    pen = float(ops.boxes.iou_penalty(b1, b2)[0, 0])
    v = float(ops.boxes.aspect_ratio_consistency(b1, b2)[0, 0])
    alpha = v / ((1 - iou) + v)
    expected = 1 - iou + pen + alpha * v
    np.testing.assert_allclose(float(ops.ciou_loss(b1, b2)[0, 0]), expected, rtol=1e-6)


def test_box_iou_jit(boxes):
    import jax

    jitted = jax.jit(ops.box_iou)
    np.testing.assert_allclose(np.asarray(jitted(boxes, boxes)), np.asarray(ops.box_iou(boxes, boxes)), atol=1e-6)
