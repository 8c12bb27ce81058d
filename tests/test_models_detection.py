import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu.models import detection
from holocron_tpu.models.detection import pad_targets, post_process
from holocron_tpu.models.detection.yolo import yolo_v12_losses


def _make_targets(num_boxes, num_classes, seed=0):
    rng = np.random.default_rng(seed)
    gts = []
    for num in num_boxes:
        boxes = rng.random((num, 4), dtype=np.float32)
        boxes[:, :2] *= boxes[:, 2:]
        boxes[0, :2] = 0
        boxes[0, 2:] = 1
        if num > 1:
            boxes[1, :2] = 0.2
            boxes[1, 2:] = 0.8
        labels = rng.integers(0, num_classes, size=(num,))
        gts.append({"boxes": boxes, "labels": labels})
    return gts


@pytest.mark.parametrize(
    ("arch", "input_shape"),
    [("yolov1", (64, 64)), ("yolov2", (64, 64)), ("yolov4", (64, 64))],
)
def test_detection_model(arch, input_shape):
    # mirrors the reference's generic contract test (tests/test_models_detection.py:9-64)
    num_classes = 10
    batch_size = 2
    x = jax.random.uniform(jax.random.key(0), (batch_size, *input_shape, 3))
    model = detection.__dict__[arch](pretrained_backbone=False, num_classes=num_classes)

    out = model(x)
    assert isinstance(out, list) and len(out) == batch_size
    assert isinstance(out[0].get("boxes"), np.ndarray)
    assert isinstance(out[0].get("scores"), np.ndarray)
    assert isinstance(out[0].get("labels"), np.ndarray)

    # list input does not change the output structure
    out_list = model([x[0], x[1]])
    assert len(out_list) == len(out)

    # training mode without target
    with pytest.raises(ValueError):
        model(x, train=True)

    # loss computation
    loss = model(x, _make_targets([3, 4], num_classes))
    assert isinstance(loss, dict)
    for subloss in loss.values():
        assert bool(jnp.isfinite(subloss))

    # empty ground truth
    empty = [{"boxes": np.zeros((0, 4), np.float32), "labels": np.zeros((0,), np.int64)} for _ in range(2)]
    loss = model(x, empty)
    for subloss in loss.values():
        assert bool(jnp.isfinite(subloss))

    # out-of-range boxes raise
    with pytest.raises(ValueError):
        model(x, [{"boxes": np.asarray([[0.0, 0.0, 2.0, 1.0]], np.float32), "labels": np.asarray([0])}])


@pytest.mark.parametrize("arch", ["yolov2", "yolov4"])
def test_detection_loss_grads(arch):
    """Gradients must be finite WITH PADDED (all-zero) target slots: yolov4's CIoU
    used to compute arctan(0/0) on them, and `where`-masking the value still leaks
    the NaN partial through the vjp (0 * NaN) — every gradient leaf went NaN on
    every step with any padding (i.e. in all real training). Regression for the
    round-4 safe-box substitution (yolov4.py per_image)."""
    model = detection.__dict__[arch](pretrained_backbone=False, num_classes=5)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    model._ensure_init(x)
    target = jax.tree.map(jnp.asarray, dict(pad_targets(_make_targets([2, 1], 5), 10)))

    def loss_fn(params):
        losses = model.module.apply({"params": params, **{k: v for k, v in model.variables.items() if k != "params"}},
                                    x, target, train=False)
        return sum(losses.values())

    grads = jax.grad(loss_fn)(model.params)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert max(float(jnp.max(jnp.abs(g))) for g in leaves) > 0


def test_yolo_loss_grads_finite_at_zero_wh():
    """The wh term's sqrt must have a zero subgradient (not 0*inf=NaN) when a
    predicted wh is exactly 0.0 — a sigmoid-decoded wh underflows to 0 once the
    head saturates early in from-scratch training, and one such batch used to
    poison every gradient leaf (yolo.py safe-subgradient sqrt)."""
    h = w = 2
    num_anchors, num_classes = 2, 3

    target = pad_targets([{"boxes": np.asarray([[0.1, 0.1, 0.4, 0.4]], np.float32), "labels": np.asarray([0])}], 4)
    target = jax.tree.map(jnp.asarray, dict(target))

    def loss_of(wh_val):
        xy = jnp.full((1, h, w, num_anchors, 2), 0.25)
        wh = jnp.full((1, h, w, num_anchors, 2), 1.0) * wh_val
        pred_xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        po = jnp.full((1, h, w, num_anchors), 0.3)
        scores = jnp.full((1, h, w, num_anchors, num_classes), 1.0 / num_classes)
        losses = yolo_v12_losses(pred_xyxy, xy, wh, po, scores, target)
        return sum(losses.values())

    g = jax.grad(loss_of)(jnp.asarray(0.0))  # saturated: every predicted wh == 0
    assert bool(jnp.isfinite(g))
    # and the fix must not perturb the healthy-path gradient
    g_pos = jax.grad(loss_of)(jnp.asarray(0.09))
    ref = (float(loss_of(0.09 + 5e-4)) - float(loss_of(0.09 - 5e-4))) / 1e-3
    assert float(g_pos) == pytest.approx(ref, rel=1e-2)


def test_post_process_obj_thresh():
    """obj_thresh exposes the reference's hard-coded 0.5 objectness gate
    (yolo.py:196): lowering it must admit sub-0.5-objectness boxes."""
    boxes = jnp.asarray([[[0.0, 0.0, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]]], jnp.float32)
    b_o = jnp.asarray([[0.3, 0.6]], jnp.float32)
    b_scores = jnp.asarray([[[0.9, 0.1], [0.8, 0.2]]], jnp.float32)

    default = post_process(boxes, b_o, b_scores, 0.7, 0.05)
    assert int(np.asarray(default["keep"]).sum()) == 1  # only the 0.6-objectness box
    lowered = post_process(boxes, b_o, b_scores, 0.7, 0.05, obj_thresh=0.2)
    assert int(np.asarray(lowered["keep"]).sum()) == 2


def test_yolo_closed_form_losses():
    """Closed-form loss values on crafted predictions — the reference's exact scenario
    (tests/test_models_detection.py:96-144)."""
    h = w = 7
    num_anchors, num_classes = 2, 10
    lambda_obj, lambda_noobj, lambda_class, lambda_coords = 1.0, 0.5, 1.0, 5.0

    # crafted predictions: every box is centered in its cell with wh = 1/7
    xy_rel = np.full((1, h, w, num_anchors, 2), 0.5, np.float32)
    xy_rel[0, 0, 0, 1, 0] = 0.8
    wh = np.full((1, h, w, num_anchors, 2), 1 / 7, np.float32)
    c_x = np.arange(w, dtype=np.float32).reshape(1, 1, -1, 1)
    c_y = np.arange(h, dtype=np.float32).reshape(1, -1, 1, 1)
    xy = np.stack([(xy_rel[..., 0] + c_x) / w, (xy_rel[..., 1] + c_y) / h], axis=-1)
    pred_xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    pred_o = np.zeros((1, h, w, num_anchors), np.float32)
    pred_o[0, 0, 0, 0] = 0.5
    pred_o[0, -1, -1, 0] = 0.5
    pred_scores = np.zeros((1, h, w, 1, num_classes), np.float32)
    pred_scores[0, 0, 0, 0, 0] = 0.5
    pred_scores[0, 0, 0, 0, 1:] = 0.5 / (num_classes - 1)

    target = pad_targets([{"boxes": np.asarray([[0, 0, 1 / 7, 1 / 7]], np.float32), "labels": np.asarray([0])}], 4)
    losses = yolo_v12_losses(
        jnp.asarray(pred_xyxy), jnp.asarray(xy), jnp.asarray(wh), jnp.asarray(pred_o), jnp.asarray(pred_scores),
        jax.tree.map(jnp.asarray, dict(target)),
        lambda_obj, lambda_noobj, lambda_class, lambda_coords, ignore_high_iou=True,
    )
    # anchor 0 of cell (0,0) matches the GT exactly: IoU 1, pred_o 0.5
    assert float(losses["obj_loss"]) == pytest.approx(lambda_obj * 0.5**2, abs=1e-6)
    # the only other confident box (cell (6,6)) is far from the GT
    assert float(losses["noobj_loss"]) == pytest.approx(lambda_noobj * 0.5**2, abs=1e-6)
    assert float(losses["bbox_loss"]) == pytest.approx(0.0, abs=1e-6)
    expected_clf = lambda_class * (0.5**2 + (num_classes - 1) * (0.5 / (num_classes - 1)) ** 2)
    assert float(losses["clf_loss"]) == pytest.approx(expected_clf, abs=1e-6)


def test_post_process_closed_form():
    # 49 disjoint boxes, half the candidates confident -> all kept, label 0
    h = w = 7
    num_classes = 10
    k = h * w * 2
    boxes = np.zeros((1, k, 4), np.float32)
    grid = np.stack(np.meshgrid(np.arange(w), np.arange(h)), -1).reshape(-1, 2)
    centers = (grid + 0.5) / 7
    boxes[0, 0::2, :2] = centers - 1 / 14
    boxes[0, 0::2, 2:] = centers + 1 / 14
    boxes[0, 1::2] = boxes[0, 0::2]
    b_o = np.zeros((1, k), np.float32)
    b_o[:, ::2] = 0.5
    b_scores = np.zeros((1, k, num_classes), np.float32)
    b_scores[..., 0] = 0.5
    b_scores[..., 1:] = 0.5 / (num_classes - 1)
    dets = post_process(jnp.asarray(boxes), jnp.asarray(b_o), jnp.asarray(b_scores))
    keep = np.asarray(dets["keep"][0])
    assert keep.sum() == k // 2
    assert np.all(np.asarray(dets["labels"][0])[keep] == 0)


def test_masked_nms():
    from holocron_tpu.models.detection import masked_nms

    boxes = jnp.asarray([
        [0.0, 0.0, 0.5, 0.5],
        [0.01, 0.01, 0.5, 0.5],  # overlaps box 0
        [0.6, 0.6, 0.9, 0.9],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([True, True, True])
    keep = masked_nms(boxes, scores, valid, iou_threshold=0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])
    # invalid candidates never kept and never suppress
    keep = masked_nms(boxes, scores, jnp.asarray([False, True, True]), iou_threshold=0.5)
    np.testing.assert_array_equal(np.asarray(keep), [False, True, True])


def test_masked_nms_matches_greedy_oracle():
    """Property test: masked_nms must agree with a plain numpy greedy NMS (the
    torchvision semantics the reference relies on, yolo.py:159-215) on random inputs."""
    from holocron_tpu.models.detection import masked_nms

    def oracle(boxes, scores, valid, thr):
        order = np.argsort(-scores, kind="stable")
        keep = np.zeros(len(scores), bool)
        for i in order:
            if not valid[i]:
                continue
            x1 = np.maximum(boxes[i, 0], boxes[keep, 0])
            y1 = np.maximum(boxes[i, 1], boxes[keep, 1])
            x2 = np.minimum(boxes[i, 2], boxes[keep, 2])
            y2 = np.minimum(boxes[i, 3], boxes[keep, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            areas = (boxes[keep, 2] - boxes[keep, 0]) * (boxes[keep, 3] - boxes[keep, 1])
            iou = inter / np.maximum(area_i + areas - inter, 1e-12)
            if not np.any(iou > thr):
                keep[i] = True
        return keep

    rng = np.random.default_rng(0)
    for case in range(25):
        n = int(rng.integers(1, 40))
        boxes = rng.random((n, 4), np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.random((n, 2)).astype(np.float32) * 0.4 + 0.01
        scores = rng.random(n).astype(np.float32)
        valid = rng.random(n) > 0.2
        thr = float(rng.choice([0.3, 0.5, 0.7]))
        got = np.asarray(masked_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), iou_threshold=thr))
        want = oracle(boxes, scores, valid, thr)
        np.testing.assert_array_equal(got, want, err_msg=f"case {case} (n={n}, thr={thr})")


def test_post_process_matches_numpy_oracle():
    """Property test: the fixed-shape post_process pipeline must produce the same
    detection set as a plain numpy implementation of the reference semantics
    (sigmoid-space objectness >= 0.5 -> score thresh -> greedy NMS, yolov4.py:303-337)."""

    def oracle(boxes, b_o, b_scores, nms_thr, score_thr):
        boxes = np.clip(boxes, 0, 1)
        scores = b_scores.max(-1) * b_o
        labels = b_scores.argmax(-1)
        valid = (b_o >= 0.5) & (scores >= score_thr)
        order = np.argsort(-scores, kind="stable")
        kept = []
        for i in order:
            if not valid[i]:
                continue
            ok = True
            for j in kept:
                x1, y1 = np.maximum(boxes[i, :2], boxes[j, :2])
                x2, y2 = np.minimum(boxes[i, 2:], boxes[j, 2:])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / max(ai + aj - inter, 1e-12) > nms_thr:
                    ok = False
                    break
            if ok:
                kept.append(i)
        return {(round(float(boxes[i, 0]), 5), round(float(scores[i]), 5), int(labels[i])) for i in kept}

    rng = np.random.default_rng(1)
    for case in range(10):
        n = int(rng.integers(5, 60))
        boxes = rng.random((1, n, 4), np.float32)
        boxes[..., 2:] = boxes[..., :2] + rng.random((1, n, 2)).astype(np.float32) * 0.3 + 0.01
        b_o = rng.random((1, n)).astype(np.float32)
        b_scores = rng.dirichlet(np.ones(6), (1, n)).astype(np.float32)
        dets = post_process(jnp.asarray(boxes), jnp.asarray(b_o), jnp.asarray(b_scores),
                            rpn_nms_thresh=0.5, box_score_thresh=0.05)
        keep = np.asarray(dets["keep"][0])
        got = {
            (round(float(np.asarray(dets["boxes"][0])[i, 0]), 5),
             round(float(np.asarray(dets["scores"][0])[i]), 5),
             int(np.asarray(dets["labels"][0])[i]))
            for i in np.nonzero(keep)[0]
        }
        want = oracle(boxes[0], b_o[0], b_scores[0], 0.5, 0.05)
        assert got == want, f"case {case}: got {len(got)} dets, want {len(want)}"


def test_detection_overfits_single_box():
    """End-to-end detection learning: overfit one bright-object image; the detector
    must produce a single correct-label detection overlapping the GT box."""
    from holocron_tpu import optim
    from holocron_tpu.models.detection.yolo import DetectionModel
    from holocron_tpu.models.detection.yolov2 import YOLOv2
    from holocron_tpu.ops import box_iou
    from holocron_tpu.trainer import DetectionTrainer

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    x[:, 16:40, 8:32] += 3.0
    gt = {"boxes": np.asarray([[8 / 64, 16 / 64, 32 / 64, 40 / 64]], np.float32), "labels": np.asarray([1])}

    tiny_layout = [(8, 0), (16, 0), (16, 0), (32, 0), (32, 1)]
    model = DetectionModel(YOLOv2(tiny_layout, num_classes=3), max_boxes=4)

    class Loader(list):
        pass

    train = Loader([(x, pad_targets([gt], 4))])
    trainer = DetectionTrainer(model, train, Loader([(x, [gt])]), None, lambda lr: optim.adamp(lr=lr))
    model._ensure_init(jnp.asarray(x))
    trainer._reset_opt(2e-3)
    first = trainer._run_step(*train[0])
    for _ in range(119):
        last = trainer._run_step(*train[0])
    assert last < first / 10

    dets = model(jnp.asarray(x))[0]
    assert dets["boxes"].shape[0] >= 1
    assert int(dets["labels"][0]) == 1
    iou = float(box_iou(jnp.asarray(gt["boxes"]), jnp.asarray(dets["boxes"][:1]))[0, 0])
    assert iou > 0.3, iou
