import jax
import jax.numpy as jnp
import numpy as np

from holocron_tpu.models.classification.repvgg import RepVGG
from holocron_tpu.models.core import Model


def test_stablehlo_export_roundtrip(tmp_path):
    """Export surface (the reference's ONNX analog, scripts/export_model.py): serialize
    the jitted deploy forward to StableHLO and verify the restored program's outputs."""
    model = Model(RepVGG([1], [8], 1.0, 1.0, num_classes=4))
    model.init((1, 32, 32, 3))
    model.reparametrize()
    module, variables = model.module, model.variables

    def fwd(x):
        return module.apply(variables, x, train=False)

    example = jnp.zeros((2, 32, 32, 3), jnp.float32)
    exported = jax.export.export(jax.jit(fwd))(example)
    blob = exported.serialize()
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)

    restored = jax.export.deserialize(path.read_bytes())
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(restored.call(x)), np.asarray(fwd(x)), atol=1e-5)


def test_stablehlo_export_segmentation(tmp_path):
    """Segmentation export round-trip (the reference exports seg models to ONNX,
    tests/test_models_segmentation.py:42-57)."""
    import flax.linen as nn

    class TinySeg(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(5, (3, 3), padding=1)(x)

    model = Model(TinySeg())
    model.init((1, 32, 32, 3))
    module, variables = model.module, model.variables

    def fwd(x):
        return module.apply(variables, x, train=False)

    exported = jax.export.export(jax.jit(fwd))(jnp.zeros((1, 32, 32, 3), jnp.float32))
    restored = jax.export.deserialize(exported.serialize())
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(restored.call(x)), np.asarray(fwd(x)), atol=1e-5)
    assert restored.call(x).shape == (1, 32, 32, 5)


def test_stablehlo_export_detection_with_postprocess(tmp_path):
    """Detection export includes the FULL post-processing (score filter + top-k +
    masked NMS, all static-shape XLA) — the analog of the reference's ONNX detection
    export (tests/test_models_detection.py:79-93)."""
    from holocron_tpu.models.detection._utils import post_process
    from holocron_tpu.models.detection.yolo import DetectionModel
    from holocron_tpu.models.detection.yolov2 import YOLOv2

    tiny_layout = [(8, 0), (16, 0), (16, 0), (32, 0), (32, 0)]
    model = DetectionModel(YOLOv2(tiny_layout, num_classes=3), max_boxes=6)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    model._ensure_init(x)
    module, variables = model.module, model.variables

    def fwd(inp):
        boxes, b_o, b_scores = module.apply(variables, inp, train=False)
        return post_process(boxes, b_o, b_scores, 0.7, 0.05)

    exported = jax.export.export(jax.jit(fwd))(x)
    restored = jax.export.deserialize(exported.serialize())
    xr = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    got, ref = restored.call(xr), fwd(xr)
    assert set(ref) == {"boxes", "scores", "labels", "keep"}
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
