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
