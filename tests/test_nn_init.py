import jax
import jax.numpy as jnp
import numpy as np

from holocron_tpu.nn import init


def test_kaiming_normal_fan_out():
    # He-normal fan-out on an HWIO kernel: std = sqrt(2 / (out_c * kh * kw))
    fn = init.kaiming_normal()
    k = fn(jax.random.key(0), (3, 3, 64, 128), jnp.float32)
    expected_std = np.sqrt(2.0 / (128 * 9))
    assert abs(float(k.std()) - expected_std) / expected_std < 0.05
    assert abs(float(k.mean())) < expected_std / 10


def test_kaiming_leaky_relu_gain():
    fn = init.kaiming_normal("leaky_relu", 0.1)
    k = fn(jax.random.key(0), (3, 3, 64, 128), jnp.float32)
    expected_std = np.sqrt(2.0 / (1 + 0.1**2) / (128 * 9))
    assert abs(float(k.std()) - expected_std) / expected_std < 0.05


def test_unsupported_nonlinearity():
    import pytest

    with pytest.raises(ValueError):
        init.kaiming_normal("softmax")
