"""Tests for post-training int8 quantization (holocron_tpu/quant.py).

The reference has no quantization subsystem — this is a TPU-native extension; the
exactness test pins the int8 conv math, the model-level tests pin the interceptor
plumbing across reparametrized/plain/grouped architectures.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from holocron_tpu.quant import QINT_MAX, calibrate, discover_convs, quantize_model


class _TwoConv(nn.Module):
    groups: int = 1
    strides: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(64, (3, 3), strides=(self.strides, self.strides), padding=1,
                    feature_group_count=self.groups, name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (1, 1), name="c2")(x)
        return x


def _int_valued_variables(variables, key):
    """Replaces params with integer values whose per-channel abs-max is exactly 127,
    making the int8 round-trip exact (scale == 1)."""

    def intify(leaf):
        nonlocal key
        key, sub = jax.random.split(key)
        vals = jax.random.randint(sub, leaf.shape, -126, 127).astype(jnp.float32)
        if leaf.ndim >= 2:  # pin abs-max per out-channel (last axis) to 127
            flat = vals.reshape(-1, leaf.shape[-1])
            flat = flat.at[0, :].set(127.0)
            vals = flat.reshape(leaf.shape)
        return vals

    return jax.tree.map(intify, variables)


@pytest.mark.parametrize("groups,strides", [(1, 1), (1, 2), (4, 1)])
def test_quantized_conv_exact_on_integer_grid(groups, strides):
    """With integer-valued weights/inputs whose abs-max is exactly 127, quantization
    introduces zero rounding error — the int8 path must match f32 bit-exactly."""
    key = jax.random.key(0)
    module = _TwoConv(groups=groups, strides=strides)
    x_shape = (2, 8, 8, 8)
    variables = module.init(key, jnp.zeros(x_shape))
    variables = _int_valued_variables(variables, jax.random.key(1))

    x = jax.random.randint(jax.random.key(2), x_shape, -126, 127).astype(jnp.float32)
    x = x.at[0, 0, 0, :].set(127.0)

    from holocron_tpu.models.core import Model

    model = Model(module, variables=variables)
    model._input_shape = x_shape
    ref = jax.jit(lambda v, a: module.apply(v, a))(variables, x)

    qm = quantize_model(model, min_in_channels=1)
    assert len(qm.qparams) == 2
    out = qm(x)
    # c1 output is integer-exact; c2 input (post-relu) is integer but may exceed 127,
    # so its activation scale is >1 and introduces bounded rounding error
    rel = jnp.abs(out - ref).max() / jnp.abs(ref).max()
    assert rel < 2e-2
    # first conv alone is bit-exact: all inputs/weights representable
    qm1 = quantize_model(model, min_in_channels=1)
    qm1.qparams = {k: v for k, v in qm1.qparams.items() if k == "c1"}
    assert jnp.array_equal(qm1(x), ref)


def test_min_in_channels_policy_excludes_narrow_and_depthwise():
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(64, (3, 3), name="stem")(x)              # in=3 -> excluded
            x = nn.Conv(64, (3, 3), feature_group_count=64, name="dw")(x)  # depthwise
            x = nn.Conv(64, (1, 1), name="pw")(x)                # in=64 -> included
            return x

    module = Net()
    variables = module.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    from holocron_tpu.models.core import Model

    model = Model(module, variables=variables)
    model._input_shape = (1, 8, 8, 3)
    qm = quantize_model(model, min_in_channels=64)
    assert set(qm.qparams) == {"pw"}


def test_discover_convs_paths_and_shapes():
    module = _TwoConv()
    variables = module.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8)))
    convs = discover_convs(module, variables, (1, 8, 8, 8))
    assert convs == {"c1": (3, 3, 8, 64), "c2": (1, 1, 64, 32)}


def test_calibrate_records_per_conv_absmax():
    module = _TwoConv()
    variables = module.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8)))
    x1 = jnp.full((1, 8, 8, 8), 3.0)
    x2 = jnp.full((1, 8, 8, 8), 5.0)
    scales = calibrate(module, variables, [x1, x2])
    assert set(scales) == {"c1", "c2"}
    assert scales["c1"] == pytest.approx(5.0)  # max over batches
    assert scales["c2"] > 0.0


@pytest.mark.parametrize("arch", ["repvgg_a0", "mobileone_s0", "resnet18", "unet"])
def test_quantized_zoo_forward_close(arch):
    from holocron_tpu import models

    model = models.__dict__[arch]()
    model.init((2, 64, 64, 3))
    if hasattr(model.module, "reparametrize"):
        model.reparametrize()
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3)) * 0.5
    ref = model(x)

    qm = quantize_model(model, calibration_batches=[x], min_in_channels=1)
    out = qm(x)
    assert out.shape == ref.shape
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    # random-init logits are tiny, so this is a loose plumbing bound; the math bound
    # is pinned by test_quantized_conv_exact_on_integer_grid
    assert rel < 0.25, rel


def test_quantize_model_discovery_defaults_to_calibration_shape():
    """When the deploy module changed its input contract after init (RepVGG's
    ``s2d_input`` host-rearranged form), conv discovery must trace with the
    calibration batch's shape, not the stale init shape."""
    from holocron_tpu import models
    from holocron_tpu.transforms.functional import space_to_depth_batch

    model = models.repvgg_a0()
    model.init((2, 32, 32, 3))
    model.reparametrize(s2d_input=True)
    import numpy as np

    z = jnp.asarray(space_to_depth_batch(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype("float32")))
    qm = quantize_model(model, calibration_batches=[z], min_in_channels=1)
    out = qm(z)
    assert out.shape == (2, model.module.num_classes)


def test_dynamic_and_calibrated_scales_agree_on_calibration_data():
    """For a single conv, the dynamic per-call scale equals the calibrated scale on
    the calibration input itself (deeper models diverge: calibration observes the
    UNQUANTIZED activations, while dynamic scales see quantized upstream outputs)."""

    class OneConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(16, (3, 3), name="c")(x)

    from holocron_tpu.models.core import Model

    module = OneConv()
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 8))
    variables = module.init(jax.random.key(0), x)
    model = Model(module, variables=variables)
    model._input_shape = x.shape
    out_dyn = quantize_model(model, min_in_channels=1)(x)
    out_cal = quantize_model(model, calibration_batches=[x], min_in_channels=1)(x)
    assert jnp.allclose(out_dyn, out_cal, atol=1e-6)


def test_quantized_weights_are_int8():
    from holocron_tpu import models

    model = models.__dict__["repvgg_a0"]()
    model.init((1, 32, 32, 3))
    model.reparametrize()
    qm = quantize_model(model)
    assert len(qm.qparams) > 0
    for rec in qm.qparams.values():
        assert rec["kernel_q"].dtype == jnp.int8
        assert rec["w_scale"].dtype == jnp.float32
        assert int(jnp.abs(rec["kernel_q"]).max()) <= QINT_MAX


def test_recommended_quantization_policy():
    """The measured per-arch int8 verdicts (docs/bench -> quant_policy.json) are
    queryable: wide RepVGGs win, concat-heavy U-Nets lose, unmeasured archs -> None."""
    from holocron_tpu.quant import recommended_quantization

    v = recommended_quantization("repvgg_b3")
    assert v["recommended"] and v["int8_speedup"] > 1.5
    v = recommended_quantization("unet_rexnet13")
    assert v is not None and not v["recommended"]
    assert recommended_quantization("not_an_arch") is None


def test_quantize_model_warns_on_losing_arch(caplog):
    import logging

    from holocron_tpu import models

    model = models.__dict__["repvgg_a0"]()
    model.init((1, 32, 32, 3))
    with caplog.at_level(logging.WARNING, logger="holocron_tpu.quant"):
        quantize_model(model, arch="unetpp")
    assert any("LOSES" in rec.message for rec in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="holocron_tpu.quant"):
        quantize_model(model, arch="repvgg_b3")
    assert not any("LOSES" in rec.message for rec in caplog.records)


def test_quantize_model_rejects_empty_calibration_iterable():
    """An exhausted generator must fail loudly, not silently degrade to dynamic
    scales while the caller believes static calibration was applied."""
    import pytest

    from holocron_tpu import models

    model = models.__dict__["repvgg_a0"](num_classes=4)
    model.init((1, 32, 32, 3))
    with pytest.raises(ValueError, match="empty"):
        quantize_model(model, calibration_batches=iter(()))
    # a (non-empty) generator works — the 'any iterable' contract
    gen = (jax.random.normal(jax.random.key(i), (1, 32, 32, 3)) for i in range(2))
    qm = quantize_model(model, calibration_batches=gen)
    assert qm.act_scales


def test_quantized_model_cache_invalidation():
    """Reassigning qparams must drop the cached jit (they are baked in as constants,
    ADVICE r2)."""
    import numpy as np

    from holocron_tpu import models

    model = models.__dict__["repvgg_a0"](num_classes=4)
    model.init((1, 32, 32, 3))
    model.reparametrize()
    qm = quantize_model(model)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    ref = np.asarray(qm(x))
    # zero every quantized kernel: output MUST change if the cache was invalidated
    qm.qparams = {k: {**v, "kernel_q": jnp.zeros_like(v["kernel_q"])} for k, v in qm.qparams.items()}
    changed = np.asarray(qm(x))
    assert np.abs(changed - ref).max() > 1e-4


def test_measure_agreement_segmentation_closed_form():
    """Hand-computed pixel agreement + macro mask-IoU on a 2x2 logit grid
    (VERDICT r3 #6: the int8 gate for dense outputs)."""
    import numpy as np

    from holocron_tpu.quant import measure_agreement_segmentation

    # ref argmax mask: [[0, 1], [1, 1]]; quant argmax mask: [[0, 1], [0, 1]]
    def to_logits(mask, num_classes=3):
        return jax.nn.one_hot(jnp.asarray(mask), num_classes) * 10.0

    ref = to_logits([[0, 1], [1, 1]])[None]
    quant = to_logits([[0, 1], [0, 1]])[None]
    out = measure_agreement_segmentation(lambda x: ref, lambda x: quant, [jnp.zeros((1, 2, 2, 3))])
    # 3 of 4 pixels agree
    assert np.isclose(out["pixel_agreement"], 0.75)
    # class 0: inter 1, union 2 -> 0.5; class 1: inter 2, union 3 -> 2/3; class 2 absent
    assert np.isclose(out["mean_mask_iou"], (0.5 + 2 / 3) / 2)

    perfect = measure_agreement_segmentation(lambda x: ref, lambda x: ref, [jnp.zeros((1, 2, 2, 3))])
    assert perfect["pixel_agreement"] == 1.0 and np.isclose(perfect["mean_mask_iou"], 1.0)


def test_measure_agreement_detection_closed_form():
    """Box-matched precision/recall/F1 against hand-placed detections (VERDICT r3 #6)."""
    import numpy as np

    from holocron_tpu.quant import measure_agreement_detection

    ref_dets = [{
        "boxes": np.array([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]]),
        "scores": np.array([0.9, 0.8]),
        "labels": np.array([1, 2]),
    }]

    # identical -> perfect
    out = measure_agreement_detection(lambda x: ref_dets, lambda x: ref_dets, [None])
    assert out["det_f1"] == 1.0 and np.isclose(out["mean_matched_iou"], 1.0)

    # quant misses the second box entirely -> recall 0.5, precision 1.0
    q_dets = [{
        "boxes": np.array([[0.1, 0.1, 0.5, 0.5]]),
        "scores": np.array([0.9]),
        "labels": np.array([1]),
    }]
    out = measure_agreement_detection(lambda x: ref_dets, lambda x: q_dets, [None])
    assert np.isclose(out["det_recall"], 0.5) and np.isclose(out["det_precision"], 1.0)
    assert np.isclose(out["det_f1"], 2 / 3)

    # same box, wrong label -> no match even at IoU 1.0
    q_wrong = [{
        "boxes": np.array([[0.1, 0.1, 0.5, 0.5]]),
        "scores": np.array([0.9]),
        "labels": np.array([3]),
    }]
    out = measure_agreement_detection(lambda x: ref_dets, lambda x: q_wrong, [None])
    assert out["det_f1"] == 0.0

    # both empty everywhere -> vacuous perfect agreement, not zero — but the
    # detection counts expose it (a 1.0 on zero boxes says nothing about int8)
    empty = [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}]
    out = measure_agreement_detection(lambda x: empty, lambda x: empty, [None])
    assert out["det_f1"] == 1.0
    assert out["dets_per_image_ref"] == 0.0 and out["dets_per_image_quant"] == 0.0

    # non-vacuous rows carry real counts
    out = measure_agreement_detection(lambda x: ref_dets, lambda x: ref_dets, [None])
    assert out["dets_per_image_ref"] == 2.0 and out["dets_per_image_quant"] == 2.0


def test_policy_min_in_channels_override():
    """quant_policy.json's trace-measured floor (repvgg_a0: 48) applies when the
    caller doesn't pass min_in_channels; an explicit value always wins."""
    from holocron_tpu import models
    from holocron_tpu.quant import recommended_quantization

    assert recommended_quantization("repvgg_a0")["min_in_channels"] == 48

    model = models.__dict__["repvgg_a0"](num_classes=4)
    model.init((1, 32, 32, 3))
    model.reparametrize()

    def quantized_in_channels(qm):
        return sorted({int(rec["kernel_q"].shape[-2]) for rec in qm.qparams.values()})

    qm_default = quantize_model(model, arch="repvgg_a0")
    qm_64 = quantize_model(model, arch="repvgg_a0", min_in_channels=64)
    assert 48 in quantized_in_channels(qm_default)  # stage-1 convs included via policy
    assert 48 not in quantized_in_channels(qm_64)  # explicit floor wins
    # stem (3 input channels) stays bf16 in both
    assert 3 not in quantized_in_channels(qm_default)
