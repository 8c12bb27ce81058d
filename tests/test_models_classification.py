import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu import models
from holocron_tpu.models.classification.repvgg import RepVGG
from holocron_tpu.models.core import Model


def test_repvgg_forward_shapes():
    # tiny config: full factory archs are exercised by test_factory_configs below
    m = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=5))
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    out = m(x)
    assert out.shape == (2, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_repvgg_train_updates_stats():
    m = Model(RepVGG([1], [8], 1.0, 2.0, num_classes=5))
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    m(x)  # lazy init
    before = m.variables["batch_stats"]["features_0_0"]["bn_3x3"]["mean"]
    m(x, train=True)
    after = m.variables["batch_stats"]["features_0_0"]["bn_3x3"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_repvgg_reparametrize_equivalence():
    """The reference contract: <=1e-3 output drift after train->deploy fusion, and no BN
    left in the deploy net (tests/test_models_classification.py:28-63)."""
    m = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=5))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    m(x, train=True)  # move BN stats off init values
    out_before = m(x)
    m.reparametrize()
    out_after = m(x)
    np.testing.assert_allclose(np.asarray(out_before), np.asarray(out_after), atol=1e-3)
    # deploy tree has a single conv per block and no BN params / stats
    flat = jax.tree_util.tree_leaves_with_path(m.variables)
    paths = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("bn" in p for p in paths)
    assert "batch_stats" not in m.variables


def test_repvgg_s2d_stem_exact_equivalence():
    """The space-to-depth stem fold is a lossless rewrite: the 2x2 stride-1 conv over
    concat_downsample2d(x, 2) must match the plain 3x3 stride-2 deploy stem exactly
    (same float ops, reordered input gather)."""
    m = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=5))
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    m(x, train=True)  # realistic BN stats before folding
    module, variables = m.module, m.variables
    d_plain, v_plain = module.reparametrize(variables)
    d_s2d, v_s2d = module.reparametrize(variables, s2d_stem=True)
    y_plain = jax.jit(lambda a: d_plain.apply(v_plain, a))(x)
    y_s2d = jax.jit(lambda a: d_s2d.apply(v_s2d, a))(x)
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_s2d), atol=2e-6)
    assert v_s2d["params"]["features_0_0"]["rep_conv"]["kernel"].shape == (2, 2, 12, 8)
    # only the stem is folded; later stage openers keep the 3x3 stride-2 form
    assert v_s2d["params"]["features_1_0"]["rep_conv"]["kernel"].shape == (3, 3, 8, 32)


def test_repvgg_s2d_input_host_rearranged_equivalence():
    """``s2d_input=True``: the deploy net consumes a HOST-rearranged (N, H/2, W/2, 4C)
    batch (``space_to_depth_batch``, same channel order as concat_downsample2d) and
    must match the plain deploy forward exactly — the device-side rearrange is the
    only thing removed."""
    from holocron_tpu.transforms.functional import space_to_depth_batch

    m = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=5))
    x = jax.random.normal(jax.random.key(5), (2, 32, 32, 3))
    m(x, train=True)
    module, variables = m.module, m.variables
    d_plain, v_plain = module.reparametrize(variables)
    d_s2d, v_s2d = module.reparametrize(variables, s2d_input=True)
    z = jnp.asarray(space_to_depth_batch(np.asarray(x)))
    assert z.shape == (2, 16, 16, 12)
    y_plain = jax.jit(lambda a: d_plain.apply(v_plain, a))(x)
    y_s2d = jax.jit(lambda a: d_s2d.apply(v_s2d, a))(z)
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_s2d), atol=2e-6)
    # a non-rearranged batch is rejected up front
    with pytest.raises(ValueError):
        d_s2d.apply(v_s2d, x)


def test_repvgg_s2d_stem_odd_input_rejected():
    m = Model(RepVGG([1], [8], 1.0, 2.0, num_classes=5))
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    m(x)
    m.reparametrize(s2d_stem=True)
    with pytest.raises(ValueError):
        m(jax.random.normal(jax.random.key(4), (2, 15, 15, 3)))


def test_repvgg_identity_channel_mismatch():
    from holocron_tpu.models.classification.repvgg import RepBlock

    block = RepBlock(planes=8, identity=True)
    with pytest.raises(ValueError):
        block.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)), train=False)


def test_repvgg_num_params_parity():
    # must match the reference checkpoint metadata (repvgg.py:187-202)
    m = models.repvgg_a0()
    m.init((1, 32, 32, 3))
    assert m.num_params == 24741642


@pytest.mark.parametrize(
    "arch,a,b,blocks",
    [
        ("repvgg_a1", 1, 2.5, [1, 2, 4, 14, 1]),
        ("repvgg_b0", 1, 2.5, [1, 4, 6, 16, 1]),
    ],
)
def test_factory_configs(arch, a, b, blocks):
    m = getattr(models, arch)()
    assert m.module.width_multiplier == a
    assert m.module.final_width_multiplier == b
    assert list(m.module.num_blocks) == blocks
    assert m.default_cfg is None  # no pretrained requested


def test_default_cfg_attached():
    # pretrained=True attaches the checkpoint metadata even when download is impossible
    m = models.repvgg_a0(pretrained=True)
    assert m.default_cfg is not None
    assert m.default_cfg.meta.arch == "repvgg_a0"
    assert m.default_cfg.evaluation.results[models.checkpoints.Metric.TOP1_ACC] == 0.9292


@pytest.mark.parametrize(
    "arch,expected_params",
    [
        # expected values from the reference's checkpoint metadata / torch param counts
        ("resnet18", 11181642),
        ("resnet50", 23528522),
        ("resnet50d", 23547754),
        ("resnext50_32x4d", 23000394),
        ("rexnet1_0x", 4796186),
        ("darknet19", 19827626),
        ("darknet24", 22413386),
        ("darknet53", 40595178),
        ("cspdarknet53", 26627434),
        ("res2net50_26w_4s", 23670610),
        ("sknet50", 35224394),
        ("tridentnet50", 45826634),
        ("pyconv_resnet50", 22819210),
        ("pyconvhg_resnet50", 23206218),
        ("convnext_atto", 3377730),
        ("mobileone_s0", 4277991),
        ("mobileone_s1", 3555188),
    ],
)
def test_num_params_parity(arch, expected_params):
    # param counts must match the reference checkpoint metadata exactly
    m = getattr(models, arch)()
    m.init((1, 64, 64, 3))
    assert m.num_params == expected_params


def test_resnet_forward_and_grads():
    from holocron_tpu.models.classification.resnet import BasicBlock, ResNet

    m = Model(ResNet(BasicBlock, [1, 1], [8, 16], num_classes=5))
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    out = m(x)
    assert out.shape == (2, 5)

    def loss_fn(params):
        logits = m.module.apply({"params": params, "batch_stats": m.state["batch_stats"]}, x, train=False)
        return jnp.sum(logits**2)

    grads = jax.grad(loss_fn)(m.params)
    gmax = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gmax > 0


def test_resnet_variants_forward():
    from holocron_tpu.models.classification.resnet import BasicBlock, Bottleneck, ResNet

    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    # deep stem + avg downsample (ResNet-D mechanics)
    m = Model(ResNet(Bottleneck, [1, 1], [8, 16], num_classes=5, deep_stem=True, avg_downsample=True))
    assert m(x).shape == (2, 5)
    # channel repeats (TridentNet mechanic) + zero-init residual
    m = Model(ResNet(BasicBlock, [1], [8], num_classes=5, num_repeats=2, zero_init_residual=True))
    assert m(x).shape == (2, 5)
    scale = m.variables["params"]["layer_0_0"]["conv_1"]["bn"]["scale"]
    assert float(jnp.max(jnp.abs(scale))) == 0.0


def test_mobileone_reparametrize_equivalence():
    m = models.mobileone_s1(num_classes=5)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    m(x, train=True)
    out_before = m(x)
    m.reparametrize()
    out_after = m(x)
    rel = np.abs(np.asarray(out_before - out_after)) / (np.abs(np.asarray(out_before)) + 1e-6)
    assert rel.max() < 1e-3
    assert "batch_stats" not in m.variables
    with pytest.raises(AssertionError):
        m.reparametrize()


def test_rexnet_partial_residual():
    from holocron_tpu.models.classification.rexnet import ReXBlock

    # stride-1, growing channels: out[..., :in_c] must include the input residual
    block = ReXBlock(channels=12, t=6, stride=1, use_se=False)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 8))
    variables = block.init(jax.random.key(1), x, train=False)
    out = block.apply(variables, x, train=False)
    assert out.shape == (2, 8, 8, 12)
    zeroed = jax.tree.map(jnp.zeros_like, variables["params"])
    out0 = block.apply({"params": zeroed, "batch_stats": variables["batch_stats"]}, x, train=False)
    # with zero weights the block output reduces to the shortcut on the first in_c chans
    np.testing.assert_allclose(np.asarray(out0[..., :8]), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out0[..., 8:]), 0.0, atol=1e-6)


def test_convnext_forward_and_sd():
    from holocron_tpu.models.classification.convnext import ConvNeXt

    m = Model(ConvNeXt([1, 1], [8, 16], num_classes=5, stochastic_depth_prob=0.5))
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    out = m(x)
    assert out.shape == (4, 5)
    # train mode with a dropout rng runs (stochastic depth active on the last block)
    out_t = m(x, train=True, rngs={"dropout": jax.random.key(1)})
    assert out_t.shape == (4, 5)

    # the stochastic-depth primitive: row mode drops whole samples and rescales
    from holocron_tpu.models.classification.convnext import stochastic_depth

    v = jnp.ones((512, 2, 2, 1))
    dropped = stochastic_depth(v, 0.5, jax.random.key(0), train=True)
    row_vals = np.asarray(dropped).reshape(512, -1)
    zero_rows = (row_vals == 0).all(axis=1)
    kept_rows = ~zero_rows
    assert zero_rows.any() and kept_rows.any()
    np.testing.assert_allclose(row_vals[kept_rows], 2.0)  # 1 / survival
    np.testing.assert_array_equal(np.asarray(stochastic_depth(v, 0.5, None, train=False)), np.asarray(v))


def test_tridentconv_branch_semantics():
    from holocron_tpu.models.classification.tridentnet import TridentConv2d

    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 6))
    conv = TridentConv2d(4, 3, padding=1, dilation=3)
    variables = conv.init(jax.random.key(1), x)
    out = conv.apply(variables, x)
    assert out.shape == (1, 8, 8, 12)
    # each branch shares the same kernel: feeding identical chunks must give identical
    # branch outputs when dilation is uniform
    conv1 = TridentConv2d(4, 3, padding=1, dilation=1)
    xx = jnp.tile(x[..., :2], (1, 1, 1, 3))
    v1 = conv1.init(jax.random.key(1), xx)
    out1 = conv1.apply(v1, xx)
    np.testing.assert_allclose(np.asarray(out1[..., :4]), np.asarray(out1[..., 4:8]), atol=1e-5)
    with pytest.raises(ValueError):
        conv.apply(variables, jnp.zeros((1, 8, 8, 7)))


def test_torch_checkpoint_conversion_parity():
    """Build the torch train-form of a small RepVGG inline, convert its state dict, and
    check logits match within 1e-4 — validates layout transposition + BN mapping."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    class TorchRepBlock(tnn.Module):
        def __init__(self, in_c, out_c, stride, identity):
            super().__init__()
            self.branches = tnn.ModuleList([
                tnn.Sequential(tnn.Conv2d(in_c, out_c, 3, stride, 1, bias=False), tnn.BatchNorm2d(out_c)),
                tnn.Sequential(tnn.Conv2d(in_c, out_c, 1, stride, 0, bias=False), tnn.BatchNorm2d(out_c)),
            ])
            if identity:
                self.branches.append(tnn.BatchNorm2d(out_c))

        def forward(self, x):
            return torch.relu(sum(b(x) for b in self.branches))

    class TorchNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Sequential(TorchRepBlock(3, 8, 2, False), TorchRepBlock(8, 8, 1, True)),
                tnn.Sequential(TorchRepBlock(8, 16, 2, False), TorchRepBlock(16, 16, 1, True)),
            )
            self.head = tnn.Linear(16, 5)

        def forward(self, x):
            x = self.features(x)
            return self.head(x.mean((2, 3)))

    tm = TorchNet().eval()
    # randomize BN stats so the conversion is non-trivial
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1, 0.2)
                mod.bias.normal_(0, 0.2)

    jm = Model(RepVGG([1, 1], [8, 16], 1.0, 1.0, num_classes=5))
    from holocron_tpu.models._torch_convert import convert_state_dict

    jm.load_variables(convert_state_dict(jm, tm.state_dict()))

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, atol=1e-4)

    # and the fused deploy net still matches the torch train-form output
    jm.reparametrize()
    got_deploy = np.asarray(jm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_deploy, expected, atol=1e-3)
