import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from holocron_tpu.parallel import batch_sharding, collectives, create_mesh, replicated, shard_batch


def test_create_mesh_shapes():
    mesh = create_mesh(axes=("data",))
    assert mesh.devices.size == 8
    mesh = create_mesh(axes=("data", "model"), model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(axes=("data", "model"), model_parallel=3)


def test_shard_batch_and_gradient_psum():
    """Data-parallel train-step semantics: per-shard grads must be reduced by XLA so
    the sharded step matches the single-device step."""
    mesh = create_mesh(axes=("data",))
    w = jnp.ones((4,))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x))

    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    ws = jax.device_put(w, replicated(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-6)

    batch = shard_batch({"x": x}, mesh)
    assert batch["x"].sharding.spec == P("data")


def test_collectives_in_shard_map():
    from jax import shard_map

    mesh = create_mesh(axes=("data",))
    x = jnp.arange(8.0)

    def f(v):
        return collectives.psum(v, "data"), collectives.pmean(v, "data"), collectives.axis_index("data").reshape(1)

    total, mean, idx = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=(P("data"), P("data"), P("data")))
    )(x)
    np.testing.assert_allclose(np.asarray(total), np.full(8, 28.0))
    np.testing.assert_allclose(np.asarray(mean), np.full(8, 3.5))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(8))


def test_all_gather_and_reduce_scatter():
    from jax import shard_map

    mesh = create_mesh(axes=("data",))
    x = jnp.arange(16.0).reshape(8, 2)

    def f(v):
        gathered = collectives.all_gather(v, "data")
        return collectives.reduce_scatter(gathered, "data")

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data")))(x)
    # all_gather then reduce_scatter of an 8-way replicated concat = 8 * original
    np.testing.assert_allclose(np.asarray(out), 8 * np.asarray(x))


def test_fused_preprocess():
    from holocron_tpu.transforms.functional import fused_preprocess

    imgs = np.random.default_rng(0).integers(0, 255, (2, 48, 64, 3)).astype(np.uint8)
    out = fused_preprocess(jnp.asarray(imgs), (32, 32), dtype=jnp.float32)
    assert out.shape == (2, 32, 32, 3)
    ref = jax.image.resize(jnp.asarray(imgs, jnp.float32) / 255.0, (2, 32, 32, 3), "bilinear")
    ref = (ref - jnp.asarray((0.485, 0.456, 0.406))) / jnp.asarray((0.229, 0.224, 0.225))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_hybrid_mesh_single_slice():
    """On one slice the hybrid mesh degrades to the plain device mesh — the same
    training code runs single-host and multi-slice."""
    from holocron_tpu.parallel import hybrid_mesh, num_slices

    assert num_slices() == 1  # CPU mesh: one island
    mesh = hybrid_mesh(("data",))
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)

    mesh = hybrid_mesh(("data", "model"), model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        hybrid_mesh(model_parallel=3)
    with pytest.raises(ValueError):
        hybrid_mesh(dcn_data_parallel=5)


def test_hybrid_mesh_trains_end_to_end():
    """A tiny sharded train step over the hybrid mesh compiles and runs."""
    import optax

    from holocron_tpu.parallel import hybrid_mesh
    from holocron_tpu.parallel.mesh import batch_sharding

    mesh = hybrid_mesh(("data",))
    w = jnp.ones((4, 4))
    x = jax.device_put(jnp.arange(32.0).reshape(8, 4), batch_sharding(mesh))
    y = jax.device_put(jnp.ones((8, 4)), batch_sharding(mesh))
    tx = optax.sgd(0.1)
    state = tx.init(w)

    @jax.jit
    def step(w, state, x, y):
        loss, grads = jax.value_and_grad(lambda w_: jnp.mean((x @ w_ - y) ** 2))(w)
        updates, state = tx.update(grads, state, w)
        return optax.apply_updates(w, updates), state, loss

    w2, state, loss = step(w, state, x, y)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(w2), np.asarray(w))


def test_initialize_single_process_noop():
    from holocron_tpu.parallel import initialize

    initialize()  # no coordinator configured: must be a harmless no-op
    assert jax.process_count() == 1


def test_shard_inference_matches_single_device():
    """8-way data-parallel inference reproduces the single-device logits, for both the
    plain model and the selective-int8 QuantizedModel, with and without head TP."""
    from holocron_tpu.models.classification.repvgg import RepVGG
    from holocron_tpu.models.core import Model
    from holocron_tpu.parallel import shard_inference
    from holocron_tpu.quant import quantize_model

    model = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=8))
    model.init((16, 32, 32, 3))
    model.reparametrize()
    x = jax.random.normal(jax.random.key(0), (16, 32, 32, 3))
    ref = model(x)

    fwd_dp = shard_inference(model)  # default ("data",) mesh over all 8 devices
    np.testing.assert_allclose(np.asarray(fwd_dp(x)), np.asarray(ref), atol=1e-5)

    mesh2 = create_mesh(axes=("data", "model"), model_parallel=2)
    fwd_tp = shard_inference(model, mesh2, head_tensor_parallel=True)
    np.testing.assert_allclose(np.asarray(fwd_tp(x)), np.asarray(ref), atol=1e-5)

    qm = quantize_model(model, calibration_batches=[x], min_in_channels=1)
    ref_q = qm(x)
    fwd_q = shard_inference(qm)
    np.testing.assert_allclose(np.asarray(fwd_q(x)), np.asarray(ref_q), atol=1e-5)


def test_tensor_parallel_inference_matches_single_device():
    """Full-backbone channel TP (conv kernels, BN vectors, dense head split over the
    'model' axis) must reproduce the single-device logits — GSPMD owns the collective
    placement, we only annotate the weights (parallel/inference.py docstring)."""
    from holocron_tpu.models.classification.convnext import ConvNeXt
    from holocron_tpu.models.classification.repvgg import RepVGG
    from holocron_tpu.models.core import Model
    from holocron_tpu.parallel import shard_inference, tensor_parallel_specs

    mesh = create_mesh(axes=("data", "model"), model_parallel=4)
    x = jax.random.normal(jax.random.key(1), (8, 32, 32, 3))

    # plain conv stack (train form: BN batch stats present in the variables)
    model = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=8))
    model.init((8, 32, 32, 3))
    ref = model(x)
    fwd = shard_inference(model, mesh, tensor_parallel=True, min_channels=8)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(ref), atol=1e-4)

    # sharding rule: wide trailing dims split over 'model', narrow/indivisible replicate
    specs = tensor_parallel_specs(model.variables, mesh, min_channels=8)
    flat = {jax.tree_util.keystr(p): s for p, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
    sharded = [k for k, s in flat.items() if s.spec != P()]
    assert sharded, "expected at least the wide conv kernels to shard"
    assert all(flat[k].spec[-1] == "model" for k in sharded)

    # depthwise convs + LayerNorm + GELU + dense blocks (ConvNeXt Bottlenext)
    model = Model(ConvNeXt([1, 1], [16, 32], num_classes=8))
    model.init((8, 32, 32, 3))
    ref = model(x)
    fwd = shard_inference(model, mesh, tensor_parallel=True, min_channels=16)
    np.testing.assert_allclose(np.asarray(fwd(x)), np.asarray(ref), atol=1e-4)


def test_spatial_inference_matches_single_device():
    """Spatial partitioning (H sharded over the mesh, params replicated): GSPMD's
    halo exchanges must reproduce the single-device output exactly — for a U-Net
    (convs, pools, bilinear upsampling, skip concats) and for a classifier whose
    global pool reduces the sharded axis away (parallel/spatial.py)."""
    from holocron_tpu.models.classification.repvgg import RepVGG
    from holocron_tpu.models.core import Model
    from holocron_tpu.models.segmentation.unet import UNet
    from holocron_tpu.parallel import shard_spatial_inference

    model = Model(UNet([8, 16], num_classes=4))
    model.init((2, 64, 64, 3))
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    ref = model(x)

    fwd_sp = shard_spatial_inference(model)  # default ("spatial",) mesh, 8-way H split
    np.testing.assert_allclose(np.asarray(fwd_sp(x)), np.asarray(ref), atol=1e-5)

    # huge-map form: leave the output sharded instead of replicating it everywhere
    fwd_sharded = shard_spatial_inference(model, gather_output=False)
    out = fwd_sharded(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # DP x SP mesh: batch over "data", rows over "spatial"
    mesh = create_mesh(axes=("data", "spatial"), model_parallel=4)
    fwd_dpsp = shard_spatial_inference(model, mesh, batch_axis="data")
    np.testing.assert_allclose(np.asarray(fwd_dpsp(x)), np.asarray(ref), atol=1e-5)

    # classification: the sharded H axis ends at the global pool (psum over shards)
    clf = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=8))
    clf.init((2, 64, 64, 3))
    ref_logits = clf(x)
    fwd_clf = shard_spatial_inference(clf)
    np.testing.assert_allclose(np.asarray(fwd_clf(x)), np.asarray(ref_logits), atol=1e-5)

    # ragged H (68 % 8 != 0): the pinned input sharding would be rejected, so the
    # wrapper must fall back to the in-trace constraint (GSPMD pads internally)
    clf68 = Model(RepVGG([1, 1], [8, 16], 1.0, 2.0, num_classes=8))
    clf68.init((2, 68, 64, 3))
    x68 = jax.random.normal(jax.random.key(2), (2, 68, 64, 3))
    fwd68 = shard_spatial_inference(clf68)
    np.testing.assert_allclose(np.asarray(fwd68(x68)), np.asarray(clf68(x68)), atol=1e-5)

    mesh1 = create_mesh(axes=("spatial",))
    with pytest.raises(ValueError):
        shard_spatial_inference(model, mesh1, batch_axis="data")


def test_spatial_train_step_matches_replicated():
    """Gradients through a spatially-sharded forward (halo exchanges in the backward
    too) must equal the replicated step's — H-sharded training is what makes
    resolutions whose activations exceed one chip's HBM trainable at all."""
    from holocron_tpu.models.core import Model
    from holocron_tpu.models.segmentation.unet import UNet
    from holocron_tpu.nn import functional as F
    from holocron_tpu.parallel import create_mesh, spatial_sharding
    from jax.sharding import NamedSharding

    mesh = create_mesh(axes=("spatial",))
    model = Model(UNet([8, 16], num_classes=4))
    model.init((2, 32, 32, 3))
    module, variables = model.module, model.variables
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    y = jax.random.randint(jax.random.key(2), (2, 32, 32), 0, 4)

    def loss_fn(params, stats, x, y):
        logits, _ = module.apply({"params": params, **stats}, x, train=True, mutable=list(stats))
        return F.cross_entropy(logits, y)

    params = variables["params"]
    stats = {k: v for k, v in variables.items() if k != "params"}
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, stats, x, y)

    x_sp = spatial_sharding(mesh)
    repl = NamedSharding(mesh, P())
    step = jax.jit(
        jax.value_and_grad(loss_fn), in_shardings=(None, None, x_sp, x_sp), out_shardings=(repl, repl)
    )
    loss, grads = step(
        jax.device_put(params, repl),
        jax.device_put(stats, repl),
        jax.device_put(x, x_sp),
        jax.device_put(y, x_sp),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(grads)[0],
        jax.tree_util.tree_flatten_with_path(ref_grads)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"spatial grads diverge at {jax.tree_util.keystr(path)}",
        )


def test_pipeline_blocks_matches_sequential():
    """GPipe over a stack of shape-preserving residual blocks (parallel/pipeline.py):
    microbatches stream through per-device stage groups via ppermute; the result —
    and its gradients, GPipe's raison d'etre — must equal folding the blocks
    sequentially on one device."""
    from holocron_tpu.parallel import pipeline_blocks

    s, c = 8, 4
    params = {
        "w": jax.random.normal(jax.random.key(0), (s, 3, 3, c, c)) * 0.1,
        "b": jax.random.normal(jax.random.key(1), (s, c)) * 0.1,
    }

    def block_fn(p, x):
        y = jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jax.nn.relu(y + p["b"]) + x

    x = jax.random.normal(jax.random.key(2), (8, 8, 8, c))
    ref = x
    for i in range(s):
        ref = block_fn(jax.tree.map(lambda t: t[i], params), ref)

    out = pipeline_blocks(block_fn, params, x)  # 8 stages, 1 block each
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # memory-honest default: the output stays sharded over the pipe axis on the
    # batch dim (M/n microbatches per device) instead of replicating everywhere
    assert not out.sharding.is_fully_replicated

    # 4 stages x 2 blocks each (inner scan), more microbatches to shrink the bubble
    mesh4 = create_mesh(jax.devices()[:4], axes=("pipe",))
    out4 = pipeline_blocks(block_fn, params, x, mesh4, num_microbatches=8)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref), atol=1e-5)

    # opt-in replication
    out_g = pipeline_blocks(block_fn, params, x, mesh4, num_microbatches=8, gather_output=True)
    assert out_g.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref), atol=1e-5)

    # microbatches must spread evenly over the belt shards
    with pytest.raises(ValueError):
        pipeline_blocks(block_fn, params, x, mesh4, num_microbatches=2)

    # gradients flow backward through the pipeline hops
    def loss_pipe(p):
        return jnp.sum(pipeline_blocks(block_fn, p, x, mesh4) ** 2)

    def loss_seq(p):
        y = x
        for i in range(s):
            y = block_fn(jax.tree.map(lambda t: t[i], p), y)
        return jnp.sum(y**2)

    g_pipe = jax.grad(loss_pipe)(params)
    g_seq = jax.grad(loss_seq)(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_pipe)[0],
        jax.tree_util.tree_flatten_with_path(g_seq)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"pipeline grads diverge at {jax.tree_util.keystr(path)}",
        )

    with pytest.raises(ValueError):
        pipeline_blocks(block_fn, params, x, num_microbatches=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        mesh3 = create_mesh(jax.devices()[:3], axes=("pipe",))
        pipeline_blocks(block_fn, params, x, mesh3)  # 8 blocks % 3 stages != 0


def test_pipeline_module_runs_real_darknet53_stage():
    """GPipe wired to a REAL zoo model: darknet53's 8-block 512-channel stage
    (features/layer_3_block_{0..7}) is extracted via Model.stage_variables,
    pipelined over 4 devices with pipeline_module, and must reproduce the model's
    own captured stage output bit-for-bit-close. This is the Model hook that makes
    the pipeline a usable path, not a library demo."""
    from holocron_tpu.models import darknet53
    from holocron_tpu.models.classification.darknetv3 import ResBlock
    from holocron_tpu.parallel import pipeline_module

    model = darknet53()
    x = jax.random.normal(jax.random.key(0), (8, 64, 64, 3))
    model.init(x.shape)

    # the model's true stage input/output, from a captured forward
    _, inter = model.module.apply(
        model.variables, x, train=False, capture_intermediates=True
    )
    inter = inter["intermediates"]["features"]
    stage_in = inter["layer_3_conv"]["__call__"][0]
    stage_out = inter["layer_3_block_7"]["__call__"][0]

    stacked = model.stage_variables("layer_3_block_")
    assert jax.tree.leaves(stacked["params"])[0].shape[0] == 8
    assert "batch_stats" in stacked  # BN running stats ride along

    mesh = create_mesh(jax.devices()[:4], axes=("pipe",))
    y = pipeline_module(
        ResBlock(512, 256), stacked, stage_in, mesh=mesh, num_microbatches=8
    )
    # activations at this depth are O(1e2); the pipelined scan fuses differently
    # (fma contraction order), so equality is relative — measured ~1e-5 rel on CPU
    np.testing.assert_allclose(np.asarray(y), np.asarray(stage_out), rtol=1e-4, atol=5e-3)

    # prefix errors are loud
    with pytest.raises(ValueError):
        model.stage_variables("not_a_block_")
    with pytest.raises(ValueError):
        model.stage_variables("layer_3_block_7")  # single block, nothing to pipeline
