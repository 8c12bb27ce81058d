"""Elastic checkpoint restore across topologies.

The reference's save/load contract (/root/reference/holocron/trainer/core.py:106-133)
is topology-free by construction (single GPU). The TPU trainer adds TP / ZeRO-1
sharding, so the elastic-recovery scenario becomes: a checkpoint written under one
mesh topology must restore into ANY other topology and continue the identical
trajectory. These tests certify that on the 8-device CPU mesh:

  save under TP=2 (msgpack + orbax) and ZeRO-1  -->  restore into single-device,
  TP=4 and ZeRO-1 trainers, continue N steps, and match the single-device
  save/restore/continue trajectory exactly (same tolerances as the live
  trajectory-equality tests in test_trainer.py).

Note the optimizer state is intentionally NOT part of the checkpoint (reference
parity: core.py:106-124 saves only {epoch, step, min_loss, model}), so every arm —
including the baseline — restarts the optimizer at the restore point; equality is
then a statement about the restored model params and the continued update math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_trainer import MockLoader, make_trainer, tiny_model

LR = 5e-3
K_STEPS = 4  # steps before save
N_STEPS = 4  # steps after restore


def _fresh_trainer(**kw):
    return make_trainer(
        model=tiny_model(),
        train_loader=MockLoader(batch_size=8),
        val_loader=MockLoader(batch_size=8, seed=1),
        **kw,
    )


def _train_and_save(path, **kw):
    trainer = _fresh_trainer(**kw)
    trainer.check_setup(lr=LR, num_it=K_STEPS)
    trainer.save(path)
    return jax.tree.map(np.asarray, trainer.model.params)


def _restore_and_continue(path, **kw):
    trainer = _fresh_trainer(**kw)
    x, _ = next(iter(trainer.train_loader))
    trainer.model(jnp.asarray(x))  # init so load_variables has a tree to replace
    trainer.load(path)
    restored = jax.tree.map(np.asarray, trainer.model.params)
    losses = trainer.check_setup(lr=LR, num_it=N_STEPS)
    final = jax.tree.map(np.asarray, trainer.model.params)
    return restored, losses, final, trainer


def _assert_tree_close(a, b, rtol=2e-4, atol=2e-6):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def baseline(tmp_path_factory):
    """Single-device save -> single-device restore -> N more steps."""
    path = str(tmp_path_factory.mktemp("elastic") / "base.bin")
    one = jax.devices()[:1]
    saved = _train_and_save(path, devices=one)
    restored, losses, final, _ = _restore_and_continue(path, devices=one)
    _assert_tree_close(saved, restored, rtol=0, atol=0)
    return {"saved": saved, "losses": losses, "final": final}


def test_tp2_save_restores_into_single_device(tmp_path, baseline):
    """TP=2-written msgpack restores into an UNSHARDED trainer (scale-down recovery)."""
    path = str(tmp_path / "tp2.bin")
    saved = _train_and_save(path, model_parallel=2, tp_min_channels=4)
    _assert_tree_close(baseline["saved"], saved)  # TP training itself matched

    restored, losses, final, _ = _restore_and_continue(path, devices=jax.devices()[:1])
    _assert_tree_close(saved, restored, rtol=0, atol=0)  # gather was lossless
    np.testing.assert_allclose(baseline["losses"], losses, rtol=2e-5, atol=2e-6)
    _assert_tree_close(baseline["final"], final)


def test_tp2_save_restores_into_tp4(tmp_path, baseline):
    """TP=2-written msgpack restores into a TP=4 trainer (scale-up recovery): the
    restored host arrays are re-sharded to the new mesh by _reset_opt and the
    trajectory continues unchanged."""
    path = str(tmp_path / "tp2.bin")
    _train_and_save(path, model_parallel=2, tp_min_channels=4)

    restored, losses, final, trainer = _restore_and_continue(
        path, model_parallel=4, tp_min_channels=4
    )
    assert trainer.mesh.devices.shape == (2, 4)
    # params actually live sharded over the NEW 4-way model axis
    specs = {leaf.sharding.spec for leaf in jax.tree.leaves(trainer.model.params)}
    assert any(spec and spec[-1] == "model" for spec in specs), specs
    np.testing.assert_allclose(baseline["losses"], losses, rtol=2e-5, atol=2e-6)
    _assert_tree_close(baseline["final"], final)


def test_tp2_orbax_save_restores_into_single_device(tmp_path, baseline):
    """Same scale-down scenario through the orbax directory path, where the LIVE
    TP-sharded arrays are handed to the checkpointer (no pre-gather)."""
    path = str(tmp_path / "tp2_orbax")  # suffix-less -> orbax
    saved = _train_and_save(path, model_parallel=2, tp_min_channels=4)

    restored, losses, final, _ = _restore_and_continue(path, devices=jax.devices()[:1])
    _assert_tree_close(saved, restored, rtol=0, atol=0)
    np.testing.assert_allclose(baseline["losses"], losses, rtol=2e-5, atol=2e-6)
    _assert_tree_close(baseline["final"], final)


def test_zero1_save_restores_into_tp2(tmp_path, baseline):
    """ZeRO-1-written checkpoint (params replicated, moments were data-sharded —
    and correctly NOT saved) restores into a TP=2 trainer."""
    path = str(tmp_path / "zero1.bin")
    saved = _train_and_save(path, shard_opt_state=True, tp_min_channels=4)
    _assert_tree_close(baseline["saved"], saved)

    restored, losses, final, trainer = _restore_and_continue(
        path, model_parallel=2, tp_min_channels=4
    )
    assert trainer.mesh.devices.shape == (4, 2)
    np.testing.assert_allclose(baseline["losses"], losses, rtol=2e-5, atol=2e-6)
    _assert_tree_close(baseline["final"], final)
