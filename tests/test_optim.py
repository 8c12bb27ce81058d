import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from holocron_tpu import optim


def _quadratic_problem():
    """Minimize ||p - target||^2 over a small pytree."""
    target = {
        "w": jnp.asarray([[1.0, -2.0], [3.0, 0.5]]),
        "b": jnp.asarray([0.5, -1.5]),
    }
    params = jax.tree.map(jnp.zeros_like, target)

    def loss_fn(p):
        return sum(jnp.sum((a - b) ** 2) for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(target)))

    return params, target, loss_fn


@pytest.mark.parametrize(
    "tx_factory",
    [
        lambda: optim.lars(lr=5e-2, momentum=0.9, weight_decay=1e-4),
        lambda: optim.lars(lr=5e-2, momentum=0.9, nesterov=True),
        lambda: optim.lamb(lr=5e-2, weight_decay=1e-4),
        lambda: optim.ralars(lr=5e-2),
        lambda: optim.ralars(lr=5e-2, force_adaptive_momentum=True),
        lambda: optim.tadam(lr=5e-2),
        lambda: optim.tadam(lr=5e-2, amsgrad=True, dof=2.0),
        lambda: optim.adabelief(lr=5e-2, weight_decay=1e-4),
        lambda: optim.adabelief(lr=5e-2, amsgrad=True),
        lambda: optim.adamp(lr=5e-2),
        lambda: optim.adan(lr=5e-2, weight_decay=1e-4),
        lambda: optim.ademamix(lr=5e-2),
        lambda: optim.lookahead(optax.adam(5e-2)),
        lambda: optim.scout(optax.adam(5e-2)),
    ],
)
def test_optimizer_decreases_loss(tx_factory):
    # mirror of the reference's param-changed assertions (tests/test_optim.py:10-39),
    # strengthened: the loss must actually go down over 20 steps
    params, _, loss_fn = _quadratic_problem()
    tx = tx_factory()
    opt_state = tx.init(params)
    initial = float(loss_fn(params))

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < initial
    for leaf in jax.tree.leaves(params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_lars_matches_sgd_direction():
    # with wd=0 and momentum=0 the LARS update is -lr * (||p||/||g||) * g
    params = {"w": jnp.asarray([3.0, 4.0])}
    grads = {"w": jnp.asarray([1.0, 0.0])}
    tx = optim.lars(lr=0.1)
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.1 * 5.0, 0.0], rtol=1e-6)


def test_lamb_trust_ratio_clips():
    # a huge parameter norm must be clamped to scale_clip[1] = 10
    params = {"w": jnp.full((4,), 100.0)}
    grads = {"w": jnp.ones((4,))}
    tx = optim.lamb(lr=1.0, weight_decay=0.0)
    updates, _ = tx.update(grads, tx.init(params), params)
    # after one step: m = 0.1*g, v = 0.001*g^2 -> update ~ m/sqrt(v) ~ 3.162 per coord
    direction = 0.1 / (np.sqrt(0.001) + 1e-8)
    update_norm = direction * 2.0  # ||[d,d,d,d]|| = 2d
    np.testing.assert_allclose(np.asarray(updates["w"]), -10.0 / update_norm * direction, rtol=1e-5)


def test_lookahead_sync():
    params = {"w": jnp.zeros(2)}
    tx = optim.lookahead(optax.sgd(1.0), sync_rate=0.5, sync_period=2)
    state = tx.init(params)
    grads = {"w": jnp.asarray([-1.0, -1.0])}
    # step 1: fast = 1, no sync
    updates, state = tx.update(grads, state, params)
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), [1.0, 1.0])
    # step 2: fast = 2, sync -> slow = 0 + 0.5*(2 - 0) = 1 -> params = slow
    updates, state = tx.update(grads, state, params)
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), [1.0, 1.0])


def test_wrapper_validation():
    with pytest.raises(ValueError):
        optim.lookahead(optax.sgd(1.0), sync_rate=2.0)
    with pytest.raises(ValueError):
        optim.scout(optax.sgd(1.0), sync_period=0)
    with pytest.raises(ValueError):
        optim.lars(lr=-1.0)
    with pytest.raises(ValueError):
        optim.lars(lr=1e-3, nesterov=True, momentum=0.0)


def test_optimizers_are_jittable_and_vectorized():
    # states must be pytrees compatible with jit + donation (used in the train step)
    params = {"a": jnp.ones((8, 8)), "b": {"c": jnp.ones((3,))}}
    grads = jax.tree.map(lambda x: 0.01 * x, params)
    for tx in [optim.tadam(), optim.adan(), optim.ademamix(), optim.adamp(), optim.adabelief()]:
        state = tx.init(params)
        updates, state2 = jax.jit(tx.update)(grads, state, params)
        assert jax.tree.structure(updates) == jax.tree.structure(params)


def test_schedules_are_zero_based():
    """The zoo evaluates LR schedules with optax's 0-based convention: the first
    update uses schedule(0), so onecycle/cosine align with optax built-ins used by
    the CLIs (regression for the off-by-one vs sgd/adamw)."""
    import jax.numpy as jnp

    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.full(3, 0.5)}
    sched = lambda count: jnp.where(count == 0, 1e-1, 1e-5)  # noqa: E731
    for factory in (optim.adabelief, optim.adamp, optim.lamb, optim.lars, optim.tadam,
                    optim.adan, optim.ademamix, optim.ralars):
        tx_sched = factory(sched)
        tx_const = factory(1e-1)
        up_s, _ = tx_sched.update(grads, tx_sched.init(params), params)
        up_c, _ = tx_const.update(grads, tx_const.init(params), params)
        np.testing.assert_allclose(np.asarray(up_s["w"]), np.asarray(up_c["w"]), rtol=1e-6,
                                   err_msg=factory.__name__)
