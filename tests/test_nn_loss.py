import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holocron_tpu import nn
from holocron_tpu.nn import functional as F


@pytest.fixture
def logits():
    return jax.random.normal(jax.random.key(0), (4, 8, 3, 3)).transpose(0, 2, 3, 1)  # (N, 3, 3, 8)


@pytest.fixture
def target():
    return jax.random.randint(jax.random.key(1), (4, 3, 3), 0, 8)


def _torch_ce(logits, target, weight=None, ignore_index=-100, reduction="mean"):
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(np.asarray(logits).transpose(0, 3, 1, 2))
    tt = torch.from_numpy(np.asarray(target)).long()
    wt = torch.from_numpy(np.asarray(weight)) if weight is not None else None
    return torch.nn.functional.cross_entropy(xt, tt, wt, ignore_index=ignore_index, reduction=reduction).numpy()


def test_cross_entropy_torch_parity(logits, target):
    for weight in [None, jnp.asarray(np.random.default_rng(0).uniform(0.5, 2.0, 8).astype(np.float32))]:
        for reduction in ["mean", "sum"]:
            ours = F.cross_entropy(logits, target, weight=weight, reduction=reduction)
            theirs = _torch_ce(logits, target, weight, reduction=reduction)
            np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5)


def test_cross_entropy_ignore_index(logits, target):
    target2 = target.at[0].set(3)
    ours = F.cross_entropy(logits, target2, ignore_index=3)
    theirs = _torch_ce(logits, target2, ignore_index=3)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5)


def test_focal_equals_ce_at_gamma0(logits, target):
    # reference contract: focal(gamma=0) == CE (tests/test_nn_loss.py:58-60)
    ours = F.focal_loss(logits, target, gamma=0.0)
    theirs = _torch_ce(logits, target)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5)


def test_focal_loss_properties(logits, target):
    loss = F.focal_loss(logits, target)
    assert loss.shape == ()
    assert bool(jnp.isfinite(loss))
    # 'none' reduction keeps target shape
    assert F.focal_loss(logits, target, reduction="none").shape == target.shape
    # certain correct prediction -> zero loss
    x = jnp.full((2, 4), -20.0).at[:, 1].set(20.0)
    t = jnp.asarray([1, 1])
    assert float(F.focal_loss(x, t)) == pytest.approx(0.0, abs=1e-6)
    # scale invariance of the focusing: gamma>0 shrinks loss for confident predictions
    assert float(F.focal_loss(logits, target, gamma=2.0)) < float(F.focal_loss(logits, target, gamma=0.0))


def test_multilabel_cross_entropy(logits, target):
    onehot = jax.nn.one_hot(target, 8)
    ours = F.multilabel_cross_entropy(logits, onehot)
    theirs = _torch_ce(logits, target)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5)
    # reduction variants
    assert F.multilabel_cross_entropy(logits, onehot, reduction="none").shape == target.shape
    np.testing.assert_allclose(
        np.asarray(F.multilabel_cross_entropy(logits, onehot, reduction="sum")),
        _torch_ce(logits, target, reduction="sum"),
        rtol=1e-5,
    )


def test_complement_cross_entropy(logits, target):
    # gamma=0 -> plain CE
    np.testing.assert_allclose(
        np.asarray(F.complement_cross_entropy(logits, target, gamma=0.0)),
        _torch_ce(logits, target),
        rtol=1e-5,
    )
    loss = F.complement_cross_entropy(logits, target)
    assert bool(jnp.isfinite(loss))
    # complement term reduces the total at gamma=-1 (negative gamma adds -entropy)
    assert float(loss) != pytest.approx(float(_torch_ce(logits, target)))


def test_mutual_channel_loss(target):
    x = jax.random.normal(jax.random.key(3), (4, 3, 3, 16))
    loss = F.mutual_channel_loss(x, target, jax.random.key(0), xi=2)
    assert loss.shape == ()
    assert bool(jnp.isfinite(loss))
    # deterministic per key
    loss2 = F.mutual_channel_loss(x, target, jax.random.key(0), xi=2)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(loss2))
    assert float(F.mutual_channel_loss(x, target, jax.random.key(1), xi=2)) != pytest.approx(float(loss))


def test_dice_loss():
    probs = jax.nn.one_hot(jnp.asarray([[0, 1], [1, 1]]), 2)  # (2, 2, 2)-> one-hot (2,2,2)
    # perfect prediction -> ~0 loss
    assert float(F.dice_loss(probs, probs)) == pytest.approx(0.0, abs=1e-6)
    # fully wrong -> ~1 loss (dice_coeff ~ 0, loss = 1)
    wrong = 1.0 - probs
    assert float(F.dice_loss(wrong, probs)) == pytest.approx(1.0, abs=1e-5)
    # weighted variant
    w = jnp.asarray([0.3, 0.7])
    assert float(F.dice_loss(probs, probs, weight=w)) == pytest.approx(0.0, abs=1e-6)


def test_poly_loss(logits, target):
    # eps=0 -> plain CE
    np.testing.assert_allclose(
        np.asarray(F.poly_loss(logits, target, eps=0.0)), _torch_ce(logits, target), rtol=1e-5
    )
    # soft-target path agrees with hard path on one-hot targets
    onehot = jax.nn.one_hot(target, 8)
    hard = F.poly_loss(logits, target, eps=2.0)
    # soft-target mean reduction averages per-sample sums over (N, H, W) equivalent
    soft = F.poly_loss(logits.reshape(-1, 8), onehot.reshape(-1, 8), eps=2.0)
    np.testing.assert_allclose(np.asarray(hard), np.asarray(soft), rtol=1e-5)
    with pytest.raises(TypeError):
        F.poly_loss(logits, target.astype(jnp.float32))


def test_loss_modules(logits, target):
    for crit, kwargs in [
        (nn.FocalLoss, {"gamma": 2.0}),
        (nn.MultiLabelCrossEntropy, {}),
        (nn.ComplementCrossEntropy, {}),
        (nn.PolyLoss, {"eps": 2.0}),
    ]:
        criterion = crit(**kwargs)
        t = jax.nn.one_hot(target, 8) if crit is nn.MultiLabelCrossEntropy else target
        loss = criterion(logits, t)
        assert loss.shape == () and bool(jnp.isfinite(loss))
        assert crit.__name__ in repr(criterion)
    # float weight becomes [w, 1-w]
    fl = nn.FocalLoss(weight=0.3)
    np.testing.assert_allclose(np.asarray(fl.weight), [0.3, 0.7])
    # reduction validation
    with pytest.raises(NotImplementedError):
        nn.FocalLoss(reduction="bad")


def test_class_balanced_wrapper(logits, target):
    num_samples = jnp.asarray([10.0, 20.0, 30.0, 40.0, 10.0, 20.0, 30.0, 40.0])
    criterion = nn.FocalLoss()
    wrapped = nn.ClassBalancedWrapper(criterion, num_samples, beta=0.99)
    assert wrapped.criterion.weight is not None
    expected_w = (1 - 0.99) / (1 - 0.99 ** np.asarray(num_samples))
    np.testing.assert_allclose(np.asarray(wrapped.criterion.weight), expected_w, rtol=1e-5)
    loss = wrapped(logits, target)
    assert loss.shape == () and bool(jnp.isfinite(loss))
    # pre-existing weights are multiplied
    crit2 = nn.FocalLoss(weight=list(np.ones(8)))
    wrapped2 = nn.ClassBalancedWrapper(crit2, num_samples, beta=0.99)
    np.testing.assert_allclose(np.asarray(wrapped2.criterion.weight), expected_w, rtol=1e-5)


def test_dice_loss_module(target):
    probs = jax.nn.one_hot(target, 8)
    criterion = nn.DiceLoss()
    assert float(criterion(probs, probs)) == pytest.approx(0.0, abs=1e-6)


def test_mutual_channel_loss_module(target):
    x = jax.random.normal(jax.random.key(3), (4, 3, 3, 16))
    criterion = nn.MutualChannelLoss(xi=2)
    loss = criterion(x, target, key=jax.random.key(0))
    assert loss.shape == () and bool(jnp.isfinite(loss))
    assert "xi=2" in repr(criterion)
