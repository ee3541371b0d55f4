"""SetCriterion and DQN Bellman loss tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.objectives.dqn_loss import dqn_bellman_loss, huber
from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion


def test_set_criterion_perfect_prediction():
    crit = SetCriterion(num_queries=4, num_classes=10)
    labels = jnp.array([3, 7])
    logits = jax.nn.one_hot(jnp.broadcast_to(labels[:, None], (2, 4)), 10) * 50.0
    out = crit(logits, labels)
    assert float(out["loss_ce"]) < 1e-3
    assert float(out["class_error"]) < 1e-3


def test_set_criterion_uniform_logits():
    crit = SetCriterion(num_queries=4, num_classes=10)
    logits = jnp.zeros((2, 4, 10))
    out = crit(logits, jnp.array([0, 1]))
    np.testing.assert_allclose(float(out["loss_ce"]), np.log(10), rtol=1e-5)


def test_set_criterion_matches_manual_ce():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (3, 5, 7))
    labels = jnp.array([1, 2, 6])
    crit = SetCriterion(num_queries=5, num_classes=7)
    out = crit(logits, labels)
    lp = jax.nn.log_softmax(logits, -1)
    manual = -np.mean([lp[b, q, labels[b]] for b in range(3) for q in range(5)])
    np.testing.assert_allclose(float(out["loss_ce"]), manual, rtol=1e-5)


def test_huber_matches_smooth_l1():
    x = jnp.array([-3.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(huber(x))
    want = np.where(np.abs(x) < 1, 0.5 * np.asarray(x) ** 2, np.abs(x) - 0.5)
    np.testing.assert_allclose(out, want)


def test_dqn_bellman_zero_when_consistent():
    """Q(s,a) == r + γ·V(s') everywhere -> zero loss."""
    b, a = 4, 10
    gamma = 0.9
    target_qx = jnp.zeros((b, a))
    target_qy = jnp.zeros((b, a))
    rewards = jnp.ones((b,))
    # expected = 0*γ + 1 = 1 -> make policy Q(s,a) = 1 at the taken action
    actions = jnp.full((b, 2), 0.35)  # index 3 of 10
    policy_qx = jnp.zeros((b, a)).at[:, 3].set(1.0)
    policy_qy = jnp.zeros((b, a)).at[:, 3].set(1.0)
    loss = dqn_bellman_loss(policy_qx, policy_qy, target_qx, target_qy,
                            actions, rewards, gamma, a)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_dqn_bellman_gradient_only_at_taken_actions():
    b, a = 2, 5
    actions = jnp.array([[0.0, 0.2], [0.4, 0.6]])  # -> x idx 0,2; y idx 1,3

    def loss_fn(qx):
        return dqn_bellman_loss(qx, jnp.zeros((b, a)), jnp.zeros((b, a)),
                                jnp.zeros((b, a)), actions,
                                jnp.ones((b,)), 0.99, a)

    g = jax.grad(loss_fn)(jnp.zeros((b, a)))
    nz = np.nonzero(np.asarray(g))
    assert set(zip(nz[0].tolist(), nz[1].tolist())) == {(0, 0), (1, 2)}
