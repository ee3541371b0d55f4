"""Replay memory + ε-greedy policy tests (SURVEY §2 #22, #23)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.rl import (
    ReplayMemory,
    eps_threshold,
    select_action,
    select_action_from_policy,
    select_random_action,
)


def test_replay_push_and_sample():
    mem = ReplayMemory(100, state_shape=(4,), seed=0)
    for i in range(5):
        mem.push(np.full((8, 4), i, np.float32), np.random.rand(8, 2),
                 np.full((8, 4), i + 1, np.float32), np.ones(8))
    assert len(mem) == 40
    tr = mem.sample(16)
    assert tr.state.shape == (16, 4) and tr.action.shape == (16, 2)
    assert tr.reward.shape == (16,)
    # next_state is state + 1 by construction
    np.testing.assert_allclose(tr.next_state[:, 0], tr.state[:, 0] + 1)


def test_replay_ring_overwrite():
    mem = ReplayMemory(16, state_shape=(2,), seed=0)
    mem.push(np.zeros((10, 2)), np.zeros((10, 2)), np.zeros((10, 2)), np.zeros(10))
    mem.push(np.ones((10, 2)), np.ones((10, 2)), np.ones((10, 2)), np.ones(10))
    assert len(mem) == 16


def test_replay_state_dict_roundtrip():
    mem = ReplayMemory(32, state_shape=(3,), seed=0)
    mem.push(np.random.rand(8, 3), np.random.rand(8, 2),
             np.random.rand(8, 3), np.random.rand(8))
    state = mem.state_dict()
    mem2 = ReplayMemory(32, state_shape=(3,), seed=1)
    mem2.load_state_dict(state)
    assert len(mem2) == 8


def test_eps_threshold_decays():
    # reference Training.py:32-33
    e0 = eps_threshold(0, 0.9, 0.05, 10.0)
    e10 = eps_threshold(10, 0.9, 0.05, 10.0)
    e100 = eps_threshold(100, 0.9, 0.05, 10.0)
    assert e0 == 0.9
    assert e0 > e10 > e100
    np.testing.assert_allclose(e100, 0.05, atol=1e-3)


def _fake_dqn(batch, n_actions, best_x, best_y):
    def apply_fn(variables, states, train=False):
        qx = jnp.zeros((batch, n_actions)).at[:, best_x].set(1.0)
        qy = jnp.zeros((batch, n_actions)).at[:, best_y].set(1.0)
        return qx, qy
    return apply_fn


def test_greedy_action_from_policy():
    apply_fn = _fake_dqn(4, 10, best_x=3, best_y=7)
    a = select_action_from_policy(apply_fn, {}, jnp.zeros((4, 8)), 10)
    np.testing.assert_allclose(np.asarray(a),
                               np.tile([[0.3, 0.7]], (4, 1)), atol=1e-6)


def test_select_action_explores_and_exploits(rng):
    apply_fn = _fake_dqn(4, 10, best_x=3, best_y=7)
    # epoch huge -> threshold ~ eps_end=0: almost always greedy
    a = select_action(rng, apply_fn, {}, jnp.zeros((4, 8)), epoch=10_000,
                      eps_start=0.9, eps_end=0.0, eps_decay=10.0,
                      num_of_actions=10, batch_size=4)
    np.testing.assert_allclose(np.asarray(a), np.tile([[0.3, 0.7]], (4, 1)),
                               atol=1e-6)
    # eps_end = 1 -> always random
    b = select_action(rng, apply_fn, {}, jnp.zeros((4, 8)), epoch=10_000,
                      eps_start=1.0, eps_end=1.0, eps_decay=10.0,
                      num_of_actions=10, batch_size=4)
    assert not np.allclose(np.asarray(b), np.tile([[0.3, 0.7]], (4, 1)))


def test_random_action_range(rng):
    a = select_random_action(rng, 64)
    assert a.shape == (64, 2)
    assert (np.asarray(a) >= 0).all() and (np.asarray(a) < 1).all()


def test_dqn_update_after_target_sync_aliasing(rng):
    """Regression: ``sync_target`` returns views of the policy params; the
    DQN update must not donate the policy state or the next update after a
    sync fails with `f(donate(a), a)` (found by the workflow smoke)."""
    import optax
    from multimodal_active_ai_tpu.models.qnet import build_dqn
    from multimodal_active_ai_tpu.train import rls_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    dqn = build_dqn(arch="ResNet18", num_of_actions=10, axis_name=None,
                    norm_kind="bn")
    g = jnp.ones((2, 30, 30, 12))
    variables = dqn.init(rng, g, train=False)
    state = TrainState.create(apply_fn=dqn.apply,
                              params=variables["params"],
                              tx=optax.rmsprop(1e-3),
                              batch_stats=variables.get("batch_stats", {}))
    update = rls_train.make_dqn_update_step(dqn, num_of_actions=10, gamma=0.9)
    target = rls_train.sync_target(state)  # aliases state.params
    tr = (jnp.ones((4, 30, 30, 12)), jnp.zeros((4, 2), jnp.int32),
          jnp.ones((4, 30, 30, 12)), jnp.ones((4,)))
    state, loss1 = update(state, target, tr)
    target = rls_train.sync_target(state)
    state, loss2 = update(state, target, tr)  # crashed before the fix
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))


def test_dqn_update_trains_batchnorm_stats(rng):
    """The Bellman step must run the policy net with live BatchNorm: stats
    change across updates (the reference trains its DQN trunk in train mode,
    ``DQN/Training.py:86-140``) and flow to the target on sync."""
    import optax
    from multimodal_active_ai_tpu.models.qnet import build_dqn
    from multimodal_active_ai_tpu.train import rls_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    dqn = build_dqn(arch="ResNet18", num_of_actions=10, axis_name=None,
                    norm_kind="bn")
    variables = dqn.init(rng, jnp.ones((2, 30, 30, 12)), train=False)
    state = TrainState.create(apply_fn=dqn.apply,
                              params=variables["params"],
                              tx=optax.rmsprop(1e-3),
                              batch_stats=variables["batch_stats"])
    update = rls_train.make_dqn_update_step(dqn, num_of_actions=10, gamma=0.9)
    target = rls_train.sync_target(state)
    tr = (jax.random.uniform(rng, (4, 30, 30, 12)),
          jnp.zeros((4, 2), jnp.int32),
          jax.random.uniform(jax.random.fold_in(rng, 1), (4, 30, 30, 12)),
          jnp.ones((4,)))
    before = jax.device_get(state.batch_stats)
    state, _ = update(state, target, tr)
    after = jax.device_get(state.batch_stats)
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree.leaves(diffs)) > 0.0
    # sync copies the live stats into the target net
    target = rls_train.sync_target(state)
    same = jax.tree.map(lambda a, b: bool((a == b).all()),
                        target["batch_stats"], state.batch_stats)
    assert all(jax.tree.leaves(same))


class _StubDQN:
    """Minimal dqn_model stand-in for rollout tests: fixed greedy bins."""

    def __init__(self, n_actions, best_x, best_y):
        self.n, self.bx, self.by = n_actions, best_x, best_y

    def apply(self, variables, states, train=False):
        b = states.shape[0]
        qx = jnp.zeros((b, self.n)).at[:, self.bx].set(1.0)
        qy = jnp.zeros((b, self.n)).at[:, self.by].set(1.0)
        return qx, qy


def _tiny_retina_cfg():
    from multimodal_active_ai_tpu.ops import retina

    return retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                               supersample=2)


def test_rollout_num_fixs_range_matches_reference(rng):
    """num_fixs is drawn in [2, F-1]: the reference's ``torch.randint(2,
    args.num_fixations)`` high is EXCLUSIVE (RLS :688,694), so the full
    fixation budget F itself is never drawn (the round-3 verdict flagged
    the old [2, F] draw as parity drift)."""
    from multimodal_active_ai_tpu.train import rls_train

    F = 5
    roll = rls_train.make_rollout(_StubDQN(10, 3, 7), _tiny_retina_cfg(),
                                  num_fixations=F, num_of_actions=10,
                                  eps_start=0.9, eps_end=0.05, eps_decay=10.0)
    images = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    seen = set()
    for i in range(24):
        ro = roll({}, images, jax.random.fold_in(rng, i),
                  jnp.asarray(0, jnp.int32))
        nf = int(F - np.asarray(ro.mask)[0].sum())
        seen.add(nf)
    assert seen <= {2, 3, 4}, seen          # never F=5, never <2
    assert len(seen) > 1                     # actually varies


def test_policy_eval_rollout_is_greedy(rng):
    """With ε=0 and epoch>0 (the ``##Policy Top-1`` evaluator), every
    fixation after the first random one is the policy's argmax — the
    ``select_action_from_policy`` path (``DQN/Training.py:57-68``)."""
    from multimodal_active_ai_tpu.train import rls_train

    A, F = 10, 5
    roll = rls_train.make_rollout(_StubDQN(A, 3, 7), _tiny_retina_cfg(),
                                  num_fixations=F, num_of_actions=A,
                                  eps_start=0.0, eps_end=0.0, eps_decay=1.0)
    images = jnp.zeros((4, 64, 64, 3), jnp.uint8)
    ro = roll({}, images, rng, jnp.asarray(1, jnp.int32))
    sacc = np.asarray(ro.saccades)
    np.testing.assert_allclose(sacc[:, 1:, 0], 0.3, atol=1e-6)
    np.testing.assert_allclose(sacc[:, 1:, 1], 0.7, atol=1e-6)
    # fixation 0 stays random (reference: j==0 -> select_random_action)
    assert not np.allclose(sacc[:, 0], [[0.3, 0.7]] * 4)
