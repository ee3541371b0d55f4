"""Mesh-parallel (GSPMD) coverage for the non-flagship train steps.

The SimCLR step's multi-device path is exercised by ``test_train_step`` and
``dryrun_multichip``; these tests compile and run the probe, DETR, and RLS
steps over a 2-device mesh with the batch sharded — the XLA-inserted
gradient all-reduce / BN-stat reduction paths the drivers rely on
(``parallel.mesh.data_parallel_jit``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.ops import retina

CFG = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                          supersample=2)


def _put(mesh, *arrays):
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def _tiny_detr():
    from multimodal_active_ai_tpu.models.detr import DETR

    return DETR(backbone_arch="ResNet18", num_classes=10, num_queries=4,
                hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1,
                dim_feedforward=64, dropout=0.0)


def _mesh_n(n):
    from multimodal_active_ai_tpu.parallel.mesh import create_mesh

    return create_mesh(data=n, model=1, devices=jax.devices()[:n])


@pytest.mark.slow
def test_simclr_step_sharded_matches_single_device(rng):
    """GSPMD-correctness, not just runs-sharded: the SAME seed and SAME
    global batch produce the same per-fixation losses and updated params on
    a 1-device mesh (plain jit) and a sharded multi-device mesh — i.e. the
    XLA-inserted gradient all-reduce, global-BN-stat reduction and NT-Xent
    negative exchange reproduce the single-replica math
    (``SimCLR/Objective.py:102-114`` + SyncBN semantics)."""
    import optax
    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.train import simclr_train

    results = []
    for n in (1, 4):
        model = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
        # SGD, not Adam: Adam's m/sqrt(v) normalization amplifies fp-level
        # cross-mesh loss differences into lr-scale param differences; SGD
        # keeps the param delta proportional to the gradient delta
        state = simclr_train.create_train_state(
            model, optax.sgd(0.05), rng, jnp.ones((2, 30, 30, 12)))
        # ONE fixation: the compared params then sit exactly one SGD update
        # from the shared init, so their difference is lr × the cross-mesh
        # gradient fp noise (~1e-6). A second chained update re-linearizes
        # at perturbed params + perturbed BN stats and amplifies that noise
        # ~1000× (measured 1e-3 abs on zero-init biases) without any
        # sharding bug — one update is the clean equivalence statement.
        step = simclr_train.make_train_step(model, _mesh_n(n), CFG,
                                            num_fixations=1, temperature=0.5,
                                            donate=False)
        images = (jax.random.uniform(rng, (4, 64, 64, 3)) * 255
                  ).astype(jnp.uint8)
        state, m = step(state, images, jax.random.PRNGKey(7))
        results.append((np.asarray(jax.device_get(m["losses"])),
                        jax.device_get(state.params)))
    (l1, p1), (ln, pn) = results
    # tolerance: fixation-2's loss sits downstream of an SGD update, which
    # amplifies cross-mesh reduction-order fp noise ~100x (measured 2.6e-4
    # rel); a real sharding bug (wrong BN stats, missing grad sync) shows
    # up at percent level
    np.testing.assert_allclose(l1, ln, rtol=1e-3, atol=2e-5)
    # atol 2e-4: measured cross-mesh conv-grad fp noise leaves ~0.06% of
    # elements near 1e-4 after the lr=0.05 update; a missing grad sync or
    # per-shard BN stats shows up 2-3 orders of magnitude above this
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


@pytest.mark.slow
def test_detr_step_sharded_matches_single_device(rng):
    """Same equivalence for the DETR classifier step (grad all-reduce +
    ``num_preds`` normalization, ``detr_CLA/models/detr.py:137-141``)."""
    from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion
    from multimodal_active_ai_tpu.train import detr_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    import optax

    results = []
    for n in (1, 4):
        model = _tiny_detr()
        criterion = SetCriterion(num_queries=4, num_classes=10)
        variables = model.init(rng, jnp.ones((2, 2, 30, 30, 12)),
                               jnp.full((2, 2, 2), 0.5))
        # SGD for the same fp-noise-amplification reason as the SimCLR
        # equivalence test (the optimizer is not what this test certifies)
        state = TrainState.create(apply_fn=model.apply,
                                  params=variables["params"],
                                  tx=optax.sgd(0.05),
                                  batch_stats=variables["batch_stats"])
        step = detr_train.make_detr_train_step(model, criterion, _mesh_n(n),
                                               CFG, 2)
        images = (jax.random.uniform(rng, (4, 64, 64, 3)) * 255
                  ).astype(jnp.uint8)
        labels = jnp.array([1, 2, 3, 4], jnp.int32)
        state, m = step(state, images, labels, jax.random.PRNGKey(9))
        results.append((float(jax.device_get(m["loss_ce"])),
                        jax.device_get(state.params)))
    (l1, p1), (ln, pn) = results
    np.testing.assert_allclose(l1, ln, rtol=1e-3, atol=2e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_probe_train_step_on_mesh(mesh2, rng):
    import optax
    from multimodal_active_ai_tpu.models import LogisticRegression, SimCLRModule
    from multimodal_active_ai_tpu.train import eval_probe
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    encoder = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    enc_vars = encoder.init(rng, jnp.ones((2, 30, 30, 12)), train=False)
    probe = LogisticRegression(num_classes=10)
    feat_dim = 512 * 16 * 2
    pv = probe.init(rng, jnp.ones((2, feat_dim)))
    state = TrainState.create(apply_fn=probe.apply, params=pv["params"],
                              tx=optax.adam(1e-3), batch_stats={})
    step = eval_probe.make_probe_train_step(encoder, probe, mesh2, CFG, 2)
    images = (jax.random.uniform(rng, (4, 64, 64, 3)) * 255).astype(jnp.uint8)
    labels = jnp.array([0, 1, 2, 3], jnp.int32)
    images, labels = _put(mesh2, images, labels)
    before = jax.device_get(state.params)
    state, m = step(state, enc_vars, images, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    after = jax.device_get(state.params)
    assert any(bool((np.asarray(a) != np.asarray(b)).any())
               for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)))


@pytest.mark.slow
def test_detr_train_and_eval_step_on_mesh(mesh2, rng):
    from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion
    from multimodal_active_ai_tpu.train import detr_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    model = _tiny_detr()
    criterion = SetCriterion(num_queries=4, num_classes=10)
    g = jnp.ones((2, 2, 30, 30, 12))
    s = jnp.full((2, 2, 2), 0.5)
    variables = model.init(rng, g, s)
    tx = detr_train.make_detr_optimizer(variables["params"], 1e-4, 1e-5,
                                        1e-4, 0.1, 200, 10)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables["batch_stats"])
    step = detr_train.make_detr_train_step(model, criterion, mesh2, CFG, 2)
    ev = detr_train.make_detr_eval_step(model, criterion, mesh2, CFG, 2)
    images = (jax.random.uniform(rng, (4, 64, 64, 3)) * 255).astype(jnp.uint8)
    labels = jnp.array([1, 2, 3, 4], jnp.int32)
    images, labels = _put(mesh2, images, labels)
    state, m = step(state, images, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(m["loss_ce"])))
    me = jax.device_get(ev(state, images, labels, jax.random.PRNGKey(3)))
    assert 0.0 <= float(me["top5"]) <= 1.0


@pytest.mark.slow
def test_rls_train_step_on_mesh(mesh2, rng):
    import optax
    from multimodal_active_ai_tpu.models.qnet import build_dqn
    from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion
    from multimodal_active_ai_tpu.train import rls_train
    from multimodal_active_ai_tpu.train.simclr_train import TrainState

    model = _tiny_detr()
    criterion = SetCriterion(num_queries=4, num_classes=10)
    g = jnp.ones((2, 3, 30, 30, 12))
    s = jnp.full((2, 3, 2), 0.5)
    variables = model.init(rng, g, s)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adam(1e-4),
                              batch_stats=variables["batch_stats"])
    dqn = build_dqn(arch="ResNet18", num_of_actions=10, axis_name=None,
                    norm_kind="bn")
    dqn_vars = dqn.init(jax.random.fold_in(rng, 1), jnp.ones((2, 30, 30, 12)),
                        train=False)
    step = rls_train.make_rls_train_step(model, criterion, dqn, mesh2, CFG,
                                         num_fixations=3, num_of_actions=10,
                                         eps_start=0.9, eps_end=0.05,
                                         eps_decay=10.0)
    images = (jax.random.uniform(rng, (4, 64, 64, 3)) * 255).astype(jnp.uint8)
    labels = jnp.array([1, 2, 3, 4], jnp.int32)
    images, labels = _put(mesh2, images, labels)
    state, m, rollout, reward = step(state, dqn_vars, images, labels,
                                     jax.random.PRNGKey(4),
                                     jnp.asarray(1, jnp.int32))
    assert np.isfinite(float(jax.device_get(m["loss_ce"])))
    # rollout buffers stay batch-sharded and host-gatherable for the replay
    assert rollout.glimpses.shape[:2] == (4, 3)
    assert np.asarray(jax.device_get(reward)).shape == (4,)
