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
