"""End-to-end SimCLR train-step tests on the simulated 8-device mesh.

Uses a reduced geometry (64-canvas, tiny ResNet) so the whole e2e path —
fused retina → encoder → cross-replica NT-Xent → backward → Adam — compiles
and runs in CI on CPU devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.models import SimCLRModule
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.train import optimizers, schedule, simclr_train

CFG = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                          glimpse_size=30, supersample=1)


def _setup(mesh):
    # GSPMD path: no axis_name; BatchNorm stats are global under sharding
    model = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    sched = schedule.simclr_learning_rate(0.01, 16, 256, 2, 1, 5)
    tx = optimizers.get_optimizer("adam", sched)
    rng = jax.random.PRNGKey(0)
    state = simclr_train.create_train_state(
        model, tx, rng, jnp.ones((2, 30, 30, 12)))
    return model, state


@pytest.mark.slow
def test_train_step_runs_and_updates(mesh2):
    model, state = _setup(mesh2)
    step = simclr_train.make_train_step(model, mesh2, CFG, num_fixations=2,
                                        temperature=0.05, donate=False)
    images = jax.random.randint(jax.random.PRNGKey(1), (4, 64, 64, 3), 0,
                                256).astype(jnp.uint8)
    p0 = jax.device_get(state.params["f"]["conv1"]["kernel"])
    state, metrics = step(state, images, jax.random.PRNGKey(2))
    losses = np.asarray(metrics["losses"])
    assert losses.shape == (2,) and np.isfinite(losses).all()
    assert int(state.step) == 2  # one optimizer step per fixation
    p1 = jax.device_get(state.params["f"]["conv1"]["kernel"])
    assert np.abs(p1 - p0).max() > 0  # parameters moved
    # BN stats moved too (train-mode forwards update them)
    assert any(np.abs(np.asarray(x)).max() > 0
               for x in jax.tree.leaves(state.batch_stats))


@pytest.mark.slow
def test_eval_step_metrics(mesh2):
    model, state = _setup(mesh2)
    ev = simclr_train.make_eval_step(model, mesh2, CFG, temperature=0.05)
    images = jax.random.randint(jax.random.PRNGKey(3), (4, 64, 64, 3), 0,
                                256).astype(jnp.uint8)
    m = jax.device_get(ev(state, images, jax.random.PRNGKey(4)))
    assert np.isfinite(m["loss"])
    assert 0.0 <= m["top1"] <= 1.0 and 0.0 <= m["top5"] <= 1.0
