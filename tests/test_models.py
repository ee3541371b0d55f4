"""Model-zoo tests: exact parameter parity with the PyTorch reference models
and the foveated-surgery output shapes (SURVEY §2 #2, #6, #7, #21)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.models import (
    SimCLRModule,
    build_dqn,
    LogisticRegression,
    MLP,
)
from multimodal_active_ai_tpu.models.resnet import ResNet, BasicBlock, encoder_feature_dim

# Parameter totals measured from the reference torch modules
# (rn.resnetXX(norm) + mlp.MLP(C*4*4, 1024, 128) under SimCLR_Module):
REF_PARAM_TOTALS = {"ResNet18": 19_725_568, "ResNet50": 57_222_912}


@pytest.mark.parametrize("arch", ["ResNet18", "ResNet50"])
def test_simclr_param_parity(arch, rng):
    m = SimCLRModule(arch=arch, axis_name=None, norm_kind="bn")
    vs = m.init(rng, jnp.ones((1, 30, 30, 12)), train=False)
    total = sum(p.size for p in jax.tree.leaves(vs["params"]))
    assert total == REF_PARAM_TOTALS[arch]


def test_simclr_forward_shapes(rng):
    m = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    vs = m.init(rng, jnp.ones((2, 30, 30, 12)), train=False)
    out = m.apply(vs, jnp.ones((2, 30, 30, 12)), train=False)
    assert out.shape == (2, 128)
    feats = m.apply(vs, jnp.ones((2, 30, 30, 12)), train=False,
                    method=SimCLRModule.features)
    # the reference surgery: stride-1 stem, no pooling -> 4x4 spatial output
    assert feats.shape == (2, 4, 4, 512)


def test_batch_stats_update_in_train_mode(rng):
    m = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    x = jax.random.normal(rng, (4, 30, 30, 12))
    vs = m.init(rng, x, train=False)
    _, mutated = m.apply(vs, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(vs["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))


def test_tiny_resnet_spatial_reduction(rng):
    tiny = ResNet(block=BasicBlock, layers=(1, 1, 1, 1), norm_kind="bn",
                  axis_name=None)
    vs = tiny.init(rng, jnp.ones((1, 30, 30, 12)), train=False)
    out = tiny.apply(vs, jnp.ones((1, 30, 30, 12)), train=False)
    assert out.shape == (1, 4, 4, 512)  # 30 -> 30 -> 15 -> 8 -> 4


def test_encoder_feature_dims():
    assert encoder_feature_dim("ResNet18") == 512
    assert encoder_feature_dim("ResNet34") == 512
    assert encoder_feature_dim("ResNet50") == 2048


def test_dqn_heads(rng):
    q = build_dqn(arch="ResNet18", num_of_actions=100, axis_name=None,
                  norm_kind="bn")
    vs = q.init(rng, jnp.ones((2, 30, 30, 12)), train=False)
    qx, qy = q.apply(vs, jnp.ones((2, 30, 30, 12)), train=False)
    assert qx.shape == (2, 100) and qy.shape == (2, 100)


def test_mlp_and_probe_shapes(rng):
    mlp = MLP(hidden_dim=1024, output_dim=128)
    v = mlp.init(rng, jnp.ones((2, 4, 4, 512)))
    assert mlp.apply(v, jnp.ones((2, 4, 4, 512))).shape == (2, 128)
    probe = LogisticRegression(num_classes=1000)
    v = probe.init(rng, jnp.ones((2, 512 * 16 * 2)))
    assert probe.apply(v, jnp.ones((2, 512 * 16 * 2))).shape == (2, 1000)


def test_frozen_batchnorm_is_affine(rng):
    m = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="frozen")
    x = jax.random.normal(rng, (2, 30, 30, 12))
    vs = m.init(rng, x, train=False)
    out1 = m.apply(vs, x, train=True)
    out2 = m.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
