"""One-pass Pallas BN-statistics kernel vs the jnp/flax oracle (interpret
mode on CPU; the compiled kernel runs on the TPU bench path)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_active_ai_tpu.models.norm import FusedStatsBatchNorm
from multimodal_active_ai_tpu.ops import pallas_bn


def test_stat_sums_matches_jnp():
    r = np.random.RandomState(0)
    for n, c in ((96, 64), (256, 128), (40, 24)):     # incl. non-pow2 tiles
        x = jnp.asarray(r.uniform(-2, 2, (n, c)).astype(np.float32))
        s, sq = pallas_bn.stat_sums(x, True)
        np.testing.assert_allclose(s, jnp.sum(x, 0), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(sq, jnp.sum(x * x, 0), rtol=1e-5, atol=1e-4)


def test_stat_sums_bf16_input_f32_accumulation():
    r = np.random.RandomState(1)
    x32 = r.uniform(-2, 2, (512, 64)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    s, sq = pallas_bn.stat_sums(x, True)
    assert s.dtype == jnp.float32
    ref = np.sum(np.asarray(x, np.float32), 0)
    np.testing.assert_allclose(s, ref, rtol=1e-2)


def test_stat_sums_gradient():
    r = np.random.RandomState(2)
    x = jnp.asarray(r.uniform(-1, 1, (64, 32)).astype(np.float32))
    w = jnp.asarray(r.uniform(-1, 1, (32,)).astype(np.float32))

    def f_pallas(x):
        s, sq = pallas_bn.stat_sums(x, True)
        return jnp.sum(s * w) + jnp.sum(sq * w * 0.5)

    def f_ref(x):
        return jnp.sum(jnp.sum(x, 0) * w) + jnp.sum(jnp.sum(x * x, 0) * w * 0.5)

    np.testing.assert_allclose(jax.grad(f_pallas)(x), jax.grad(f_ref)(x),
                               rtol=1e-5, atol=1e-5)


def test_fused_bn_matches_flax_batchnorm():
    """Forward, gradients, and running-stat updates match nn.BatchNorm
    (same fast-variance statistics, same momentum/eps, same state names —
    checkpoints are interchangeable)."""
    r = np.random.RandomState(3)
    x = jnp.asarray(r.uniform(-3, 3, (8, 5, 5, 16)).astype(np.float32))
    ref = nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5)
    fused = FusedStatsBatchNorm(use_running_average=None, momentum=0.9,
                                epsilon=1e-5)
    rv = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    fv = fused.init(jax.random.PRNGKey(0), x, use_running_average=False)
    assert jax.tree_util.tree_structure(rv) == jax.tree_util.tree_structure(fv)

    # train mode: outputs + new running stats
    yr, mr = ref.apply(rv, x, use_running_average=False,
                       mutable=["batch_stats"])
    yf, mf = fused.apply(rv, x, use_running_average=False,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(yf, yr, rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                         atol=1e-6),
                 mf["batch_stats"], mr["batch_stats"])

    # eval mode uses running stats
    ye_r = ref.apply({"params": rv["params"],
                      "batch_stats": mr["batch_stats"]}, x,
                     use_running_average=True)
    ye_f = fused.apply({"params": rv["params"],
                        "batch_stats": mr["batch_stats"]}, x,
                       use_running_average=True)
    np.testing.assert_allclose(ye_f, ye_r, rtol=1e-5, atol=1e-5)

    # gradients through the train-mode normalize (the BN backward path)
    t = jnp.asarray(r.uniform(-1, 1, x.shape).astype(np.float32))

    def loss(params, mod):
        y = mod.apply({"params": params, "batch_stats": rv["batch_stats"]},
                      x, use_running_average=False,
                      mutable=["batch_stats"])[0]
        return jnp.mean((y - t) ** 2)

    gr = jax.grad(loss)(rv["params"], ref)
    gf = jax.grad(loss)(rv["params"], fused)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-5), gf, gr)

    def loss_x(x_in, mod):
        y = mod.apply(rv, x_in, use_running_average=False,
                      mutable=["batch_stats"])[0]
        return jnp.mean(jnp.sin(y) * t)

    np.testing.assert_allclose(jax.grad(loss_x)(x, fused),
                               jax.grad(loss_x)(x, ref), rtol=1e-4, atol=1e-5)


def test_fused_bn_in_resnet_step():
    """bn_fused drops into the encoder family: one SimCLR train step runs
    and matches the bn kind's loss on identical params/inputs."""
    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.ops import retina
    from multimodal_active_ai_tpu.train import optimizers, simclr_train

    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              supersample=2)
    rng = jax.random.PRNGKey(0)
    images = jax.random.randint(rng, (2, 64, 64, 3), 0, 256,
                                dtype=jnp.int32).astype(jnp.uint8)
    key = jax.random.PRNGKey(7)
    losses = {}
    for kind in ("bn", "bn_fused"):
        model = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind=kind)
        tx = optimizers.get_optimizer("adam", lambda t: 1e-3)
        state = simclr_train.create_train_state(
            model, tx, rng, jnp.ones((2, 30, 30, 12)))
        step = simclr_train.make_train_step(model, None, cfg,
                                            num_fixations=1, temperature=0.5)
        _, m = step(state, images, key)
        losses[kind] = float(jax.device_get(m["losses"])[-1])
    assert np.isfinite(losses["bn_fused"])
    np.testing.assert_allclose(losses["bn_fused"], losses["bn"],
                               rtol=1e-4, atol=1e-4)
