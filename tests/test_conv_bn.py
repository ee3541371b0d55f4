"""Fused 1x1-conv + BN-statistics production vs the unfused conv->BN graph
(Pallas kernel in interpret mode on CPU; the gram form is plain jnp)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.models.conv_bn import FusedConv1x1BN
from multimodal_active_ai_tpu.ops import pallas_conv_bn


def _oracle(x, w):
    y = x @ w
    return y, jnp.sum(y, 0), jnp.sum(y * y, 0)


@pytest.mark.parametrize("impl", ["pallas", "gram"])
def test_stats_match_oracle(impl):
    r = np.random.RandomState(0)
    for m, k, n in ((64, 16, 64), (96, 24, 40), (256, 64, 256)):
        x = jnp.asarray(r.uniform(-1, 1, (m, k)).astype(np.float32))
        w = jnp.asarray(r.uniform(-1, 1, (k, n)).astype(np.float32))
        if impl == "pallas":
            y, s, sq = pallas_conv_bn.conv1x1_stats(x, w, True)
        else:
            y, s, sq = pallas_conv_bn.gram_stats(x, w)
        yr, sr, sqr = _oracle(x, w)
        np.testing.assert_allclose(y, yr, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s, sr, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(sq, sqr, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("impl", ["pallas", "gram"])
def test_stats_gradients_match_unfused(impl):
    r = np.random.RandomState(1)
    x = jnp.asarray(r.uniform(-1, 1, (48, 16)).astype(np.float32))
    w = jnp.asarray(r.uniform(-1, 1, (16, 32)).astype(np.float32))
    ty = jnp.asarray(r.uniform(-1, 1, (48, 32)).astype(np.float32))
    ts = jnp.asarray(r.uniform(-1, 1, (32,)).astype(np.float32))

    def loss_fused(x, w):
        if impl == "pallas":
            y, s, sq = pallas_conv_bn.conv1x1_stats(x, w, True)
        else:
            y, s, sq = pallas_conv_bn.gram_stats(x, w)
        return jnp.sum(y * ty) + jnp.sum(s * ts) + 0.5 * jnp.sum(sq * ts)

    def loss_ref(x, w):
        y, s, sq = _oracle(x, w)
        return jnp.sum(y * ty) + jnp.sum(s * ts) + 0.5 * jnp.sum(sq * ts)

    gx, gw = jax.grad(loss_fused, (0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, (0, 1))(x, w)
    np.testing.assert_allclose(gx, rx, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw, rw, rtol=1e-4, atol=1e-4)


class _UnfusedPair(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.features, (1, 1), strides=self.stride,
                    use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(y)


def _tie_params(fused_params, pair_params):
    """Copy the unfused pair's weights into the fused module's tree."""
    return {"kernel": pair_params["Conv_0"]["kernel"],
            "scale": pair_params["BatchNorm_0"]["scale"],
            "bias": pair_params["BatchNorm_0"]["bias"]}


@pytest.mark.parametrize("impl", ["pallas", "gram"])
@pytest.mark.parametrize("stride", [1, 2])
def test_module_matches_conv_bn_pair(impl, stride):
    r = np.random.RandomState(2)
    x = jnp.asarray(r.uniform(-2, 2, (4, 8, 8, 12)).astype(np.float32))
    pair = _UnfusedPair(features=24, stride=stride)
    fused = FusedConv1x1BN(features=24, stride=stride, impl=impl)
    pv = pair.init(jax.random.PRNGKey(0), x, train=True)
    fv = fused.init(jax.random.PRNGKey(0), x, train=True)
    fparams = _tie_params(fv["params"], pv["params"])

    yr, mr = pair.apply({"params": pv["params"],
                         "batch_stats": pv["batch_stats"]}, x, train=True,
                        mutable=["batch_stats"])
    yf, mf = fused.apply({"params": fparams,
                          "batch_stats": fv["batch_stats"]}, x, train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(yf, yr, rtol=1e-4, atol=1e-4)
    # running stats update identically
    np.testing.assert_allclose(mf["batch_stats"]["mean"],
                               mr["batch_stats"]["BatchNorm_0"]["mean"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mf["batch_stats"]["var"],
                               mr["batch_stats"]["BatchNorm_0"]["var"],
                               rtol=1e-4, atol=1e-5)

    # eval mode normalizes with running stats
    ye_r = pair.apply({"params": pv["params"],
                       "batch_stats": mr["batch_stats"]}, x, train=False)
    ye_f = fused.apply({"params": fparams,
                        "batch_stats": mf["batch_stats"]}, x, train=False)
    np.testing.assert_allclose(ye_f, ye_r, rtol=1e-4, atol=1e-4)

    # gradients through the train-mode graph
    t = jnp.asarray(r.uniform(-1, 1, np.asarray(yr).shape).astype(np.float32))

    def loss_pair(p):
        y = pair.apply({"params": p, "batch_stats": pv["batch_stats"]}, x,
                       train=True, mutable=["batch_stats"])[0]
        return jnp.mean((y - t) ** 2)

    def loss_fused(p):
        y = fused.apply({"params": p, "batch_stats": fv["batch_stats"]}, x,
                        train=True, mutable=["batch_stats"])[0]
        return jnp.mean((y - t) ** 2)

    gr = jax.grad(loss_pair)(pv["params"])
    gf = jax.grad(loss_fused)(fparams)
    np.testing.assert_allclose(gf["kernel"], gr["Conv_0"]["kernel"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(gf["scale"], gr["BatchNorm_0"]["scale"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(gf["bias"], gr["BatchNorm_0"]["bias"],
                               rtol=1e-3, atol=1e-5)

    def loss_pair_x(xi):
        y = pair.apply({"params": pv["params"],
                        "batch_stats": pv["batch_stats"]}, xi, train=True,
                       mutable=["batch_stats"])[0]
        return jnp.mean(jnp.sin(y) * t)

    def loss_fused_x(xi):
        y = fused.apply({"params": fparams,
                         "batch_stats": fv["batch_stats"]}, xi, train=True,
                        mutable=["batch_stats"])[0]
        return jnp.mean(jnp.sin(y) * t)

    np.testing.assert_allclose(jax.grad(loss_fused_x)(x),
                               jax.grad(loss_pair_x)(x), rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("impl", ["gram"])
def test_bottleneck_block_parity_tied_params(impl):
    """A full Bottleneck (incl. downsample) with stat_fusion matches the
    unfused block exactly when the weights are tied across the two trees."""
    from multimodal_active_ai_tpu.models.norm import make_norm
    from multimodal_active_ai_tpu.models.resnet import Bottleneck

    r = np.random.RandomState(3)
    x = jnp.asarray(r.uniform(-1, 1, (2, 8, 8, 16)).astype(np.float32))
    norm = make_norm("bn", axis_name=None)
    mk = lambda fusion: Bottleneck(planes=8, stride=2, downsample=True,
                                   norm=norm, stat_fusion=fusion)
    uv = mk(None).init(jax.random.PRNGKey(0), x, train=True)
    fv = mk(impl).init(jax.random.PRNGKey(0), x, train=True)

    up, us = uv["params"], uv["batch_stats"]
    fp = {
        "FusedConv1x1BN_0": {"kernel": up["Conv_0"]["kernel"],
                             "scale": up["BatchNorm_0"]["scale"],
                             "bias": up["BatchNorm_0"]["bias"]},
        "Conv_0": up["Conv_1"],
        "BatchNorm_0": up["BatchNorm_1"],
        "FusedConv1x1BN_1": {"kernel": up["Conv_2"]["kernel"],
                             "scale": up["BatchNorm_2"]["scale"],
                             "bias": up["BatchNorm_2"]["bias"]},
        "FusedConv1x1BN_2": {"kernel": up["Conv_3"]["kernel"],
                             "scale": up["BatchNorm_3"]["scale"],
                             "bias": up["BatchNorm_3"]["bias"]},
    }
    fs = {
        "FusedConv1x1BN_0": us["BatchNorm_0"],
        "BatchNorm_0": us["BatchNorm_1"],
        "FusedConv1x1BN_1": us["BatchNorm_2"],
        "FusedConv1x1BN_2": us["BatchNorm_3"],
    }
    assert jax.tree_util.tree_structure(fv["params"]) \
        == jax.tree_util.tree_structure(fp)

    yu, mu = mk(None).apply(uv, x, train=True, mutable=["batch_stats"])
    yf, mf = mk(impl).apply({"params": fp, "batch_stats": fs}, x, train=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(yf, yu, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        mf["batch_stats"]["FusedConv1x1BN_2"]["mean"],
        mu["batch_stats"]["BatchNorm_3"]["mean"], rtol=1e-4, atol=1e-5)

    # gradient parity on the tied trees
    t = jnp.asarray(r.uniform(-1, 1, np.asarray(yu).shape).astype(np.float32))

    def loss(mod, variables):
        y = mod.apply(variables, x, train=True, mutable=["batch_stats"])[0]
        return jnp.mean((y - t) ** 2)

    gu = jax.grad(lambda p: loss(mk(None), {"params": p,
                                            "batch_stats": us}))(up)
    gf = jax.grad(lambda p: loss(mk(impl), {"params": p,
                                            "batch_stats": fs}))(fp)
    np.testing.assert_allclose(gf["FusedConv1x1BN_1"]["kernel"],
                               gu["Conv_2"]["kernel"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(gf["Conv_0"]["kernel"],
                               gu["Conv_1"]["kernel"], rtol=1e-3, atol=1e-5)


def test_resnet50_step_runs_with_gram_fusion():
    """stat_fusion threads through the ResNet-50 SimCLR train step (the
    gram form is plain jnp, so this runs compiled on CPU) and yields a
    finite loss + finite grads-applied state."""
    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.ops import retina
    from multimodal_active_ai_tpu.train import optimizers, simclr_train

    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              supersample=2)
    rng = jax.random.PRNGKey(0)
    images = jax.random.randint(rng, (2, 64, 64, 3), 0, 256,
                                dtype=jnp.int32).astype(jnp.uint8)
    model = SimCLRModule(arch="ResNet50", axis_name=None, norm_kind="bn",
                         stat_fusion="gram")
    tx = optimizers.get_optimizer("adam", lambda t: 1e-3)
    state = simclr_train.create_train_state(
        model, tx, rng, jnp.ones((2, 30, 30, 12)))
    step = simclr_train.make_train_step(model, None, cfg,
                                        num_fixations=1, temperature=0.5)
    new_state, m = step(state, images, jax.random.PRNGKey(7))
    assert np.isfinite(float(jax.device_get(m["losses"])[-1]))
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.all(np.isfinite(jax.device_get(leaf)))


def test_stat_fusion_rejects_incompatible_norms():
    from multimodal_active_ai_tpu.models.resnet import build_encoder

    enc = build_encoder("ResNet50", norm_kind="frozen", axis_name=None,
                        stat_fusion="gram")
    with pytest.raises(ValueError, match="stat_fusion"):
        enc.init(jax.random.PRNGKey(0), jnp.ones((1, 30, 30, 12)), train=True)


def test_convert_stat_fusion_variables_roundtrip_and_forward():
    """Unfused ResNet-50 variables convert to the fused layout (and back,
    losslessly); the fused model under converted variables reproduces the
    unfused model's outputs in both eval and train mode."""
    from multimodal_active_ai_tpu.models.conv_bn import (
        convert_stat_fusion_variables)
    from multimodal_active_ai_tpu.models.resnet import build_encoder

    r = np.random.RandomState(5)
    x = jnp.asarray(r.uniform(-1, 1, (2, 30, 30, 12)).astype(np.float32))
    unfused = build_encoder("ResNet50", norm_kind="bn", axis_name=None)
    fused = build_encoder("ResNet50", norm_kind="bn", axis_name=None,
                          stat_fusion="gram")
    uv = unfused.init(jax.random.PRNGKey(0), x, train=True)
    fv_ref = fused.init(jax.random.PRNGKey(0), x, train=True)

    fv = convert_stat_fusion_variables(uv, to_fused=True)
    assert jax.tree_util.tree_structure(fv) \
        == jax.tree_util.tree_structure(dict(fv_ref))

    # lossless round trip
    back = convert_stat_fusion_variables(fv, to_fused=False)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 back, dict(uv))

    # eval-mode forward parity (running stats). Tolerances absorb ~50
    # layers of f32 accumulation-order drift (conv_general vs dot) while
    # still failing loudly on any mis-mapped weight.
    ye_u = unfused.apply(uv, x, train=False)
    ye_f = fused.apply(fv, x, train=False)
    np.testing.assert_allclose(ye_f, ye_u, rtol=5e-3, atol=5e-3)

    # train-mode forward parity (batch stats; gram form, compiled jnp)
    yt_u, mu = unfused.apply(uv, x, train=True, mutable=["batch_stats"])
    yt_f, mf = fused.apply(fv, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(yt_f, yt_u, rtol=1e-2, atol=1e-2)
    # updated running stats convert back to the unfused layout losslessly
    mb = convert_stat_fusion_variables(
        {"params": fv["params"], "batch_stats": mf["batch_stats"]},
        to_fused=False)["batch_stats"]
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-2,
                                                         atol=1e-3),
                 mb, dict(mu["batch_stats"]))


def test_gram_fusion_global_batch_stats_on_mesh(mesh2, rng):
    """The GSPMD-safety claim: with the batch sharded over a 2-device mesh,
    the gram form's statistics are still GLOBAL-batch statistics (SyncBN
    semantics) — outputs and running-stat updates match the single-device
    run of the identical program to float tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mod = FusedConv1x1BN(features=24, impl="gram")
    r = np.random.RandomState(7)
    x = jnp.asarray(r.uniform(-2, 2, (8, 6, 6, 12)).astype(np.float32))
    v = mod.init(jax.random.PRNGKey(0), x, train=True)

    @jax.jit
    def f(v, x):
        return mod.apply(v, x, train=True, mutable=["batch_stats"])

    y1, m1 = f(v, x)
    xs = jax.device_put(x, NamedSharding(mesh2, P("data")))
    y2, m2 = f(v, xs)
    np.testing.assert_allclose(jax.device_get(y2), jax.device_get(y1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(jax.device_get(m2["batch_stats"]["mean"]),
                               jax.device_get(m1["batch_stats"]["mean"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(jax.device_get(m2["batch_stats"]["var"]),
                               jax.device_get(m1["batch_stats"]["var"]),
                               rtol=1e-5, atol=1e-6)


def test_convert_is_noop_on_basicblock_trees():
    """ResNet-18/34 downsample BasicBlocks also expose Conv_0..2 — the
    fused-layout probe must not mistake their 3x3-led blocks for
    Bottlenecks (layout conversion is identity for BasicBlock nets)."""
    from multimodal_active_ai_tpu.models.conv_bn import (
        convert_stat_fusion_variables)
    from multimodal_active_ai_tpu.models.resnet import build_encoder

    enc = build_encoder("ResNet18", norm_kind="bn", axis_name=None)
    v = enc.init(jax.random.PRNGKey(0), jnp.ones((1, 30, 30, 12)),
                 train=True)
    out = convert_stat_fusion_variables(dict(v), to_fused=True)
    assert jax.tree_util.tree_structure(out) \
        == jax.tree_util.tree_structure(dict(v))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 out, dict(v))


@pytest.mark.slow
def test_training_curve_parity_fused_vs_unfused():
    """Loss-CURVE equivalence (verdict #1's parity check): the same
    ResNet-50 SimCLR training run — identical init (via the layout
    converter), identical glimpse stream — produces the same per-step
    losses with and without gram stat fusion, so the perf lever does not
    change training dynamics."""
    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.models.conv_bn import (
        convert_stat_fusion_variables)
    from multimodal_active_ai_tpu.ops import retina
    from multimodal_active_ai_tpu.train import optimizers, simclr_train

    cfg = retina.RetinaConfig(canvas_size=64, crop_sizes=(40, 24, 10, 30),
                              supersample=2)
    rng = jax.random.PRNGKey(0)
    sample = jnp.ones((2, 30, 30, 12))
    tx = optimizers.get_optimizer("adam", lambda t: 1e-3)

    def run(stat_fusion, variables=None):
        model = SimCLRModule(arch="ResNet50", axis_name=None, norm_kind="bn",
                             stat_fusion=stat_fusion)
        state = simclr_train.create_train_state(model, tx, rng, sample)
        if variables is not None:
            conv = convert_stat_fusion_variables(variables,
                                                 to_fused=bool(stat_fusion))
            state = state.replace(params=conv["params"],
                                  batch_stats=conv["batch_stats"])
        step = simclr_train.make_train_step(model, None, cfg,
                                            num_fixations=2, temperature=0.5)
        curve = []
        r = np.random.RandomState(11)
        for t in range(4):
            images = jnp.asarray(
                r.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8))
            state, m = step(state, images, jax.random.PRNGKey(100 + t))
            curve.extend(float(x) for x in jax.device_get(m["losses"]))
        return curve, {"params": jax.device_get(state.params),
                       "batch_stats": jax.device_get(state.batch_stats)}

    base_model = SimCLRModule(arch="ResNet50", axis_name=None,
                              norm_kind="bn")
    base_vars = jax.device_get(dict(
        params=simclr_train.create_train_state(
            base_model, tx, rng, sample).params,
        batch_stats=simclr_train.create_train_state(
            base_model, tx, rng, sample).batch_stats))

    unfused, _ = run(None, base_vars)
    fused, _ = run("gram", base_vars)
    np.testing.assert_allclose(fused, unfused, rtol=2e-3, atol=1e-4)
