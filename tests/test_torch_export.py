"""Reference-layout checkpoint EXPORT: the inverse of the importers.

BASELINE.json's north star says checkpoint semantics match the PyTorch
reference bit-for-layout; import was proven in round 2
(``test_torch_parity.py``, ``test_torch_detr_import.py``) — these tests
prove the other direction: a model pretrained in this framework round-trips
through the reference ``.pth.tar`` layout (flax -> state_dict -> import ->
identical leaves) and loads ``strict=True`` into a torch model written with
the reference's exact module names (``SimCLR/SimCLR.py`` tree:
``f.conv1 ... g.layers.2``) with matching forward outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_active_ai_tpu.models import LogisticRegression, SimCLRModule
from multimodal_active_ai_tpu.utils.checkpoint import (
    export_torch_classifier_state_dict,
    export_torch_detr_state_dict,
    export_torch_simclr_state_dict,
    import_torch_classifier_state_dict,
    import_torch_checkpoint,
    import_torch_detr_state_dict,
    import_torch_simclr_state_dict,
    save_torch_checkpoint,
)


def _randomized_bn_stats(batch_stats, seed=7):
    """Init leaves BN stats at (0, 1); randomize them so layout mistakes in
    the stats walk cannot hide behind identical defaults."""
    r = np.random.RandomState(seed)

    def jitter(path, leaf):
        leaf = np.asarray(leaf)
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if name in ("var", "weight"):
            return (np.abs(r.randn(*leaf.shape)) * 0.3 + 0.7).astype(leaf.dtype)
        return (r.randn(*leaf.shape) * 0.1).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(jitter, batch_stats)


def _build_reference_torch_simclr():
    """The reference module tree (``SimCLR/SimCLR.py`` + ``resnet.py`` +
    ``multilayerPerceptron.py``): exact state_dict names ``f.conv1.weight``,
    ``f.layer{s}.{i}.conv{j}/bn{j}/downsample.{0,1}``, ``g.layers.{0,2}``."""
    from torch import nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            if stride != 1 or cin != planes:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))
            else:
                self.downsample = None

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            identity = x if self.downsample is None else self.downsample(x)
            return torch.relu(out + identity)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(12, 64, 7, 1, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            cin = 64
            for stage, (planes, stride) in enumerate(
                    zip((64, 128, 256, 512), (1, 2, 2, 2))):
                blocks = []
                for b in range(2):
                    blocks.append(BasicBlock(cin, planes,
                                             stride if b == 0 else 1))
                    cin = planes
                setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            for s in range(1, 5):
                x = getattr(self, f"layer{s}")(x)
            return x

    class MLP(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(nn.Linear(512 * 16, 1024), nn.ReLU(),
                                        nn.Linear(1024, 128))

        def forward(self, x):
            return self.layers(x)

    class SimCLR(nn.Module):
        def __init__(self):
            super().__init__()
            self.f = Encoder()
            self.g = MLP()

        def forward(self, x_nchw):
            feats = self.f(x_nchw)
            return self.g(feats.reshape(x_nchw.shape[0], -1))  # C-major flatten

    return SimCLR()


@pytest.fixture(scope="module")
def simclr_tree():
    model = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((2, 30, 30, 12)), train=False)
    params = jax.device_get(variables["params"])
    stats = _randomized_bn_stats(jax.device_get(variables["batch_stats"]))
    return model, params, stats


def test_simclr_export_roundtrip(simclr_tree):
    """flax -> reference state_dict -> import -> identical leaves."""
    model, params, stats = simclr_tree
    sd = export_torch_simclr_state_dict(params, stats)
    re_p, re_s = import_torch_simclr_state_dict(sd, params, stats)
    jax.tree.map(np.testing.assert_array_equal, params, re_p)
    jax.tree.map(np.testing.assert_array_equal, stats, re_s)


def test_simclr_export_loads_into_reference_torch_model(simclr_tree):
    """strict=True load into the reference module tree + forward parity."""
    model, params, stats = simclr_tree
    sd = export_torch_simclr_state_dict(params, stats)
    tmodel = _build_reference_torch_simclr()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected
    tmodel.eval()

    x = np.random.RandomState(0).uniform(-1, 1, (3, 30, 30, 12)).astype(np.float32)
    j_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_simclr_export_pth_tar_schema(simclr_tree, tmp_path):
    """save_torch_checkpoint writes the reference schema
    (``Contrastive_Learning.py:521-530``) and import_torch_checkpoint
    consumes the file unchanged."""
    model, params, stats = simclr_tree
    sd = export_torch_simclr_state_dict(params, stats)
    path = str(tmp_path / "checkpoint.pth.tar")
    save_torch_checkpoint(sd, path, epoch=3, best_prec1=0.5,
                          extra={"loss_history": [1.0, 0.5],
                                 "top1_acc_history": [0.1],
                                 "top5_acc_history": [0.2],
                                 "total_time": 12.5})
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("epoch", "state_dict", "best_prec1", "optimizer",
                "loss_history", "top1_acc_history", "top5_acc_history",
                "total_time"):
        assert key in ckpt, key
    assert ckpt["epoch"] == 3
    re_p, re_s = import_torch_checkpoint(path, params, stats)
    jax.tree.map(np.testing.assert_array_equal, params, re_p)
    jax.tree.map(np.testing.assert_array_equal, stats, re_s)


def test_classifier_export_roundtrip_and_torch_forward(rng):
    F_FIX, C, NCLS, B = 2, 512, 10, 3
    probe = LogisticRegression(num_classes=NCLS)
    pv = jax.device_get(probe.init(rng, jnp.ones((2, F_FIX * C * 16)))["params"])
    # non-trivial weights
    r = np.random.RandomState(1)
    pv["Dense_0"]["kernel"] = r.randn(*pv["Dense_0"]["kernel"].shape).astype(np.float32)
    pv["Dense_0"]["bias"] = r.randn(NCLS).astype(np.float32)

    sd = export_torch_classifier_state_dict(pv, num_fixations=F_FIX)
    re_p = import_torch_classifier_state_dict(sd, pv, num_fixations=F_FIX)
    jax.tree.map(np.testing.assert_array_equal, pv, re_p)

    # torch forward on C-major flatten == flax forward on NHWC flatten
    lin = torch.nn.Linear(F_FIX * C * 16, NCLS)
    missing, unexpected = lin.load_state_dict(
        {k.split(".", 1)[1]: torch.from_numpy(v) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected
    feats = torch.randn(B, F_FIX, C, 4, 4)
    with torch.no_grad():
        t_logits = lin(feats.reshape(B, -1))
    nhwc = feats.permute(0, 1, 3, 4, 2).reshape(B, -1).numpy()
    j_logits = probe.apply({"params": pv}, jnp.asarray(nhwc))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_detr_export_roundtrip(rng):
    """DETR head: flax -> reference state_dict -> import -> identical leaves
    (the import side's numeric parity vs torch is already pinned by
    ``test_torch_detr_import.py``)."""
    from multimodal_active_ai_tpu.models.detr import DETR

    model = DETR(backbone_arch="ResNet18", num_classes=10, num_queries=4,
                 hidden_dim=32, nheads=2, enc_layers=1, dec_layers=1,
                 dim_feedforward=64, dropout=0.0)
    g = jnp.ones((2, 3, 30, 30, 12))
    s = jnp.full((2, 3, 2), 0.5)
    variables = model.init(rng, g, s)
    params = jax.device_get(variables["params"])
    stats = _randomized_bn_stats(jax.device_get(variables["batch_stats"]))

    sd = export_torch_detr_state_dict(params, stats)
    re_p, re_s = import_torch_detr_state_dict(sd, params, stats, nheads=2)
    jax.tree.map(np.testing.assert_array_equal, params, re_p)
    jax.tree.map(np.testing.assert_array_equal, stats, re_s)

    # every reference-layout family is present
    for key in ("backbone.0.body.conv1.weight",
                "backbone.0.body.layer2.0.downsample.1.running_var",
                "transformer.encoder.layers.0.self_attn.in_proj_weight",
                "transformer.decoder.layers.0.multihead_attn.out_proj.bias",
                "transformer.decoder.norm.weight",
                "input_proj.weight", "query_embed.weight",
                "class_embed.bias"):
        assert key in sd, key
    assert sd["input_proj.weight"].shape == (32, 512 * 16, 1)
