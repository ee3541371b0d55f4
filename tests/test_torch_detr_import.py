"""Reference DETR-classifier checkpoint import (.pth.tar layout).

Covers the widened checkpoint contract: reference-trained DETR heads
(``detr_classifier_checkpoint.pth.tar``, ``DETR_Image_Classification.py:
463-468``) load into this framework's DETR pytrees — attention qkv packing,
norm ordering, Conv1d input_proj flatten order, frozen-BN backbone buffers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_active_ai_tpu.utils.checkpoint import (
    _torch_mha_to_flax,
    import_torch_detr_state_dict,
)

D, HEADS, FF, Q, CLS = 32, 2, 64, 4, 10


def test_mha_import_matches_torch(rng):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention:
    identical outputs on identical inputs after the qkv/out remap."""
    import flax.linen as nn

    torch.manual_seed(0)
    tm = torch.nn.MultiheadAttention(D, HEADS, batch_first=True)
    sd = {f"attn.{k}": v for k, v in tm.state_dict().items()}
    flax_tree = jax.tree.map(
        jnp.asarray,
        _torch_mha_to_flax({k: v.numpy() for k, v in sd.items()}, "attn",
                           HEADS))

    q = np.random.RandomState(0).randn(2, 5, D).astype(np.float32)
    kv = np.random.RandomState(1).randn(2, 7, D).astype(np.float32)
    with torch.no_grad():
        t_out, _ = tm(torch.from_numpy(q), torch.from_numpy(kv),
                      torch.from_numpy(kv))
    mha = nn.MultiHeadDotProductAttention(num_heads=HEADS, qkv_features=D,
                                          out_features=D, deterministic=True)
    j_out = mha.apply({"params": flax_tree}, jnp.asarray(q), jnp.asarray(kv),
                      jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def _reference_detr_state_dict(f_params, f_stats):
    """Synthesize a reference-named state_dict sized for the tiny config:
    distinct random values so placement errors show as shape/value failures."""
    r = np.random.RandomState(3)
    sd = {}

    def add(k, shape):
        v = r.randn(*shape).astype(np.float32)
        if k.endswith("running_var"):
            v = np.abs(v) + 0.5  # variances must be positive (sqrt in BN)
        elif k.endswith("weight") and len(shape) >= 2:
            v *= 0.05  # keep the random 16-layer net finite in float32
        sd[k] = v

    # backbone.0.body.* — shapes derived from our encoder tree (HWIO->OIHW)
    bb = "backbone.0.body."
    add(bb + "conv1.weight",
        np.transpose(f_params["conv1"]["kernel"], (3, 2, 0, 1)).shape)
    for nm in ("weight", "bias", "running_mean", "running_var"):
        add(bb + f"bn1.{nm}", f_stats["bn1"]["mean"].shape)
    for name, block in f_params.items():
        if not name.startswith("layer"):
            continue
        stage, idx = name[5:].split("_")
        p = f"{bb}layer{stage}.{idx}."
        convs = sorted([k for k in block if k.startswith("Conv_")],
                       key=lambda s: int(s.split("_")[1]))
        has_down = len(convs) == 3
        n_main = len(convs) - (1 if has_down else 0)
        for j in range(n_main):
            kshape = np.transpose(block[convs[j]]["kernel"], (3, 2, 0, 1)).shape
            add(p + f"conv{j + 1}.weight", kshape)
            for nm in ("weight", "bias", "running_mean", "running_var"):
                add(p + f"bn{j + 1}.{nm}", (kshape[0],))
        if has_down:
            kshape = np.transpose(block[convs[-1]]["kernel"], (3, 2, 0, 1)).shape
            add(p + "downsample.0.weight", kshape)
            for nm in ("weight", "bias", "running_mean", "running_var"):
                add(p + f"downsample.1.{nm}", (kshape[0],))

    # transformer
    for side, n in (("encoder", 1), ("decoder", 1)):
        for i in range(n):
            p = f"transformer.{side}.layers.{i}"
            for attn in (("self_attn",) if side == "encoder"
                         else ("self_attn", "multihead_attn")):
                add(f"{p}.{attn}.in_proj_weight", (3 * D, D))
                add(f"{p}.{attn}.in_proj_bias", (3 * D,))
                add(f"{p}.{attn}.out_proj.weight", (D, D))
                add(f"{p}.{attn}.out_proj.bias", (D,))
            add(f"{p}.linear1.weight", (FF, D))
            add(f"{p}.linear1.bias", (FF,))
            add(f"{p}.linear2.weight", (D, FF))
            add(f"{p}.linear2.bias", (D,))
            for nn_ in range(2 if side == "encoder" else 3):
                add(f"{p}.norm{nn_ + 1}.weight", (D,))
                add(f"{p}.norm{nn_ + 1}.bias", (D,))
    add("transformer.decoder.norm.weight", (D,))
    add("transformer.decoder.norm.bias", (D,))
    add("input_proj.weight", (D, 512 * 16, 1))
    add("input_proj.bias", (D,))
    add("query_embed.weight", (Q, D))
    add("class_embed.weight", (CLS, D))
    add("class_embed.bias", (CLS,))
    return sd


def test_detr_checkpoint_import_places_weights(rng):
    from multimodal_active_ai_tpu.models.detr import DETR

    model = DETR(backbone_arch="ResNet18", num_classes=CLS, num_queries=Q,
                 hidden_dim=D, nheads=HEADS, enc_layers=1, dec_layers=1,
                 dim_feedforward=FF, dropout=0.0)
    g = jnp.ones((2, 3, 30, 30, 12))
    s = jnp.full((2, 3, 2), 0.5)
    variables = model.init(rng, g, s)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    sd = _reference_detr_state_dict(params["backbone_f"],
                                    stats["backbone_f"])
    new_p, new_s = import_torch_detr_state_dict(sd, params, stats,
                                                nheads=HEADS)

    # spot-check placements across every mapped family
    np.testing.assert_array_equal(new_p["class_embed"]["kernel"],
                                  sd["class_embed.weight"].T)
    np.testing.assert_array_equal(new_p["query_embed"], sd["query_embed.weight"])
    enc = new_p["transformer"]["TransformerEncoderLayer_0"]
    np.testing.assert_array_equal(
        enc["LayerNorm_1"]["scale"],
        sd["transformer.encoder.layers.0.norm2.weight"])
    dec = new_p["transformer"]["TransformerDecoderLayer_0"]
    np.testing.assert_array_equal(
        dec["LayerNorm_2"]["bias"], sd["transformer.decoder.layers.0.norm3.bias"])
    np.testing.assert_array_equal(
        dec["_MHA_1"]["MultiHeadDotProductAttention_0"]["out"]["bias"],
        sd["transformer.decoder.layers.0.multihead_attn.out_proj.bias"])
    np.testing.assert_array_equal(
        new_s["backbone_f"]["bn1"]["mean"],
        sd["backbone.0.body.bn1.running_mean"])
    # a downsample block's frozen buffers (layer2_0 has one in ResNet18)
    np.testing.assert_array_equal(
        new_s["backbone_f"]["layer2_0"]["FrozenBatchNorm_2"]["var"],
        sd["backbone.0.body.layer2.0.downsample.1.running_var"])

    # the imported tree runs
    out = model.apply({"params": jax.tree.map(jnp.asarray, new_p),
                       "batch_stats": jax.tree.map(jnp.asarray, new_s)},
                      g, s)
    assert out["pred_logits"].shape == (2, Q, CLS)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_classifier_checkpoint_import_matches_torch_forward(rng):
    """Probe-head import: identical logits from torch's C-major-flattened
    features and our NHWC-flattened features of the same feature map."""
    import jax
    from multimodal_active_ai_tpu.models import LogisticRegression
    from multimodal_active_ai_tpu.utils.checkpoint import (
        import_torch_classifier_state_dict,
    )

    F_FIX, C, NCLS, B = 2, 8, 10, 3
    torch.manual_seed(1)
    lin = torch.nn.Linear(F_FIX * C * 16, NCLS)
    feats = torch.randn(B, F_FIX, C, 4, 4)       # (B, F, C, H, W)
    torch_in = feats.reshape(B, F_FIX, -1).reshape(B, -1)   # C-major per fix
    with torch.no_grad():
        t_logits = lin(torch_in)

    probe = LogisticRegression(num_classes=NCLS)
    pv = probe.init(rng, jnp.ones((2, F_FIX * C * 16)))
    params = import_torch_classifier_state_dict(
        {"linear." + k: v for k, v in lin.state_dict().items()},
        jax.device_get(pv["params"]), num_fixations=F_FIX)
    nhwc = feats.permute(0, 1, 3, 4, 2).reshape(B, -1).numpy()  # NHWC per fix
    j_logits = probe.apply({"params": jax.tree.map(jnp.asarray, params)},
                           jnp.asarray(nhwc))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=1e-4, atol=1e-5)
