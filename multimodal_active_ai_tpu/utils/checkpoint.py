"""Checkpoint manager: last/best files, full training history, rank-0 writes.

Rebuild of reference ``SimCLR/Model_Util.py:95-99`` + the SimCLR driver's
checkpoint schema (``Contrastive_Learning.py:521-530``):

    {epoch, state_dict, best_prec1, optimizer,
     loss_history, top1_acc_history, top5_acc_history, total_time}

Semantics preserved: a rolling ``checkpoint`` file plus a ``model_best`` copy
when validation improves (``Model_Util.py:95-99``), written by process 0 only
(``Contrastive_Learning.py:517``). Serialization is flax msgpack instead of
``torch.save``; :func:`import_torch_checkpoint` consumes the reference's
``.pth.tar`` layout directly (torch-CPU load + name/layout mapping) so
pretrained PyTorch encoders can be evaluated or fine-tuned in this
framework — the cross-stage contract of ``backbone.py:205-213`` and
``Representation_Evaluation.py:405-422``.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(state: dict, is_best: bool,
                    filename: str = "checkpoint.msgpack",
                    best_filename: str = "model_best.msgpack") -> None:
    """Write ``state`` and copy to the best file when ``is_best``
    (``Model_Util.py:95-99``). Call only from process 0.

    ``to_state_dict`` first: optimizer states are tuples/namedtuples
    (optax chains), which msgpack cannot serialize directly."""
    _write_checkpoint(serialization.to_state_dict(_to_host(state)),
                      is_best, filename, best_filename,
                      state.get("best_prec1"))


def _write_checkpoint(state_dict, is_best: bool, filename: str,
                      best_filename: str, best_prec1) -> None:
    """Serialize + atomic write (+ best copy): the device-independent half
    of a save, shared by the sync and async paths."""
    payload = serialization.msgpack_serialize(state_dict)
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, filename)
    if is_best:
        print("Saving a new best model with precesion {}".format(best_prec1))
        os.makedirs(os.path.dirname(os.path.abspath(best_filename)),
                    exist_ok=True)
        shutil.copyfile(filename, best_filename)


class AsyncCheckpointer:
    """Non-blocking checkpoint writes for the epoch loop.

    The reference blocks its epoch boundary on ``torch.save``
    (``Contrastive_Learning.py:517-530``); at pod scale the serialize+write
    of the full params/opt/BN tree stalls every device. Here ``save()``
    snapshots the tree to host synchronously (device arrays are donated to
    the next step's jit, so the get cannot be deferred) and hands the
    msgpack serialization + atomic file write + best-copy to one background
    worker thread. At most one save is in flight — a second ``save()``
    first joins the previous one, so checkpoints land in order and a crash
    can lose at most the newest. Call ``wait()`` before reading the files
    or exiting.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def save(self, state: dict, is_best: bool,
             filename: str = "checkpoint.msgpack",
             best_filename: str = "model_best.msgpack") -> None:
        self.wait()
        # snapshot on the caller's thread: cheap host copies of the already
        # device_get'd leaves (drivers pass host trees), and safe against
        # later donation of the device buffers
        state_dict = serialization.to_state_dict(_to_host(state))
        best = state.get("best_prec1")
        import threading

        def work():
            try:
                _write_checkpoint(state_dict, is_best, filename,
                                  best_filename, best)
            except BaseException as exc:  # noqa: BLE001 — re-raised in wait()
                self._error = exc

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) has hit the disk; re-raise
        its error on the caller's thread."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err


def load_checkpoint(filename: str) -> dict:
    with open(filename, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template, state):
    """Restore a host-loaded checkpoint subtree onto a template pytree
    (shape/dtype donors), keeping the template's structure.

    ``state`` may be the template's own pytree type or the nested-dict
    state-dict form :func:`save_checkpoint` writes (tuples appear as
    string-indexed dicts; ``from_state_dict`` maps them back in order —
    naive leaf zipping would sort "10" before "2")."""
    try:
        restored = serialization.from_state_dict(template, state)
        return jax.tree.map(
            lambda t, s: jnp.asarray(s, dtype=t.dtype).reshape(t.shape),
            template, restored)
    except (KeyError, ValueError, TypeError):
        flat_t, treedef = jax.tree.flatten(template)
        flat_s = jax.tree.leaves(state)
        if len(flat_t) != len(flat_s):
            raise ValueError("checkpoint/template leaf mismatch: "
                             f"{len(flat_s)} vs {len(flat_t)}")
        return jax.tree.unflatten(treedef, [
            jnp.asarray(s, dtype=t.dtype).reshape(t.shape)
            for t, s in zip(flat_t, flat_s)
        ])


# ---------------------------------------------------------------------------
# PyTorch reference-checkpoint import


def _torch_conv_to_hwio(w: np.ndarray) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _sorted_slots(tree: dict, prefix: str) -> list[str]:
    """Traced submodule slots (``Conv_0``, ``BatchNorm_1``, ...) in trace
    order — the shared walk of all four import/export block mappers."""
    return sorted([k for k in tree if k.startswith(prefix)],
                  key=lambda s: int(s.split("_")[1]))


def _has_downsample(block_p: dict, convs: list[str]) -> bool:
    """A traced ResNet block has a downsample iff its LAST conv is a 1x1
    reading the block input (BasicBlock: 2 main convs +1; Bottleneck:
    3 main +1 — a bottleneck's conv3 is also 1x1 but reads the hidden
    width, so the input-channel check disambiguates len==3)."""
    c_in_first = block_p[convs[0]]["kernel"].shape[2]
    c_in_last = block_p[convs[-1]]["kernel"].shape[2]
    return len(convs) >= 3 and c_in_last == c_in_first and \
        block_p[convs[-1]]["kernel"].shape[:2] == (1, 1)


def torch_linear_on_flattened_conv(w: np.ndarray, chw: tuple[int, int, int]) -> np.ndarray:
    """Convert a torch Linear weight that consumes ``x.view(B, -1)`` of an
    NCHW feature map into the flax kernel consuming the NHWC flatten.

    torch flattens (C, H, W) C-major; this framework flattens (H, W, C).
    Returns the flax-layout kernel ``(H*W*C, out)``.
    """
    c, h, wd = chw
    out_dim = w.shape[0]
    return np.transpose(w.reshape(out_dim, c, h, wd), (2, 3, 1, 0)).reshape(h * wd * c, out_dim)


def import_torch_simclr_state_dict(state_dict: dict[str, Any], params: dict,
                                   batch_stats: dict) -> tuple[dict, dict]:
    """Map a reference SimCLR ``state_dict`` (``Contrastive_Learning.py:523``)
    onto this framework's ``params``/``batch_stats`` pytrees.

    Reference layout: ``f.conv1.weight``, ``f.bn1.{weight,bias,running_mean,
    running_var}``, ``f.layer{1..4}.{i}.conv{j}.weight``, ``f.layer{k}.{i}.
    downsample.{0,1}.*``, ``g.layers.{0,2}.{weight,bias}`` — produced by
    ``resnet.py`` + ``multilayerPerceptron.py`` under ``SimCLR_Module``.
    """
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    batch_stats = copy.deepcopy(jax.tree.map(np.asarray, batch_stats))
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        if node[path[-1]].shape != value.shape:  # not assert: survives -O
            raise ValueError(f"checkpoint import shape mismatch at {path}: "
                             f"{value.shape} != {node[path[-1]].shape}")
        node[path[-1]] = value.astype(node[path[-1]].dtype)

    f_params = params["f"]

    # stem
    put(f_params, ("conv1", "kernel"), _torch_conv_to_hwio(sd["f.conv1.weight"]))
    put(f_params, ("bn1", "scale"), sd["f.bn1.weight"])
    put(f_params, ("bn1", "bias"), sd["f.bn1.bias"])
    put(batch_stats["f"], ("bn1", "mean"), sd["f.bn1.running_mean"])
    put(batch_stats["f"], ("bn1", "var"), sd["f.bn1.running_var"])

    # blocks: our naming layer{s}_{i} with Conv_0/Conv_1[/Conv_2][/Conv_3=downsample]
    # and BatchNorm_0..; torch: f.layer{s}.{i}.conv{j}/bn{j}/downsample.{0,1}
    for name in list(f_params.keys()):
        if not name.startswith("layer"):
            continue
        stage, idx = name[5:].split("_")
        prefix = f"f.layer{stage}.{idx}."
        block_p = f_params[name]
        block_s = batch_stats["f"][name]
        convs = _sorted_slots(block_p, "Conv_")
        bns = _sorted_slots(block_p, "BatchNorm_")
        has_down = (prefix + "downsample.0.weight") in sd
        n_main = len(convs) - (1 if has_down else 0)
        for j in range(n_main):
            put(block_p, (convs[j], "kernel"),
                _torch_conv_to_hwio(sd[f"{prefix}conv{j + 1}.weight"]))
            put(block_p, (bns[j], "scale"), sd[f"{prefix}bn{j + 1}.weight"])
            put(block_p, (bns[j], "bias"), sd[f"{prefix}bn{j + 1}.bias"])
            put(block_s, (bns[j], "mean"), sd[f"{prefix}bn{j + 1}.running_mean"])
            put(block_s, (bns[j], "var"), sd[f"{prefix}bn{j + 1}.running_var"])
        if has_down:
            put(block_p, (convs[-1], "kernel"),
                _torch_conv_to_hwio(sd[prefix + "downsample.0.weight"]))
            put(block_p, (bns[-1], "scale"), sd[prefix + "downsample.1.weight"])
            put(block_p, (bns[-1], "bias"), sd[prefix + "downsample.1.bias"])
            put(block_s, (bns[-1], "mean"), sd[prefix + "downsample.1.running_mean"])
            put(block_s, (bns[-1], "var"), sd[prefix + "downsample.1.running_var"])

    # projector g: torch Linear weight is (out, in) -> flax kernel (in, out);
    # the first layer consumes the flattened (C,4,4) feature map, so its
    # input indices must be permuted from torch's C-major flatten to NHWC.
    if "g.layers.0.weight" in sd and "g" in params:
        g = params["g"]
        w0 = sd["g.layers.0.weight"]
        feat_c = w0.shape[1] // 16  # spatial output is 4x4 (resnet.py surgery)
        put(g, ("Dense_0", "kernel"), torch_linear_on_flattened_conv(w0, (feat_c, 4, 4)))
        put(g, ("Dense_0", "bias"), sd["g.layers.0.bias"])
        put(g, ("Dense_1", "kernel"), sd["g.layers.2.weight"].T)
        put(g, ("Dense_1", "bias"), sd["g.layers.2.bias"])

    return params, batch_stats


def import_torch_checkpoint(path: str, params: dict, batch_stats: dict):
    """Load a reference ``.pth.tar`` checkpoint file and map its
    ``state_dict`` onto framework pytrees. Requires torch (CPU) at call time."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    return import_torch_simclr_state_dict(sd, params, batch_stats)


def _torch_mha_to_flax(sd, prefix: str, nheads: int):
    """torch ``nn.MultiheadAttention`` tensors -> flax
    ``MultiHeadDotProductAttention`` {query,key,value,out} subtrees."""
    d = sd[f"{prefix}.in_proj_weight"].shape[1]
    hd = d // nheads
    w = sd[f"{prefix}.in_proj_weight"]      # (3d, d) rows [q; k; v], y = W x
    b = sd[f"{prefix}.in_proj_bias"]        # (3d,)
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        out[name] = {
            "kernel": w[i * d:(i + 1) * d].T.reshape(d, nheads, hd),
            "bias": b[i * d:(i + 1) * d].reshape(nheads, hd),
        }
    wo = sd[f"{prefix}.out_proj.weight"]    # (d, d) over head-concat input
    out["out"] = {"kernel": wo.T.reshape(nheads, hd, d),
                  "bias": sd[f"{prefix}.out_proj.bias"]}
    return out


def import_torch_detr_state_dict(state_dict: dict[str, Any], params: dict,
                                 batch_stats: dict, nheads: int = 8
                                 ) -> tuple[dict, dict]:
    """Map a reference DETR classifier ``state_dict``
    (``DETR_Image_Classification.py:463-468``) onto this framework's DETR
    pytrees — completing the checkpoint-contract story for reference-trained
    DETR heads.

    Reference layout (``detr_CLA/models``): ``backbone.0.body.*`` (the
    frozen-BN SimCLR encoder ``f``), ``transformer.encoder.layers.{i}.
    {self_attn.*, linear1/2.*, norm1/2.*}``, ``transformer.decoder.layers.
    {i}.{self_attn.*, multihead_attn.*, linear1/2/3?.*, norm1/2/3.*}``,
    ``transformer.decoder.norm.*``, ``input_proj.{weight,bias}`` (Conv1d
    k=1 on the C-major-flattened feature, ``detr.py:41``),
    ``query_embed.weight``, ``class_embed.{weight,bias}``.

    Layer-norm/dense ordering per flax compact tracing: LayerNorm_0↔norm1,
    LayerNorm_1↔norm2, LayerNorm_2↔norm3, Dense_0↔linear1, Dense_1↔linear2,
    _MHA_0↔self_attn, _MHA_1↔multihead_attn (holds for both post- and
    pre-norm variants — verified against ``models/transformer.py``).
    """
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    batch_stats = copy.deepcopy(jax.tree.map(np.asarray, batch_stats))
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        if node[path[-1]].shape != value.shape:  # not assert: survives -O
            raise ValueError(f"checkpoint import shape mismatch at {path}: "
                             f"{value.shape} != {node[path[-1]].shape}")
        node[path[-1]] = value.astype(node[path[-1]].dtype)

    # ---- backbone: frozen-BN encoder under backbone.0.body.* -------------
    bb = "backbone.0.body."
    f_params = params["backbone_f"]
    f_stats = batch_stats["backbone_f"]
    put(f_params, ("conv1", "kernel"), _torch_conv_to_hwio(sd[bb + "conv1.weight"]))
    put(f_stats, ("bn1", "weight"), sd[bb + "bn1.weight"])
    put(f_stats, ("bn1", "bias"), sd[bb + "bn1.bias"])
    put(f_stats, ("bn1", "mean"), sd[bb + "bn1.running_mean"])
    put(f_stats, ("bn1", "var"), sd[bb + "bn1.running_var"])
    for name in list(f_params.keys()):
        if not name.startswith("layer"):
            continue
        stage, idx = name[5:].split("_")
        prefix = f"{bb}layer{stage}.{idx}."
        block_p, block_s = f_params[name], f_stats[name]
        convs = _sorted_slots(block_p, "Conv_")
        fbns = _sorted_slots(block_s, "FrozenBatchNorm_")
        has_down = (prefix + "downsample.0.weight") in sd
        n_main = len(convs) - (1 if has_down else 0)

        def put_frozen(slot, tkey):
            put(block_s, (slot, "weight"), sd[tkey + ".weight"])
            put(block_s, (slot, "bias"), sd[tkey + ".bias"])
            put(block_s, (slot, "mean"), sd[tkey + ".running_mean"])
            put(block_s, (slot, "var"), sd[tkey + ".running_var"])

        for j in range(n_main):
            put(block_p, (convs[j], "kernel"),
                _torch_conv_to_hwio(sd[f"{prefix}conv{j + 1}.weight"]))
            put_frozen(fbns[j], f"{prefix}bn{j + 1}")
        if has_down:
            put(block_p, (convs[-1], "kernel"),
                _torch_conv_to_hwio(sd[prefix + "downsample.0.weight"]))
            put_frozen(fbns[-1], prefix + "downsample.1")

    # ---- heads ------------------------------------------------------------
    w_proj = sd["input_proj.weight"][:, :, 0]        # Conv1d k=1 -> (out, in)
    feat_c = w_proj.shape[1] // 16                   # spatial output is 4x4
    put(params, ("input_proj", "kernel"),
        torch_linear_on_flattened_conv(w_proj, (feat_c, 4, 4)))
    put(params, ("input_proj", "bias"), sd["input_proj.bias"])
    put(params, ("query_embed",), sd["query_embed.weight"])
    put(params, ("class_embed", "kernel"), sd["class_embed.weight"].T)
    put(params, ("class_embed", "bias"), sd["class_embed.bias"])

    # ---- transformer -------------------------------------------------------
    tr = params["transformer"]

    def put_mha(layer, slot, prefix):
        """Validated wholesale replacement of one flax MHA subtree: every
        produced tensor must match the template's shape (catches a wrong
        ``nheads`` — any divisor of d_model reshapes successfully but
        scrambles the head split)."""
        new = _torch_mha_to_flax(sd, prefix, nheads)
        tmpl = layer[slot]["MultiHeadDotProductAttention_0"]
        for name, node in new.items():
            for k, v in node.items():
                want = np.asarray(tmpl[name][k]).shape
                if v.shape != want:
                    raise ValueError(
                        f"{prefix}.{name}.{k}: imported shape {v.shape} != "
                        f"model shape {want} (wrong --nheads?)")
                node[k] = v.astype(np.asarray(tmpl[name][k]).dtype)
        layer[slot]["MultiHeadDotProductAttention_0"] = new

    def put_common(layer, prefix, n_norms):
        put(layer, ("Dense_0", "kernel"), sd[f"{prefix}.linear1.weight"].T)
        put(layer, ("Dense_0", "bias"), sd[f"{prefix}.linear1.bias"])
        put(layer, ("Dense_1", "kernel"), sd[f"{prefix}.linear2.weight"].T)
        put(layer, ("Dense_1", "bias"), sd[f"{prefix}.linear2.bias"])
        for n in range(n_norms):
            put(layer, (f"LayerNorm_{n}", "scale"), sd[f"{prefix}.norm{n + 1}.weight"])
            put(layer, (f"LayerNorm_{n}", "bias"), sd[f"{prefix}.norm{n + 1}.bias"])

    for name in tr:
        if name.startswith("TransformerEncoderLayer_"):
            i = int(name.split("_")[-1])
            prefix = f"transformer.encoder.layers.{i}"
            layer = tr[name]
            put_mha(layer, "_MHA_0", f"{prefix}.self_attn")
            put_common(layer, prefix, 2)
        elif name.startswith("TransformerDecoderLayer_"):
            i = int(name.split("_")[-1])
            prefix = f"transformer.decoder.layers.{i}"
            layer = tr[name]
            put_mha(layer, "_MHA_0", f"{prefix}.self_attn")
            put_mha(layer, "_MHA_1", f"{prefix}.multihead_attn")
            put_common(layer, prefix, 3)
    put(tr, ("decoder_norm", "scale"), sd["transformer.decoder.norm.weight"])
    put(tr, ("decoder_norm", "bias"), sd["transformer.decoder.norm.bias"])
    if "transformer.encoder.norm.weight" in sd and "LayerNorm_0" in tr:
        put(tr, ("LayerNorm_0", "scale"), sd["transformer.encoder.norm.weight"])
        put(tr, ("LayerNorm_0", "bias"), sd["transformer.encoder.norm.bias"])

    # learned position embedding (sine has no parameters); reference names
    # row_embed/col_embed under the Joiner's slot 1 (position_encoding.py:58-80)
    if "backbone.1.row_embed.weight" in sd and "pos_embed" in params:
        put(params, ("pos_embed", "row_embed", "embedding"),
            sd["backbone.1.row_embed.weight"])
        put(params, ("pos_embed", "col_embed", "embedding"),
            sd["backbone.1.col_embed.weight"])

    return params, batch_stats


def import_torch_classifier_state_dict(state_dict: dict[str, Any],
                                       params: dict, num_fixations: int
                                       ) -> dict:
    """Map a reference linear-probe classifier ``state_dict``
    (``classifier_checkpoint.pth.tar``, ``Representation_Evaluation.py:
    528-533``; the MLR module's single ``linear`` layer) onto this
    framework's :class:`LogisticRegression` params.

    The probe consumes F concatenated per-fixation feature flattens; torch
    flattens each fixation's (C, 4, 4) map C-major
    (``Representation_Evaluation.py:622-654``) while this framework
    flattens NHWC, so each fixation block of the weight is permuted
    independently before transposing to the flax (in, out) kernel.
    """
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    w = sd["linear.weight"]          # (num_classes, F*C*16)
    b = sd["linear.bias"]
    out_dim, in_dim = w.shape
    if in_dim % (num_fixations * 16) != 0:
        raise ValueError(
            f"classifier import: input dim {in_dim} not divisible by "
            f"num_fixations*16 = {num_fixations * 16} "
            f"(checkpoint trained with a different --num-fixations/arch?)")
    per_fix = in_dim // num_fixations
    c = per_fix // 16                # spatial output is 4x4 (resnet surgery)
    kernel = np.concatenate(
        [torch_linear_on_flattened_conv(w[:, f * per_fix:(f + 1) * per_fix],
                                        (c, 4, 4))
         for f in range(num_fixations)], axis=0)       # (F*16*C, out)
    tmpl = params["Dense_0"]
    if tmpl["kernel"].shape != kernel.shape:
        raise ValueError(
            f"classifier import: kernel {kernel.shape} != model "
            f"{tmpl['kernel'].shape} (arch/num_fixations mismatch?)")
    tmpl["kernel"] = kernel.astype(tmpl["kernel"].dtype)
    tmpl["bias"] = b.astype(tmpl["bias"].dtype)
    return params


# ---------------------------------------------------------------------------
# PyTorch reference-checkpoint EXPORT (the inverse walks): models pretrained
# in this framework become consumable by the reference stack — the other half
# of the "checkpoint semantics match the PyTorch reference bit-for-layout"
# contract (``Model_Util.py:95-99`` writer, ``Contrastive_Learning.py:521-530``
# schema). Each exporter is the exact inverse of its importer above and is
# round-trip-tested (flax -> state_dict -> import -> identical leaves) plus
# forward-parity-tested against a reference-layout torch model.


def _flax_conv_to_torch(k: np.ndarray) -> np.ndarray:
    # flax HWIO -> torch OIHW
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def flax_linear_on_flattened_conv(kernel: np.ndarray,
                                  chw: tuple[int, int, int]) -> np.ndarray:
    """Inverse of :func:`torch_linear_on_flattened_conv`: convert a flax
    Dense kernel consuming the NHWC flatten of a feature map into the torch
    Linear weight consuming ``x.view(B, -1)`` of the NCHW map."""
    c, h, w = chw
    out_dim = kernel.shape[1]
    return np.ascontiguousarray(
        np.transpose(kernel.reshape(h, w, c, out_dim), (3, 2, 0, 1))
        .reshape(out_dim, c * h * w))


def export_torch_simclr_state_dict(params: dict, batch_stats: dict
                                   ) -> dict[str, np.ndarray]:
    """Emit a reference-layout SimCLR ``state_dict``
    (``f.conv1.weight`` ... ``g.layers.2.bias`` — the tree
    ``SimCLR_Module(f=resnet, g=MLP)`` saves at
    ``Contrastive_Learning.py:523``), inverse of
    :func:`import_torch_simclr_state_dict`. Values are numpy float32 (int64
    for ``num_batches_tracked``, which torch BatchNorm2d checkpoints carry).
    """
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    sd: dict[str, np.ndarray] = {}

    def put_bn(tkey, p_bn, s_bn):
        sd[tkey + ".weight"] = np.asarray(p_bn["scale"], np.float32)
        sd[tkey + ".bias"] = np.asarray(p_bn["bias"], np.float32)
        sd[tkey + ".running_mean"] = np.asarray(s_bn["mean"], np.float32)
        sd[tkey + ".running_var"] = np.asarray(s_bn["var"], np.float32)
        sd[tkey + ".num_batches_tracked"] = np.asarray(0, np.int64)

    f_params, f_stats = params["f"], batch_stats["f"]
    sd["f.conv1.weight"] = _flax_conv_to_torch(f_params["conv1"]["kernel"])
    put_bn("f.bn1", f_params["bn1"], f_stats["bn1"])

    for name in f_params:
        if not name.startswith("layer"):
            continue
        stage, idx = name[5:].split("_")
        prefix = f"f.layer{stage}.{idx}."
        block_p, block_s = f_params[name], f_stats[name]
        convs = _sorted_slots(block_p, "Conv_")
        bns = _sorted_slots(block_p, "BatchNorm_")
        has_down = _has_downsample(block_p, convs)
        n_main = len(convs) - (1 if has_down else 0)
        for j in range(n_main):
            sd[f"{prefix}conv{j + 1}.weight"] = _flax_conv_to_torch(
                block_p[convs[j]]["kernel"])
            put_bn(f"{prefix}bn{j + 1}", block_p[bns[j]], block_s[bns[j]])
        if has_down:
            sd[prefix + "downsample.0.weight"] = _flax_conv_to_torch(
                block_p[convs[-1]]["kernel"])
            put_bn(prefix + "downsample.1", block_p[bns[-1]], block_s[bns[-1]])

    if "g" in params:
        g = params["g"]
        k0 = np.asarray(g["Dense_0"]["kernel"])
        feat_c = k0.shape[0] // 16      # spatial output is 4x4 (resnet surgery)
        sd["g.layers.0.weight"] = flax_linear_on_flattened_conv(
            k0, (feat_c, 4, 4))
        sd["g.layers.0.bias"] = np.asarray(g["Dense_0"]["bias"], np.float32)
        sd["g.layers.2.weight"] = np.ascontiguousarray(
            np.asarray(g["Dense_1"]["kernel"]).T)
        sd["g.layers.2.bias"] = np.asarray(g["Dense_1"]["bias"], np.float32)
    return sd


def export_torch_classifier_state_dict(params: dict, num_fixations: int
                                       ) -> dict[str, np.ndarray]:
    """Emit the reference probe-classifier layout (the MLR module's single
    ``linear`` layer, ``classifier_checkpoint.pth.tar``), inverse of
    :func:`import_torch_classifier_state_dict`: each fixation block of the
    kernel is independently permuted back to torch's C-major flatten."""
    kernel = np.asarray(params["Dense_0"]["kernel"])   # (F*16*C, out)
    bias = np.asarray(params["Dense_0"]["bias"])
    in_dim, out_dim = kernel.shape
    if in_dim % (num_fixations * 16) != 0:
        raise ValueError(
            f"classifier export: input dim {in_dim} not divisible by "
            f"num_fixations*16 = {num_fixations * 16}")
    per_fix = in_dim // num_fixations
    c = per_fix // 16
    w = np.concatenate(
        [flax_linear_on_flattened_conv(
            kernel[f * per_fix:(f + 1) * per_fix], (c, 4, 4))
         for f in range(num_fixations)], axis=1)       # (out, F*C*16)
    return {"linear.weight": np.ascontiguousarray(w.astype(np.float32)),
            "linear.bias": bias.astype(np.float32)}


def _flax_mha_to_torch(tree: dict, prefix: str) -> dict[str, np.ndarray]:
    """Inverse of :func:`_torch_mha_to_flax`: flax MHA subtree ->
    ``nn.MultiheadAttention`` tensors (packed qkv ``in_proj``)."""
    d = np.asarray(tree["out"]["bias"]).shape[0]
    rows = []
    brows = []
    for name in ("query", "key", "value"):
        k = np.asarray(tree[name]["kernel"]).reshape(d, d)   # (d, nheads*hd)
        rows.append(np.ascontiguousarray(k.T))               # y = W x rows
        brows.append(np.asarray(tree[name]["bias"]).reshape(d))
    wo = np.asarray(tree["out"]["kernel"]).reshape(d, d)     # (nheads*hd, d)
    return {
        f"{prefix}.in_proj_weight": np.concatenate(rows, 0).astype(np.float32),
        f"{prefix}.in_proj_bias": np.concatenate(brows, 0).astype(np.float32),
        f"{prefix}.out_proj.weight": np.ascontiguousarray(wo.T).astype(np.float32),
        f"{prefix}.out_proj.bias": np.asarray(tree["out"]["bias"], np.float32),
    }


def export_torch_detr_state_dict(params: dict, batch_stats: dict
                                 ) -> dict[str, np.ndarray]:
    """Emit a reference-layout DETR classifier ``state_dict``
    (``detr_classifier_checkpoint.pth.tar``, the ``detr_CLA/models`` tree:
    ``backbone.0.body.*`` frozen-BN encoder, ``transformer.*``,
    ``input_proj``/``query_embed``/``class_embed``), inverse of
    :func:`import_torch_detr_state_dict`. Frozen-BN buffers carry no
    ``num_batches_tracked`` (``backbone.py:35-70`` registers only
    weight/bias/running_mean/running_var)."""
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    sd: dict[str, np.ndarray] = {}

    def put_frozen(tkey, s_bn):
        sd[tkey + ".weight"] = np.asarray(s_bn["weight"], np.float32)
        sd[tkey + ".bias"] = np.asarray(s_bn["bias"], np.float32)
        sd[tkey + ".running_mean"] = np.asarray(s_bn["mean"], np.float32)
        sd[tkey + ".running_var"] = np.asarray(s_bn["var"], np.float32)

    bb = "backbone.0.body."
    f_params, f_stats = params["backbone_f"], batch_stats["backbone_f"]
    sd[bb + "conv1.weight"] = _flax_conv_to_torch(f_params["conv1"]["kernel"])
    put_frozen(bb + "bn1", f_stats["bn1"])
    for name in f_params:
        if not name.startswith("layer"):
            continue
        stage, idx = name[5:].split("_")
        prefix = f"{bb}layer{stage}.{idx}."
        block_p, block_s = f_params[name], f_stats[name]
        convs = _sorted_slots(block_p, "Conv_")
        fbns = _sorted_slots(block_s, "FrozenBatchNorm_")
        has_down = _has_downsample(block_p, convs)
        n_main = len(convs) - (1 if has_down else 0)
        for j in range(n_main):
            sd[f"{prefix}conv{j + 1}.weight"] = _flax_conv_to_torch(
                block_p[convs[j]]["kernel"])
            put_frozen(f"{prefix}bn{j + 1}", block_s[fbns[j]])
        if has_down:
            sd[prefix + "downsample.0.weight"] = _flax_conv_to_torch(
                block_p[convs[-1]]["kernel"])
            put_frozen(prefix + "downsample.1", block_s[fbns[-1]])

    # heads
    k = np.asarray(params["input_proj"]["kernel"])     # (16*C, hidden)
    feat_c = k.shape[0] // 16
    sd["input_proj.weight"] = flax_linear_on_flattened_conv(
        k, (feat_c, 4, 4))[:, :, None]                 # Conv1d k=1: (out, in, 1)
    sd["input_proj.bias"] = np.asarray(params["input_proj"]["bias"], np.float32)
    sd["query_embed.weight"] = np.asarray(params["query_embed"], np.float32)
    sd["class_embed.weight"] = np.ascontiguousarray(
        np.asarray(params["class_embed"]["kernel"]).T.astype(np.float32))
    sd["class_embed.bias"] = np.asarray(params["class_embed"]["bias"], np.float32)

    # transformer
    tr = params["transformer"]

    def put_common(layer, prefix, n_norms):
        sd[f"{prefix}.linear1.weight"] = np.ascontiguousarray(
            np.asarray(layer["Dense_0"]["kernel"]).T.astype(np.float32))
        sd[f"{prefix}.linear1.bias"] = np.asarray(layer["Dense_0"]["bias"], np.float32)
        sd[f"{prefix}.linear2.weight"] = np.ascontiguousarray(
            np.asarray(layer["Dense_1"]["kernel"]).T.astype(np.float32))
        sd[f"{prefix}.linear2.bias"] = np.asarray(layer["Dense_1"]["bias"], np.float32)
        for n in range(n_norms):
            sd[f"{prefix}.norm{n + 1}.weight"] = np.asarray(
                layer[f"LayerNorm_{n}"]["scale"], np.float32)
            sd[f"{prefix}.norm{n + 1}.bias"] = np.asarray(
                layer[f"LayerNorm_{n}"]["bias"], np.float32)

    for name in tr:
        if name.startswith("TransformerEncoderLayer_"):
            i = int(name.split("_")[-1])
            prefix = f"transformer.encoder.layers.{i}"
            layer = tr[name]
            sd.update(_flax_mha_to_torch(
                layer["_MHA_0"]["MultiHeadDotProductAttention_0"],
                f"{prefix}.self_attn"))
            put_common(layer, prefix, 2)
        elif name.startswith("TransformerDecoderLayer_"):
            i = int(name.split("_")[-1])
            prefix = f"transformer.decoder.layers.{i}"
            layer = tr[name]
            sd.update(_flax_mha_to_torch(
                layer["_MHA_0"]["MultiHeadDotProductAttention_0"],
                f"{prefix}.self_attn"))
            sd.update(_flax_mha_to_torch(
                layer["_MHA_1"]["MultiHeadDotProductAttention_0"],
                f"{prefix}.multihead_attn"))
            put_common(layer, prefix, 3)
    sd["transformer.decoder.norm.weight"] = np.asarray(
        tr["decoder_norm"]["scale"], np.float32)
    sd["transformer.decoder.norm.bias"] = np.asarray(
        tr["decoder_norm"]["bias"], np.float32)
    if "LayerNorm_0" in tr:     # pre-norm variant's final encoder norm
        sd["transformer.encoder.norm.weight"] = np.asarray(
            tr["LayerNorm_0"]["scale"], np.float32)
        sd["transformer.encoder.norm.bias"] = np.asarray(
            tr["LayerNorm_0"]["bias"], np.float32)
    if "pos_embed" in params and isinstance(params["pos_embed"], dict) \
            and "row_embed" in params["pos_embed"]:
        sd["backbone.1.row_embed.weight"] = np.asarray(
            params["pos_embed"]["row_embed"]["embedding"], np.float32)
        sd["backbone.1.col_embed.weight"] = np.asarray(
            params["pos_embed"]["col_embed"]["embedding"], np.float32)
    return sd


def save_torch_checkpoint(state_dict: dict[str, np.ndarray], path: str, *,
                          epoch: int = 0, best_prec1: float = 0.0,
                          optimizer: Any = None,
                          extra: dict | None = None) -> None:
    """Write a reference-schema ``.pth.tar`` via ``torch.save``:
    ``{epoch, state_dict, best_prec1, optimizer, **extra}``
    (``Contrastive_Learning.py:521-530`` — SimCLR adds ``loss_history``/
    ``top1_acc_history``/``top5_acc_history``/``total_time`` through
    ``extra``; probe/DETR use the 4-key schema,
    ``Representation_Evaluation.py:528-533``). Requires torch at call time.
    """
    import torch

    payload = {
        "epoch": int(epoch),
        # torch.tensor copies — jax device_get arrays are non-writable
        "state_dict": {k: torch.tensor(np.asarray(v))
                       for k, v in state_dict.items()},
        "best_prec1": best_prec1,
        "optimizer": optimizer,
    }
    payload.update(extra or {})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(payload, path)


def import_torch_detr_checkpoint(path: str, params: dict, batch_stats: dict,
                                 nheads: int = 8):
    """Load a reference ``detr_classifier_checkpoint.pth.tar`` and map it
    onto framework DETR pytrees; returns ``(params, batch_stats, payload)``
    so callers can restore epoch/best_prec1."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    p, s = import_torch_detr_state_dict(sd, params, batch_stats, nheads)
    return p, s, ckpt
