"""Meters, metrics, checkpoint, config tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_active_ai_tpu.config import (
    ContrastiveConfig,
    DETRConfig,
    RLSConfig,
    parse_into,
)
from multimodal_active_ai_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_like,
    save_checkpoint,
)
from multimodal_active_ai_tpu.utils.meters import AverageMeter, perf_line, speed_line
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


def test_average_meter_semantics():
    m = AverageMeter()
    m.update(2.0, n=2)
    m.update(4.0)
    assert m.val == 4.0 and m.sum == 8.0 and m.count == 3
    np.testing.assert_allclose(m.avg, 8.0 / 3)
    state = m.state_dict()
    m2 = AverageMeter()
    m2.load_state_dict(state)
    assert m2.avg == m.avg


def test_top_k_accuracy_index_and_onehot():
    preds = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    target = jnp.array([1, 2])
    assert float(top_k_accuracy(preds, target, 1)) == 0.5
    assert float(top_k_accuracy(preds, target, 3)) == 1.0
    onehot = jax.nn.one_hot(target, 3)
    assert float(top_k_accuracy(preds, onehot, 1)) == 0.5


def test_log_line_formats():
    bt, ls = AverageMeter(), AverageMeter()
    bt.update(0.5)
    ls.update(1.234)
    line = speed_line(3, 10, 100, bt, ls, 512)
    assert "Epoch: [3][10/100]" in line and "Speed" in line
    pl = perf_line(0.5, 0.9, 0.6, 512, 0.25)
    assert "##Perf" in pl


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "epoch": 3,
        "state_dict": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "best_prec1": 0.75,
        "loss_history": [1.0, 0.5],
    }
    f = str(tmp_path / "checkpoint.msgpack")
    b = str(tmp_path / "model_best.msgpack")
    save_checkpoint(state, is_best=True, filename=f, best_filename=b)
    assert os.path.exists(f) and os.path.exists(b)
    loaded = load_checkpoint(f)
    assert loaded["epoch"] == 3
    np.testing.assert_array_equal(loaded["state_dict"]["w"], state["state_dict"]["w"])


def test_restore_like():
    template = {"a": jnp.zeros((2, 2), jnp.float32)}
    restored = restore_like(template, {"a": np.ones((2, 2), np.float64)})
    assert restored["a"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(restored["a"]), 1.0)


def test_contrastive_cli_parity():
    """Reference command lines parse with identical flag names/defaults
    (``Contrastive_Learning.py:96-178``)."""
    cfg = parse_into(ContrastiveConfig, [
        "/data", "--arch", "ResNet50", "-b", "128", "-f", "5",
        "--lr", "0.3", "--lrs", "sqrt", "--temperature", "0.1",
        "--optimizer", "lars", "--dataset", "imagenet", "-t", "-v",
    ])
    assert cfg.data == "/data" and cfg.arch == "ResNet50"
    assert cfg.batch_size == 128 and cfg.num_fixations == 5
    assert cfg.lrs == "sqrt" and cfg.optimizer == "lars"
    assert cfg.test and cfg.verbose
    d = ContrastiveConfig()
    assert d.epochs == 190 and d.batch_size == 256 and d.num_fixations == 10
    assert d.temperature == 0.05 and d.hue == 90.0


def test_detr_and_rls_cli_defaults():
    d = DETRConfig()
    assert d.hidden_dim == 256 and d.num_queries == 10 and d.enc_layers == 6
    assert d.lr_backbone == 1e-5 and d.clip_max_norm == 0.1
    r = RLSConfig()
    assert r.gamma == 0.999 and r.num_of_actions == 100
    assert r.eps_start == 0.9 and r.target_update_freq == 3
    cfg = parse_into(RLSConfig, ["/ckpt", "/data", "--dqn", "ResNet34",
                                 "--num-of-actions", "50"])
    assert cfg.backbone_path == "/ckpt" and cfg.dqn == "ResNet34"
    assert cfg.num_of_actions == 50


def test_checkpoint_roundtrip_with_optax_state(tmp_path):
    """Full driver-schema checkpoint (incl. tuple-structured optax chain
    state) must round-trip through msgpack — the bug the workflow smoke
    caught: msgpack cannot serialize tuples directly."""
    import optax
    from multimodal_active_ai_tpu.utils import checkpoint as ckpt

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = tx.init(params)
    path = str(tmp_path / "checkpoint.msgpack")
    ckpt.save_checkpoint({
        "epoch": 3,
        "state_dict": {"params": params},
        "best_prec1": 12.5,
        "optimizer": opt_state,
        "loss_history": np.asarray([1.0, 0.5]),
    }, is_best=False, filename=path)
    payload = ckpt.load_checkpoint(path)
    assert int(payload["epoch"]) == 3
    restored_params = ckpt.restore_like(params, payload["state_dict"]["params"])
    np.testing.assert_array_equal(np.asarray(restored_params["w"]),
                                  np.asarray(params["w"]))
    restored_opt = ckpt.restore_like(opt_state, payload["optimizer"])
    for a, b in zip(jax.tree.leaves(restored_opt), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_create_hybrid_mesh_single_slice_fallback():
    """On a single-slice (CPU) topology the hybrid mesh is the plain mesh."""
    from multimodal_active_ai_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, create_hybrid_mesh)

    mesh = create_hybrid_mesh()
    assert set(mesh.axis_names) == {DATA_AXIS, MODEL_AXIS}
    assert mesh.size == len(jax.devices())


def test_meter_resumes_from_readonly_state():
    """Regression: msgpack-restored scalars are read-only numpy arrays; the
    meter must keep accumulating after load_state_dict (resume path)."""
    from multimodal_active_ai_tpu.utils.meters import AverageMeter

    m = AverageMeter()
    m.update(2.0, 3)
    state = {k: np.asarray(v) for k, v in m.state_dict().items()}
    for v in state.values():
        v.setflags(write=False)
    m2 = AverageMeter()
    m2.load_state_dict(state)
    m2.update(4.0)  # raised ValueError before the fix
    assert m2.count == 4 and abs(m2.avg - 2.5) < 1e-9


def test_async_checkpointer_nonblocking_ordered_and_raises(tmp_path, monkeypatch):
    """Round-3 verdict #8: the epoch boundary must not block on
    serialization. save() returns before the write lands; saves land in
    order (at most one in flight); wait() surfaces a worker error."""
    from time import perf_counter, sleep

    from multimodal_active_ai_tpu.utils import checkpoint as ckpt

    orig = ckpt._write_checkpoint

    def slow_write(*a, **k):
        sleep(0.6)
        orig(*a, **k)

    monkeypatch.setattr(ckpt, "_write_checkpoint", slow_write)
    f = str(tmp_path / "c.msgpack")
    b = str(tmp_path / "best.msgpack")
    saver = ckpt.AsyncCheckpointer()
    t0 = perf_counter()
    saver.save({"epoch": np.int64(1), "best_prec1": 0.5}, True,
               filename=f, best_filename=b)
    assert perf_counter() - t0 < 0.3            # returned before the write
    t0 = perf_counter()
    saver.save({"epoch": np.int64(2), "best_prec1": 0.7}, False,
               filename=f, best_filename=b)
    assert perf_counter() - t0 >= 0.5           # joined the in-flight save
    saver.wait()
    assert int(ckpt.load_checkpoint(f)["epoch"]) == 2
    assert int(ckpt.load_checkpoint(b)["epoch"]) == 1   # best copy of save 1

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt, "_write_checkpoint", boom)
    saver.save({"epoch": np.int64(3)}, False, filename=f, best_filename=b)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        saver.wait()
