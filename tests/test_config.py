"""CLI flag-surface parity tests: the drivers must accept the reference's
invocation style (``python <script>.py DATA --arch ResNet50 -b 256 -f 10 …``,
DETR's underscore transformer flags, the RLS DQN flags)."""

import pytest

from multimodal_active_ai_tpu.config import (
    ContrastiveConfig,
    DETRConfig,
    EvalConfig,
    RLSConfig,
    parse_into,
)


def test_contrastive_reference_invocation():
    cfg = parse_into(ContrastiveConfig, [
        "/data", "--arch", "ResNet50", "-b", "256", "-f", "10",
        "--lr", "0.3", "--lrs", "sqrt", "--optimizer", "lars",
        "--warmup-epochs", "5", "--epochs", "100", "-t", "-v",
        "--resume", "ck.msgpack",
    ])
    assert cfg.data == "/data" and cfg.arch == "ResNet50"
    assert cfg.batch_size == 256 and cfg.num_fixations == 10
    assert cfg.lr == 0.3 and cfg.lrs == "sqrt" and cfg.optimizer == "lars"
    assert cfg.test and cfg.verbose and cfg.resume == "ck.msgpack"


def test_detr_reference_invocation():
    cfg = parse_into(DETRConfig, [
        "backbone.msgpack", "/data", "--backbone", "ResNet50",
        "--enc_layers", "2", "--dec_layers", "3", "--hidden_dim", "128",
        "--nheads", "4", "--dim_feedforward", "512", "--num_queries", "10",
        "--lr_backbone", "1e-5", "--clip_max_norm", "0.1",
        "--position_embedding", "learned", "--pre_norm",
    ])
    assert cfg.backbone_path == "backbone.msgpack"
    assert cfg.enc_layers == 2 and cfg.dec_layers == 3
    assert cfg.hidden_dim == 128 and cfg.nheads == 4
    assert cfg.position_embedding == "learned" and cfg.pre_norm


def test_rls_adds_dqn_flags():
    cfg = parse_into(RLSConfig, [
        "backbone.msgpack", "/data", "--gamma", "0.95",
        "--eps-start", "0.8", "--eps-end", "0.1", "--eps-decay", "20",
        "--replay-memory-capacity", "500", "--target-update-freq", "2",
        "--dqn-batch-size", "64",
    ])
    assert cfg.gamma == 0.95 and cfg.eps_start == 0.8
    assert cfg.replay_memory_capacity == 500 and cfg.dqn_batch_size == 64
    assert cfg.enc_layers == 6  # inherits the DETR transformer defaults


def test_default_on_booleans_have_an_off_switch():
    # --bf16 defaults on; without --no-bf16 the drivers could never run f32
    # from the CLI (the knob an f32-vs-bf16 learning control needs)
    for cls, pre in [(ContrastiveConfig, ["/data"]),
                     (DETRConfig, ["bb.msgpack", "/data"]),
                     (RLSConfig, ["bb.msgpack", "/data"]),
                     (EvalConfig, ["model.msgpack", "/data"])]:
        assert parse_into(cls, pre).bf16
        assert not parse_into(cls, pre + ["--no-bf16"]).bf16
        assert parse_into(cls, pre + ["--bf16"]).bf16


def test_eval_invocation():
    cfg = parse_into(EvalConfig, [
        "model.msgpack", "/data", "--arch", "ResNet34", "-f", "4", "-e",
    ])
    assert cfg.model == "model.msgpack" and cfg.arch == "ResNet34"
    assert cfg.num_fixations == 4 and cfg.evaluate


def test_unknown_flag_rejected():
    with pytest.raises(SystemExit):
        parse_into(ContrastiveConfig, ["/data", "--definitely-not-a-flag"])
