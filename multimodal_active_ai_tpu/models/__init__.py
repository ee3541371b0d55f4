from multimodal_active_ai_tpu.models.resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
    encoder_feature_dim,
    build_encoder,
)
from multimodal_active_ai_tpu.models.mlp import MLP, LogisticRegression, Identity
from multimodal_active_ai_tpu.models.simclr import SimCLRModule
from multimodal_active_ai_tpu.models.qnet import DQN, build_dqn

__all__ = [
    "ResNet", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d", "wide_resnet50_2", "wide_resnet101_2",
    "encoder_feature_dim", "build_encoder",
    "MLP", "LogisticRegression", "Identity", "SimCLRModule", "DQN", "build_dqn",
]
