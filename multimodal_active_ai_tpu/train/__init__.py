from multimodal_active_ai_tpu.train.schedule import simclr_learning_rate
from multimodal_active_ai_tpu.train.optimizers import get_optimizer

__all__ = ["simclr_learning_rate", "get_optimizer"]
