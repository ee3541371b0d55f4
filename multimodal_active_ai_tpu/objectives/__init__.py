from multimodal_active_ai_tpu.objectives.ntxent import contrastive_loss, naive_ntxent_loss
from multimodal_active_ai_tpu.objectives.set_criterion import SetCriterion
from multimodal_active_ai_tpu.objectives.dqn_loss import dqn_bellman_loss

__all__ = [
    "contrastive_loss",
    "naive_ntxent_loss",
    "SetCriterion",
    "dqn_bellman_loss",
]
