from multimodal_active_ai_tpu.rl.replay_memory import ReplayMemory, Transition
from multimodal_active_ai_tpu.rl.policy import (
    eps_threshold,
    select_action,
    select_action_from_policy,
    select_random_action,
)

__all__ = [
    "ReplayMemory",
    "Transition",
    "eps_threshold",
    "select_action",
    "select_action_from_policy",
    "select_random_action",
]
