from multimodal_active_ai_tpu.utils.meters import AverageMeter
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy

__all__ = ["AverageMeter", "top_k_accuracy"]
