from multimodal_active_ai_tpu.utils.meters import AverageMeter
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy
from multimodal_active_ai_tpu.utils.rng import epoch_key_stream, host_key_stream

__all__ = ["AverageMeter", "top_k_accuracy", "epoch_key_stream",
           "host_key_stream"]
