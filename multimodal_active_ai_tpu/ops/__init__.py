from multimodal_active_ai_tpu.ops import image_ops, retina

__all__ = ["image_ops", "retina"]
