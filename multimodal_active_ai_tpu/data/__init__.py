from multimodal_active_ai_tpu.data.readers import (
    compute_shard_size,
    list_coco_images,
    list_image_folder,
    shard_files,
)
from multimodal_active_ai_tpu.data.loader import HostLoader
from multimodal_active_ai_tpu.data.synthetic import SyntheticReader

__all__ = [
    "compute_shard_size",
    "list_coco_images",
    "list_image_folder",
    "shard_files",
    "HostLoader",
    "SyntheticReader",
]
