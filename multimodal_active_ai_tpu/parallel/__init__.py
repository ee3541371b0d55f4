from multimodal_active_ai_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    initialize_distributed,
    local_batch_slice,
)
from multimodal_active_ai_tpu.parallel.collectives import cross_replica_concat

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "create_mesh",
    "initialize_distributed",
    "local_batch_slice",
    "cross_replica_concat",
]
