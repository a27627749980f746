from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
from gpt_oss_vllm_tpu.checkpoint.unsloth import (
    UnslothCheckpointReader,
    write_synthetic_unsloth_checkpoint,
)

__all__ = [
    "TensorStore",
    "UnslothCheckpointReader",
    "write_synthetic_unsloth_checkpoint",
]
