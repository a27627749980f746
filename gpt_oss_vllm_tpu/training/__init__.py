from gpt_oss_vllm_tpu.training.train_step import (
    TrainState,
    make_sharded_train_step,
    next_token_loss,
)

__all__ = ["TrainState", "make_sharded_train_step", "next_token_loss"]
