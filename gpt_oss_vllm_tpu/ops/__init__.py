from gpt_oss_vllm_tpu.ops.linear import quantized_linear
from gpt_oss_vllm_tpu.ops.rope import apply_rope, yarn_rope_tables

__all__ = ["quantized_linear", "apply_rope", "yarn_rope_tables"]
