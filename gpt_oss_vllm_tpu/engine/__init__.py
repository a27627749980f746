from gpt_oss_vllm_tpu.engine.kv_cache import BlockAllocator, KVCache
from gpt_oss_vllm_tpu.engine.request import Request, SamplingParams

__all__ = ["KVCache", "BlockAllocator", "Request", "SamplingParams"]
