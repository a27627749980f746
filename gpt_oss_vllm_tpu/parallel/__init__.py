from gpt_oss_vllm_tpu.parallel.mesh import make_mesh
from gpt_oss_vllm_tpu.parallel.sharding import (
    cache_pspec,
    params_pspecs,
    shard_params,
)

__all__ = ["make_mesh", "params_pspecs", "cache_pspec", "shard_params"]
