from gpt_oss_vllm_tpu.models.params import (
    LayerParams,
    ModelParams,
    load_params_from_store,
    random_params,
)

__all__ = [
    "LayerParams",
    "ModelParams",
    "load_params_from_store",
    "random_params",
]
