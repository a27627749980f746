from gpt_oss_vllm_tpu.serving.tokenizer import Tokenizer, get_tokenizer

__all__ = ["Tokenizer", "get_tokenizer"]
