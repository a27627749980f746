from gpt_oss_vllm_tpu.utils.telemetry import device_memory_stats, log_memory, StepTimer

__all__ = ["device_memory_stats", "log_memory", "StepTimer"]
