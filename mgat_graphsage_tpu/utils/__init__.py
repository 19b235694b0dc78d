from .backend import probe_backend
from .logging import MetricLogger, read_jsonl
from .profiling import StepTimer, device_memory_stats, trace

__all__ = ["MetricLogger", "read_jsonl", "StepTimer",
           "device_memory_stats", "trace", "probe_backend"]
