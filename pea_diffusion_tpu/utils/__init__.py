from .metrics import MetricLogger, ProfilerWindow

__all__ = ["MetricLogger", "ProfilerWindow"]
