from .pytree import pytree_dataclass, field
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step
from .metrics import MetricsLogger
from .config import (
    FlowConfig, TrainConfig, SamplerConfig, MeshConfig, RunConfig,
    load_config, build_flow,
)
from .profiling import trace, annotate, StepTimer
from .resilience import run_checkpointed, heartbeat
from .debugging import nan_guard, assert_finite, assert_replicated_consistent

__all__ = [
    "pytree_dataclass", "field",
    "save_checkpoint", "restore_checkpoint", "latest_step",
    "MetricsLogger",
    "FlowConfig", "TrainConfig", "SamplerConfig", "MeshConfig", "RunConfig",
    "load_config", "build_flow",
    "trace", "annotate", "StepTimer",
    "run_checkpointed", "heartbeat",
    "nan_guard", "assert_finite", "assert_replicated_consistent",
]
