from apollo_vision_net_tpu.configs.base import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    bev_tiny_det,
    bev_smoke_det,
)

__all__ = [
    "DataConfig", "ExperimentConfig", "ModelConfig", "OptimConfig",
    "bev_tiny_det", "bev_smoke_det",
]
