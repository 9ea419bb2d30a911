from apollo_vision_net_tpu.configs.base import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    bev_smoke_det,
    bev_smoke_det_map,
    bev_smoke_det_occ,
    bev_tiny_det,
    bev_tiny_det_map_apollo,
    bev_tiny_det_occ_apollo,
)

__all__ = [
    "DataConfig", "ExperimentConfig", "ModelConfig", "OptimConfig",
    "bev_smoke_det", "bev_smoke_det_map", "bev_smoke_det_occ",
    "bev_tiny_det", "bev_tiny_det_map_apollo", "bev_tiny_det_occ_apollo",
]
