from apollo_vision_net_tpu.configs.base import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    bev_base_occ,
    bev_smoke_det,
    bev_smoke_det_map,
    bev_smoke_det_occ,
    bev_tiny_det,
    bev_tiny_det_map_apollo,
    bev_tiny_det_mapv2,
    bev_tiny_det_occ_apollo,
    hybrid_tiny_occ,
    semantic_kitti_occ,
    smoke_det_mapv2,
    smoke_hybrid_occ,
    smoke_voxel_occ,
    voxel_tiny_occ,
)

__all__ = [
    "DataConfig", "ExperimentConfig", "ModelConfig", "OptimConfig",
    "bev_base_occ", "bev_smoke_det", "bev_smoke_det_map",
    "bev_smoke_det_occ", "bev_tiny_det", "bev_tiny_det_map_apollo",
    "bev_tiny_det_mapv2", "bev_tiny_det_occ_apollo", "hybrid_tiny_occ",
    "semantic_kitti_occ", "smoke_det_mapv2", "smoke_hybrid_occ",
    "smoke_voxel_occ", "voxel_tiny_occ",
]
