"""Typed experiment configs.

Replaces the reference's mmcv Config/plugin registry (SURVEY.md §5: the
single most load-bearing convention there) with plain frozen dataclasses and
explicit factory functions — one function per experiment, mirroring the
reference's one-cfg-file-per-experiment granularity (projects/configs/...).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # BEV grid
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Tuple[float, ...] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    num_points_in_pillar: int = 4
    # queries / classes
    num_query: int = 900
    num_classes: int = 10
    code_size: int = 10
    # trunk
    embed_dims: int = 256
    encoder_layers: int = 3
    decoder_layers: int = 6
    feedforward_channels: int = 512
    num_cams: int = 6
    num_feature_levels: int = 1
    backbone_type: str = "resnet"
    backbone_depth: int = 50
    backbone_out_indices: Tuple[int, ...] = (3,)
    neck_type: str = "fpn"
    group_detr: int = 1
    # inputs
    img_shape: Tuple[int, int] = (480, 800)  # post-pipeline (H, W)
    queue_length: int = 3
    # behaviour
    use_grid_mask: bool = True
    rotate_prev_bev: bool = True
    use_shift: bool = True
    use_can_bus: bool = True
    shift_current_refs: bool = True  # reference aliasing-bug parity
    attn_logits_clamp: Optional[float] = None
    video_test_mode: bool = True
    msda_impl: str = "auto"
    # tasks
    with_occupancy: bool = False
    with_map: bool = False
    # occupancy (Apollo det+occ: 200x200x16 @0.5m, occ_dims 128)
    occupancy_classes: int = 16
    occ_xdim: int = 200
    occ_ydim: int = 200
    occ_zdim: int = 16
    occ_dims: int = 128
    occ_head_type: str = "cnn"
    predict_flow: bool = False
    occ_loss_type: str = "CustomFocalLoss"
    # map (MapTR v1 protocol)
    num_map_vec: int = 50
    map_num_pts: int = 20
    map_num_classes: int = 3
    map_decoder_layers: int = 6
    map_shift_pattern: str = "v2"

    @property
    def map_patch_size(self) -> Tuple[float, float]:
        """(patch_h, patch_w) — derived from pc_range like the reference's
        VectorizedLocalMap (det_occ_map_dataset.py:300-307)."""
        return (
            self.pc_range[4] - self.pc_range[1],
            self.pc_range[3] - self.pc_range[0],
        )


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 2e-4
    weight_decay: float = 0.01
    backbone_lr_mult: float = 0.1  # paramwise_cfg img_backbone lr_mult
    grad_clip_norm: float = 35.0   # optimizer_config grad_clip max_norm
    warmup_iters: int = 500
    warmup_ratio: float = 1.0 / 3.0
    min_lr_ratio: float = 1e-3     # CosineAnnealing min_lr_ratio
    total_steps: int = 100_000


@dataclasses.dataclass(frozen=True)
class DataConfig:
    batch_size_per_device: int = 1
    max_gt_boxes: int = 64
    img_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    img_std: Tuple[float, ...] = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model: ModelConfig
    optim: OptimConfig = OptimConfig()
    data: DataConfig = DataConfig()
    compute_dtype: str = "float32"  # or "bfloat16"


def bev_tiny_det() -> ExperimentConfig:
    """projects/configs/bevformer/bev_tiny_det.py — R50, 200×200 BEV,
    900 queries, 3 encoder / 6 decoder layers, queue 3."""
    return ExperimentConfig(name="bev_tiny_det", model=ModelConfig())


def bev_tiny_det_occ_apollo() -> ExperimentConfig:
    """projects/configs/bevformer/bev_tiny_det_occ_apollo.py — DLA-34 +
    SECONDFPNV2, 50×50 BEV, group_detr=11 (900 queries/group), CNN-upsample
    occupancy 200×200×16 @0.5m, CustomFocal+lovász+affinity losses."""
    return ExperimentConfig(
        name="bev_tiny_det_occ_apollo",
        model=ModelConfig(
            bev_h=50, bev_w=50,
            backbone_type="dla", backbone_out_indices=(3, 4, 5),
            neck_type="secondfpn",
            num_query=900 * 11, group_detr=11,
            with_occupancy=True,
        ),
        compute_dtype="bfloat16",
    )


def bev_tiny_det_map_apollo() -> ExperimentConfig:
    """projects/configs/bevformer/bev_tiny_det_map_apollo.py — det+map:
    DLA-34 + SECONDFPNV2, 50×50 BEV, queue 3, 900 det queries, 50×20 map
    point queries (cfg:74-246)."""
    return ExperimentConfig(
        name="bev_tiny_det_map_apollo",
        model=ModelConfig(
            bev_h=50, bev_w=50,
            backbone_type="dla", backbone_out_indices=(3, 4, 5),
            neck_type="secondfpn",
            with_map=True,
        ),
        compute_dtype="bfloat16",
    )


def bev_smoke_det_occ() -> ExperimentConfig:
    """CI-sized det+occ."""
    return ExperimentConfig(
        name="bev_smoke_det_occ",
        model=ModelConfig(
            bev_h=8, bev_w=8, num_query=24, embed_dims=32,
            encoder_layers=1, decoder_layers=2, feedforward_channels=64,
            num_cams=2, img_shape=(64, 96), queue_length=2,
            group_detr=2, with_occupancy=True,
            occ_xdim=32, occ_ydim=32, occ_zdim=4, occ_dims=16,
        ),
        data=DataConfig(max_gt_boxes=8),
        optim=OptimConfig(warmup_iters=2, total_steps=100),
    )


def bev_smoke_det_map() -> ExperimentConfig:
    """CI-sized det+map."""
    return ExperimentConfig(
        name="bev_smoke_det_map",
        model=ModelConfig(
            bev_h=8, bev_w=8, num_query=12, embed_dims=32,
            encoder_layers=1, decoder_layers=2, feedforward_channels=64,
            num_cams=2, img_shape=(64, 96), queue_length=2,
            with_map=True, num_map_vec=5, map_num_pts=4,
            map_decoder_layers=2,
        ),
        data=DataConfig(max_gt_boxes=8),
        optim=OptimConfig(warmup_iters=2, total_steps=100),
    )


def bev_smoke_det() -> ExperimentConfig:
    """Small-everything variant for CI / CPU-mesh tests (the analog of the
    reference's smoke_det_map_forward_train.py path)."""
    return ExperimentConfig(
        name="bev_smoke_det",
        model=ModelConfig(
            bev_h=8, bev_w=8, num_query=12, embed_dims=32,
            encoder_layers=1, decoder_layers=2, feedforward_channels=64,
            num_cams=2, img_shape=(64, 96), queue_length=2,
        ),
        data=DataConfig(max_gt_boxes=8),
        optim=OptimConfig(warmup_iters=2, total_steps=100),
    )
