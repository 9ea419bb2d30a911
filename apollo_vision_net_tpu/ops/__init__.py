from apollo_vision_net_tpu.ops.msda import ms_deform_attn
from apollo_vision_net_tpu.ops.grid_sample import grid_sample_2d, rotate_2d
from apollo_vision_net_tpu.ops.hungarian import linear_sum_assignment

__all__ = [
    "ms_deform_attn",
    "grid_sample_2d",
    "rotate_2d",
    "linear_sum_assignment",
]
