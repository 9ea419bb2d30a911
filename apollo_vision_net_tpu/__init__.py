"""apollo_vision_net_tpu — a TPU-native multi-task BEV perception framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
Apollo-Vision-Net (multi-camera temporal BEVFormer trunk + 3D detection /
semantic occupancy / vectorized HD-map heads), designed TPU-first:

- the multi-scale deformable attention op (reference: mmcv CUDA
  ``ms_deform_attn``) is a Pallas kernel with a pure-XLA fallback
  (`ops/msda.py`, `ops/msda_pallas.py`);
- Hungarian matching (reference: scipy ``linear_sum_assignment`` on CPU) is
  an exact, jittable shortest-augmenting-path solver (`ops/hungarian.py`);
- the whole model compiles into one XLA graph; parallelism is expressed as a
  `jax.sharding.Mesh` + pjit shardings instead of DDP/NCCL (`parallel/`);
- all shapes are static: per-camera query rebatching, variable GT counts and
  sparse occupancy labels become masked dense tensors.

Reference layer map and parity targets: see /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
