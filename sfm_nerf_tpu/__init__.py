"""sfm_nerf_tpu — a TPU-native (JAX/XLA/Pallas) Structure-from-Motion + NeRF framework.

Re-implements, TPU-first, every capability of the reference two-phase pipeline
(classical SfM in NumPy/OpenCV/SciPy + NeRF in PyTorch; see SURVEY.md):

- ``sfm_nerf_tpu.ops``       pure-functional JAX geometry + rendering ops
  (batched 8-point F, RANSAC, DLT/nonlinear triangulation, PnP,
  Schur-complement Levenberg-Marquardt bundle adjustment, ray generation,
  stratified sampling, volume rendering).
- ``sfm_nerf_tpu.models``    NeRF MLPs as pure pytrees (active + legacy
  serialization-compatible variants) and a .pth checkpoint converter.
- ``sfm_nerf_tpu.kernels``   Pallas TPU kernels (fused PE->MLP->composite render).
- ``sfm_nerf_tpu.parallel``  device-mesh sharding (dp over rays, tp over MLP
  channels) via jax.sharding / shard_map with XLA collectives.
- ``sfm_nerf_tpu.train``     jitted training loop, optax optimizer, checkpoints.
- ``sfm_nerf_tpu.sfm``       incremental SfM pipeline driver.
- ``sfm_nerf_tpu.io``        dataset loaders (Blender JSON, calibration/matching
  parsers) and artifact writers (plots, gif).
"""

__version__ = "0.1.0"
