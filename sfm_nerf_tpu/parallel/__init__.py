"""Multi-chip scale-out via jax.sharding over a device Mesh.

The reference is strictly single-process, single-device (SURVEY §2.3: no
torch.distributed / DDP / NCCL anywhere).  Here scale-out is first-class:

- data parallelism shards the ray batch over the 'data' mesh axis with
  gradients reduced by ``psum``/``pmean`` over ICI (explicit, via shard_map);
- tensor parallelism shards the MLP hidden dimension over the 'model' axis
  (Megatron-style alternating column/row parallel) with XLA/GSPMD inserting
  the collectives from sharding annotations;
- per-chip RNG is derived with ``jax.random.fold_in(key, axis_index)`` so the
  global sample distribution is independent of mesh shape.
"""

from sfm_nerf_tpu.parallel.mesh import make_mesh  # noqa: F401
