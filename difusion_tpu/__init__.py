"""di-fusion-tpu: a TPU-native (JAX/XLA/Pallas) online implicit 3D reconstruction framework.

A from-scratch rebuild of the capabilities of DI-Fusion (CVPR 2021, reference at
/root/reference): online RGB-D SLAM over a sparse voxel grid of latent codes
("PLIVoxes") decoded by a shared probabilistic-SDF MLP, plus the offline prior
training pipeline (data generation, encoder/decoder training).

Design stance (vs. the CUDA/torch reference):
  * fixed-capacity, functional map state (pytree of arrays) updated by jitted
    scatter/segment ops -- no dynamic buffers, no host round-trips per frame;
  * camera tracking as a jitted Gauss-Newton loop (`lax.while_loop`) with
    `jax.grad` through the decoder for the SDF term;
  * sparse marching cubes as a batched, static-shape XLA/Pallas computation with
    prefix-sum compaction instead of atomics;
  * scaling via `jax.sharding.Mesh` + collectives instead of DataParallel.
"""

__version__ = "0.1.0"
