"""TPU-native stereo visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++ reference
system farhad-dalirani/StereoVision-SLAM (see SURVEY.md): a tracking frontend
(batched GFTT detection, pyramidal LK optical flow, stereo triangulation,
Gauss-Newton pose estimation), a sliding-window bundle-adjustment backend
(Schur-complement solver), loop closure (MobileNet-V2 embeddings + geometric
verification + SE(3) pose-graph optimization), offline dense reconstruction,
and a distributed BA path over `jax.sharding` meshes.

Design principles (TPU-first, not a port):
  * pure-functional state: the map is a pytree of fixed-capacity masked arrays,
    threaded through jitted update functions — no mutexes, no shared pointers.
  * static shapes everywhere: feature slots, keyframe windows and landmark
    tables are fixed-capacity ring buffers with validity masks.
  * batched math: per-point/per-observation work is vmapped; reductions are
    segment-sums and einsums that map onto the MXU.
  * host code only orchestrates I/O and control flow.
"""

__version__ = "0.1.0"
