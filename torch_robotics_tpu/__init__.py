"""torch_robotics_tpu: TPU-native differentiable robotics + trajectory optimization.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``anindex/torch_robotics`` plus a batched trajectory-optimization / MPC engine:

- ``core``: quaternion / SO(3) / SE(3) math (batched, branchless)
- ``kin``: URDF -> static-array kinematic model; batched FK / Jacobians / IK
- ``geom``: analytic SDF primitives, posed object fields, precomputed grid SDFs
- ``costs``: differentiable planning objectives (obstacle, self-collision,
  EE pose, workspace bounds, GP priors)
- ``robots`` / ``envs`` / ``tasks``: embodiments, environment zoo, planning task
- ``solve``: batched GPMP2 (Gauss-Newton, block-tridiagonal), CHOMP, MPPI,
  RRT-Connect and a receding-horizon MPC driver
- ``parallel``: mesh/sharding utilities for multi-chip / multi-host scaling
- ``ops``: Pallas TPU kernels for the hot cost paths
"""

__version__ = "0.1.0"
