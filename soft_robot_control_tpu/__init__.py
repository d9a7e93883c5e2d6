"""soft_robot_control_tpu — TPU-native optimal control of soft robots via reduced-order models.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
StanfordASL/soft-robot-control (reference layout documented in SURVEY.md):

- Model order reduction (POD) and reduced dynamics model families
  (TPWL, SSM, Koopman, single-linearization "ROMPC") as pure pytrees.
- Optimal control: Riccati/DARE/CARE, finite-horizon tracking LQR, iLQR,
  and GuSTO trust-region sequential convex programming MPC.
- An on-device OSQP-style ADMM QP solver (replacing the reference's
  external C OSQP/Gurobi processes, sofacontrol/scp/locp.py:60-63).
- State estimation: EKF, Luenberger, SSM manifold observer.
- A jitted FEM surrogate plant replacing SOFA for data collection and
  closed-loop evaluation, plus batched (vmap/pjit) closed-loop harnesses.

Everything in the compute path is functional: pytrees in, pytrees out,
`lax.scan` over time, `vmap` over batch, shardable over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from soft_robot_control_tpu.core import packing, types, discretize, constraints  # noqa: F401
