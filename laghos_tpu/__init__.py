"""laghos_tpu — a TPU-native Lagrangian shock-hydrodynamics framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
CEED/Laghos miniapp (high-order finite-element compressible Euler in a
moving Lagrangian frame, cf. reference laghos.cpp / laghos_solver.cpp).

Design stance (TPU-first, not a translation):
  * the "mesh" is a dof array; the element index is the batch axis,
  * every hot kernel is a jitted batched tensor contraction,
  * distribution is sharding of the element axis over a `jax.sharding.Mesh`
    with XLA collectives (psum/pmin) replacing every MPI call,
  * host Python holds only the adaptive-dt control loop.

Double precision is required for the reference's 1e-13 regression goldens,
so importing this package enables jax x64 mode.
"""

import jax

jax.config.update("jax_enable_x64", True)
# On TPU the DEFAULT matmul precision is one bf16 MXU pass (~2.6e-3
# relative error on f32 inputs) — silently wrong for a solver whose f32
# mode advertises f32 accuracy.  Pin 3-pass f32 everywhere; the bench's
# explicitly-labeled bf16 speed rows opt back in with
# jax.default_matmul_precision("bfloat16").  (No effect on CPU f64 runs
# or on the int8-MXU Ozaki path, which controls its own dots.)
jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"
