"""ns_gls_tpu — a TPU-native (JAX/XLA/Pallas) incompressible Navier-Stokes
framework with GLS (SUPG/PSPG/grad-div) stabilization and equal-order
Q_k/Q_k finite elements.

This is a from-scratch re-design of the capabilities of the reference
C++/deal.II solver ``peterrum/dealii-ns-gls`` (GLS-stabilized equal-order
FEM incompressible NS; see reference ``main.cc``, ``include/operator_ns.cc``)
for TPU hardware:

- cells are batched as the leading array axis (the TPU analogue of the
  reference's ``VectorizedArray`` SIMD cell batching),
- the hot quadrature sweep is a fused batched-einsum / Pallas kernel,
- distribution happens via ``jax.sharding`` meshes + XLA collectives
  instead of MPI/p4est,
- the Krylov/Newton stack is pure functional JAX (jit-compiled).
"""

__version__ = "0.1.0"

from ns_gls_tpu.config import Parameters  # noqa: F401
