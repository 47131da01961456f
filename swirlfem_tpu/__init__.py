"""swirlfem_tpu: a TPU-native spectral/finite element framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
google-research/swirl-fem: high-order finite element simulation on
unstructured quadrilateral/hexahedral meshes, incompressible Navier-Stokes
via spectral elements, differentiable solvers, and distributed execution
over jax.sharding device meshes.
"""

__version__ = '0.1.0'
