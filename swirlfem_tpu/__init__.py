"""swirlfem_tpu: a TPU-native spectral/finite element framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
google-research/swirl-fem: high-order finite element simulation on
unstructured quadrilateral/hexahedral meshes, incompressible Navier-Stokes
via spectral elements, differentiable solvers, and distributed execution
over jax.sharding device meshes.
"""

__version__ = '0.1.0'

# Convenience re-exports of the most-used entry points.
from swirlfem_tpu.core.mesh import Mesh
from swirlfem_tpu.core.premesh import Premesh
from swirlfem_tpu.core.quadrature import Nodes1D, NodeType, Quadrature1D
from swirlfem_tpu.core.refine import refine_premesh
from swirlfem_tpu.core.fespace import FiniteElementSpace, grad, div
from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.linalg.cg import cg
from swirlfem_tpu.utils.box import unit_cube_mesh
