"""dolfinx_mpc_tpu: TPU-native constrained finite elements.

A brand-new JAX/XLA/Pallas framework with the capabilities of
jorgensd/dolfinx_mpc (multi-point constraints enforced via element-level
K^T A K elimination during assembly) — see SURVEY.md for the structural map.
The public surface mirrors the reference package
(/root/reference/python/src/dolfinx_mpc/__init__.py:29-41) plus the mini-FEM
substrate that replaces DOLFINx.
"""

# Install the huge-page numpy allocator BEFORE anything allocates large
# arrays: this host faults 4KB pages at ~40s/GB; THP-backed allocations
# fault at ~0.6s/GB (csrc/hugealloc.c).  No-op where unsupported.
from .native import install_hugepage_allocator as _ihp

_ihp()

# Full-precision matmuls, package-wide.  The TPU MXU computes f32
# dot_generals with bf16 multiplies at Precision.DEFAULT (~4e-3 relative
# noise).  FEM at f32 cannot absorb that: CG's alpha/beta come from vdots
# of ~1M-long vectors every iteration (measured: the 824k-dof bs=3
# elasticity GMG-CG that converges in 42 its on XLA:CPU stalls at 3000 its /
# rnorm 5e-2 on XLA:TPU with default precision), and the general assembler's
# conj(T)^T A_e T einsums would bake the same noise into matrix ENTRIES.
# The hot paths (stencil/ELL SpMV, pallas kernels) are elementwise VPU ops
# and don't touch this; what does — CG dots, dense coarse solves, element
# transform contractions — needs exact f32.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

from .fem import cells, forms, mesh
from .fem.forms import BilinearForm, Form, LinearForm, derivative
from .fem.functionspace import (
    DirichletBC,
    Function,
    FunctionSpace,
    dirichletbc,
    functionspace,
    locate_dofs_geometrical,
    locate_dofs_topological,
)
from .fem.mixed import MixedFunctionSpace, mixed_functionspace, split
from .multipointconstraint import FinalizedMPC, MPCData, MultiPointConstraint
from .ops.assemble import (
    apply_lifting,
    assemble_matrix,
    assemble_vector,
    create_sparsity_pattern,
    set_bc,
)
from .ops.nest import (
    assemble_matrix_nest,
    assemble_vector_nest,
    create_matrix_nest,
    create_vector_nest,
)
from .problem import LinearProblem, NonlinearProblem, NonlinearProblemNest

__version__ = "0.1.0"

# subsystem modules re-exported for discoverability (io.XDMFFile/read_gmsh,
# ops.lattice fast path, la.gmg multigrid, utils.timing Timer registry,
# parallel SPMD paths) — import lazily to keep `import dolfinx_mpc_tpu` light
from . import io  # noqa: E402  (XDMFFile, read_gmsh)
from .utils.timing import Timer, list_timings  # noqa: E402

__all__ = [
    "assemble_matrix",
    "create_matrix_nest",
    "assemble_matrix_nest",
    "assemble_vector",
    "apply_lifting",
    "assemble_vector_nest",
    "create_vector_nest",
    "MultiPointConstraint",
    "LinearProblem",
    "create_sparsity_pattern",
    "NonlinearProblem",
    "set_bc",
    "MPCData",
    "FinalizedMPC",
    "Function",
    "FunctionSpace",
    "functionspace",
    "MixedFunctionSpace",
    "mixed_functionspace",
    "split",
    "dirichletbc",
    "DirichletBC",
    "locate_dofs_geometrical",
    "locate_dofs_topological",
    "BilinearForm",
    "LinearForm",
    "Form",
    "derivative",
]
