"""Linear algebra: static-structure CSR, jitted Krylov solvers,
preconditioners (Jacobi, Chebyshev, geometric multigrid)."""

from .eig import eigsh_shift_invert
from .solvers import SolverOptions, bicgstab, cg, gmres, jacobi_preconditioner
from .sparse import CSRMatrix, SlotPattern, build_slot_pattern
