"""Solver drivers: LinearProblem (Krylov) and NonlinearProblem (Newton).

TPU-native rebuild of /root/reference/python/src/dolfinx_mpc/problem.py:
- LinearProblem (:353-600): assemble A/b, lifting, set_bc, Krylov solve,
  backsubstitution.
- NonlinearProblem (:159-350): Newton iteration with the constraint enforced
  on every iterate via homogenize+backsubstitution — the semantics of
  `assemble_residual_mpc`/`assemble_jacobian_mpc` (:26-156).

PETSc KSP/SNES are replaced by the jitted Krylov solvers in la/solvers.py;
`petsc_options` dicts are accepted and mapped onto SolverOptions.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .fem.forms import Form, derivative
from .fem.functionspace import Function
from .la.solvers import SolverOptions, solve as krylov_solve
from .multipointconstraint import MultiPointConstraint
from .ops.assemble import apply_lifting, assemble_matrix, assemble_vector, set_bc

__all__ = ["LinearProblem", "NonlinearProblem"]


class LinearProblem:
    """Linear constrained problem a(u,v) = L(v) with MPC + Dirichlet BCs
    (reference problem.py:353-600)."""

    def __init__(
        self,
        a: Form,
        L: Form,
        mpc: MultiPointConstraint,
        bcs=None,
        u: Optional[Function] = None,
        petsc_options: Optional[dict] = None,
        P: Optional[Form] = None,
    ):
        if mpc is not None and mpc.finalized is None:
            raise RuntimeError("The multi point constraint has to be finalized before calling initializer")
        self._a = a
        self._L = L
        self.mpc = mpc
        self.bcs = bcs or []
        self.u = u if u is not None else Function(a.test_space, dtype=mpc.dtype if mpc else np.float64)
        self.options = SolverOptions.from_petsc(petsc_options)
        self._P = P
        self._A = None
        self._b = None
        self.its = -1

    def assemble(self):
        dtype = self.mpc.dtype if self.mpc is not None else np.float64
        self._A = self._assemble_A(dtype)
        b = assemble_vector(self._L, self.mpc, dtype=dtype)
        b = apply_lifting(b, [self._a], [self.bcs], self.mpc, dtype=dtype)
        self._b = set_bc(b, self.bcs)
        return self._A, self._b

    def _assemble_A(self, dtype):
        """Prefer the scatter-free lattice fast path (structured box meshes,
        P1 cell forms); fall back to the general slot-CSR assembler."""
        try:
            from .ops.lattice import assemble_matrix_lattice, get_lattice_info

            if get_lattice_info(self._a.test_space.mesh) is None:
                raise ValueError
            key = ("lattice_clf", id(self.mpc), tuple(id(bc) for bc in self.bcs), np.dtype(dtype).str)
            cache = self._a.__dict__.setdefault("_compiled_cache", {})
            clf = cache.get(key)
            if clf is None:
                for fmt in ("fold", "cells"):
                    try:
                        clf = assemble_matrix_lattice(
                            self._a, self.mpc, bcs=self.bcs, dtype=dtype, side_format=fmt
                        )
                        break
                    except (ValueError, AssertionError):
                        clf = None
                if clf is None or clf.kernel_soa is None:
                    raise ValueError
                cache[key] = clf
                cache.setdefault("_refs", []).append((self.mpc, tuple(self.bcs)))
            return clf.assemble()
        except (ValueError, AssertionError):
            return assemble_matrix(self._a, self.mpc, self.bcs, dtype=dtype)

    @property
    def A(self):
        return self._A

    @property
    def b(self):
        return self._b

    def solve(self) -> Function:
        from .utils.timing import timed

        A, b = self.assemble()
        with timed("~MPC: Solve linear problem"):
            x, its, rnorm = krylov_solve(A.matvec, b, self.options, diag=A.diagonal())
        self.its = int(its)
        self.rnorm = float(rnorm)
        if self.mpc is not None:
            with timed("~MPC: Backsubstitution"):
                x = self.mpc.finalized.backsubstitution(x)
        self.u.x.array[:] = np.asarray(x)
        return self.u


class NonlinearProblem:
    """Newton solve of F(u; v) = 0 with MPC enforced on every iterate
    (reference problem.py:159-350; the homogenize+backsubstitute-before-
    assembly pattern is the V0.11 fix noted in SURVEY.md §2.2 P5)."""

    def __init__(
        self,
        F: Form,
        u: Function,
        mpc: MultiPointConstraint,
        bcs=None,
        J: Optional[Form] = None,
        petsc_options: Optional[dict] = None,
        u_name: str = "u",
        rtol: float = 1e-10,
        atol: float = 1e-10,
        max_it: int = 50,
    ):
        if mpc is not None and mpc.finalized is None:
            raise RuntimeError("The multi point constraint has to be finalized before calling initializer")
        self._F = F
        self._J = J if J is not None else derivative(F, u_name)
        self.u = u
        self.u_name = u_name
        self.mpc = mpc
        self.bcs = bcs or []
        self.options = SolverOptions.from_petsc(petsc_options)
        self.rtol, self.atol, self.max_it = rtol, atol, max_it

    def solve(self):
        """Returns (num_newton_iterations, converged)."""
        mpc = self.mpc
        dtype = mpc.dtype if mpc is not None else np.float64
        u = self.u
        converged = False
        it = 0
        r0 = None
        for it in range(1, self.max_it + 1):
            if mpc is not None:
                mpc.homogenize(u)
                mpc.backsubstitution(u)
            rhs = -assemble_vector(self._F, mpc, dtype=dtype)
            uarr = jnp.asarray(u.x.array)
            rhs = apply_lifting(rhs, [self._J], [self.bcs], mpc, x0=uarr, scale=1.0, dtype=dtype)
            rhs = set_bc(rhs, self.bcs, x0=uarr, scale=1.0)
            rnorm = float(jnp.linalg.norm(rhs))
            if r0 is None:
                r0 = max(rnorm, 1e-30)
            if rnorm < self.atol or rnorm / r0 < self.rtol:
                converged = True
                break
            A = assemble_matrix(self._J, mpc, self.bcs, dtype=dtype)
            du, _, _ = krylov_solve(A.matvec, rhs, self.options, diag=A.diagonal())
            if mpc is not None:
                du = mpc.finalized.backsubstitution(du)
            u.x.array[:] = np.asarray(uarr + du)
        if mpc is not None:
            mpc.backsubstitution(u)
        return it, converged
