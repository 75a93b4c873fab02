"""Block ("nest") assembly: block matrices/vectors over lists of forms.

Rebuild of the reference's PETSc MATNEST support
(/root/reference/python/src/dolfinx_mpc/assemble_matrix.py:91-146,
assemble_vector.py:107-147), used for Stokes-type mixed systems
(demo_stokes_nest.py).  A NestMatrix is a 2D grid of CSR blocks with a fused
matvec over the concatenated dof vector — XLA fuses the per-block SpMVs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..fem.forms import Form
from .assemble import apply_lifting, assemble_matrix, assemble_vector

__all__ = ["NestMatrix", "create_matrix_nest", "assemble_matrix_nest", "create_vector_nest", "assemble_vector_nest", "NestVector"]


@dataclass
class NestMatrix:
    blocks: list  # 2D list of CSRMatrix or None
    row_sizes: list
    col_sizes: list

    def matvec(self, x):
        xs = self.split(x)
        out = []
        for i, row in enumerate(self.blocks):
            acc = jnp.zeros(self.row_sizes[i], dtype=x.dtype)
            for j, B in enumerate(row):
                if B is not None:
                    acc = acc + B.matvec(xs[j])
            out.append(acc)
        return jnp.concatenate(out)

    def split(self, x):
        xs, off = [], 0
        for n in self.col_sizes:
            xs.append(x[off : off + n])
            off += n
        return xs

    def diagonal(self):
        out = []
        for i, row in enumerate(self.blocks):
            B = row[i]
            out.append(B.diagonal() if B is not None else jnp.ones(self.row_sizes[i]))
        return jnp.concatenate(out)

    def to_scipy(self):
        import scipy.sparse as sp

        rows = []
        for i, row in enumerate(self.blocks):
            cols = []
            for j, B in enumerate(row):
                cols.append(B.to_scipy() if B is not None else sp.csr_matrix((self.row_sizes[i], self.col_sizes[j])))
            rows.append(cols)
        return sp.bmat(rows, format="csr")


class NestVector:
    """Concatenated block vector with sub-vector views."""

    def __init__(self, parts):
        self.parts = list(parts)

    @property
    def array(self):
        return jnp.concatenate(self.parts)

    def __iter__(self):
        return iter(self.parts)


def create_matrix_nest(a: List[List[Optional[Form]]], constraints):
    """Shape-only creation (reference assemble_matrix.py:91-116); assembly
    happens in assemble_matrix_nest."""
    row_sizes = [c.V.num_dofs for c in constraints]
    col_sizes = row_sizes
    return NestMatrix([[None for _ in constraints] for _ in constraints], row_sizes, col_sizes)


def assemble_matrix_nest(A: NestMatrix, a, constraints, bcs=None, diagval=1.0):
    """Assemble every block with its (row, col) constraint pair
    (reference assemble_matrix.py:119-146)."""
    bcs = bcs or []
    for i, row in enumerate(a):
        for j, form in enumerate(row):
            if form is None:
                continue
            bij = [bc for bc in bcs if bc.V is form.test_space or bc.V is form.trial_space]
            A.blocks[i][j] = assemble_matrix(
                form, (constraints[i], constraints[j]), bij, diagval=diagval, dtype=constraints[i].dtype
            )
    return A


def block_diag_preconditioner(parts, sizes):
    """Block-diagonal preconditioner for nest systems: `parts` is one callable
    per block applied to that block's residual slice (e.g. Chebyshev on the
    velocity block + pressure-mass Jacobi for Stokes — the fieldsplit recipe
    of reference demo_stokes_nest)."""
    offsets = np.cumsum([0] + list(sizes))

    def M(r):
        return jnp.concatenate(
            [parts[i](r[offsets[i] : offsets[i + 1]]) for i in range(len(parts))]
        )

    return M


def create_vector_nest(L, constraints) -> NestVector:
    return NestVector([jnp.zeros(c.V.num_dofs, dtype=c.dtype) for c in constraints])


def assemble_vector_nest(b: NestVector, L, constraints) -> NestVector:
    """Reference assemble_vector.py:107-147."""
    for i, form in enumerate(L):
        b.parts[i] = assemble_vector(form, constraints[i], dtype=constraints[i].dtype)
    return b
