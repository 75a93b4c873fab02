"""MultiPointConstraint: the MPC container as static padded gather tables.

TPU-native rebuild of the reference's MPC core
(/root/reference/cpp/MultiPointConstraint.h:22-225 and the Python builder
/root/reference/python/src/dolfinx_mpc/multipointconstraint.py:87-631).

Instead of CSR adjacency lists + an extended ghosted function space, a
finalized constraint is four dense arrays — slaves, a padded
(n_slaves, max_masters) master-index table, matching coefficients, and an
is_slave marker — which make backsubstitution (u[s] = sum c·u[m],
reference MultiPointConstraint.h:129-145) a single gather-FMA and make the
element-level K^T A K elimination a batched dense matmul (see ops/assemble.py).
No extended function space is needed: there is one global address space and
sharding happens at the array level.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .fem.functionspace import Function, FunctionSpace

__all__ = ["MPCData", "FinalizedMPC", "MultiPointConstraint"]


@dataclass
class MPCData:
    """Flat constraint POD mirroring `mpc_data<T>`
    (/root/reference/cpp/utils.h:110-127): slaves are unrolled dof indices,
    masters/coeffs in CSR layout via offsets."""

    slaves: np.ndarray
    masters: np.ndarray
    coeffs: np.ndarray
    owners: np.ndarray
    offsets: np.ndarray


@jax.tree_util.register_pytree_node_class
class FinalizedMPC:
    """Device-resident constraint tables.

    slaves: (n_s,) int32 unrolled dof indices
    masters: (n_s, MM) int32 padded master dof indices (0-padded)
    coeffs: (n_s, MM) padded coefficients (0-padded => padding is inert)
    is_slave: (num_dofs,) bool
    """

    def __init__(self, slaves, masters, coeffs, is_slave, num_dofs):
        self.slaves = slaves
        self.masters = masters
        self.coeffs = coeffs
        self.is_slave = is_slave
        self.num_dofs = num_dofs

    def tree_flatten(self):
        return (self.slaves, self.masters, self.coeffs, self.is_slave), (self.num_dofs,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0])

    @property
    def n_slaves(self):
        return self.slaves.shape[0]

    def backsubstitution(self, u):
        """u[s] = sum_j c_j u[m_j] (reference MultiPointConstraint.h:129-145)."""
        if self.n_slaves == 0:
            return u
        vals = jnp.einsum("sm,sm->s", self.coeffs, u[self.masters].astype(self.coeffs.dtype))
        return u.at[self.slaves].set(vals)

    def homogenize(self, u):
        """u[s] = 0 (reference MultiPointConstraint.h:148-152)."""
        if self.n_slaves == 0:
            return u
        return u.at[self.slaves].set(0)

    def expand(self, u_reduced):
        """Alias of backsubstitution: û -> u = K û."""
        return self.backsubstitution(u_reduced)

    def reduce_transpose(self, y):
        """y_red = K^H y: add conj(c)*y[slave] into masters, zero slaves.
        The reverse-mode mirror of backsubstitution — used by the matrix-free
        K^H A K operator (SURVEY.md §7 step 6)."""
        if self.n_slaves == 0:
            return y
        ys = y[self.slaves]
        contrib = (jnp.conj(self.coeffs) * ys[:, None]).ravel()
        y = y.at[self.masters.ravel()].add(contrib.astype(y.dtype))
        return y.at[self.slaves].set(0)


class MultiPointConstraint:
    """Builder with the reference's add/finalize lifecycle
    (/root/reference/python/src/dolfinx_mpc/multipointconstraint.py:87-223).
    """

    def __init__(self, V: FunctionSpace, dtype=np.float64):
        self.V = V
        self.dtype = np.dtype(dtype)
        self._slaves = []
        self._masters = []
        self._coeffs = []
        self._offsets = [0]
        self.finalized: Optional[FinalizedMPC] = None

    # -- accumulation --------------------------------------------------
    def add_constraint(self, V, slaves, masters, coeffs, owners=None, offsets=None):
        """Append constraints: slaves/masters are unrolled dof indices;
        offsets is the CSR offset array (len(slaves)+1)."""
        assert self.finalized is None, "already finalized"
        slaves = np.asarray(slaves, dtype=np.int64)
        masters = np.asarray(masters, dtype=np.int64)
        coeffs = np.asarray(coeffs, dtype=self.dtype)
        if offsets is None:
            # one master per slave
            offsets = np.arange(len(slaves) + 1, dtype=np.int64)
        offsets = np.asarray(offsets, dtype=np.int64)
        assert len(offsets) == len(slaves) + 1
        for i, s in enumerate(slaves):
            self._slaves.append(int(s))
            self._masters.append(masters[offsets[i] : offsets[i + 1]])
            self._coeffs.append(coeffs[offsets[i] : offsets[i + 1]])

    def add_constraint_from_mpc_data(self, V, mpc_data: MPCData):
        self.add_constraint(V, mpc_data.slaves, mpc_data.masters, mpc_data.coeffs, mpc_data.owners, mpc_data.offsets)

    # -- constraint generators (mirror reference API) -------------------
    def create_general_constraint(self, slave_master_dict, subspace_slave=None, subspace_master=None):
        from .constraints import create_dictionary_constraint

        data = create_dictionary_constraint(self.V, slave_master_dict, subspace_slave, subspace_master, self.dtype)
        self.add_constraint_from_mpc_data(self.V, data)

    def create_periodic_constraint_topological(self, V, meshtag, tag, relation, bcs=None, scale=1.0):
        from .constraints import create_periodic_condition_topological

        data = create_periodic_condition_topological(V, meshtag, tag, relation, bcs or [], scale, self.dtype)
        self.add_constraint_from_mpc_data(V, data)

    def create_periodic_constraint_geometrical(self, V, indicator, relation, bcs=None, scale=1.0):
        from .constraints import create_periodic_condition_geometrical

        data = create_periodic_condition_geometrical(V, indicator, relation, bcs or [], scale, self.dtype)
        self.add_constraint_from_mpc_data(V, data)

    def create_slip_constraint(self, space, facet_marker, v, bcs=None):
        from .constraints import create_slip_condition

        data = create_slip_condition(space, facet_marker, v, bcs or [], self.dtype)
        self.add_constraint_from_mpc_data(space, data)

    def create_contact_slip_condition(self, meshtags, slave_marker, master_marker, normal, eps2=1e-20):
        from .constraints import create_contact_slip_condition

        data = create_contact_slip_condition(self.V, meshtags, slave_marker, master_marker, normal, eps2, self.dtype)
        self.add_constraint_from_mpc_data(self.V, data)

    def create_contact_inelastic_condition(self, meshtags, slave_marker, master_marker, eps2=1e-20, allow_missing_masters=False):
        from .constraints import create_contact_inelastic_condition

        data = create_contact_inelastic_condition(
            self.V, meshtags, slave_marker, master_marker, eps2, allow_missing_masters, self.dtype
        )
        self.add_constraint_from_mpc_data(self.V, data)

    # -- finalize -------------------------------------------------------
    def finalize(self) -> None:
        """Freeze into padded device tables.  Unlike the reference there is no
        extended function space to build (mpc_helpers.h:139-235) — masters are
        already globally addressable."""
        from .utils.timing import Timer

        _t = Timer("~MPC: Finalize MPC").start()
        assert self.finalized is None, "already finalized"
        n_s = len(self._slaves)
        num_dofs = self.V.num_dofs
        if n_s == 0:
            self._np_slaves = np.zeros((0,), np.int64)
            self._np_masters = np.zeros((0, 1), np.int64)
            self._np_coeffs = np.zeros((0, 1), self.dtype)
            self._np_is_slave = np.zeros(num_dofs, dtype=bool)
            self.finalized = FinalizedMPC(
                jnp.zeros((0,), jnp.int32),
                jnp.zeros((0, 1), jnp.int32),
                jnp.zeros((0, 1), self.dtype),
                jnp.zeros((num_dofs,), bool),
                num_dofs,
            )
            return
        slaves = np.asarray(self._slaves, dtype=np.int64)
        if len(np.unique(slaves)) != n_s:
            raise ValueError("duplicate slave dofs in constraint")
        # compact away explicit zero-coefficient masters (algebraically inert;
        # e.g. slip conditions with axis-aligned normals produce them) so that
        # the padded tables satisfy "first k columns are the real masters",
        # which assembly's count-based slicing relies on.
        comp = [
            (np.asarray(m)[np.asarray(c) != 0], np.asarray(c)[np.asarray(c) != 0])
            for m, c in zip(self._masters, self._coeffs)
        ]
        mm = max(max((len(m) for m, _ in comp), default=1), 1)
        masters = np.zeros((n_s, mm), dtype=np.int64)
        coeffs = np.zeros((n_s, mm), dtype=self.dtype)
        for i, (m, c) in enumerate(comp):
            masters[i, : len(m)] = m
            coeffs[i, : len(c)] = c
        is_slave = np.zeros(num_dofs, dtype=bool)
        is_slave[slaves] = True
        if is_slave[masters[coeffs != 0]].any():
            raise ValueError("a master dof is itself a slave (chained constraints unsupported, as in reference)")
        self._np_slaves = slaves
        self._np_masters = masters
        self._np_coeffs = coeffs
        self._np_is_slave = is_slave
        self.finalized = FinalizedMPC(
            jnp.asarray(slaves, jnp.int32),
            jnp.asarray(masters, jnp.int32),
            jnp.asarray(coeffs),
            jnp.asarray(is_slave),
            num_dofs,
        )
        _t.stop()

    # -- accessors mirroring the reference ------------------------------
    @property
    def function_space(self) -> FunctionSpace:
        return self.V

    @property
    def slaves(self) -> np.ndarray:
        self._require_finalized()
        return self._np_slaves

    @property
    def masters(self):
        """(flat_masters, offsets) CSR view like reference `masters()`."""
        self._require_finalized()
        counts = (self._np_coeffs != 0).sum(axis=1)
        # keep at least declared masters even if coeff == 0 was explicit: use stored lists
        flat, offs = [], [0]
        for m in self._masters:
            flat.extend(int(x) for x in m)
            offs.append(offs[-1] + len(m))
        return np.asarray(flat, dtype=np.int64), np.asarray(offs, dtype=np.int64)

    @property
    def coefficients(self):
        self._require_finalized()
        flat, offs = [], [0]
        for c in self._coeffs:
            flat.extend(c.tolist())
            offs.append(offs[-1] + len(c))
        return np.asarray(flat, dtype=self.dtype), np.asarray(offs, dtype=np.int64)

    @property
    def is_slave(self) -> np.ndarray:
        self._require_finalized()
        return self._np_is_slave

    @property
    def num_local_slaves(self) -> int:
        self._require_finalized()
        return len(self._np_slaves)

    def cell_to_slaves(self):
        """cells -> slave indices map (reference MultiPointConstraint.h:66)."""
        self._require_finalized()
        dm = self.V.dofmap
        out = []
        spos = -np.ones(self.V.num_dofs, dtype=np.int64)
        spos[self._np_slaves] = np.arange(len(self._np_slaves))
        for c in range(dm.shape[0]):
            s = spos[dm[c]]
            out.append(s[s >= 0])
        return out

    # -- kernels --------------------------------------------------------
    def backsubstitution(self, u) -> None:
        """In-place on a Function or array (reference
        multipointconstraint.py:586-606)."""
        self._require_finalized()
        # copy=True: jnp.asarray may zero-copy the numpy buffer on CPU and
        # the result is written back into that same buffer below
        if isinstance(u, Function):
            u.x.array[:] = np.asarray(self.finalized.backsubstitution(jnp.array(u.x.array, copy=True)))
        else:
            u[:] = np.asarray(self.finalized.backsubstitution(jnp.array(u, copy=True)))

    def homogenize(self, u) -> None:
        self._require_finalized()
        if isinstance(u, Function):
            u.x.array[:] = np.asarray(self.finalized.homogenize(jnp.array(u.x.array, copy=True)))
        else:
            u[:] = np.asarray(self.finalized.homogenize(jnp.array(u, copy=True)))

    def _require_finalized(self):
        if self.finalized is None:
            raise RuntimeError("call finalize() first")
