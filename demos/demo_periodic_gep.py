"""Generalized eigenproblem K u = λ M u with a periodic MPC.

Counterpart of /root/reference/python/demos/demo_periodic_gep.py (there:
SLEPc EPS with shift-and-invert; here: the same algorithm TPU-native —
`la.eig.eigsh_shift_invert`, block inverse iteration whose inner solves are
one batched jitted CG).  Demonstrates the same `diagval` trick the reference
documents: slave/bc rows get `diagval` on the diagonal, shifting the spurious
eigenvalues to ~diagval, far from the physical spectrum that shift-and-invert
at σ=0 targets.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(n=16, nev=4, diagval=1e4):
    import jax

    # correctness demo (mirrors the reference's SLEPc verification): run in
    # f64, which the axon/TPU backend silently truncates — pin to CPU.
    # No-op under pytest (conftest already selects cpu+x64); guarded because
    # jax refuses platform changes once a backend is live.
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    except RuntimeError:
        pass
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_square

    mesh = create_unit_square(n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0), lambda x: np.stack([1.0 - x[0], x[1]]), [bc]
    )
    mpc.finalize()

    k_form = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    m_form = dmt.BilinearForm(V, lambda u, v, c: inner(u, v))
    # diagval shifts slave/bc eigenvalues to ~diagval (reference demo README)
    K = dmt.assemble_matrix(k_form, mpc, bcs=[bc], diagval=diagval)
    M = dmt.assemble_matrix(m_form, mpc, bcs=[bc], diagval=1.0)

    # shift-and-invert at sigma=0: the smallest pencil eigenvalues become the
    # dominant ones of K^{-1} M; the inner solves ride a Jacobi-preconditioned
    # batched CG (one jitted program for the whole search block)
    from dolfinx_mpc_tpu.la import eigsh_shift_invert, jacobi_preconditioner

    pc = jacobi_preconditioner(jnp.asarray(np.asarray(K.diagonal())))
    lam, U, info = eigsh_shift_invert(K, M, nev, sigma=0.0, pc=pc, tol=1e-8)
    print(f"smallest generalized eigenvalues: {lam} "
          f"({info['outer']} outer, {info['inner']} inner CG its)")

    # reference eigenvalues via scipy on the reduced pencil
    import scipy.sparse.linalg as spla
    from dolfinx_mpc_tpu.utils import gather_transformation_matrix

    Ks = dmt.assemble_matrix(k_form, None, bcs=[bc]).to_scipy()
    Ms = dmt.assemble_matrix(m_form, None, bcs=[bc]).to_scipy()
    Kt = gather_transformation_matrix(mpc)
    # restrict the reduced pencil to non-bc reduced dofs (bc rows are
    # diagval·identity and would flood the spectrum with λ = 1)
    is_slave = np.zeros(V.num_dofs, bool)
    is_slave[np.asarray(mpc.slaves)] = True
    reduced_of_full = -np.ones(V.num_dofs, np.int64)
    reduced_of_full[~is_slave] = np.arange((~is_slave).sum())
    free = reduced_of_full[np.setdiff1d(np.flatnonzero(~is_slave), bc.dofs)]
    Kr = (Kt.T @ Ks @ Kt).tocsr()[free][:, free]
    Mr = (Kt.T @ Ms @ Kt).tocsr()[free][:, free]
    vals = spla.eigsh(Kr, k=nev, M=Mr, sigma=0, which="LM", return_eigenvectors=False)
    vals = np.sort(vals)
    print(f"scipy reference eigenvalues: {vals}")
    rel = np.abs(np.sort(lam) - vals) / vals
    for i in range(nev):
        print(f"mode {i}: {np.sort(lam)[i]:.6f} vs scipy {vals[i]:.6f} "
              f"(rel {rel[i]:.2e})")
    assert rel.max() < 1e-6, f"eigenvalue mismatch: {rel}"
    return lam


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
