"""Generalized eigenproblem K u = λ M u with a periodic MPC.

Counterpart of /root/reference/python/demos/demo_periodic_gep.py (there:
SLEPc shift-and-invert; here: jitted LOBPCG on the Jacobi-symmetrized pencil).
Demonstrates the same `diagval` trick the reference documents: slave rows get
`diagval` on the diagonal, shifting the spurious slave eigenvalues away from
the physical spectrum.
"""

import numpy as np


def main(n=16, nev=4, diagval=1e4):
    import jax
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

    # LOBPCG on B^{-1/2} K B^{-1/2} with B = diag(M) lumped-ish symmetrization,
    # then Rayleigh-quotient correction with the true M
    from jax.experimental.sparse.linalg import lobpcg_standard

    dM = np.asarray(M.diagonal())
    s = jnp.asarray(1.0 / np.sqrt(dM))

    def op(X):  # (n, k)
        return jax.vmap(lambda col: s * K.matvec(s * col), 1, 1)(X)

    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((V.num_dofs, nev)))
    theta, U, iters = lobpcg_standard(op, X0, m=200)
    # smallest eigenvalues: lobpcg_standard finds the LARGEST; invert spectrum
    # by shift: use A' = sigma I - A with sigma > lambda_max estimate
    sigma = float(theta.max()) * 1.05

    def op2(X):
        return sigma * X - op(X)

    theta2, U2, _ = lobpcg_standard(op2, X0, m=300)
    lam = sigma - np.asarray(theta2)
    order = np.argsort(lam)
    lam = lam[order]
    print(f"smallest generalized eigenvalues (diag-symmetrized): {lam[:nev]}")

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
    # the diag-symmetrized pencil is an approximation of the M-pencil; check
    # the true Rayleigh quotients of the recovered eigenvectors instead
    U2 = np.asarray(U2)[:, order]
    for i in range(min(nev, 3)):
        u_full = np.asarray(s) * U2[:, i]
        rq = (u_full @ np.asarray(K.matvec(jnp.asarray(u_full)))) / (
            u_full @ np.asarray(M.matvec(jnp.asarray(u_full)))
        )
        rel = abs(rq - vals[i]) / vals[i]
        print(f"mode {i}: Rayleigh quotient {rq:.4f} vs scipy {vals[i]:.4f} (rel {rel:.2e})")
    return lam


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
