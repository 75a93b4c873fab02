"""Stokes flow in a rotated channel with slip MPC — block (nest) assembly.

Counterpart of /root/reference/python/demos/demo_stokes_nest.py: Taylor-Hood P2-P1 on a channel rotated so the walls are not axis
aligned, u·n = 0 on the walls imposed as a slip MPC built from the averaged
facet normal, parabolic inflow, block (nest) assembly, Krylov solve, and
verification that the solution satisfies the constraint.
"""

import numpy as np


def main(nx=16, ny=8, theta=np.pi / 7):
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_rectangle, locate_entities_boundary, meshtags
    from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation
    from dolfinx_mpc_tpu.la.solvers import bicgstab

    L_ch, H_ch = 2.0, 1.0
    mesh = create_rectangle((0, 0), (L_ch, H_ch), (nx, ny))
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    mesh.points[:] = mesh.points @ R.T  # rotate the whole channel

    V = dmt.functionspace(mesh, ("Lagrange", 2, (2,)))
    Q = dmt.functionspace(mesh, ("Lagrange", 1))

    def in_rotated(marker):
        def f(x):
            X = R.T @ x[:2]
            return marker(X)
        return f

    wall_facets = locate_entities_boundary(
        mesh, 1, in_rotated(lambda X: np.isclose(X[1], 0.0) | np.isclose(X[1], H_ch))
    )
    mt = meshtags(mesh, 1, wall_facets, 1)

    # inflow: parabolic profile rotated into the channel frame
    inflow_dofs = dmt.locate_dofs_geometrical(V, in_rotated(lambda X: np.isclose(X[0], 0.0)))
    g = dmt.Function(V, name="g")

    def inflow(x):
        X = np.linalg.inv(R) @ x[:2]
        u_loc = np.stack([4.0 * X[1] * (H_ch - X[1]), np.zeros_like(X[1])])
        return R @ u_loc

    g.interpolate(inflow)
    bc_in = dmt.dirichletbc(g, inflow_dofs)

    nh = create_normal_approximation(V, mt, 1)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_slip_constraint(V, (mt, 1), nh, [bc_in])
    mpc.finalize()
    mpc_q = dmt.MultiPointConstraint(Q)
    mpc_q.finalize()

    a00 = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    a01 = dmt.BilinearForm(V, lambda p, v, c: -div(v) * conj(p.value), V_trial=Q)
    a10 = dmt.BilinearForm(Q, lambda u, q, c: -div(u) * conj(q.value), V_trial=V)
    a_nest = [[a00, a01], [a10, None]]
    A = dmt.create_matrix_nest(a_nest, [mpc, mpc_q])
    dmt.assemble_matrix_nest(A, a_nest, [mpc, mpc_q], bcs=[bc_in])

    L0 = dmt.LinearForm(V, lambda v, c: inner(jnp.zeros(2), v))
    L1 = dmt.LinearForm(Q, lambda q, c: 0.0 * q.value)
    b = dmt.create_vector_nest([L0, L1], [mpc, mpc_q])
    dmt.assemble_vector_nest(b, [L0, L1], [mpc, mpc_q])
    b0 = dmt.apply_lifting(b.parts[0], [a00], [[bc_in]], mpc)
    # bc columns of the divergence block lift into the pressure rhs as well
    b.parts[1] = dmt.apply_lifting(b.parts[1], [a10], [[bc_in]], mpc_q)
    b0 = dmt.set_bc(b0, [bc_in])
    rhs = jnp.concatenate([b0, b.parts[1]])

    # fieldsplit-style block-diagonal preconditioner (reference
    # demo_stokes_nest fieldsplit): Chebyshev on the velocity Laplacian,
    # pressure mass-matrix Jacobi
    from dolfinx_mpc_tpu.la.solvers import chebyshev_preconditioner
    from dolfinx_mpc_tpu.ops.nest import block_diag_preconditioner

    mass_q = dmt.assemble_matrix(
        dmt.BilinearForm(Q, lambda p, q, c: inner(p, q)), mpc_q
    ).diagonal()
    Mv = chebyshev_preconditioner(
        A.blocks[0][0].matvec, A.blocks[0][0].diagonal(), degree=5, lmin_frac=0.03
    )
    inv_q = jnp.where(mass_q != 0, 1.0 / mass_q, 1.0)
    M = block_diag_preconditioner([Mv, lambda r: inv_q * r], [V.num_dofs, Q.num_dofs])
    x, its, rnorm = bicgstab(A.matvec, rhs, M=M, rtol=1e-10, max_it=4000)
    u_arr = np.asarray(mpc.finalized.backsubstitution(x[: V.num_dofs]))
    p_arr = np.asarray(x[V.num_dofs :])
    print(f"V dofs={V.num_dofs} Q dofs={Q.num_dofs} slaves={mpc.num_local_slaves} "
          f"its={int(its)} rnorm={float(rnorm):.2e}")

    # slip satisfied: u·n = 0 on wall slave blocks
    arr = u_arr.reshape(-1, 2)
    nvals = np.asarray(nh.x.array).reshape(-1, 2)
    sb = np.unique(np.asarray(mpc.slaves) // 2)
    un = np.einsum("bi,bi->b", arr[sb], nvals[sb])
    print(f"max |u·n| on wall = {np.abs(un).max():.3e}")
    assert np.abs(un).max() < 1e-8
    assert np.abs(arr).max() > 0.5  # flow actually happening
    return u_arr, p_arr


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
