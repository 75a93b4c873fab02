"""Stokes flow in a rotated channel with slip MPC — ONE mixed-space matrix.

Counterpart of /root/reference/python/demos/demo_stokes.py: Taylor-Hood
P2-P1 in a single MixedElement space, u·n = 0 on the non-axis-aligned walls
as a slip MPC on the velocity sub-space, parabolic inflow, single-matrix
assembly + Krylov solve, slip + oracle verification.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(nx=16, ny=8, theta=np.pi / 7):
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_rectangle, locate_entities_boundary, meshtags
    from dolfinx_mpc_tpu.utils import compare_mpc_lhs
    from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation

    L_ch, H_ch = 2.0, 1.0
    mesh = create_rectangle((0, 0), (L_ch, H_ch), (nx, ny))
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    mesh.points[:] = mesh.points @ R.T

    # ONE mixed Taylor-Hood space: velocity P2 vector + pressure P1
    W = dmt.mixed_functionspace(mesh, [("Lagrange", 2, (2,)), ("Lagrange", 1)])
    Wv = W.sub(0)

    def in_rotated(marker):
        return lambda x: marker(R.T @ x[:2])

    wall_facets = locate_entities_boundary(
        mesh, 1, in_rotated(lambda X: np.isclose(X[1], 0.0) | np.isclose(X[1], H_ch))
    )
    mt = meshtags(mesh, 1, wall_facets, 1)

    inflow_dofs = dmt.locate_dofs_geometrical(Wv, in_rotated(lambda X: np.isclose(X[0], 0.0)))
    g = dmt.Function(Wv, name="g")

    def inflow(x):
        X = np.linalg.inv(R) @ x[:2]
        return R @ np.stack([4.0 * X[1] * (H_ch - X[1]), np.zeros_like(X[1])])

    g.interpolate(inflow)
    bc_in = dmt.dirichletbc(g, inflow_dofs)

    # slip MPC on the velocity field of the mixed space
    nh = create_normal_approximation(Wv, mt, 1)
    mpc = dmt.MultiPointConstraint(W)
    mpc.create_slip_constraint(Wv, (mt, 1), nh, [bc_in])
    mpc.finalize()
    print(f"slip slaves: {mpc.num_local_slaves}")

    a = dmt.BilinearForm(
        W,
        lambda u, v, c: inner(grad(u[0]), grad(v[0]))
        - div(v[0]) * conj(u[1].value)
        - div(u[0]) * conj(v[1].value),
    )
    L = dmt.LinearForm(W, lambda v, c: inner(jnp.zeros(2), v[0]) + 0.0 * v[1].value)

    A = dmt.assemble_matrix(a, mpc, bcs=[bc_in])
    b = dmt.assemble_vector(L, mpc)
    b = dmt.apply_lifting(b, [a], [[bc_in]], mpc)
    b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc_in])))

    from dolfinx_mpc_tpu.la.solvers import gmres, jacobi_preconditioner

    x, its, rnorm = gmres(
        A.matvec, b, M=jacobi_preconditioner(A.diagonal()),
        rtol=1e-10, restart=100, max_it=20000,
    )
    x = mpc.finalized.backsubstitution(x)
    u = dmt.Function(W, np.asarray(x))
    uv, p = dmt.split(u)
    print(f"dofs={W.num_dofs} gmres its={int(its)} rnorm={float(rnorm):.2e}")

    # slip holds on the wall
    nvals = np.asarray(nh.x.array).reshape(-1, 2)
    uu = np.asarray(uv.x.array).reshape(-1, 2)
    wall_blocks = dmt.locate_dofs_topological(Wv, 1, wall_facets)
    un = np.abs((uu[wall_blocks] * nvals[wall_blocks]).sum(1)).max()
    print(f"max |u·n| on wall: {un:.2e}")
    assert un < 1e-8
    assert np.abs(uu).max() > 0.5  # flow developed

    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, bcs=[bc_in]).to_scipy(),
        dmt.assemble_matrix(a, mpc, bcs=[bc_in]).to_scipy(),
        mpc,
    )
    print("K^T A K verification passed")
    return u


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    main()
