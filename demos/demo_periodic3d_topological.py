"""3D Poisson, second-order elements, topologically-located periodic MPC.

Counterpart of /root/reference/python/demos/demo_periodic3d_topological.py.
"""

import argparse

import numpy as np


def main(n=8, degree=2):
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import (
        create_unit_cube,
        locate_entities_boundary,
        meshtags,
    )

    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", degree))

    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)

    facets = locate_entities_boundary(mesh, 2, lambda x: np.isclose(x[0], 1.0))
    mt = meshtags(mesh, 2, facets, 2)

    def relation(x):
        out = np.copy(x)
        out[0] = 1.0 - x[0]
        return out

    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_topological(V, mt, 2, relation, [bc])
    mpc.finalize()

    import jax.numpy as jnp

    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(
        V, lambda v, c: (2.0 + jnp.sin(2 * jnp.pi * c.x[2])) * v.value
    )
    problem = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-10})
    u = problem.solve()
    print(f"P{degree}: dofs={V.num_dofs} slaves={mpc.num_local_slaves} its={problem.its}")

    # periodicity check at the dof level
    arr = np.asarray(u.x.array)
    coords = V.dof_coords_blocks
    l = np.flatnonzero(np.isclose(coords[:, 0], 0.0))
    r = np.flatnonzero(np.isclose(coords[:, 0], 1.0))
    key = lambda i: np.lexsort((coords[i, 2], coords[i, 1]))
    err = np.abs(arr[l[key(l)]] - arr[r[key(r)]]).max()
    print(f"periodicity error = {err:.3e}")
    assert err < 1e-8
    return u


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--degree", type=int, default=2)
    a = p.parse_args()
    main(a.n, a.degree)
