"""Unconstrained 3D Poisson baseline — counterpart of
/root/reference/python/benchmarks/ref_periodic.py: the identical problem
WITHOUT the periodic MPC, to isolate constrained-assembly overhead."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(r, degree, rtol, out):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
    from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner

    N = 3 * 2 ** r
    dtype = np.float32
    mesh = create_unit_cube(N, N, N)
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    a = dmt.BilinearForm(
        V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=max(2 * (degree - 1), 1)
    )
    L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)

    t0 = time.time()
    if degree == 1:
        from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

        A = assemble_matrix_lattice(a, None, bcs=[bc], dtype=dtype).assemble()
        jax.block_until_ready(A.dia.data)
    else:
        A = dmt.assemble_matrix(a, None, bcs=[bc], dtype=dtype)
        A.data.block_until_ready()
    t_assemble = time.time() - t0

    b = dmt.assemble_vector(L, None, dtype=dtype)
    b = dmt.apply_lifting(b, [a], [[bc]], None, dtype=dtype)
    b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc])))
    solve = jax.jit(
        lambda b: cg(A.matvec, b, M=jacobi_preconditioner(A.diagonal()), rtol=rtol, max_it=5000)
    )
    x, its, rn = solve(b)
    x.block_until_ready()
    t0 = time.time()
    x, its, rn = solve(b * 1.0000001)
    x.block_until_ready()
    t_solve = time.time() - t0
    print(
        f"[ref] r={r} N={N} dofs={V.num_dofs} its={int(its)} "
        f"assemble={t_assemble:.3f}s solve={t_solve:.3f}s"
    )
    if out:
        import h5py

        with h5py.File(out, "a") as f:
            grp = f.create_group(f"r{r}_deg{degree}_{int(time.time())}")
            grp.create_dataset("its", data=int(its))
            grp.create_dataset("num_dofs", data=V.num_dofs)
            grp.create_dataset("solve_time", data=np.asarray([t_solve]))
            grp.create_dataset("assembly_time", data=np.asarray([t_assemble]))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nref", type=int, default=2)
    p.add_argument("--degree", type=int, default=1)
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--out", default="ref_periodic_results.h5")
    args = p.parse_args()
    run(args.nref, args.degree, args.rtol, args.out)
