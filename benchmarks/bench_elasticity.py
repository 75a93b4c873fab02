"""3D elasticity with a point-dof MPC — counterpart of
/root/reference/python/benchmarks/bench_elasticity.py: vector P1 elasticity
on the unit cube, fixed bottom, one dof tied to another with a general
constraint (s = 0.9 m), CG+Jacobi, HDF5 {its, num_dofs, num_slaves,
solve_time, assembly_time}.  Pairs with ref_elasticity.py (identical run
WITHOUT the MPC) to isolate the MPC overhead."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(r, rtol, out, with_mpc=True):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
    from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner
    from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

    N = 3 * 2 ** r
    dtype = np.float32
    mesh = create_unit_cube(N, N, N)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)

    t0 = time.time()
    mpc = dmt.MultiPointConstraint(V, dtype=dtype)
    if with_mpc:
        # tie u_z at (1,1,1) to u_z at (0,0,1) with coefficient 0.9
        # (reference bench_elasticity.py ties a corner dof the same way)
        mpc.create_general_constraint(
            {np.array([1.0, 1.0, 1.0]).tobytes(): {np.array([0.0, 0.0, 1.0]).tobytes(): 0.9}},
            subspace_slave=2,
            subspace_master=2,
        )
    mpc.finalize()
    t_constraint = time.time() - t0

    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast, quad_degree=1)
    L = dmt.LinearForm(V, lambda v, c: inner(jnp.asarray([0.0, 0.0, -1.0]), v))

    t0 = time.time()
    A = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=dtype).assemble()
    jax.block_until_ready(A.dia.data)
    t_assemble = time.time() - t0

    b = dmt.assemble_vector(L, mpc, dtype=dtype)
    b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc])))
    solve = jax.jit(
        lambda A_, b: cg(A_.matvec, b, M=jacobi_preconditioner(A_.diagonal()),
                         rtol=rtol, max_it=8000)
    )
    x, its, rn = solve(A, b)
    x.block_until_ready()
    t0 = time.time()
    x, its, rn = solve(A, b * 1.0000001)
    x.block_until_ready()
    t_solve = time.time() - t0
    tag = "mpc" if with_mpc else "ref"
    print(
        f"[{tag}] r={r} N={N} dofs={V.num_dofs} slaves={mpc.num_local_slaves} "
        f"its={int(its)} rnorm={float(rn):.2e} constraint={t_constraint:.3f}s "
        f"assemble={t_assemble:.3f}s solve={t_solve:.3f}s"
    )
    if out:
        import h5py

        with h5py.File(out, "a") as f:
            grp = f.create_group(f"r{r}_{int(time.time())}")
            grp.create_dataset("its", data=int(its))
            grp.create_dataset("num_dofs", data=V.num_dofs)
            grp.create_dataset("num_slaves", data=np.asarray([mpc.num_local_slaves]))
            grp.create_dataset("solve_time", data=np.asarray([t_solve]))
            grp.create_dataset("assembly_time", data=np.asarray([t_assemble]))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nref", type=int, default=1)
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--out", default="bench_elasticity_results.h5")
    args = p.parse_args()
    run(args.nref, args.rtol, args.out)
