"""3D periodic Poisson benchmark — counterpart of
/root/reference/python/benchmarks/bench_periodic.py.

Refinement ladder N = 3·2^r (same as the reference's --nref), CG + Jacobi,
writes the reference's HDF5 schema {its, num_dofs, num_slaves, solve_time}
(bench_periodic.py:219-226) plus assembly_time.  P1 runs ride the lattice
fast path; --degree 2 exercises the general slot-CSR assembler.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(r, degree, rtol, out, boomeramg=False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
    from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner

    N = 3 * 2 ** r
    dtype = np.float32
    t0 = time.time()
    mesh = create_unit_cube(N, N, N)
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=dtype)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    t_setup = time.time() - t0

    a = dmt.BilinearForm(
        V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=degree
    )
    L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)

    t0 = time.time()
    # the DIA fast path covers degrees 1 AND 2 (grid-lex P2 numbering;
    # fused pallas kernels on accelerators); general CSR beyond
    try:
        from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

        clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=dtype)
        A = clf.assemble()
        jax.block_until_ready(A.dia.data)
    except (ValueError, AssertionError):
        A = dmt.assemble_matrix(a, mpc, bcs=[bc], dtype=dtype)
        A.data.block_until_ready()
    t_assemble = time.time() - t0

    b = dmt.assemble_vector(L, mpc, dtype=dtype)
    b = dmt.apply_lifting(b, [a], [[bc]], mpc, dtype=dtype)
    b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc])))

    solve = jax.jit(
        lambda A_, b: cg(A_.matvec, b, M=jacobi_preconditioner(A_.diagonal()), rtol=rtol, max_it=5000)
    )
    solve_ = solve
    solve = lambda b: solve_(A, b)
    x, its, rn = solve(b)
    x.block_until_ready()  # includes compile
    t0 = time.time()
    x, its, rn = solve(b * 1.0000001)
    x.block_until_ready()
    t_solve = time.time() - t0
    u = mpc.finalized.backsubstitution(x)

    print(
        f"r={r} N={N} dofs={V.num_dofs} slaves={mpc.num_local_slaves} "
        f"its={int(its)} rnorm={float(rn):.2e} setup={t_setup:.2f}s "
        f"assemble={t_assemble:.3f}s solve={t_solve:.3f}s"
    )
    if out:
        import h5py

        with h5py.File(out, "a") as f:
            grp = f.create_group(f"r{r}_deg{degree}_{int(time.time())}")
            grp.create_dataset("its", data=int(its))
            grp.create_dataset("num_dofs", data=V.num_dofs)
            grp.create_dataset("num_slaves", data=np.asarray([mpc.num_local_slaves]))
            grp.create_dataset("solve_time", data=np.asarray([t_solve]))
            grp.create_dataset("assembly_time", data=np.asarray([t_assemble]))
    return u


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nref", type=int, default=2, help="refinement level: N = 3*2^r")
    p.add_argument("--degree", type=int, default=1)
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--tet", action="store_true", help="(always tet; flag kept for parity)")
    p.add_argument("--boomeramg", action="store_true", help="(parity flag; Jacobi-CG here)")
    p.add_argument("--out", default="bench_periodic_results.h5")
    args = p.parse_args()
    run(args.nref, args.degree, args.rtol, args.out, args.boomeramg)
