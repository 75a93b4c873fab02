"""Headline benchmark: constrained-assembly throughput (MDoF/s) for the 3D
periodic Poisson problem — the reference's canonical benchmark
(/root/reference/python/benchmarks/bench_periodic.py: 3D Poisson on a unit
cube with a periodic MPC, tet mesh, CG).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MDoF/s", "vs_baseline": N}

vs_baseline divides by an estimated 64-core C++/PETSc reference rate
(REFERENCE_MDOF_S below).  The reference repo publishes no numbers
(BASELINE.md) and this image cannot run dolfinx/PETSc, so the estimate is
~1 MDoF/s/core for P1 tet MPC assembly x 64 cores; BASELINE.json's gate is
5x that per dof.

Env knobs: BENCH_N (mesh resolution, default 64), BENCH_DEGREE (default 1),
BENCH_REPS (default 5).
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_MDOF_S = 64.0  # estimated 64-core C++/PETSc constrained assembly


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", "64"))
    degree = int(os.environ.get("BENCH_DEGREE", "1"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
    from dolfinx_mpc_tpu.ops.assemble import _bc_masks, _get_compiled_matrix

    t0 = time.time()
    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    log(f"mesh: {mesh.num_cells} tets, {V.num_dofs} dofs ({time.time()-t0:.1f}s)")

    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    t0 = time.time()
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V,
        lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]),
        [bc],
    )
    mpc.finalize()
    log(f"constraint: {mpc.num_local_slaves} slaves ({time.time()-t0:.1f}s)")

    # quad_degree=2(p-1): exact for the affine-simplex stiffness integrand
    # (grad u . grad v is degree 2(p-1)); the default heuristic adds headroom
    # for coefficients the Poisson form doesn't have.
    a = dmt.BilinearForm(
        V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=max(2 * (degree - 1), 1)
    )
    dtype = np.float32
    t0 = time.time()
    cm = _get_compiled_matrix(a, mpc, dtype)
    log(f"tables+pattern: nnz={cm.pattern.nnz} ({time.time()-t0:.1f}s)")

    bc_mask = jnp.asarray(_bc_masks(V, [bc], dtype))
    bc_diag = np.zeros(V.num_dofs, dtype)
    bc_diag[bc.dofs] = 1.0
    bc_diag = jnp.asarray(bc_diag)
    diagval = jnp.asarray(1.0, dtype)
    tables = jax.tree_util.tree_map(jnp.asarray, cm.tables)

    def assemble():
        return cm.assemble_fn(tables, [{}], bc_mask, bc_mask, bc_diag, diagval)

    t0 = time.time()
    data = assemble()
    data.block_until_ready()
    log(f"first assembly (compile): {time.time()-t0:.1f}s")
    assert bool(jnp.isfinite(data).all()), "non-finite matrix data"

    times = []
    for _ in range(reps):
        t0 = time.time()
        assemble().block_until_ready()
        times.append(time.time() - t0)
    t = float(np.median(times))
    mdof_s = V.num_dofs / t / 1e6
    log(f"assembly times: {['%.4f' % x for x in times]} -> median {t*1e3:.1f} ms")
    log(f"constrained assembly: {mdof_s:.1f} MDoF/s")

    print(
        json.dumps(
            {
                "metric": "constrained_assembly_p1_3d_periodic",
                "value": round(mdof_s, 2),
                "unit": "MDoF/s",
                "vs_baseline": round(mdof_s / REFERENCE_MDOF_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
