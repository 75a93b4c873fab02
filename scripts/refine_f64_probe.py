"""Mixed-precision iterative refinement: the BASELINE 1e-8 gate ON-CHIP.

All recorded TPU numbers are f32 (rtol 1e-6); the 1e-8..1e-12 oracle gates
run only in f64 on CPU (PARITY Known gaps, VERDICT r4 missing #6).  This
probe closes the gap the standard mixed-precision way (HPL-AI / Carson &
Higham): the heavy solve runs ON-CHIP in f32 (GMG-CG, the production
path), while the cheap residual r = b - A x is evaluated in f64 against
the host-assembled f64 operator.  Each refinement step contracts the f64
residual by ~the inner solve's rtol, so 2-3 device solves reach 1e-12 —
f64-quality answers at f32 speed, cond(A)*eps_f32 ~ 4e-4 << 1 at n=64.

Gate: relative L2 agreement <= 1e-8 between the refined on-chip solution
and an independent f64 CPU solve of the same reduced system (the
reference's demo-output agreement gate, BASELINE.md).

Run: python scripts/refine_f64_probe.py  (TPU via the axon tunnel)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["DMT_REEXEC"] = "1"

import numpy as np

N = int(os.environ.get("REFINE_N", "64"))
RTOL_INNER = 1e-5
TARGET = 1e-12  # f64 residual target; leaves margin under the 1e-8 gate


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_problem(m, dtype):
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube

    mesh = create_unit_cube(m, m, m)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=dtype)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)),
                         quad_degree=1)
    L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)
    return V, bc, mpc, a, L


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    from dolfinx_mpc_tpu.utils.tunnel import init_devices_retry

    init_devices_retry()
    import contextlib

    import jax.numpy as jnp

    import bench
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.la.gmg import LatticeGMG, build_gmg_hierarchy
    from dolfinx_mpc_tpu.la.solvers import cg
    from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

    cpu0 = jax.devices("cpu")[0]

    # ---- host-side f64 truth: operator, rhs, independent solution -------
    t0 = time.time()
    with jax.default_device(cpu0):
        V, bc, mpc, a, L = make_problem(N, np.float64)
        prev = os.environ.get("DMT_NO_PALLAS")
        os.environ["DMT_NO_PALLAS"] = "1"
        try:
            clf64 = assemble_matrix_lattice(a, mpc, bcs=[bc],
                                            dtype=np.float64,
                                            side_format="fold")
            A64op = clf64.assemble()
        finally:
            if prev is None:
                del os.environ["DMT_NO_PALLAS"]
            else:
                os.environ["DMT_NO_PALLAS"] = prev
        A64 = A64op.to_scipy().tocsr()
        b64 = np.asarray(dmt.assemble_vector(L, mpc, dtype=np.float64))
        b64 = np.asarray(dmt.apply_lifting(b64, [a], [[bc]], mpc,
                                           dtype=np.float64))
        b64 = np.asarray(dmt.set_bc(b64, [bc])).astype(np.float64)
    log(f"host f64 operator: {A64.shape[0]} dofs, nnz {A64.nnz}, "
        f"{time.time() - t0:.1f}s")

    t0 = time.time()
    import scipy.sparse.linalg as spla

    d = A64.diagonal()
    Mj = spla.LinearOperator(A64.shape, lambda v: v / d)
    x_ref, info = spla.cg(A64, b64, M=Mj, rtol=1e-13, atol=0.0, maxiter=20000)
    assert info == 0, f"reference CG failed: {info}"
    log(f"reference f64 CPU solve: {time.time() - t0:.1f}s, "
        f"residual {np.linalg.norm(b64 - A64 @ x_ref) / np.linalg.norm(b64):.2e}")

    # ---- on-chip f32 production solver (assembler + GMG-CG) -------------
    t0 = time.time()
    with jax.default_device(cpu0):
        Vf, bcf, mpcf, af, Lf = make_problem(N, np.float32)
        clf = assemble_matrix_lattice(af, mpcf, bcs=[bcf], dtype=np.float32,
                                      side_format="fold")
    bench._ship_to_device([clf, mpcf, bcf], jax.devices()[0])
    A = clf.assemble()

    def make_level(m):
        with jax.default_device(cpu0):
            _, bc_l, mpc_l, a_l, _ = make_problem(m, np.float32)
            return assemble_matrix_lattice(a_l, mpc_l, bcs=[bc_l],
                                           dtype=np.float32,
                                           side_format="fold")

    ops, masks = bench._load_or_build_hierarchy(
        make_level, N, 1, build_gmg_hierarchy, bs=1)
    ops[0] = A
    M = LatticeGMG(ops, free_masks=masks, smoother="chebyshev")
    log(f"device solver setup: {time.time() - t0:.1f}s")

    @jax.jit
    def solve_f32(A_, M_, r32):
        return cg(A_.matvec, r32, M=M_, rtol=RTOL_INNER, atol=0.0,
                  max_it=500)

    # ---- refinement loop ------------------------------------------------
    t0 = time.time()
    x = np.zeros_like(b64)
    bnorm = np.linalg.norm(b64)
    history = []
    total_its = 0
    for k in range(8):
        r = b64 - A64 @ x  # f64 residual on host
        rel = np.linalg.norm(r) / bnorm
        history.append(float(rel))
        if rel <= TARGET:
            break
        dx, its, _ = solve_f32(A, M, jnp.asarray(r, jnp.float32))
        total_its += int(its)
        x = x + np.asarray(dx, np.float64)
    wall = time.time() - t0
    log(f"refinement: residual history {['%.2e' % h for h in history]}, "
        f"{total_its} total inner GMG-CG its, {wall:.1f}s wall")

    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    log(f"rel L2 vs independent f64 CPU solve: {err:.2e}")
    assert err < 1e-8, err
    assert history[-1] <= TARGET
    print(json.dumps({
        "metric": "refined_f64_residual_p1_3d_periodic",
        "value": history[-1], "unit": "rel_l2_residual",
        "n": N, "dofs": int(A64.shape[0]),
        "refine_steps": len(history) - 1, "inner_its_total": total_its,
        "rel_l2_vs_f64_cpu": float(err), "gate_1e-8": bool(err < 1e-8),
    }))


if __name__ == "__main__":
    main()
