"""Tied contact between stacked cubes with per-phase timings — counterpart of
/root/reference/python/benchmarks/bench_contact_3D.py (phases: constraint
init / assemble matrix / assemble vector / solve / backsubstitution,
:277-331)."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(nb, nt, rtol, out, max_it=8000, cheb=False, seg=100, pc="amg",
        fmt="ell", split=False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from dolfinx_mpc_tpu.utils.tunnel import init_devices_retry

    init_devices_retry()
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags
    from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner

    bot = create_box((0, 0, 0), (1, 1, 1), (nb, nb, nb))
    top = create_box((0, 0, 1), (1, 1, 2), (nt, nt, nt))
    mesh = Mesh(
        np.vstack([bot.points, top.points]),
        np.vstack([bot.cells, top.cells + bot.num_points]),
        bot.cell_type,
    )
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))

    fverts, _, f2c = mesh.facets()
    on_iface = np.isclose(mesh.points[fverts][:, :, 2], 1.0).all(axis=1)
    ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
    iface = np.flatnonzero(on_iface & ext)
    cz = mesh.points[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 2]
    mt = meshtags(mesh, 2, iface, np.where(cz > 1.0, 1, 2))

    timings = {}
    t0 = time.time()
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_contact_inelastic_condition(mt, 1, 2)
    mpc.finalize()
    timings["constraint init"] = time.time() - t0

    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
    tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
    bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)
    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast)
    L = dmt.LinearForm(V, lambda v, c: inner(jnp.zeros(3), v))

    t0 = time.time()
    A = dmt.assemble_matrix(a, mpc, bcs=[bc, bc_top])
    A.data.block_until_ready()
    timings["assemble matrix"] = time.time() - t0
    t0 = time.time()
    b = dmt.assemble_vector(L, mpc)
    b = dmt.apply_lifting(b, [a], [[bc, bc_top]], mpc)
    b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc, bc_top])))
    timings["assemble vector"] = time.time() - t0

    # A as a jit ARG (pytree), not a closure: closed-over index/data arrays
    # become 100MB+ executable constants that fault the device at scale
    # segmented CG: exact Krylov continuation across bounded dispatches —
    # a single long execution is killed by this environment's TPU tunnel
    from dolfinx_mpc_tpu.la.solvers import cg_segmented

    # the reference solves this with GAMG (bench_contact_3D.py:186-213);
    # smoothed-aggregation AMG (la/amg.py) is the TPU counterpart, and the
    # node-block-ELL format (la/ell.py, 97% fill for this sparsity) replaces
    # the scalar segment_sum SpMV.  The ELL fine op is SHARED with the AMG
    # fine level — one HBM copy (8x128 BELL tiles needed 4.8 GiB of padding
    # here and OOM'd at 1M dofs).
    t0 = time.time()
    As = A.to_scipy()
    Aop = A
    if fmt == "ell":
        from dolfinx_mpc_tpu.la.ell import ell_from_scipy

        Aop = ell_from_scipy(As, br=3, k_quantile=99.5, dtype=np.float32)
        del A
    elif fmt == "bell":
        from dolfinx_mpc_tpu.la.bell import bell_from_scipy

        Aop = bell_from_scipy(As, dtype=np.float32)
    M = None
    if pc == "amg":
        from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg
        from dolfinx_mpc_tpu.utils.mpc_utils import rigid_motions_nullspace

        # all 6 rigid-body modes as the near-nullspace — the reference
        # attaches these to GAMG (bench_contact_3D.py:186-213 +
        # mpc_utils.py:163-215); r4: 16 -> 10 its at 7k dofs
        M = smoothed_aggregation_amg(
            As, bs=3, dtype=np.float32,
            fine_op=Aop if fmt == "ell" else None,
            nullspace=rigid_motions_nullspace(V))
    timings["pc+format setup"] = time.time() - t0

    x, its, rn = cg_segmented(Aop, b, M=M, rtol=rtol, max_it=max_it, seg=seg)
    jax.block_until_ready(x)
    t0 = time.time()
    x, its, rn = cg_segmented(Aop, b, M=M, rtol=rtol, max_it=max_it, seg=seg)
    jax.block_until_ready(x)
    timings["solve"] = time.time() - t0

    if split:
        # device-vs-dispatch split of the solve (VERDICT r4 next #4): the
        # wall-clock "solve" above conflates V-cycle device time with the
        # TPU tunnel's ~30-50 ms/dispatch relay and its result-fetch
        # latency.  bench.py's protocol: fixed-iteration CG chains with the
        # trip count TRACED (one compile serves all k), perturbed input to
        # defeat the tunnel's dispatch cache, best-of-3, differenced.
        from dolfinx_mpc_tpu.la.solvers import cg as _cg

        rn_j = jax.jit(lambda Ao, Mo, bb, s, k: _cg(
            Ao.matvec, bb * (1.0 + 1e-9 * s), M=Mo, rtol=0.0, atol=0.0,
            max_it=k)[2])

        def _timed(k):
            best = 1e9
            for rep in range(3):
                s = jnp.float32(1 + rep + 17 * k)
                t1 = time.time()
                np.asarray(rn_j(Aop, M, b, s, k))
                best = min(best, time.time() - t1)
            return best

        k_hi = max(int(its), 9)
        t_lo, t_hi = _timed(2), _timed(k_hi)
        per_it = max((t_hi - t_lo) / (k_hi - 2), 1e-9)
        dev = per_it * int(its)
        timings["solve device (its x per-it)"] = dev
        timings["solve dispatch/relay overhead"] = timings["solve"] - dev
        print(f"  split: {per_it * 1e3:.1f} ms/it on-device "
              f"(T2={t_lo * 1e3:.0f}ms T{k_hi}={t_hi * 1e3:.0f}ms), "
              f"device solve {dev:.2f}s of {timings['solve']:.2f}s wall",
              flush=True)
    t0 = time.time()
    u = mpc.finalized.backsubstitution(x)
    jax.block_until_ready(u)
    timings["backsubstitution"] = time.time() - t0

    print(f"dofs={V.num_dofs} slaves={mpc.num_local_slaves} its={int(its)} rnorm={float(rn):.2e}")
    assert np.isfinite(float(rn)) and np.isfinite(np.asarray(u)).all(), \
        "non-finite solve"
    for k, v in timings.items():
        print(f"  ~MPC: {k}: {v:.4f}s")
    if out:
        with open(out, "w") as f:
            f.write(f"num_dofs {V.num_dofs}\nits {int(its)}\n")
            for k, v in timings.items():
                f.write(f"{k.replace(' ', '_')} {v:.6f}\n")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nb", type=int, default=16, help="bottom cube resolution")
    p.add_argument("--nt", type=int, default=13, help="top cube resolution")
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--max-it", type=int, default=8000)
    p.add_argument("--cheb", action="store_true")
    p.add_argument("--seg", type=int, default=100, help="CG iterations per device dispatch")
    p.add_argument("--pc", choices=["amg", "jacobi"], default="amg")
    p.add_argument("--format", choices=["ell", "bell", "csr"], default="ell",
                   help="device SpMV format for the fine operator")
    p.add_argument("--out", default="results_bench_contact.txt")
    p.add_argument("--split", action="store_true",
                   help="measure the device-vs-dispatch split of the solve")
    args = p.parse_args()
    run(args.nb, args.nt, args.rtol, args.out, max_it=args.max_it, cheb=args.cheb,
        seg=args.seg, pc=args.pc, fmt=args.format, split=args.split)
