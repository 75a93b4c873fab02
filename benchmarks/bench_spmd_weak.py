"""Weak-scaling evidence for the GENERAL (unstructured row-block) SPMD path
at >= 500k dofs on an 8-virtual-device CPU mesh (VERDICT r3 weak #6 / next
#8): per-device vector window and table bytes vs problem size, plus solver
iterations — the analogue of the reference's mpirun scaling tables
(SURVEY.md §2.3, cpp/mpc_helpers.h:139-235 ghost-region construction).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/bench_spmd_weak.py [--cases poisson,contact]

Prints one table row per config:
  case n dofs n_dev window window_frac dev_table_MB dev_slot_MB its rnorm wall_s
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# the image's sitecustomize pins JAX_PLATFORMS=axon and imports jax at
# interpreter startup, so env vars are too late — force CPU via config
# (the backend itself has not initialized yet) and make 8 virtual devices
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # the f64 table rows must BE f64

import numpy as np


def _tab_bytes(tabs):
    total = 0
    for tb in tabs:
        for v in tb.values():
            if isinstance(v, dict):
                total += sum(int(np.asarray(w).nbytes) for w in v.values())
            else:
                total += int(np.asarray(v).nbytes)
    return total


def _poisson(n):
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube

    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)
    return V, a, L, mpc, [bc]


def _contact(nb, nt):
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags

    bot = create_box((0, 0, 0), (1, 1, 1), (nb, nb, nb))
    top = create_box((0, 0, 1), (1, 1, 2), (nt, nt, nt))
    mesh = Mesh(np.vstack([bot.points, top.points]),
                np.vstack([bot.cells, top.cells + bot.num_points]),
                bot.cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    fverts, _, f2c = mesh.facets()
    on_iface = np.isclose(mesh.points[fverts][:, :, 2], 1.0).all(axis=1)
    ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
    iface = np.flatnonzero(on_iface & ext)
    cz = mesh.points[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 2]
    mt = meshtags(mesh, 2, iface, np.where(cz > 1.0, 1, 2))
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_contact_inelastic_condition(mt, 1, 2)
    mpc.finalize()
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
    tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
    bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)
    a = dmt.BilinearForm(V, lambda u, v, c: 2 * inner(sym(grad(u)), sym(grad(v)))
                         + 1.25 * div(u) * conj(div(v)))
    L = dmt.LinearForm(V, lambda v, c: inner(jnp.zeros(3), v))
    return V, a, L, mpc, [bc, bc_top]


def run_case(label, n_label, builder, n_dev, rtol, max_it, dtype=np.float64):
    from dolfinx_mpc_tpu.parallel import ShardedLinearProblem, make_device_mesh

    V, a, L, mpc, bcs = builder()
    t0 = time.time()
    prob = ShardedLinearProblem(a, L, mpc, bcs,
                                device_mesh=make_device_mesh(n_dev),
                                rtol=rtol, max_it=max_it, dtype=dtype)
    setup = time.time() - t0
    dev_tab = (_tab_bytes(prob._a_tabs) + _tab_bytes(prob._L_tabs)) / n_dev
    dev_slot = prob.part.nnz_pad * np.dtype(dtype).itemsize
    t0 = time.time()
    u, its, rnorm = prob.solve()
    wall = time.time() - t0
    assert np.isfinite(np.asarray(u)).all()
    frac = prob._window / V.num_dofs
    print(f"{label:8s} {n_label:>7} {V.num_dofs:>9} {n_dev:>2} "
          f"{prob._window:>9} {frac:6.3f} {dev_tab/1e6:9.1f} "
          f"{dev_slot/1e6:9.1f} {int(its):>5} {float(rnorm):.2e} "
          f"{wall:7.1f} (setup {setup:.1f}s)", flush=True)
    return dict(case=label, n=n_label, dofs=int(V.num_dofs), n_dev=n_dev,
                window=int(prob._window), frac=float(frac),
                dev_table_mb=dev_tab / 1e6, dev_slot_mb=dev_slot / 1e6,
                its=int(its), rnorm=float(rnorm), wall=wall)


def run_gmg_case(n, n_dev, rtol):
    """Sharded-GMG lattice path at >= 500k dofs: the 2-level scheme's
    psum-replicated (n/2) hierarchy vs sharded_levels=2 (middle level
    sharded, only the (n/4) tail replicated) — the memory_report()
    evidence VERDICT r4 next #3/#6 ask for."""
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.la.gmg import LatticeGMG, build_gmg_hierarchy
    from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice
    from dolfinx_mpc_tpu.parallel import make_device_mesh
    from dolfinx_mpc_tpu.parallel.lattice_spmd import ShardedLatticeProblem

    V, a, L, mpc, bcs = _poisson(n)

    def make_level(m):
        Vl, al, Ll, mpcl, bcl = _poisson(m)
        return assemble_matrix_lattice(al, mpcl, bcs=bcl, side_format="fold")

    t0 = time.time()
    # 4 levels (40/20/10/5 at n=80): a coarsest of 6^3 keeps the dense
    # coarse inverse at 0.4 MB — with a 11^3 coarsest its 14 MB inverse
    # dominated the replicated tail and masked the middle-level shard win
    ops, masks = build_gmg_hierarchy(make_level, n // 2, 4, min_n=5)
    cg = LatticeGMG(ops, free_masks=masks)
    hier = time.time() - t0
    rows = []
    for lvls in (1, 2):
        t0 = time.time()
        prob = ShardedLatticeProblem(
            a, L, mpc, bcs, device_mesh=make_device_mesh(n_dev), rtol=rtol,
            pc_type="gmg", coarse_gmg=cg, sharded_levels=lvls)
        setup = time.time() - t0
        t0 = time.time()
        u, its, rnorm = prob.solve()
        wall = time.time() - t0
        assert np.isfinite(np.asarray(u)).all()
        rep = prob.memory_report()
        print(f"gmg-{lvls}lvl {n:>6} {V.num_dofs:>9} {n_dev:>2} "
              f"rep_coarse {rep['replicated_coarse']/1e6:8.1f} MB/dev  "
              f"sharded {rep['sharded_per_device']/1e6:8.1f} MB/dev  "
              f"{int(its):>4} {float(rnorm):.2e} {wall:7.1f} "
              f"(setup {setup:.1f}s, hierarchy {hier:.1f}s)", flush=True)
        rows.append(dict(case=f"gmg-{lvls}lvl", n=n, dofs=int(V.num_dofs),
                         n_dev=n_dev, rep_coarse_mb=rep["replicated_coarse"] / 1e6,
                         sharded_mb=rep["sharded_per_device"] / 1e6,
                         its=int(its), rnorm=float(rnorm), wall=wall))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", default="poisson,contact,contact1m,gmg")
    p.add_argument("--big-dtype", default="f32", choices=["f32", "f64"])
    p.add_argument("--max-it", type=int, default=1200)
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    print("case         n      dofs nd    window  frac  tab_MB/d slot_MB/d "
          "  its rnorm      wall_s", flush=True)
    cases = set(args.cases.split(","))
    rows = []
    if "poisson" in cases:
        for n in (24, 40, 64, 81):  # 15.6k .. 551k dofs
            rows.append(run_case(
                "poisson", str(n), lambda n=n: _poisson(n), 8,
                args.rtol, args.max_it))
        # single-device reference point for the window fraction
        rows.append(run_case("poisson", "64(1d)", lambda: _poisson(64), 1,
                             args.rtol, args.max_it))
    if "contact" in cases:
        for nb, nt in ((24, 20), (40, 34)):  # 74.7k / 335k dofs
            rows.append(run_case(
                "contact", f"{nb}/{nt}", lambda nb=nb, nt=nt: _contact(nb, nt),
                8, args.rtol, args.max_it))
    if "contact1m" in cases:
        # the 1.01M-dof case OOM-kills this 125 GB host in f64 (129 GB of
        # 8-device tables + assembly intermediates, oom-kill recorded
        # 2026-08-21) — it runs in f32, flagged in the table
        dt = np.float32 if args.big_dtype == "f32" else np.float64
        rows.append(run_case(
            "contact", "58/50*", lambda: _contact(58, 50),
            8, max(args.rtol, 1e-5) if dt == np.float32 else args.rtol,
            args.max_it, dtype=dt))
    if "gmg" in cases:
        rows.extend(run_gmg_case(80, 8, args.rtol))  # 531k dofs
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
