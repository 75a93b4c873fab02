"""Headline benchmark: constrained assembly + CG solve for 3D periodic
Poisson — the reference's canonical benchmark
(/root/reference/python/benchmarks/bench_periodic.py: unit-cube tet mesh,
periodic MPC, CG; Makefile baseline `--nref 6 --tet --degree 2` on 23 ranks).

Measurement protocol (round-3 rewrite; the round-2 artifact was corrupted by
two tunnel behaviors):
 - `block_until_ready()` does NOT block through the axon TPU tunnel — only a
   VALUE FETCH forces execution.  Every timed region ends with np.asarray()
   on a scalar result, and the queue is drained before t0.
 - The tunnel caches identical dispatches, so every timed call carries a
   fresh seed argument that perturbs the input.
 - Per-op time comes from differencing two on-device chain lengths
   (fori/while loop trip count passed as a TRACED argument — one compile
   serves all K).  A noise-floor guard grows K until the difference clears
   4 ms and flags the JSON with "suspect_noise_floor" if it cannot, plus a
   physical roofline guard (effective write bandwidth must stay below
   1.2 TB/s on a ~0.8 TB/s HBM part).
 - Phase breakdown on stderr: assembly, single SpMV, one GMG V-cycle, CG
   per-iteration (fixed-iteration differencing), and the converged solve.
 - pallas==XLA is asserted ON-CHIP for both the assembler and the SpMV
   before any timing (VERDICT r2 weak #6); skip with DMT_SKIP_EQCHECK=1.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by a MEASURED reference rate: csrc/ref_baseline.cpp
reimplements the reference's per-cell constrained-assembly pipeline
(verified matrix-identical to this package in tests/test_ref_baseline.py),
is measured on this host, and the per-core MDoF/s is scaled by the 64 cores
of the node named in BASELINE.md — i.e. the reference is granted IDEAL
linear MPI scaling, which is generous to it.  If the C++ toolchain is
unavailable the old 1.0 MDoF/s/core estimate is used and flagged on stderr.

Env knobs: BENCH_N (default 64), BENCH_CHAIN (default 33),
BENCH_XCHUNKS (default 1; >1 bounds the assembly working set by processing
x-slabs inside one fori_loop — needed beyond ~n=96 on a 16 GB chip),
BENCH_DEGREE (default 1; 2 = the reference's canonical --degree 2 config,
riding the refined-grid DIA fast path), BENCH_BS (default 1; 3 = vector P1
elasticity — the reference's bench_elasticity_edge problem class — against
a bs=3 elasticity build of the measured C++ baseline).
"""

import itertools
import json
import os
import sys
import time

# this image sets PYTHONDONTWRITEBYTECODE=1, so every process re-compiles
# ~40 MB of generated mlir/mosaic python to bytecode (~40 s of the measured
# host setup).  Re-exec once with a pycache under $HOME: the first run pays
# the compile and caches it, every later run loads .pyc.
if os.environ.pop("PYTHONDONTWRITEBYTECODE", None) and not os.environ.get("DMT_REEXEC"):
    os.environ["PYTHONPYCACHEPREFIX"] = os.path.expanduser("~/.pycache")
    os.environ["DMT_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import numpy as np

REFERENCE_CORES = 64  # node size named in BASELINE.md


def reference_mdof_s(n: int, degree: int = 1, bs: int = 1) -> float:
    """Measured per-core CPU reference rate x ideal 64-core scaling."""
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_cpu_baseline",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "benchmarks", "ref_cpu_baseline.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # cap the reference problem size: past ~n=128 the single-core C++
        # sparsity-setup RAM and runtime explode while the per-core rate only
        # drops (cache effects) — capping is GENEROUS to the reference
        res = mod.measure(n=min(n, (128 if degree == 1 else 64) // bs),
                          degree=degree, bs=bs)
        rate = res["mdof_s"] / res["threads"] * REFERENCE_CORES
        log(f"reference baseline (measured): {res['mdof_s']:.2f} MDoF/s/core "
            f"x {REFERENCE_CORES} ideal cores = {rate:.1f} MDoF/s")
        return rate
    except Exception as e:  # pragma: no cover - toolchain missing
        log(f"WARNING: measured baseline unavailable ({e}); "
            f"falling back to 1.0 MDoF/s/core estimate")
        return 1.0 * REFERENCE_CORES


def log(*args):
    print(*args, file=sys.stderr, flush=True)


SEED = itertools.count(1)


def timed(run, reps=4):
    """Best-of-reps wall time of run(seed) with the result VALUE-FETCHED
    (block_until_ready is a no-op through the TPU tunnel) and a fresh seed
    per call (the tunnel caches identical dispatches)."""
    best = 1e9
    for _ in range(reps):
        s = float(next(SEED))
        t0 = time.time()
        np.asarray(run(s))
        best = min(best, time.time() - t0)
    return best


def chain_diff(run_chain, k_lo, k_hi, label, floor=4e-3, k_max=4096):
    """Per-op seconds from (T(k_hi) - T(k_lo)) / (k_hi - k_lo), growing k_hi
    until the difference clears `floor` (k is a traced arg: no recompiles).
    Returns (per_op_seconds, suspect: bool)."""
    t_lo = timed(lambda s: run_chain(s, k_lo))
    t_hi = timed(lambda s: run_chain(s, k_hi))
    while (t_hi - t_lo) < floor and k_hi * 2 <= k_max:
        k_hi *= 2
        t_hi = timed(lambda s: run_chain(s, k_hi))
    per = (t_hi - t_lo) / (k_hi - k_lo)
    suspect = (t_hi - t_lo) < floor or per <= 0
    log(f"{label}: T{k_lo}={t_lo*1e3:.1f}ms T{k_hi}={t_hi*1e3:.1f}ms -> "
        f"{per*1e3:.3f} ms/op" + ("  ** NOISE FLOOR — SUSPECT **" if suspect else ""))
    return max(per, 1e-9), suspect


def _init_devices_retry(tries=10, sleep=30):
    from dolfinx_mpc_tpu.utils.tunnel import init_devices_retry

    return init_devices_retry(tries=tries, sleep=sleep, log=log)


def _hier_code_hash():
    """Hash of the sources that determine assembled coarse-level values —
    keys the on-disk hierarchy cache so a kernel change invalidates it."""
    import hashlib

    base = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha1()
    for p in ("dolfinx_mpc_tpu/ops/lattice.py",
              "dolfinx_mpc_tpu/ops/pallas_lattice.py",
              "dolfinx_mpc_tpu/ops/soa_kernels.py",
              "dolfinx_mpc_tpu/la/gmg.py",
              # element tabulation / form compilation also determine the
              # assembled entries — a change there must invalidate the cache
              "dolfinx_mpc_tpu/fem/elements.py",
              "dolfinx_mpc_tpu/fem/forms.py",
              "dolfinx_mpc_tpu/fem/quadrature.py",
              # so do the mesh/dof layout, BC dof location, slave sets (baked
              # into the cached free masks), and the assembler itself
              "dolfinx_mpc_tpu/fem/mesh.py",
              "dolfinx_mpc_tpu/fem/functionspace.py",
              "dolfinx_mpc_tpu/multipointconstraint.py",
              "dolfinx_mpc_tpu/ops/assemble.py"):
        h.update(open(os.path.join(base, p), "rb").read())
    return h.hexdigest()[:12]


def _cache_read_path(fname):
    """First existing cache location: the user cache dir, then the repo's
    checked-in `benchmarks/cache/` (pre-built for the driver's COLD
    environment — the keyed code hash makes staleness impossible: any change
    to the value-determining sources produces a different filename and the
    build falls back to the cold path).  Returns None when neither exists."""
    for d in (os.path.expanduser("~/.dmt_bench_cache"),
              os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "cache")):
        p = os.path.join(d, fname)
        if os.path.exists(p):
            return p
    return None


def _cache_save(fname, payload):
    """Write to the user cache dir; with DMT_CACHE_EXPORT=1 also write a
    COMPRESSED copy into the repo's benchmarks/cache/ (stencil data is
    near-constant in the interior and compresses ~50x)."""
    cache_dir = os.path.expanduser("~/.dmt_bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(os.path.join(cache_dir, fname), **payload)
    if os.environ.get("DMT_CACHE_EXPORT"):
        rdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "cache")
        os.makedirs(rdir, exist_ok=True)
        np.savez_compressed(os.path.join(rdir, fname), **payload)


def _load_or_build_hierarchy(make_level, n, degree, build_gmg_hierarchy, bs=1,
                             levels=None):
    """Coarse GMG levels (levels 1+) from a keyed disk cache: each is a few
    MB of DIA data whose per-level host setup + remote assembly compile
    otherwise costs ~15 s of the bench wall clock.  Level 0 is ALWAYS
    assembled fresh (ops[0] is overwritten by the caller), so the cache can
    never ship a stale fine operator."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.lattice import BlockDIAMatrix, DIAMatrix, LatticeOperator

    fname = (f"gmgh_p{degree}{'' if bs == 1 else f'_bs{bs}'}_n{n}"
             f"{'' if levels is None else '_pc%d' % len(levels)}"
             f"_{_hier_code_hash()}.npz")
    path = _cache_read_path(fname)
    if path is not None:
        z = np.load(path)
        nlev = int(z["nlev"])
        ops, masks = [None], [jnp.asarray(z["mask0"])]
        for l in range(1, nlev):
            if f"trips{l}" in z:  # parity-blocked (degree-2) level
                tr = z[f"trips{l}"]
                trips = tuple((tuple(int(v) for v in t[0:3]),
                               tuple(int(v) for v in t[3:6]),
                               tuple(int(v) for v in t[6:9])) for t in tr)
                dia = BlockDIAMatrix(
                    jnp.asarray(z[f"data{l}"]), trips,
                    tuple(int(v) for v in z[f"vshape{l}"]),
                    tuple(int(v) for v in z[f"r3_{l}"]), int(z[f"bs{l}"]))
            else:
                dia = DIAMatrix(jnp.asarray(z[f"data{l}"]),
                                tuple(tuple(int(v) for v in o) for o in z[f"offsets{l}"]),
                                tuple(int(v) for v in z[f"vshape{l}"]), int(z[f"bs{l}"]))
            fa = int(z[f"fold_axis{l}"])
            op = LatticeOperator(
                dia, jnp.zeros((0,), dia.data.dtype), None, None,
                int(z[f"nrows{l}"]), diagval=jnp.asarray(z[f"diagval{l}"]),
                fold_axis=None if fa < 0 else fa,
                fold_mask=(jnp.asarray(z[f"fold_mask{l}"])
                           if z[f"fold_mask{l}"].size else None),
            )
            ops.append(op)
            masks.append(jnp.asarray(z[f"mask{l}"]))
        log(f"GMG coarse levels from cache ({os.path.basename(path)})")
        return ops, masks
    # coarse_on_cpu: each cache-miss coarse level otherwise pays a fresh
    # remote accelerator compile (~40-60 s); locally-compiled CPU assembly of
    # a <=300k-dof coarse operator takes seconds and is device_put once
    ops, masks = build_gmg_hierarchy(make_level, n, 4, min_n=8,
                                     coarse_on_cpu=True, levels=levels)
    if any(op._unassembled() or op.side_data.shape[0] for op in ops[1:]):
        return ops, masks  # non-lean levels carry side blocks: don't cache
    try:
        payload = {"nlev": len(ops), "mask0": np.asarray(masks[0])}
        for l in range(1, len(ops)):
            op = ops[l]
            if hasattr(op.dia, "trips"):  # BlockDIAMatrix
                payload[f"trips{l}"] = np.asarray(
                    [list(a) + list(b) + list(c) for a, b, c in op.dia.trips],
                    np.int64)
                payload[f"r3_{l}"] = np.asarray(op.dia.r3, np.int64)
            else:
                payload[f"offsets{l}"] = np.asarray(op.dia.offsets, np.int64)
            payload.update({
                f"data{l}": np.asarray(op.dia.data),
                f"vshape{l}": np.asarray(op.dia.vshape, np.int64),
                f"bs{l}": op.dia.bs,
                f"nrows{l}": op.side_nrows,
                f"diagval{l}": np.asarray(op.diagval),
                f"fold_axis{l}": -1 if op.fold_axis is None else op.fold_axis,
                f"fold_mask{l}": (np.asarray(op.fold_mask)
                                  if op.fold_mask is not None else np.zeros(0)),
                f"mask{l}": np.asarray(masks[l]),
            })
        _cache_save(fname, payload)
    except Exception as e:  # cache is best-effort
        log(f"hierarchy cache save failed ({e})")
    return ops, masks


def _ship_to_device(roots, dev):
    """Move every jax.Array reachable from the package objects in `roots`
    onto `dev` with batched device_puts (one transfer program per object,
    not one tunnel round trip per array).  Only walks dolfinx_mpc_tpu
    objects; plain numpy stays host-side."""
    import jax

    seen = set()

    def walk(obj):
        if obj is None or id(obj) in seen:
            return
        seen.add(id(obj))
        if isinstance(obj, (list, tuple)):
            for x in obj:
                walk(x)
            return
        if isinstance(obj, dict):
            arr = {k: v for k, v in obj.items() if isinstance(v, jax.Array)}
            if arr:
                moved = jax.device_put(list(arr.values()), dev)
                for k, m in zip(arr, moved):
                    obj[k] = m
            for v in obj.values():
                if not isinstance(v, jax.Array):
                    walk(v)
            return
        if not type(obj).__module__.startswith("dolfinx_mpc_tpu"):
            return
        d = getattr(obj, "__dict__", None)
        if d is None:
            return
        arr = {k: v for k, v in d.items() if isinstance(v, jax.Array)}
        if arr:
            moved = jax.device_put(list(arr.values()), dev)
            for k, m in zip(arr, moved):
                d[k] = m
        for k, v in d.items():
            if isinstance(v, (list, tuple)) and v and all(
                    isinstance(x, jax.Array) for x in v):
                d[k] = type(v)(jax.device_put(list(v), dev))
            elif not isinstance(v, jax.Array):
                walk(v)

    for r in roots:
        walk(r)


def main():
    n = int(os.environ.get("BENCH_N", "64"))
    K = int(os.environ.get("BENCH_CHAIN", "33"))
    xchunks = int(os.environ.get("BENCH_XCHUNKS", "1"))
    degree = int(os.environ.get("BENCH_DEGREE", "1"))
    bs = int(os.environ.get("BENCH_BS", "1"))  # 3 = vector elasticity

    import threading

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    # backend init through the TPU tunnel is 10-90+ s of pure network wait
    # (measured) — start it on a thread so the NUMPY-ONLY part of host setup
    # (mesh/space/bc/mpc construction) overlaps the handshake.  The thread
    # MUST be joined before the first eager jnp op (mpc.finalize): two
    # threads racing into axon backend init deadlock the plugin.
    init_t0 = time.time()
    init_thread = threading.Thread(target=_init_devices_retry, daemon=True)
    init_thread.start()

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
    from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

    def make_problem(m, deg=None):
        """(mesh, V, bc, mpc, form) for size m — scalar Poisson (bs=1) or
        vector elasticity (bs=3, reference bench_elasticity_edge.py)."""
        deg = degree if deg is None else deg
        mesh_m = create_unit_cube(m, m, m)
        shape = () if bs == 1 else (bs,)
        V_m = dmt.functionspace(mesh_m, ("Lagrange", deg, shape) if bs > 1
                                else ("Lagrange", deg))
        bdofs_m = dmt.locate_dofs_geometrical(
            V_m, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
        )
        bc_m = dmt.dirichletbc(0.0 if bs == 1 else np.zeros(bs), bdofs_m, V_m)
        mpc_m = dmt.MultiPointConstraint(V_m, dtype=np.float32)
        mpc_m.create_periodic_constraint_geometrical(
            V_m,
            lambda x: np.isclose(x[0], 1.0),
            lambda x: np.stack([1.0 - x[0], x[1], x[2]]),
            [bc_m],
        )
        if bs == 1:
            a_m = dmt.BilinearForm(V_m, lambda u, v, c: inner(grad(u), grad(v)),
                                   quad_degree=deg)
        else:
            from dolfinx_mpc_tpu.fem.forms import conj, div, sym

            mu, lam = 1.0, 1.25
            a_m = dmt.BilinearForm(
                V_m,
                lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
                + lam * div(u) * conj(div(v)),
                quad_degree=deg,
            )
        return mesh_m, V_m, bc_m, mpc_m, a_m

    t0 = time.time()
    mesh, V, bc, mpc, a = make_problem(n)
    init_thread.join()  # before the first eager jnp op (finalize)
    log(f"devices: {jax.devices()} (init overlapped with mesh setup, "
        f"{time.time()-init_t0:.1f}s since start)")
    # finalize + table construction run EAGER jnp ops; through the TPU
    # tunnel each one is a ~40 ms remote dispatch (measured: 118 s of the
    # n=64 setup was tunnel round trips vs 7.8 s of actual host work on the
    # CPU backend).  Build everything on the LOCAL CPU backend, then ship
    # the finished tables to the accelerator in ONE batched device_put.
    # (BENCH_SETUP_TPU=1 restores the old eager-on-accelerator behaviour.)
    import contextlib

    cpu0 = jax.devices("cpu")[0]
    setup_ctx = (contextlib.nullcontext() if os.environ.get("BENCH_SETUP_TPU")
                 else jax.default_device(cpu0))
    with setup_ctx:
        mpc.finalize()
        # side format preference: "fold" (plane identification — matching
        # periodic constraints collapse into the stencil, zero irregular
        # ops) -> "cells" (unassembled per-cell interface blocks).  Both
        # verified operator-identical to the assembled CSR side in
        # tests/test_lattice.py.
        try:
            clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                          side_format="fold", x_chunks=xchunks)
            log("side format: fold" + (" (lean)" if clf._lean else ""))
        except ValueError:
            clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                          side_format="cells")
            log("side format: cells")
    _ship_to_device([clf, mpc, bc], jax.devices()[0])
    nnz_msg = ("lean (no side pattern)" if clf.pattern is None
               else f"side nnz {clf.pattern.nnz}")
    log(
        f"setup {time.time()-t0:.1f}s: {mesh.num_cells} tets, {V.num_dofs} dofs, "
        f"{mpc.num_local_slaves} slaves, {nnz_msg}"
    )

    f = clf._assemble
    dv = jnp.asarray(1.0, jnp.float32)
    if clf._lean:
        # lean fold: assembly is f(jitter, diagval, keep) — coords
        # synthesized on device; the seed perturbs the jitter to defeat the
        # tunnel's dispatch cache while keeping real per-cell geometry work
        keepg = clf._keep_arg  # blocked (degree-2) or fine keep grid

        @jax.jit
        def chain(j0, kg, k):
            # keep_grid must be an ARGUMENT of the jitted chain: closed over,
            # XLA constant-folds its broadcast/pad chains into 632MB padded
            # literals (P2 n=54 OOM)
            def body(i, acc):
                r = f(j0 + 1e-7 * i.astype(jnp.float32), dv, kg)
                return acc + r.dia.data.ravel()[0]
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        run_chain = lambda s, k: chain(jnp.float32(s * 1e-6), keepg, k)
    else:
        keep = clf._keep_soa
        coords = clf.coords_soa

        @jax.jit
        def chain(c, k):
            def body(i, acc):
                r = f(c * (1.0 + 1e-7 * i.astype(jnp.float32)), keep, {}, dv)
                acc = acc + r.dia.data.ravel()[0]
                if r.side_Aep is not None and r.side_Aep.shape[0]:
                    acc = acc + r.side_Aep.ravel()[0]
                elif r.side_data is not None and r.side_data.shape[0]:
                    acc = acc + r.side_data[0]
                return acc
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        run_chain = lambda s, k: chain(coords * (1.0 + 1e-9 * s), k)

    t0 = time.time()
    np.asarray(run_chain(0.0, 1))
    np.asarray(run_chain(0.0, K))
    log(f"assembly compile+warm: {time.time()-t0:.1f}s")

    # ---- on-chip pallas == XLA equivalence (before any timing) ----------
    on_tpu = jax.default_backend() not in ("cpu",)
    if (on_tpu and clf._lean and getattr(clf, "_pallas_raw", None) is not None
            and not os.environ.get("DMT_SKIP_EQCHECK")):
        t0 = time.time()
        jit_t = jnp.float32(3e-7)
        d_pl = f(jit_t, dv, keepg).dia
        xla_asm = jax.jit(clf._assemble_fold_lean_blocked if clf._blocked_lean
                          else clf._assemble_fold_lean)
        d_xla = xla_asm(jit_t, dv, keepg).dia
        num = float(jnp.max(jnp.abs(d_pl.data - d_xla.data)))
        den = float(jnp.max(jnp.abs(d_xla.data)))
        rel_a = num / max(den, 1e-30)
        # SpMV: same DIA data through both matvec paths
        xr = jax.random.normal(jax.random.PRNGKey(0), (d_xla.shape[0],),
                               dtype=jnp.float32)
        y_pl = jax.jit(lambda A_, x_: A_.matvec(x_))(d_xla, xr)
        os.environ["DMT_NO_PALLAS"] = "1"
        try:
            y_xla = jax.jit(lambda A_, x_: A_.matvec(x_))(d_xla, xr)
        finally:
            del os.environ["DMT_NO_PALLAS"]
        rel_m = float(jnp.linalg.norm(y_pl - y_xla)) / max(float(jnp.linalg.norm(y_xla)), 1e-30)
        log(f"on-chip pallas==XLA: assembler rel {rel_a:.2e}, SpMV rel {rel_m:.2e} "
            f"({time.time()-t0:.1f}s)")
        assert rel_a < 5e-4, f"pallas assembler diverges from XLA on-chip: {rel_a}"
        assert rel_m < 5e-5, f"pallas SpMV diverges from XLA on-chip: {rel_m}"

    t_asm, suspect = chain_diff(run_chain, 1, K, "assembly chain")
    mdof_s = V.num_dofs / t_asm / 1e6
    if clf._lean and clf._blocked_lean:
        out_vals = len(clf.trips) * int(np.prod(clf._cdims))
    elif clf._lean:
        out_vals = (V.num_dofs // clf.bs) * len(clf.offsets) * clf.bs * clf.bs
    else:
        out_vals = V.num_dofs * 15
    out_bytes = 4 * out_vals
    eff_bw = out_bytes / t_asm / 1e9
    if eff_bw > 1200.0:  # physical guard: ~0.82 TB/s HBM on v5e
        suspect = True
        log(f"** assembly implies {eff_bw:.0f} GB/s write BW — above the HBM "
            f"roofline, marking measurement SUSPECT **")
    log(f"constrained assembly: {mdof_s:.1f} MDoF/s ({eff_bw:.0f} GB/s DIA write)")

    # ---- full solve: GMG-preconditioned CG ------------------------------
    A = clf.assemble()
    if clf._lean and (V.num_dofs > 2**21 or bs > 1):
        # the general RHS assembler keeps O(cells) tables — at 10M-dof scale
        # use a manufactured RHS b = A u0 instead (identical per-iteration
        # SpMV work; the headline metric is assembly throughput anyway)
        n0, n1, n2 = clf.vshape
        ii = jnp.arange(n0, dtype=jnp.float32)[:, None, None] / n0
        jj = jnp.arange(n1, dtype=jnp.float32)[None, :, None] / n1
        kk = jnp.arange(n2, dtype=jnp.float32)[None, None, :] / n2
        pat = jnp.sin(np.pi * ii) * jnp.sin(np.pi * jj) * jnp.sin(2 * np.pi * kk)
        # keep_grid is component-major (bs, n0, n1, n2); x is interleaved
        u0 = jnp.moveaxis(pat[None] * clf._keep_grid, 0, -1).reshape(-1)
        b = jax.jit(lambda A_, u: A_.matvec(u))(A, u0)
    else:
        L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)
        b = jnp.asarray(np.asarray(dmt.assemble_vector(L, mpc, dtype=np.float32)))
        b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc])))
    from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner

    M = None
    blocked_mode = False
    try:
        from dolfinx_mpc_tpu.la.gmg import LatticeGMG, build_gmg_hierarchy

        def make_level(lv):
            deg_l, m = lv if isinstance(lv, tuple) else (degree, lv)
            if m == n and deg_l == degree:
                return clf  # reuse the finest-level compiled form (and its chunking)
            _, V_l, bc_l, mpc_l, a_l = make_problem(m, deg=deg_l)
            mpc_l.finalize()
            try:
                return assemble_matrix_lattice(a_l, mpc_l, bcs=[bc_l], dtype=np.float32,
                                               side_format="fold")
            except ValueError:
                return assemble_matrix_lattice(a_l, mpc_l, bcs=[bc_l], dtype=np.float32,
                                               side_format="cells")

        # degree 2: p-coarsen first — level 1 is the P1 operator on the SAME
        # refined nodal grid (identity transfer), then h-coarsen P1.  Every
        # coarse sweep then rides the 15/27-diagonal P1 SpMV instead of the
        # 65-diagonal P2 one (measured 60ms of the 94.6ms n=64 V-cycle was
        # coarse-level work in the h-P2 hierarchy, chain r3 18:48 step).
        levels = None
        if degree == 2 and bs == 1:
            levels, m = [(2, n), (1, 2 * n)], n
            while m >= 8 and m % 2 == 0:
                levels.append((1, m))
                m //= 2

        t0 = time.time()
        ops, masks = _load_or_build_hierarchy(make_level, n, degree,
                                              build_gmg_hierarchy, bs=bs,
                                              levels=levels)
        ops[0] = A
        # sidecar cache for the GMG scalars that each cost a remote compile
        # (one-program Gershgorin bounds; dense coarse inverse): keyed like
        # the hierarchy cache, so a kernel/code change invalidates both
        xname = (f"gmgx_p{degree}{'' if bs == 1 else f'_bs{bs}'}_n{n}"
                 f"{'' if levels is None else '_pc%d' % len(levels)}"
                 f"_{_hier_code_hash()}.npz")
        xpath = _cache_read_path(xname)
        gkw = {}
        if xpath is not None:
            zx = np.load(xpath)
            gkw["bounds"] = [float(v) for v in zx["bounds"]]
            if "coarse_inv" in zx:
                gkw["coarse_inv"] = jnp.asarray(zx["coarse_inv"])
            log(f"GMG bounds/coarse-inv from cache ({os.path.basename(xpath)})")
        # blocked-native fine level (degree-2): vectors stay in the padded
        # class-major stack through CG + smoothing; the interleave<->blocked
        # transposes (4.8 ms/matvec at 2.1M dofs, probe r4) happen once per
        # V-cycle at the level-0/1 transfer instead of per sweep
        blocked_mode = clf._blocked_lean and ops[0].supports_blocked()
        # chebyshev smoothing (GAMG/hypre's default): measured 34 -> 18 its
        # on bs=3 elasticity and 16 -> 10 on P1 at equal sweep counts (r4)
        smoother = os.environ.get("BENCH_SMOOTHER", "chebyshev")
        n_sw = 3 if bs > 1 else 2
        M = LatticeGMG(ops, free_masks=masks, blocked_io=blocked_mode,
                       smoother=smoother, n_pre=n_sw, n_post=n_sw, **gkw)
        if not gkw and M._bounds is not None:
            try:
                xtra = {"bounds": np.asarray(M._bounds, np.float64)}
                if M.coarse_mode == "dense":
                    xtra["coarse_inv"] = np.asarray(M.coarse_inv)
                _cache_save(xname, xtra)
            except Exception as e:
                log(f"gmg extras cache save failed ({e})")
        log(f"GMG hierarchy ({len(ops)} levels): {time.time()-t0:.1f}s "
            f"(coarse={M.coarse_mode}, omegas={[round(o, 3) for o in M.omegas]})")
        # pallas==XLA on EVERY coarse level too (VERDICT r2 weak #6 applied
        # to the V-cycle: a Mosaic bug at a coarse-level shape would corrupt
        # the preconditioner with no fine-level check tripping)
        if (jax.default_backend() not in ("cpu",)
                and not os.environ.get("DMT_SKIP_EQCHECK")):
            for l, op in enumerate(ops[1:], start=1):
                xr_l = jax.random.normal(jax.random.PRNGKey(l), (op.shape[0],),
                                         dtype=jnp.float32)
                y_pl = jax.jit(lambda A_, x_: A_.matvec(x_))(op, xr_l)
                os.environ["DMT_NO_PALLAS"] = "1"
                try:
                    y_xla = jax.jit(lambda A_, x_: A_.matvec(x_))(op, xr_l)
                finally:
                    del os.environ["DMT_NO_PALLAS"]
                rel_l = (float(jnp.linalg.norm(y_pl - y_xla))
                         / max(float(jnp.linalg.norm(y_xla)), 1e-30))
                assert rel_l < 5e-5, f"GMG level {l} pallas SpMV diverges: {rel_l}"
                log(f"  level {l} pallas==XLA SpMV rel {rel_l:.2e}")
    except Exception as e:
        log(f"GMG unavailable ({e}); Jacobi fallback")
        blocked_mode = False
        M = jacobi_preconditioner(A.diagonal())

    # operators as jit ARGS (pytrees), never closures: closed-over operator
    # data becomes compile-time constants and blows the remote-compile
    # payload limit at 10M dofs
    from dolfinx_mpc_tpu.la.gmg import LatticeGMG as _GMG

    # phase breakdown: single fine SpMV and one V-cycle, chain-differenced;
    # in blocked mode the production layout is the class stack, so the
    # chains ride matvec_blocked / the blocked V-cycle
    @jax.jit
    def mv_chain(A_, x_, s, k):
        mv = A_.matvec_blocked if blocked_mode else A_.matvec
        def body(i, v):
            return mv(v * (1.0 + 1e-9 * i.astype(jnp.float32)))
        return jax.lax.fori_loop(0, k, body, x_ * (1.0 + 1e-9 * s)).ravel()[0]

    xr = b / jnp.maximum(jnp.linalg.norm(b), 1e-30)
    if blocked_mode:
        to_b = jax.jit(A.dia._to_blocked)
        from_b = jax.jit(A.dia._from_blocked)
        xr = to_b(xr)
    # floor=24ms: the n=64 SpMV is ~0.1 ms/op — a 4 ms floor lets the chain
    # difference ride the tunnel's multi-ms dispatch jitter (measured
    # 136-302 GB/s scatter across r4/r5 runs at the default floor); a
    # 24 ms difference needs k~256 and pins the number
    t_mv, _ = chain_diff(lambda s, k: mv_chain(A, xr, jnp.float32(s), k), 1, 33,
                         "fine SpMV chain" + (" (blocked layout)" if blocked_mode else ""),
                         floor=24e-3)
    log(f"  -> SpMV {len(clf.trips) if clf._blocked_lean else (len(clf.offsets) if clf._lean else 15)}"
        f"-{'triple' if clf._blocked_lean else 'diag'} "
        f"{(out_bytes + 2 * 4 * V.num_dofs)/t_mv/1e9:.0f} GB/s effective")

    if isinstance(M, _GMG):
        @jax.jit
        def vc_chain(M_, r0, s, k):
            def body(i, v):
                return M_(v * (1.0 + 1e-9 * i.astype(jnp.float32)))
            return jax.lax.fori_loop(0, k, body, r0 * (1.0 + 1e-9 * s)).ravel()[0]

        t_vc, _ = chain_diff(lambda s, k: vc_chain(M, xr, jnp.float32(s), k), 1, 9,
                             "V-cycle chain", floor=24e-3)

    @jax.jit
    def solve(A_, M_, b_, rtol, atol, max_it):
        mv = A_.matvec_blocked if blocked_mode else A_.matvec
        return cg(mv, b_, M=M_, rtol=rtol, atol=atol, max_it=max_it)

    b_run = to_b(b) if blocked_mode else b
    # NOTE: the pallas blocked SpMV stays OFF (dia.use_pallas_mv default):
    # once the layout transposes are gone the XLA blocked stencil runs at
    # 476 GB/s (0.567 ms at 2.1M dofs) while the roll-bound pallas kernel
    # measured 2.43 ms standalone and +8 ms/it composed (r4, eqcheck-passed
    # but slower) — the kernel stays in pallas_lattice.py for probes.

    run = lambda s, rtol, atol, mi: solve(A, M, b_run * (1.0 + 1e-9 * s), rtol, atol, mi)

    # converged solve: iterations + rnorm from a real run, then per-iteration
    # time via FIXED-iteration differencing (rtol=0 never converges)
    t0 = time.time()
    x, its, rn = run(0.0, 1e-6, 1e-12, 3000)
    rn_v, its_v = float(rn), int(its)
    t_first = time.time() - t0  # includes compile on a cold cache
    log(f"solve compile+first run: {t_first:.1f}s (its={its_v} rnorm={rn_v:.2e})")
    assert np.isfinite(np.asarray(x)).all()

    k_lo, k_hi = 2, max(its_v, 10)
    t_lo = timed(lambda s: run(s, 0.0, 0.0, k_lo)[2])
    t_hi = timed(lambda s: run(s, 0.0, 0.0, k_hi)[2])
    per_it = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    t_solve = per_it * its_v
    wall = timed(lambda s: run(s, 1e-6, 1e-12, 3000)[2])
    log(f"CG solve: its={its_v} rnorm={rn_v:.2e} device={t_solve*1e3:.1f}ms "
        f"({per_it*1e3:.2f} ms/it) wall-with-relay={wall*1e3:.1f}ms")

    metric = (f"constrained_assembly_p{degree}_3d_periodic" if bs == 1 else
              f"constrained_assembly_p{degree}_bs{bs}_3d_periodic_elasticity")
    result = {
        "metric": metric,
        "value": round(mdof_s, 2),
        "unit": "MDoF/s",
        "vs_baseline": round(mdof_s / reference_mdof_s(n, degree, bs), 3),
    }
    if suspect:
        result["suspect_noise_floor"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
