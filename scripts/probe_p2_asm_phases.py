"""Decompose the degree-2 blocked assembly time on TPU (VERDICT r3 weak #3:
4.489 ms/op = 56 GB/s effective at n=64, ~4x off the HBM write roofline).

Phases timed by chain differencing (T_K - T_1)/(K - 1), value-fetch forced:
  raw      : clf._pallas_raw(jitter) alone (the fused pallas DIA write)
  raw+bc   : + _zero_bc_blocked (230 sequential .at[m].multiply passes)
  full     : + _diag_adds_blocked (the shipped assembler)
  zeros    : jnp.full of the same (n_trip, s0, s1, s2) array — XLA write
             roofline for this layout/shape
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

n = int(os.environ.get("BENCH_N", "64"))
K = int(os.environ.get("BENCH_CHAIN", "17"))

cpu0 = jax.devices("cpu")[0]
with jax.default_device(cpu0):
    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 2))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)),
                         quad_degree=2)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                  side_format="fold")
assert clf._lean and clf._blocked_lean and clf._pallas_raw is not None
dev = jax.devices()[0]


def _ship(obj, seen=None):
    """Move every reachable jax.Array onto the accelerator (compact version
    of bench._ship_to_device)."""
    seen = set() if seen is None else seen
    if obj is None or id(obj) in seen:
        return
    seen.add(id(obj))
    if isinstance(obj, (list, tuple)):
        for x in obj:
            _ship(x, seen)
        return
    d = getattr(obj, "__dict__", None)
    if d is None:
        return
    arr = {k: v for k, v in d.items() if isinstance(v, jax.Array)}
    if arr:
        moved = jax.device_put(list(arr.values()), dev)
        for k, m in zip(arr, moved):
            setattr(obj, k, m)
    for k, v in d.items():
        if not isinstance(v, jax.Array) and (
                type(v).__module__ or "").startswith("dolfinx_mpc_tpu"):
            _ship(v, seen)
        elif isinstance(v, (list, tuple, dict)):
            _ship(list(v.values()) if isinstance(v, dict) else v, seen)


_ship([clf, mpc, bc])
keepg = jax.device_put(clf._keep_arg, dev)
dv = jnp.asarray(1.0, jnp.float32)
n_trip = len(clf.trips)
s0, s1, s2 = clf._cdims
out_mb = n_trip * s0 * s1 * s2 * 4 / 1e6
print(f"n={n}: {V.num_dofs} dofs, {n_trip} trips, cdims {clf._cdims}, "
      f"data {out_mb:.0f} MB", flush=True)

raw = clf._pallas_raw


def chain(body):
    @jax.jit
    def run(j0, k):
        def step(i, acc):
            r = body(j0 + 1e-7 * i.astype(jnp.float32))
            return acc + r.ravel()[0]
        return jax.lax.fori_loop(0, k, step, jnp.zeros((), jnp.float32))
    return run


if getattr(clf, "_pallas_fused", False):
    variants = {
        "fused": chain(lambda j: raw(j, keepg)),
        "full": chain(lambda j: clf._assemble(j, dv, keepg).dia.data),
    }
else:
    variants = {
        "raw": chain(lambda j: raw(j)),
        "raw+bc": chain(lambda j: clf._zero_bc_blocked(raw(j), keepg)),
        "full": chain(lambda j: clf._diag_adds_blocked(
            clf._zero_bc_blocked(raw(j), keepg), dv)),
        "zeros": chain(lambda j: jnp.full((n_trip, s0, s1, s2), j,
                                          jnp.float32)),
    }

for name, run in variants.items():
    np.asarray(run(jnp.float32(0.0), 1))  # compile+warm
    t0 = time.time(); np.asarray(run(jnp.float32(1e-6), 1)); t1 = time.time() - t0
    t0 = time.time(); np.asarray(run(jnp.float32(2e-6), K)); tK = time.time() - t0
    per = (tK - t1) / (K - 1)
    print(f"{name:8s}: T1={t1*1e3:7.1f}ms TK={tK*1e3:7.1f}ms -> "
          f"{per*1e3:6.3f} ms/op  ({out_mb/1e3/per:6.0f} GB/s)", flush=True)

# ---- SpMV variants over the assembled blocked operator ---------------------
A = clf.assemble()
dia = A.dia
x0 = jax.device_put(
    jnp.asarray(np.random.default_rng(0).standard_normal(
        V.num_dofs).astype(np.float32)), dev)


def mv_chain(mv):
    @jax.jit
    def run(x, k):
        def step(i, xi):
            y = mv(xi + 1e-7 * i.astype(jnp.float32))
            return y / (jnp.abs(y).max() + 1.0)
        return jax.lax.fori_loop(0, k, step, x).ravel()[0]
    return run


mv_variants = {"xla-fused": lambda x: dia.matvec(x)}
try:
    from dolfinx_mpc_tpu.ops.pallas_lattice import make_blocked_matvec_pallas

    mvp = make_blocked_matvec_pallas(dia.trips, dia.vshape, dia.r3)
    if mvp is not None:
        mv_variants["pallas"] = lambda x: dia._from_blocked(
            mvp(dia.data, dia._to_blocked(x)))
        # blocked in/out (no interleave<->class transposes): the kernel cost
        mv_variants["pallas-b"] = None  # placeholder, filled below
        xb0 = jax.jit(dia._to_blocked)(x0)

        @jax.jit
        def run_pb(xb, k):
            def step(i, xi):
                y = mvp(dia.data, xi + 1e-7 * i.astype(jnp.float32))
                return y / (jnp.abs(y).max() + 1.0)
            return jax.lax.fori_loop(0, k, step, xb).ravel()[0]
except Exception as e:
    print("pallas matvec unavailable:", e, flush=True)

for name, mv in mv_variants.items():
    if name == "pallas-b":
        run, arg = run_pb, xb0
    else:
        run, arg = mv_chain(mv), x0
    np.asarray(run(arg, 1))
    t0 = time.time(); np.asarray(run(arg, 1)); t1 = time.time() - t0
    t0 = time.time(); np.asarray(run(arg, K)); tK = time.time() - t0
    per = (tK - t1) / (K - 1)
    print(f"mv {name:10s}: {per*1e3:6.3f} ms/op  ({out_mb/1e3/per:6.0f} GB/s)",
          flush=True)
