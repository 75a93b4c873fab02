"""Phase breakdown of the lean fold assembly on TPU: kernel-only vs
pack-only vs full assembly vs matvec, chain-difference timed.  Appends to
.bench_notes.md.  Usage: python scripts/lean_probe.py [n] [degree]."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
deg = int(sys.argv[2]) if len(sys.argv) > 2 else 1
K = int(os.environ.get("CHAIN", "13"))


def log(*a):
    print(*a, flush=True)


mesh = create_unit_cube(n, n, n)
V = dmt.functionspace(mesh, ("Lagrange", deg))
bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
bc = dmt.dirichletbc(0.0, bdofs, V)
mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
mpc.create_periodic_constraint_geometrical(
    V, lambda x: np.isclose(x[0], 1.0), lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc]
)
mpc.finalize()
a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=deg)
clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32, side_format="fold")
assert clf._lean
log(f"n={n} deg={deg}: {V.num_dofs} dofs, {mesh.num_cells} cells, "
    f"{len(clf.offsets)} offsets, {len(clf.moves)} moves")

dv = jnp.asarray(1.0, jnp.float32)


def chain(fn, k):
    # operators/masks reach fn via the extra args (jit ARGS, not closures —
    # closed-over arrays get constant-folded into padded literals)
    @jax.jit
    def c(j0, *extra):
        def body(i, acc):
            r = fn(j0 + 1e-7 * i.astype(jnp.float32), *extra)
            return acc + r
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
    return c


def measure(name, fn, *extra):
    c1, cK = chain(fn, 1), chain(fn, K)
    t0 = time.time()
    c1(jnp.zeros((), jnp.float32), *extra).block_until_ready()
    cK(jnp.zeros((), jnp.float32), *extra).block_until_ready()
    tc = time.time() - t0

    def best(c):
        ts = []
        for _ in range(5):
            t0 = time.time()
            c(jnp.zeros((), jnp.float32), *extra).block_until_ready()
            ts.append(time.time() - t0)
        return min(ts)

    tK, t1 = best(cK), best(c1)
    dt = max((tK - t1) / (K - 1), 1e-9)
    log(f"{name:28s} {dt*1e3:9.3f} ms  ({V.num_dofs/dt/1e6:8.1f} MDoF/s)  compile {tc:.1f}s")
    return dt


# 1. coordinate synthesis alone
measure("synth_coords", lambda j: clf._synth_coords(j, "tmajor").ravel()[0])
# 2. element kernel on synthesized coords
measure("kernel (Ae)", lambda j: clf.kernel_soa(clf._synth_coords(j, "tmajor"), {}).ravel()[0])
# 3. full lean assembly
measure("full assembly", lambda j, kg: clf._assemble(j, dv, kg).dia.data.ravel()[0],
        clf._keep_grid)
# 4. matvec on the assembled operator
A = clf.assemble()
x0 = jnp.ones((V.num_dofs,), jnp.float32)
measure("matvec", lambda j, A_: A_.matvec(x0 * (1.0 + j)).ravel()[0], A)
# rooflines
nbytes = len(clf.offsets) * V.num_dofs * 4
log(f"DIA data: {nbytes/1e6:.0f} MB -> write-roofline {nbytes/819e9*1e3:.2f} ms @819GB/s")
