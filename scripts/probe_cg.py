"""Probe 2: CG (while_loop) with Jacobi M on the synthetic P1 stencil at
n=64 — isolates whether pallas-in-while_loop is the round-2 solve
regression, independent of the 70s bench setup."""
import os
import sys
import time

import numpy as np

n = int(os.environ.get("PROBE_N", "64"))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from dolfinx_mpc_tpu.ops.lattice import DIAMatrix
from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner

offsets = [(0, 0, 0)]
for d in range(3):
    for s in (-1, 1):
        o = [0, 0, 0]
        o[d] = s
        offsets.append(tuple(o))
for s in (-1, 1):
    offsets += [(s, s, 0), (0, s, s), (s, 0, s), (s, s, s)]
vshape = (n + 1, n + 1, n + 1)
n0, n1, n2 = vshape
rng = np.random.default_rng(0)
# diagonally dominant SPD-ish stencil
data = np.full((15, 1, 1, n0, n1, n2), -1.0, np.float32)
data[0] = 14.02
data = jnp.asarray(data)
x = jnp.asarray(rng.random(n0 * n1 * n2), jnp.float32)
A = DIAMatrix(data, tuple(offsets), vshape, 1)
M = jacobi_preconditioner(A.diagonal())
print(f"n={n} dofs={x.size}", file=sys.stderr)


def bench(tag):
    @jax.jit
    def solve(A_, b, seed, maxit):
        return cg(A_.matvec, b * (1.0 + 1e-9 * seed), M=M, rtol=1e-30, max_it=maxit)

    for it in (2, 102):
        float(solve(A, x, 0.0, it)[2])
    ts = {}
    seed = [1.0]
    for it in (2, 102):
        best = 1e9
        for _ in range(4):
            seed[0] += 1.0
            t0 = time.time()
            xx, its, rn = solve(A, x, seed[0], it)
            float(rn)
            best = min(best, time.time() - t0)
        ts[it] = best
    per = (ts[102] - ts[2]) / 100
    print(f"{tag}: T2={ts[2]*1e3:.1f}ms T102={ts[102]*1e3:.1f}ms -> "
          f"{per*1e3:.3f} ms/it", file=sys.stderr)


os.environ["DMT_NO_PALLAS"] = "1"
bench("CG XLA   ")
del os.environ["DMT_NO_PALLAS"]
bench("CG pallas")
