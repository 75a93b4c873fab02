"""Micro-probe: pallas vs XLA DIA SpMV at the bench's n=64 shape, on the
real TPU — diagnoses the VERDICT round-2 finding that the driver-captured
GMG-CG solve ran 654 ms/it (vs ~7 claimed) with the pallas path suspect.

Times K chained matvecs inside one jitted fori_loop (same chain-difference
protocol as bench.py) for both paths.
"""
import os
import sys
import time

import numpy as np

n = int(os.environ.get("PROBE_N", "64"))
K = int(os.environ.get("PROBE_CHAIN", "101"))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

print(f"devices: {jax.devices()}", file=sys.stderr)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from dolfinx_mpc_tpu.ops.lattice import DIAMatrix

# the P1 Freudenthal 15-point stencil
offsets = [(0, 0, 0)]
for d in range(3):
    for s in (-1, 1):
        o = [0, 0, 0]
        o[d] = s
        offsets.append(tuple(o))
for s in (-1, 1):
    offsets += [(s, s, 0), (0, s, s), (s, 0, s), (s, s, s)]
offsets = offsets[:15]
vshape = (n + 1, n + 1, n + 1)
n0, n1, n2 = vshape
rng = np.random.default_rng(0)
data = jnp.asarray(rng.random((15, 1, 1, n0, n1, n2)), jnp.float32)
x = jnp.asarray(rng.random(n0 * n1 * n2), jnp.float32)
A = DIAMatrix(data, tuple(offsets), vshape, 1)
nbytes = data.nbytes + x.nbytes
print(f"n={n} dofs={x.size} data {data.nbytes/1e6:.0f}MB", file=sys.stderr)


def bench(tag, mv):
    @jax.jit
    def chain(A_, x_, seed, k):
        def body(i, v):
            return mv(A_, v * (1.0 + 1e-9 * i))
        return jax.lax.fori_loop(0, k, body, x_ * (1.0 + 1e-9 * seed))

    for k in (1, K):
        float(chain(A, x, 0.0, k)[0])
    ts = {}
    seed = [1.0]
    for k in (1, K):
        best = 1e9
        for _ in range(5):
            seed[0] += 1.0
            t0 = time.time()
            float(chain(A, x, seed[0], k)[0])
            best = min(best, time.time() - t0)
        ts[k] = best
    per = (ts[K] - ts[1]) / (K - 1)
    gbs = nbytes / max(per, 1e-12) / 1e9
    print(f"{tag}: T1={ts[1]*1e3:.1f}ms T{K}={ts[K]*1e3:.1f}ms -> "
          f"{per*1e3:.3f} ms/matvec ({gbs:.0f} GB/s effective)", file=sys.stderr)
    return per


os.environ["DMT_NO_PALLAS"] = "1"
t_xla = bench("XLA slice-add", lambda A_, v: A_.matvec(v))
del os.environ["DMT_NO_PALLAS"]
t_pl = bench("pallas       ", lambda A_, v: A_.matvec(v))
print(f"pallas/xla ratio: {t_pl/t_xla:.2f}x", file=sys.stderr)
