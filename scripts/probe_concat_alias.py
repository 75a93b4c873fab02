"""Minimal repro for the XLA:TPU corruption seen in the contact assembly
values (r4): concatenating [big computed block (padded buffer -> DUS ->
slice), small computed block, small input passthrough] returns garbage in
the final passthrough region at large sizes (observed at ~22M f32 total;
clean at ~6.5M).

Run on TPU:   python scripts/probe_concat_alias.py
Run on CPU:   PROBE_CPU=1 python scripts/probe_concat_alias.py
Env: MODE=barrier|perblock to test candidate fixes.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

mode = os.environ.get("MODE", "plain")

# shapes mirror the failing case: ns-term 18855936 (=130944 cells x 144),
# sl-term 3304800, slave fill 1323, bc passthrough 74658
NS_CELLS, NS_W = 130944, 144
SL_CELLS, SL_W = 2172, 1521  # ~3.30M
NSLAVE, NBC = 1323, 74658
CHUNK = 262144


def block(key, n_cells, width):
    n_chunks = -(-n_cells // CHUNK)
    chunk = min(CHUNK, n_cells)
    n_chunks = -(-n_cells // chunk)
    src = jax.random.normal(key, (n_chunks * chunk, width), jnp.float32)

    def body(i, flat):
        c0 = i * chunk
        ae = jax.lax.dynamic_slice_in_dim(src, c0, chunk, 0) * 2.0
        return jax.lax.dynamic_update_slice_in_dim(
            flat, ae.reshape(-1), c0 * width, 0)

    flat0 = jnp.zeros((n_chunks * chunk * width,), jnp.float32)
    flat = body(0, flat0) if n_chunks == 1 else jax.lax.fori_loop(
        0, n_chunks, body, flat0)
    return flat[: n_cells * width]


@jax.jit
def f(bc):
    k = jax.random.PRNGKey(0)
    a = block(jax.random.fold_in(k, 1), NS_CELLS, NS_W)
    b = block(jax.random.fold_in(k, 2), SL_CELLS, SL_W)
    c = jnp.full((NSLAVE,), 1.0, jnp.float32)
    parts = [a, b, c, bc]
    if mode == "barrier":
        parts = list(jax.lax.optimization_barrier(tuple(parts)))
    return jnp.concatenate(parts)


bc = np.zeros(NBC, np.float32)
bc[:: 7] = 1.0
out = np.asarray(f(jnp.asarray(bc)))
tail = out[-NBC:]
slave = out[-NBC - NSLAVE: -NBC]
nbad_tail = int((np.abs(tail - bc) > 1e-6).sum())
nbad_slave = int((np.abs(slave - 1.0) > 1e-6).sum())
print(f"platform={jax.devices()[0].platform} mode={mode} total={out.size} "
      f"tail_bad={nbad_tail}/{NBC} slave_bad={nbad_slave}/{NSLAVE}")
if nbad_tail:
    i = np.flatnonzero(np.abs(tail - bc) > 1e-6)[:5]
    print("  sample idx", i, "got", tail[i], "want", bc[i])
