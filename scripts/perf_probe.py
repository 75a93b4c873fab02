"""One-shot TPU perf probe for the lattice path — appends results to
.bench_notes.md.  Run in background; every section prints immediately."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import DIAMatrix, assemble_matrix_lattice


def log(*a):
    print(*a, flush=True)


def timeit(f, *args, n=20):
    f(*args).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f(*args).block_until_ready()
        ts.append(time.time() - t0)
    return min(ts) * 1e3


n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
mesh = create_unit_cube(n, n, n)
V = dmt.functionspace(mesh, ("Lagrange", 1))
log(f"n={n}: {mesh.num_cells} cells, {V.num_dofs} dofs")
a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=1)
t0 = time.time()
clf = assemble_matrix_lattice(a, None, bcs=[], dtype=np.float32)
log("table setup:", time.time() - t0)
t0 = time.time()
A = clf.assemble()
A.dia.data.block_until_ready()
log("assemble compile+first:", time.time() - t0)
log("assemble steady:", timeit(lambda: clf.assemble().dia.data, n=5), "ms")

OFFS = A.dia.offsets
n0, n1, n2 = A.dia.vshape
x = jnp.asarray(np.random.rand(V.num_dofs).astype(np.float32))
data = jnp.asarray(np.asarray(A.dia.data))
log("offsets:", OFFS)


@jax.jit
def inline_mv(data, x):
    xg = jnp.moveaxis(x.reshape(n0, n1, n2, 1), -1, 0)
    y = jnp.zeros_like(xg)
    for d, (di, dj, dk) in enumerate(OFFS):
        dst = (
            slice(max(-di, 0), n0 - max(di, 0)),
            slice(max(-dj, 0), n1 - max(dj, 0)),
            slice(max(-dk, 0), n2 - max(dk, 0)),
        )
        src = (
            slice(max(di, 0), n0 + min(di, 0)),
            slice(max(dj, 0), n1 + min(dj, 0)),
            slice(max(dk, 0), n2 + min(dk, 0)),
        )
        y = y.at[(0,) + dst].add(data[(d, 0, 0) + dst] * xg[(0,) + src])
    return y.reshape(-1)


log("inline mv (real data):", timeit(inline_mv, data, x), "ms")
rand = jnp.asarray(np.random.rand(*A.dia.data.shape).astype(np.float32))
log("inline mv (random data):", timeit(inline_mv, rand, x), "ms")

mv = jax.jit(lambda d, xx: DIAMatrix(d, OFFS, A.dia.vshape, 1).matvec(xx))
log("class mv:", timeit(mv, data, x), "ms")

# element kernel alone
from dolfinx_mpc_tpu.ops.kernels import compile_term

ct = compile_term(a.terms[0], V, V)
kf = jax.jit(lambda c, l: ct.kernel(c, l, {}))
log("kernel-only qdeg=1:", timeit(kf, clf.coords, clf.lf, n=5), "ms")

# hand-rolled P1 tet stiffness: Ae = vol * G @ G^T via one batched matmul
coords = clf.coords  # (ncells, 4, 3)


@jax.jit
def fast_kernel(coords):
    e = coords[:, 1:, :] - coords[:, :1, :]  # (c, 3, 3) edge matrix
    det = (
        e[:, 0, 0] * (e[:, 1, 1] * e[:, 2, 2] - e[:, 1, 2] * e[:, 2, 1])
        - e[:, 0, 1] * (e[:, 1, 0] * e[:, 2, 2] - e[:, 1, 2] * e[:, 2, 0])
        + e[:, 0, 2] * (e[:, 1, 0] * e[:, 2, 1] - e[:, 1, 1] * e[:, 2, 0])
    )
    inv = jnp.linalg.inv(e)  # (c, 3, 3)  J^{-1}
    gref = jnp.concatenate([-jnp.ones((1, 3), coords.dtype), jnp.eye(3, dtype=coords.dtype)])
    G = jnp.einsum("ag,cgt->cat", gref, inv)  # (c, 4, 3) physical gradients
    vol = jnp.abs(det) / 6.0
    return vol[:, None, None] * jnp.einsum("cat,cbt->cab", G, G)


log("fast hand kernel:", timeit(fast_kernel, coords, n=5), "ms")
err = float(jnp.abs(fast_kernel(coords) - kf(clf.coords, clf.lf)).max())
log("fast kernel err vs general:", err)
