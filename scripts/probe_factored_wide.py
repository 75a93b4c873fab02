"""Mosaic lowering probe: the factored lean assembler at axis sizes > 128
lanes.

The r4d chain crashed at n=128 (axis 129) and n=216 (axis 217) with
`Unsupported reshape (n,) -> (n, 1)` from the 1-D mask-factor slices in
kernel_factored (ops/pallas_lattice.py); n<=108 configs (<=109 lanes) fit a
single lane register and lowered fine.  The fix keeps every kernel slice
2-D (transposed j-factors).  This probe compiles the fixed kernel ON-CHIP
at a wide-but-cheap anisotropic grid (9 x 133 x 133 nodes, both vector
axes > 128) and asserts pallas == XLA-lean, then x-reports timing.

Run: python scripts/probe_factored_wide.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice
from dolfinx_mpc_tpu.ops.pallas_lattice import (make_lean_fold_pallas,
                                                pallas_supported)

NX, NYZ = 8, 132  # nodes: 9 x 133 x 133 — j/k axes exceed one lane register


def main():
    t0 = time.time()
    mesh = create_unit_cube(NX, NYZ, NYZ)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)),
                         quad_degree=1)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                  side_format="fold")
    assert clf._lean and pallas_supported(clf)
    print(f"setup {time.time() - t0:.1f}s; vshape={clf._keep_grid.shape}",
          flush=True)

    jit = jnp.asarray(0.013, jnp.float32)
    dv = jnp.asarray(1.0, jnp.float32)
    t0 = time.time()
    ref = clf._assemble_fold_lean(jit, dv, clf._keep_grid)
    ref_data = np.asarray(ref.dia.data)
    print(f"XLA lean fold: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    pal = make_lean_fold_pallas(clf)  # real Mosaic compile on-chip
    data_p = jnp.asarray(jnp.asarray(pal(jit))[:, None, None])
    data_p = clf._zero_bc_on_grid(data_p, clf._keep_grid)
    data_p = np.asarray(clf._diag_adds(data_p, dv))
    print(f"pallas compile+run: {time.time() - t0:.1f}s", flush=True)

    err = np.abs(ref_data - data_p).max()
    scale = np.abs(ref_data).max()
    rel = err / max(scale, 1.0)
    print(f"pallas vs XLA: abs {err:.3e} rel {rel:.3e}", flush=True)
    assert rel < 5e-6, (err, scale)
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
