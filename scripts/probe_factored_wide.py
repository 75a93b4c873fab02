"""Mosaic lowering probe: the FACTORED fused lean assembler at axis sizes
> 128 lanes.

The r4d chain crashed at n=128 (axis 129) and n=216 (axis 217) with
`Unsupported reshape (n,) -> (n, 1)` from the 1-D mask-factor slices in
kernel_factored (ops/pallas_lattice.py); n<=108 configs (<=109 lanes) fit a
single lane register and lowered fine.  The fix keeps every kernel slice
2-D (transposed j-factors).  This probe compiles the FIXED kernel ON-CHIP —
the fuse_mask=True factored path that production selects at
lattice.py:875-881, NOT the unfused kernel the r4 version of this probe
built by mistake (ADVICE.md r4, medium) — at a wide-but-cheap anisotropic
grid (9 x 133 x 133 nodes, both vector axes > 128), asserts
pallas == XLA-lean on the fully masked+diagval'd output, then reports
timing.

Run: python scripts/probe_factored_wide.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice
from dolfinx_mpc_tpu.ops.pallas_lattice import (_detect_factored_masks,
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
    # production (lattice.py:875-881) must have picked the FUSED factored
    # kernel — that is the code path the j-factor transposition fixed
    assert getattr(clf, "_pallas_fused", False), "fused masking not selected"
    assert _detect_factored_masks(clf) == "factored", "masks not separable?"
    print(f"setup {time.time() - t0:.1f}s; vshape={clf.vshape}", flush=True)

    jit = jnp.asarray(0.013, jnp.float32)
    dv = jnp.asarray(1.0, jnp.float32)
    t0 = time.time()
    ref = clf._assemble_fold_lean(jit, dv, clf._keep_grid)
    ref_data = np.asarray(ref.dia.data)
    print(f"XLA lean fold: {time.time() - t0:.1f}s", flush=True)

    # real Mosaic compile on-chip of the production fused entry: masking +
    # diagval happen in-kernel, so compare the final operator data directly
    t0 = time.time()
    pal = clf._assemble_fold_lean_pallas(jit, dv, clf._keep_arg)
    data_p = np.asarray(pal.dia.data)
    print(f"pallas compile+run: {time.time() - t0:.1f}s", flush=True)

    err = np.abs(ref_data - data_p).max()
    scale = np.abs(ref_data).max()
    rel = err / max(scale, 1.0)
    print(f"pallas vs XLA: abs {err:.3e} rel {rel:.3e}", flush=True)
    assert rel < 5e-6, (err, scale)

    # steady-state timing of the fused assembler at wide axes
    f = jax.jit(clf._assemble_fold_lean_pallas)
    f(jit, dv, clf._keep_arg).dia.data.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = f(jit, dv, clf._keep_arg).dia.data
    out.block_until_ready()
    dofs = int(np.prod(clf.vshape))
    dt = (time.time() - t0) / 5
    print(f"fused factored assemble: {dt * 1e3:.3f} ms "
          f"({dofs / dt / 1e6:.0f} MDoF/s)", flush=True)
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
