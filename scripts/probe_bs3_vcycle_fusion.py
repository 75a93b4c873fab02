"""Repro: XLA:TPU fusion degrades the bs=3 composed GMG V-cycle (~2e-2).

Round-5 finding (2026-08-21).  The r5b chain's bs=3 elasticity solve ran
32 CG its on-chip where the identical program/operands give 21 on CPU
(and round 4's on-chip record was 21).  Bisection:

- every stage ALONE is chip==CPU exact: fine matvec 4.0e-08, chebyshev
  smooth 7.0e-08, restrict/prolong 0.0, level-1+ sub-V-cycle 2.3e-07,
  dense coarse solve 3.1e-07;
- the COMPOSED program (L0 smooth + residual + restrict + sub-V-cycle +
  prolong) differs from the staged computation by rel ~2.15e-02 ON CHIP
  (CPU composed == CPU staged);
- `jax.lax.optimization_barrier` at the level boundaries does NOT fix it
  (the bad fusion is inside the sub-V-cycle when compiled together with
  the L0 stages);
- the IDENTICAL probe at bs=1 (P1 scalar) is EXACT (rel 0.0) — the bug
  is bs>1-specific, the same family as the bs>1 pallas DIA SpMV that was
  removed from dispatch in round 4 for a deterministic 6.8% composed-
  program miscompile (scripts/probe_bs3_bisect.py).

Impact: PERFORMANCE only.  CG converges against any fixed preconditioner
— the solve still reaches rtol (rnorm 2.29e-06), just in 32 its instead
of 21 (bench_bs3 r5b, tpu_chain_r5b.log).  The bs=1 flagship and the
blocked degree-2 path (9 its, matching r4) are unaffected.

Run: python scripts/probe_bs3_vcycle_fusion.py
"""

import os
import sys

os.environ["DMT_REEXEC"] = "1"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def make_problem(m, bs):
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube

    mesh = create_unit_cube(m, m, m)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (bs,)) if bs > 1
                          else ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(np.zeros(bs) if bs > 1 else 0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    if bs > 1:
        a = dmt.BilinearForm(
            V, lambda u, v, c: 2 * inner(sym(grad(u)), sym(grad(v)))
            + 1.25 * div(u) * conj(div(v)), quad_degree=1)
    else:
        a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)),
                             quad_degree=1)
    return V, bc, mpc, a


def run(bs, n=64):
    import jax
    import jax.numpy as jnp

    import bench
    from dolfinx_mpc_tpu.la.gmg import LatticeGMG, build_gmg_hierarchy
    from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

    cpu0 = jax.devices("cpu")[0]
    tpu0 = jax.devices()[0]
    with jax.default_device(cpu0):
        V, bc, mpc, a = make_problem(n, bs)
        os.environ["DMT_NO_PALLAS"] = "1"
        clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                      side_format="fold")
        A_cpu = clf.assemble()

        def make_level(m):
            _, bc_l, mpc_l, a_l = make_problem(m, bs)
            return assemble_matrix_lattice(a_l, mpc_l, bcs=[bc_l],
                                           dtype=np.float32,
                                           side_format="fold")

        ops, masks = bench._load_or_build_hierarchy(
            make_level, n, 1, build_gmg_hierarchy, bs=bs)
        del os.environ["DMT_NO_PALLAS"]
        ops[0] = A_cpu
        M_cpu = LatticeGMG(ops, free_masks=masks, smoother="chebyshev",
                           n_pre=3 if bs > 1 else 2,
                           n_post=3 if bs > 1 else 2)
        rng = np.random.default_rng(0)
        r = jnp.asarray(rng.standard_normal(A_cpu.shape[0]).astype(np.float32))
    M = jax.device_put(M_cpu, tpu0)
    r_t = jax.device_put(r, tpu0)
    nm = np.linalg.norm

    # staged: every piece its own XLA program
    x0 = jax.jit(lambda M_, r_: M_._smooth(0, jnp.zeros_like(r_), r_,
                                           M_.n_pre))(M, r_t)
    rc = jax.jit(lambda M_, r_, x_: M_._mask(1, M_._restrict(
        0, M_._mask(0, r_ - M_.ops[0].matvec(x_)))))(M, r_t, x0)
    xc = jax.jit(lambda M_, rc_: M_._vcycle(1, rc_))(M, rc)
    y_staged = np.asarray(jax.jit(
        lambda M_, x_, xc_: x_ + M_._mask(0, M_._prolong(0, M_._mask(1, xc_)))
    )(M, x0, xc))

    # composed: ONE program (what the production CG solve compiles)
    def upto(M_, r_):
        x = M_._smooth(0, jnp.zeros_like(r_), r_, M_.n_pre)
        res = M_._mask(0, r_ - M_.ops[0].matvec(x))
        rc_ = M_._mask(1, M_._restrict(0, res))
        xc_ = M_._vcycle(1, rc_)
        return x + M_._mask(0, M_._prolong(0, M_._mask(1, xc_)))

    y_comp = np.asarray(jax.jit(upto)(M, r_t))
    rel = nm(y_comp - y_staged) / nm(y_staged)
    print(f"bs={bs}: composed vs staged V-cycle rel {rel:.2e}", flush=True)
    return rel


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    from dolfinx_mpc_tpu.utils.tunnel import init_devices_retry

    init_devices_retry()
    rel1 = run(1)
    rel3 = run(3)
    assert rel1 < 1e-5, f"bs=1 regressed: {rel1}"
    if rel3 > 1e-4:
        print(f"BS3_FUSION_BUG_PRESENT (rel {rel3:.2e})", flush=True)
    else:
        print("BS3_FUSION_BUG_ABSENT — remove the known-issue note?",
              flush=True)


if __name__ == "__main__":
    main()
