"""On-TPU BELL smoke: pallas kernel == XLA path on the real chip + timing.

Usage: python scripts/tpu_bell_smoke.py [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(n=500_000):
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    import jax.numpy as jnp
    import scipy.sparse as sp

    from dolfinx_mpc_tpu.la.bell import bell_from_scipy

    rng = np.random.default_rng(0)
    # mesh-like banded pattern (bs=3 blocked 7-point stencil on an m^3 grid):
    # BELL assumes the tile locality real FEM matrices have — a uniformly
    # random pattern has ~120 distinct col tiles per 8-row block and blows
    # the conversion up to a 15 GB dense target
    m = max(2, int(round((n / 3) ** (1 / 3))))
    deltas = [0, 1, 2, -1, -2, 3, -3, 3 * m, -3 * m, 3 * m * m, -3 * m * m,
              3 * (m + 1), -3 * (m + 1), 3 * m * (m + 1), -3 * m * (m + 1)]
    rows = np.repeat(np.arange(n), len(deltas))
    cols = np.clip(rows + np.tile(np.asarray(deltas), n), 0, n - 1)
    vals = rng.standard_normal(rows.shape[0])
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    B = bell_from_scipy(A)
    print(f"n={n} nnz={A.nnz} bell data {B.data.shape} "
          f"({B.data.nbytes/1e6:.0f} MB, fill {A.nnz/np.prod(B.data.shape):.1%}) "
          f"rem {B.rem_data.shape[0]}", flush=True)

    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mv = jax.jit(lambda B_, x_: B_.matvec(x_))
    y_pl = np.asarray(mv(B, x))
    os.environ["DMT_NO_PALLAS"] = "1"
    try:
        y_xla = np.asarray(jax.jit(lambda B_, x_: B_.matvec(x_))(B, x))
    finally:
        del os.environ["DMT_NO_PALLAS"]
    y_ref = A @ np.asarray(x, np.float64)
    rel = np.abs(y_pl - y_xla).max() / max(np.abs(y_xla).max(), 1e-30)
    rel_ref = np.abs(y_pl - y_ref).max() / max(np.abs(y_ref).max(), 1e-30)
    print(f"pallas==XLA rel {rel:.2e}; vs scipy rel {rel_ref:.2e}", flush=True)
    assert rel < 5e-5, rel
    assert rel_ref < 5e-3, rel_ref

    # chain-difference timing (value-fetch forced, fresh seed per call)
    @jax.jit
    def chain(B_, x_, k):
        def body(i, v):
            return B_.matvec(v * (1.0 + 1e-9 * i.astype(jnp.float32)))
        return jax.lax.fori_loop(0, k, body, x_)[0]

    for label, env in (("pallas", None), ("xla", "1")):
        if env:
            os.environ["DMT_NO_PALLAS"] = env
        try:
            ch = jax.jit(lambda B_, x_, k: chain(B_, x_, k))
            np.asarray(ch(B, x, 1))  # warm
            best = {}
            for k in (1, 33):
                b = 1e9
                for r in range(4):
                    xs = x * (1.0 + 1e-9 * r)
                    t0 = time.time()
                    np.asarray(ch(B, xs, k))
                    b = min(b, time.time() - t0)
                best[k] = b
            per = (best[33] - best[1]) / 32
            bw = (B.data.nbytes + 8 * n) / per / 1e9
            print(f"{label}: {per*1e3:.2f} ms/matvec ({bw:.0f} GB/s effective)",
                  flush=True)
        finally:
            if env:
                del os.environ["DMT_NO_PALLAS"]


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
