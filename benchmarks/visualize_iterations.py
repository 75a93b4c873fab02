"""Plot iteration counts / solve times vs dofs from benchmark HDF5 outputs —
counterpart of /root/reference/python/benchmarks/visualize_iterations.py.
Produces a matplotlib PNG when matplotlib is available, otherwise an ASCII
table + sparkline."""

import sys

import numpy as np


def load(paths):
    import h5py

    series = {}
    for path in paths:
        rows = []
        with h5py.File(path, "r") as f:
            for name in sorted(f):
                g = f[name]
                rows.append(
                    (
                        int(np.asarray(g["num_dofs"])),
                        int(np.asarray(g["its"])),
                        float(np.asarray(g["solve_time"]).ravel()[0]),
                    )
                )
        rows.sort()
        series[path] = rows
    return series


def main(paths, out="iterations.png"):
    series = load(paths)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        for path, rows in series.items():
            dofs = [r[0] for r in rows]
            ax1.semilogx(dofs, [r[1] for r in rows], "o-", label=path)
            ax2.loglog(dofs, [r[2] for r in rows], "o-", label=path)
        ax1.set_xlabel("dofs")
        ax1.set_ylabel("Krylov iterations")
        ax2.set_xlabel("dofs")
        ax2.set_ylabel("solve time [s]")
        ax1.legend(fontsize=7)
        ax1.grid(True, alpha=0.3)
        ax2.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        print(f"wrote {out}")
    except ImportError:
        for path, rows in series.items():
            print(f"== {path}")
            print(f"{'dofs':>10s} {'its':>5s} {'solve[s]':>9s}")
            for d, i, t in rows:
                print(f"{d:10d} {i:5d} {t:9.3f}")
    return series


if __name__ == "__main__":
    main(sys.argv[1:] or ["bench_periodic_results.h5"])
