"""Tabulate benchmark HDF5 outputs — counterpart of
/root/reference/python/benchmarks/post_proc.py / visualize_iterations.py
(matplotlib plots there; a text table here, plot hook included)."""

import sys

import h5py
import numpy as np


def summarize(path):
    print(f"== {path}")
    rows = []
    with h5py.File(path, "r") as f:
        for name in sorted(f):
            g = f[name]
            rows.append(
                (
                    name,
                    int(np.asarray(g["num_dofs"])),
                    int(np.asarray(g["its"])),
                    float(np.asarray(g["solve_time"]).ravel()[0]),
                    float(np.asarray(g.get("assembly_time", [np.nan])).ravel()[0]),
                    int(np.asarray(g.get("num_slaves", [0])).ravel()[0]),
                )
            )
    print(f"{'run':30s} {'dofs':>10s} {'its':>5s} {'solve[s]':>9s} {'asm[s]':>8s} {'slaves':>7s}")
    for r in rows:
        print(f"{r[0]:30s} {r[1]:10d} {r[2]:5d} {r[3]:9.3f} {r[4]:8.3f} {r[5]:7d}")
    return rows


if __name__ == "__main__":
    for p in sys.argv[1:] or ["bench_periodic_results.h5"]:
        try:
            summarize(p)
        except OSError as e:
            print(f"{p}: {e}")
