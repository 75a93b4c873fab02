"""Unconstrained elasticity baseline — counterpart of
/root/reference/python/benchmarks/ref_elasticity.py: the identical run of
bench_elasticity.py WITHOUT the MPC, isolating the constrained-assembly and
solve overhead."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench_elasticity import run  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nref", type=int, default=1)
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--out", default="ref_elasticity_results.h5")
    args = p.parse_args()
    run(args.nref, args.rtol, args.out, with_mpc=False)
