"""Measure the CPU reference rate for constrained assembly on THIS machine.

BASELINE.md requires the reference number to be *measured*, not assumed.
dolfinx/PETSc are not installable in this image, so ``csrc/ref_baseline.cpp``
reimplements the reference's per-cell assembly pipeline (FFCx-equivalent P1
kernel + modify_mpc_cell master expansion + MatSetValues-style CSR sorted
insertion, see the .cpp header for the reference file:line map) and this
script builds + runs it, caching the result in
``benchmarks/ref_cpu_baseline.json``.

The headline comparison (bench.py) scales the measured per-core MDoF/s by
the 64 cores of the node named in BASELINE.md — i.e. it grants the reference
*ideal linear MPI scaling*, which is generous to the reference.

Run directly for a fresh measurement: ``python benchmarks/ref_cpu_baseline.py [n]``.
"""

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
CACHE = os.path.join(_HERE, "ref_cpu_baseline.json")
SRC = os.path.join(_REPO, "csrc", "ref_baseline.cpp")
BIN = os.path.join(_REPO, "csrc", ".build", "ref_baseline")


def build(force: bool = False) -> str:
    """Compile csrc/ref_baseline.cpp (cached on mtime)."""
    os.makedirs(os.path.dirname(BIN), exist_ok=True)
    if (
        not force
        and os.path.exists(BIN)
        and os.path.getmtime(BIN) >= os.path.getmtime(SRC)
    ):
        return BIN
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-std=c++17", SRC, "-o", BIN,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return BIN

def measure(n: int = 64, reps: int = 3, degree: int = 1, force: bool = False,
            bs: int = 1) -> dict:
    """Return the measured baseline dict, using the cache when it matches
    (n, degree, bs).  One cache entry per (n, degree, bs) triple."""
    key = f"{n}_d{degree}" + ("" if bs == 1 else f"_bs{bs}")
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
        if not isinstance(cache, dict) or "mdof_s" in cache:  # legacy flat cache
            cache = {f"{cache.get('n')}_d{cache.get('degree', 1)}": cache} if cache else {}
    if not force and key in cache:
        return cache[key]
    out = subprocess.run(
        [build(), str(n), str(reps), str(degree), "-", str(bs)],
        check=True, capture_output=True, text=True,
    ).stdout
    result = json.loads(out.strip().splitlines()[-1])
    cache[key] = result
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return result


if __name__ == "__main__":
    nn = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dd = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print(json.dumps(measure(nn, degree=dd, force=True)))
