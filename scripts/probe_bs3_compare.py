"""Compare the TPU and CPU artifact dumps from probe_bs3_tpu.py."""
import sys

import numpy as np

a = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bs3_dump_tpu"
b = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bs3_dump_cpu"
import glob
import os

names = sorted(os.path.basename(p) for p in glob.glob(f"{a}/*.npy"))
for nm in names:
    pa, pb = f"{a}/{nm}", f"{b}/{nm}"
    if not os.path.exists(pb):
        print(f"{nm}: missing in {b}")
        continue
    xa = np.load(pa).astype(np.float64)
    xb = np.load(pb).astype(np.float64)
    if xa.shape != xb.shape:
        print(f"{nm}: shape {xa.shape} vs {xb.shape}")
        continue
    d = np.abs(xa - xb)
    scale = max(np.abs(xb).max(), 1e-300)
    idx = np.unravel_index(np.argmax(d), d.shape)
    print(f"{nm}: max|diff|={d.max():.3e} rel={d.max()/scale:.3e} "
          f"at {idx} (a={xa[idx]:.6e} b={xb[idx]:.6e}); "
          f"n_diff(rel>1e-5)={(d > 1e-5 * scale).sum()}")
