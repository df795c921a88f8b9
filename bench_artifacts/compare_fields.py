"""Compare converged flagship fields across matmul precisions.

Reads converge_flagship_default.npz and converge_flagship_highest.npz
(written by scripts/converge_flagship.py) and reports the relative L2 and
max field differences — the measured bf16-MXU bias of the default-precision
converged solution against the exact-passes (bf16x6) reference."""
import os
import sys

import numpy as np

d = os.path.dirname(os.path.abspath(__file__))
a = np.load(os.path.join(d, "converge_flagship_default.npz"))["Tc"]
b = np.load(os.path.join(d, "converge_flagship_highest.npz"))["Tc"]
l2 = np.linalg.norm(a - b) / np.linalg.norm(b)
mx = np.abs(a - b).max() / np.abs(b).max()
print(f"relative L2 field difference (default vs highest): {l2:.3e}")
print(f"relative max field difference:                     {mx:.3e}")
with open(os.path.join(d, "field_precision_delta.txt"), "w") as f:
    f.write(f"rel_l2 {l2:.6e}\nrel_max {mx:.6e}\n")
