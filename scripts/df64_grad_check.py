"""Validate + time the df64 GRADIENT tier on the real TPU.

Compares ``evaluate_with_gradients`` on the Pallas df64 pair-list kernels
against a CPU-subprocess f64 oracle of the same FMM plan, and times the
gradient evaluation against value-only evaluation (VERDICT r2 item 5:
gradients within ~3x of value-only throughput, <= ~1e-12 relative error).

Usage: python scripts/df64_grad_check.py [n]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_oracle(n, seed):
    """f64 scan evaluation in a CPU subprocess (true IEEE f64)."""
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys, numpy as np
sys.path.insert(0, {ROOT!r})
from ferreus_rbf_tpu.ops.fmm.api import FmmTree
from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType
rng = np.random.default_rng({seed})
pts = rng.random(({n}, 3))
w = rng.standard_normal(({n}, 2))
kp = KernelParams(KernelType.Spheroidal5Rbf, base_range=1.2, total_sill=0.9)
tree = FmmTree(pts, 5, kp, adaptive_tree=True, sparse=True)
tree.set_weights(w)
v, g = tree.evaluate_with_gradients(w, pts, reuse_key="src")
np.save("/tmp/df64_grad_oracle_v.npy", v)
np.save("/tmp/df64_grad_oracle_g.npy", g)
"""
    subprocess.run([sys.executable, "-c", code], check=True)
    return np.load("/tmp/df64_grad_oracle_v.npy"), np.load("/tmp/df64_grad_oracle_g.npy")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    seed = 7
    from ferreus_rbf_tpu.ops.fmm.api import FmmTree
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType

    rng = np.random.default_rng(seed)
    pts = rng.random((n, 3))
    w = rng.standard_normal((n, 2))
    kp = KernelParams(KernelType.Spheroidal5Rbf, base_range=1.2, total_sill=0.9)
    tree = FmmTree(pts, 5, kp, adaptive_tree=True, sparse=True)
    tree.set_weights(w)

    # warm both paths
    t0 = time.perf_counter()
    v, g = tree.evaluate_with_gradients(w, pts, reuse_key="src")
    print(f"cold grad eval: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        v, g = tree.evaluate_with_gradients(w, pts, reuse_key="src")
    grad_s = (time.perf_counter() - t0) / reps

    tree.evaluate(w, pts, reuse_key="src")
    t0 = time.perf_counter()
    for _ in range(reps):
        tree.evaluate(w, pts, reuse_key="src")
    val_s = (time.perf_counter() - t0) / reps

    out = {
        "n": n,
        "grad_s": grad_s,
        "val_s": val_s,
        "grad_over_val": grad_s / val_s,
        "grad_pts_per_s": n / grad_s,
        "val_pts_per_s": n / val_s,
    }

    if n <= 200_000:
        vo, go = run_oracle(n, seed)
        out["val_rel_err"] = float(np.max(np.abs(v - vo)) / np.max(np.abs(vo)))
        out["grad_rel_err"] = float(np.max(np.abs(g - go)) / np.max(np.abs(go)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
