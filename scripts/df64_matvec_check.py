"""TPU df64 matvec vs CPU true-f64 FMM oracle (same tree/plan).

Usage:
  python scripts/df64_matvec_check.py oracle   # CPU subprocess -> /tmp/df64_oracle.npy
  python scripts/df64_matvec_check.py          # TPU run + compare + time
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, NRHS, P = 100_000, 8, 5
ORACLE = "/tmp/df64_oracle.npy"


def build(precision_platform_cpu):
    import jax

    if precision_platform_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ferreus_rbf_tpu.config import FmmCompressionType, FmmParams
    from ferreus_rbf_tpu.ops.fmm.api import FmmTree
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType

    rng = np.random.default_rng(42)
    pts = rng.random((N, 3))
    weights = rng.standard_normal((N, NRHS))
    params = FmmParams(interpolation_order=P, max_points_per_cell=256,
                       compression_type=FmmCompressionType.ACA, epsilon=10.0**-P)
    kp = KernelParams(KernelType.LinearRbf)
    tree = FmmTree(pts, P, kp, adaptive_tree=False, sparse=True, params=params)
    tree.prepare_targets(pts, "src")
    return tree, weights


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "oracle":
        tree, weights = build(True)
        import jax.numpy as jnp

        vals = np.asarray(tree.evaluate_device(jnp.asarray(weights), "src", precision="f64"))
        np.save(ORACLE, vals)
        print("oracle saved", vals.shape)
        return

    import subprocess

    if not os.path.exists(ORACLE):
        print("building CPU oracle in subprocess...")
        subprocess.run([sys.executable, os.path.abspath(__file__), "oracle"], check=True)

    import jax
    import jax.numpy as jnp

    tree, weights = build(False)
    w = jnp.asarray(weights)
    vals = tree.evaluate_device(w, "src", precision="f64")  # -> df64 on TPU
    float(jnp.sum(vals))
    ref = np.load(ORACLE)
    got = np.asarray(vals)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"TPU df64 vs CPU f64 FMM: rel err {err:.3e}")

    times = []
    for i in range(7):
        t0 = time.perf_counter()
        float(jnp.sum(tree.evaluate_device(w * (1.0 + 1e-15 * i), "src", precision="f64")))
        times.append(time.perf_counter() - t0)
    times.sort()
    el = times[len(times) // 2]
    print(f"df64 fused matvec: {el*1e3:.1f} ms -> {N/el:,.0f} pts/s")

    # f32 for comparison
    float(jnp.sum(tree.evaluate_device(w, "src", precision="f32")))
    times = []
    for i in range(7):
        t0 = time.perf_counter()
        float(jnp.sum(tree.evaluate_device(w * (1.0 + 1e-15 * i), "src", precision="f32")))
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"f32 fused matvec:  {times[3]*1e3:.1f} ms -> {N/times[3]:,.0f} pts/s")


if __name__ == "__main__":
    main()
