"""One-M-step preconditioner diagnostic at scale (config4/5 stall debugging).

Builds the bench's volumetric signed-distance dataset at --n, constructs the
DeviceSystem (FMM tree + DDM/Schwarz hierarchy) exactly as the iterative fit
does, then measures:

  1. a VERBOSE Schwarz sweep (per-level correction norms, finiteness),
  2. one-M-step reduction ||b - A(M b)|| / ||b|| with the matvec evaluated
     at BOTH precision tiers (f32 and f64-grade/df64) — separates "M is
     weak" from "A is inaccurate at this tier",
  3. the f32-vs-df64 matvec relative discrepancy on z = M b (the vector the
     solver actually feeds the operator),
  4. a second M-step (stationary-iteration contraction factor).

Run on the default platform for the TPU answer; --cpu forces the host path
(the reference comparison).  Usage:
    python scripts/mstep_diag.py --n 3000000 2>&1 | tee /tmp/mdiag_tpu3m.log
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3_000_000)
    ap.add_argument("--cpu", action="store_true", help="force the CPU platform")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import ferreus_rbf_tpu as frt
    from bench import _synthetic_sd
    from ferreus_rbf_tpu.solver.iterative import DeviceSystem
    from ferreus_rbf_tpu.solver.schwarz import _solve_fine_level
    from ferreus_rbf_tpu.utils import common

    pts, sd = _synthetic_sd(args.n)
    s = frt.InterpolantSettings(kernel_type=frt.RBFKernelType.Linear)
    rbfi = frt.RBFInterpolator(pts, sd, s, _skip_solve=True)
    rbfi.translation_factor, rbfi.scale_factor = common.get_cheb_cube_scaling_factors(
        rbfi.points
    )

    t0 = time.time()
    system = DeviceSystem(rbfi)
    print(f"n={args.n}: setup {time.time() - t0:.0f}s", flush=True)

    n, m = system.n, system.m
    vals = rbfi.point_values
    b = jnp.asarray(np.concatenate([vals, np.zeros((m, vals.shape[1]))]) if m else vals)
    nb = float(jnp.linalg.norm(b))
    print(f"||b|| = {nb:.4e}  levels = {len(system.ddm_tree.levels)}", flush=True)

    def verbose_precon(rg):
        ddm = system.ddm_tree
        rg = jnp.asarray(rg)
        sl = jnp.zeros_like(rg)
        coarse_idx = len(ddm.levels) - 1
        first = True
        for i in range(coarse_idx):
            res = rg if first else rg - system.matvec_partial(sl, i)
            first = False
            si = _solve_fine_level(res, ddm, i, system.settings, system.ortho_poly)
            sl = sl + si
            print(
                f"  L{i}: n_lvl={ddm.levels[i].point_indices.size}"
                f" ||res||={float(jnp.linalg.norm(res)):.4e}"
                f" ||s||={float(jnp.linalg.norm(si)):.4e}"
                f" finite={bool(jnp.all(jnp.isfinite(si)))}",
                flush=True,
            )
            res = rg - system.matvec_partial(sl, "coarse")
            sc = ddm.solve_coarse(res, add_poly=(i == coarse_idx - 1))
            sl = sl + sc
            print(f"  C{i}: ||s||={float(jnp.linalg.norm(sc)):.4e}", flush=True)
        return sl

    t0 = time.time()
    z = verbose_precon(b)
    print(f"one M application: {time.time() - t0:.0f}s  ||z||="
          f"{float(jnp.linalg.norm(z)):.4e}", flush=True)

    av = {}
    for prec in ("f32", "f64"):
        t0 = time.time()
        az = system.matvec(z, precision=prec)
        r = b - az
        av[prec] = az
        print(
            f"one-M-step ||b-Az||/||b|| (matvec {prec}) = "
            f"{float(jnp.linalg.norm(r)) / nb:.4e}  ({time.time() - t0:.0f}s)",
            flush=True,
        )
    dd = float(jnp.linalg.norm(av["f32"] - av["f64"])) / max(
        float(jnp.linalg.norm(av["f64"])), 1e-300
    )
    print(f"matvec tier discrepancy on z: ||A32 z - A64 z||/||A64 z|| = {dd:.4e}",
          flush=True)

    # second stationary step, with the accurate-tier residual
    r1 = b - av["f64"]
    z2 = z + verbose_precon(r1)
    r2 = b - system.matvec(z2, precision="f64")
    n1 = float(jnp.linalg.norm(r1)) / nb
    n2 = float(jnp.linalg.norm(r2)) / nb
    print(f"two-M-step residual = {n2:.4e}  contraction (step2/step1) = "
          f"{n2 / max(n1, 1e-300):.4e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
