"""Correctness + timing for the df64 bucketed near-field Pallas kernel.

Oracle: numpy f64 with the same tile layout. Shapes mimic driver config 2.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ferreus_rbf_tpu.ops import df64
    from ferreus_rbf_tpu.ops.fmm import p2p_pallas
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType, make_kernel

    kt = KernelType[sys.argv[1]] if len(sys.argv) > 1 else KernelType.LinearRbf
    keep = int(os.environ.get("FERREUS_RBF_TPU_DF64_KEEP", "6"))
    R, T, U, S, d, nrhs = 64, 128, 27, 256, 3, 8
    L = 512
    rng = np.random.default_rng(0)
    tgt = rng.random((R, T, d))
    src = rng.random((L + 1, d, S))
    w = rng.standard_normal((L + 1, nrhs, S))
    w[L] = 0.0
    nbr = rng.integers(0, L, (R, U)).astype(np.int32)
    nbr[:, -3:] = L

    kp = KernelParams(kt, base_range=1.0, total_sill=0.7)

    th, tl = df64.from_f64(jnp.asarray(tgt))
    sh, sl = df64.from_f64(jnp.asarray(src))
    wh, wl = df64.from_f64(jnp.asarray(w))
    planes, _ = df64.slice_planes(wh, wl, (2,), keep)  # (keep, L+1, nrhs, S)
    wp = jnp.transpose(planes, (1, 0, 2, 3))

    use_slab = os.environ.get("FERREUS_DF64_SLAB", "") not in ("", "0")
    kern = (p2p_pallas.p2p_leaf_slab_df64 if use_slab
            else p2p_pallas.p2p_leaf_pairs_df64)
    if use_slab:  # manual DMA needs tile-aligned (8-sublane) coord tiles
        sh = jnp.pad(sh, ((0, 0), (0, 8 - d), (0, 0)))
        sl = jnp.pad(sl, ((0, 0), (0, 8 - d), (0, 0)))
    oh, ol = kern(
        th, tl, sh, sl, wp, jnp.asarray(nbr.T), kparams=kp, nsl=keep, keep=keep)
    out = np.asarray(df64.to_f64(oh, ol)).swapaxes(1, 2)  # (R, nrhs, T) -> (R, T, nrhs)

    k = make_kernel(kp, xp=np)
    ref = np.zeros((R, T, nrhs))
    absref = np.zeros((R, T, nrhs))
    for r in range(R):
        for u in range(U):
            l = nbr[r, u]
            diff = tgt[r][:, None, :] - src[l].T[None, :, :]
            r2 = (diff**2).sum(-1)
            phi = k.phi_r2(r2)
            ref[r] += phi @ w[l].T
            absref[r] += np.abs(phi) @ np.abs(w[l].T)
    err = np.max(np.abs(out - ref) / np.maximum(absref, 1e-300))
    print(f"{kt.value}: df64 kernel (keep={keep}) rel err (vs sum-of-|terms|): {err:.3e}")
    assert err < (5e-13 if keep >= 6 else 5e-11), err

    # timing at config-2 scale (chained to subtract the tunnel cost)
    R2 = 1024
    th2, tl2 = df64.from_f64(jnp.asarray(rng.random((R2, T, d))))
    nbr2 = jnp.asarray(rng.integers(0, L, (U, R2)).astype(np.int32))

    K = 10

    @jax.jit
    def many(t0):
        def body(t_c, _):
            o_h, o_l = kern(
                t_c, tl2, sh, sl, wp, nbr2, kparams=kp, nsl=keep, keep=keep)
            # feed the output back so the call cannot be hoisted out of
            # the scan as loop-invariant
            return t_c * (1.0 + 0.0 * o_h[0, 0, 0]), o_h[0, 0, 0]
        _, outs = jax.lax.scan(body, t0, None, length=K)
        return jnp.sum(outs)

    float(many(th2))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(many(th2))
        times.append(time.perf_counter() - t0)
    times.sort()
    el = times[len(times) // 2] / K
    pairs = R2 * T * U * S
    print(f"df64 pair kernel: {el*1e3:.2f} ms/call for {pairs:.2e} padded pairs "
          f"-> {pairs/el:.3e} pairs/s")


if __name__ == "__main__":
    main()
