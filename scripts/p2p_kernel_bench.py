"""Standalone correctness + timing for the bucketed near-field Pallas kernel.

Shapes mimic driver config 2: R target rows of T=64, U=27 neighbour leaf
tiles of S=256 each, nrhs=8.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ferreus_rbf_tpu.ops.fmm import p2p_pallas
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType, make_kernel

    R, T, U, S, d, nrhs = 128, 64, 27, 256, 3, 8
    L = 512  # leaf tiles
    rng = np.random.default_rng(0)
    tgt = rng.random((R, T, d)).astype(np.float32)
    src = rng.random((L + 1, d, S)).astype(np.float32)
    w = rng.standard_normal((L + 1, nrhs, S)).astype(np.float32)
    w[L] = 0.0  # sentinel tile carries zero weights
    nbr = rng.integers(0, L, (R, U)).astype(np.int32)
    nbr[:, -3:] = L  # exercise sentinel padding

    kp = KernelParams(KernelType.LinearRbf)

    out = np.asarray(p2p_pallas.p2p_leaf_pairs(
        jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(w), jnp.asarray(nbr.T),
        kparams=kp))

    # numpy oracle
    k = make_kernel(kp, xp=np)
    ref = np.zeros((R, T, nrhs))
    for r in range(R):
        for u in range(U):
            l = nbr[r, u]
            diff = tgt[r][:, None, :] - src[l].T[None, :, :]
            r2 = (diff.astype(np.float64) ** 2).sum(-1)
            ref[r] += k.phi_r2(r2) @ w[l].T.astype(np.float64)
    err = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    print(f"correctness: rel err {err:.3e}")
    assert err < 1e-5, err

    # ---- timing at config-2 scale
    R2 = 2048
    tgt2 = jnp.asarray(rng.random((R2, T, d)).astype(np.float32))
    nbr2 = jnp.asarray(rng.integers(0, L, (U, R2)).astype(np.int32))
    srcj, wj = jnp.asarray(src), jnp.asarray(w)

    K = 10  # chained calls per dispatch: subtracts the ~25-40ms tunnel cost

    @jax.jit
    def many_pair(w0):
        def body(w_c, _):
            o = p2p_pallas.p2p_leaf_pairs(tgt2, srcj, w_c, nbr2, kparams=kp)
            # feed a scalar of the output back so calls can't be elided
            return w_c * (1.0 + 0.0 * o[0, 0, 0]), o[0, 0, 0]
        _, outs = jax.lax.scan(body, w0, None, length=K)
        return jnp.sum(outs)

    def timeit(fn, *args):
        float(fn(*args))
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    el = timeit(many_pair, wj) / K
    pairs = R2 * T * U * S
    print(f"pair kernel: {el*1e3:.2f} ms/call for {pairs:.2e} padded pairs "
          f"-> {pairs/el:.3e} pairs/s")

    # reference: p2p_rows on equivalent gathered tables (one width class)
    SC = U * S  # concatenated width
    src3 = jnp.asarray(rng.random((R2, d, SC)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((R2, nrhs, SC)).astype(np.float32))

    @jax.jit
    def many_row(w0):
        def body(w_c, _):
            o = p2p_pallas.p2p_rows(tgt2, src3, w_c, kparams=kp)
            return w_c * (1.0 + 0.0 * o[0, 0, 0]), o[0, 0, 0]
        _, outs = jax.lax.scan(body, w0, None, length=K)
        return jnp.sum(outs)

    el2 = timeit(many_row, w3) / K
    print(f"row kernel (pre-gathered): {el2*1e3:.2f} ms/call -> {pairs/el2:.3e} pairs/s")

    # fused in-kernel-DMA variant: correctness vs the pair kernel + timing
    cnt = np.full(R, U, np.int32)
    cnt[-3:] = U - 3  # exercise variable counts
    nbr_c = rng.integers(0, L, (U, R)).astype(np.int32)
    out_pair = np.asarray(p2p_pallas.p2p_leaf_pairs(
        jnp.asarray(tgt), srcj, wj, jnp.asarray(nbr_c), kparams=kp))
    nbr_masked = nbr_c.copy()
    for r_i in range(R):
        nbr_masked[cnt[r_i]:, r_i] = L  # sentinel beyond the true count
    out_pair = np.asarray(p2p_pallas.p2p_leaf_pairs(
        jnp.asarray(tgt), srcj, wj, jnp.asarray(nbr_masked), kparams=kp))
    out_fused = np.asarray(p2p_pallas.p2p_leaf_fused(
        jnp.asarray(tgt), srcj, wj, jnp.asarray(nbr_c), jnp.asarray(cnt), kparams=kp))
    ferr = np.max(np.abs(out_fused - out_pair)) / np.max(np.abs(out_pair))
    print(f"fused kernel vs pair kernel: rel diff {ferr:.3e}")

    cnt2 = jnp.asarray(np.full(R2, U, np.int32))

    @jax.jit
    def many_fused(t0):
        def body(t_c, _):
            o = p2p_pallas.p2p_leaf_fused(t_c, srcj, wj, nbr2, cnt2, kparams=kp)
            return t_c * (1.0 + 0.0 * o[0, 0, 0]), o[0, 0, 0]
        _, outs = jax.lax.scan(body, t0, None, length=K)
        return jnp.sum(outs)

    el4 = timeit(many_fused, tgt2) / K
    print(f"fused kernel: {el4*1e3:.2f} ms/call -> {pairs/el4:.3e} pairs/s")

    # and the gather cost itself (what the current path pays per matvec)
    sidx = jnp.asarray(rng.integers(0, L * S, (R2, SC)).astype(np.int32))
    pts_flat = jnp.asarray(rng.random((L * S, d)).astype(np.float32))

    @jax.jit
    def many_gather(p0):
        def body(p_c, _):
            g = p_c[sidx]  # (R2, SC, d)
            return p_c * (1.0 + 0.0 * g[0, 0, 0]), g[0, 0, 0]
        _, outs = jax.lax.scan(body, p0, None, length=K)
        return jnp.sum(outs)

    el3 = timeit(many_gather, pts_flat) / K
    print(f"row-table coordinate gather alone: {el3*1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
