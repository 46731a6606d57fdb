"""Leaf-pass sub-part profile at config-2 scale: L2P alone, P2P slab alone,
weight bucketing, unbucket gather — chained K deep per dispatch to subtract
the tunnel latency.

Usage: python scripts/profile_leaf.py [n]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ferreus_rbf_tpu.config import FmmCompressionType, FmmParams
    from ferreus_rbf_tpu.ops.fmm import api, p2p_pallas
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    nrhs, p = 8, 5
    rng = np.random.default_rng(42)
    pts = rng.random((n, 3))
    weights = rng.standard_normal((n, nrhs))
    params = FmmParams(interpolation_order=p, max_points_per_cell=256,
                       compression_type=FmmCompressionType.ACA, epsilon=10.0**-p)
    kp = KernelParams(KernelType.LinearRbf)
    tree = api.FmmTree(pts, p, kp, adaptive_tree=False, sparse=True, params=params)
    tree.prepare_targets(pts, "src")
    binned = tree._target_cache["src"]
    dev = tree._dev
    w_dev = jnp.asarray(weights)

    mult, w_sorted = api._upward(dev, w_dev, prec="f32")
    local = api._downward(dev, mult, w_sorted, kparams=kp, prec="f32")
    local = local.astype(jnp.float64)
    K = 8

    def timeit(fn, *args):
        float(jnp.sum(fn(*args)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # --- L2P alone, chained
    @jax.jit
    def l2p_chain(loc):
        def body(l_c, _):
            _, vals_b, _ = api._l2p_impl(
                dev, binned["targets_pad"], binned["tgt_idx"], binned["tgt_mask"],
                binned["tcells"], l_c, d=3, p=p, with_grads=False, prec="f32",
            )
            return l_c * (1.0 + 0.0 * vals_b[0, 0, 0]), vals_b[0, 0, 0]
        _, outs = jax.lax.scan(body, loc, None, length=K)
        return outs

    t_l2p = timeit(l2p_chain, local) / K

    # --- weight bucketing alone
    @jax.jit
    def wt_chain(w0):
        def body(w_c, _):
            w_tiles = jnp.where(
                dev["src_tile_mask"][..., None],
                w_c[dev["src_tile_idx"]].astype(jnp.float32),
                jnp.float32(0.0),
            ).transpose(0, 2, 1)
            return w_c * (1.0 + 0.0 * w_tiles[0, 0, 0].astype(jnp.float64)), w_tiles[0, 0, 0]
        _, outs = jax.lax.scan(body, w0, None, length=K)
        return outs

    t_wt = timeit(wt_chain, w_sorted) / K

    # --- P2P slab alone (the real operands)
    w_tiles = jnp.where(
        dev["src_tile_mask"][..., None],
        w_sorted[dev["src_tile_idx"]].astype(jnp.float32),
        jnp.float32(0.0),
    ).transpose(0, 2, 1)
    tpts = binned["targets_pad"][binned["tgt_idx"]].astype(jnp.float32)
    nbr = binned["nbr_tab"]
    u_max = nbr.shape[0]

    @jax.jit
    def slab_chain(wt):
        def body(w_c, _):
            (o,) = api._chunk_pair_rows(
                lambda t_args, nbr_c: (p2p_pallas.p2p_leaf_slab(
                    t_args[0], dev["src_tiles"], w_c, nbr_c, kparams=kp),),
                (tpts,), nbr,
            )
            return w_c * (1.0 + 0.0 * o[0, 0, 0]), o[0, 0, 0]
        _, outs = jax.lax.scan(body, wt, None, length=K)
        return outs

    t_slab = timeit(slab_chain, w_tiles) / K

    # --- unbucket gather alone
    vals_b = jnp.ones((nbr.shape[1], tpts.shape[1], nrhs), jnp.float64)

    @jax.jit
    def unb_chain(vb):
        def body(v_c, _):
            vals, _ = api._unbucket_impl(
                binned["inv_row"], binned["inv_slot"], v_c, jnp.zeros((0,)),
                n_pad=binned["n_pad"], d=3, with_grads=False)
            return v_c * (1.0 + 0.0 * vals[0, 0]), vals[0, 0]
        _, outs = jax.lax.scan(body, vb, None, length=K)
        return outs

    t_unb = timeit(unb_chain, vals_b) / K

    print(f"rows R={nbr.shape[1]} T={tpts.shape[1]} U={u_max} smax_pad={tree.smax_pad}")
    print(f"L2P          {t_l2p*1e3:7.2f} ms")
    print(f"w-bucketing  {t_wt*1e3:7.2f} ms")
    print(f"P2P slab     {t_slab*1e3:7.2f} ms")
    print(f"unbucket     {t_unb*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
