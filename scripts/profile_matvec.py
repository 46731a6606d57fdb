"""Per-pass wall-clock profile of the device-resident FMM matvec (config 2).

Times upward / downward / leaf separately AND the fused matvec, at both
precisions, with medians over repeats (the axon tunnel shows large transient
stalls; block_until_ready does not synchronise -> force with a scalar pull).

Usage: python scripts/profile_matvec.py [n] [prec]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med_time(fn, reps=7):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from ferreus_rbf_tpu.config import FmmCompressionType, FmmParams
    from ferreus_rbf_tpu.ops.fmm import api
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    prec = sys.argv[2] if len(sys.argv) > 2 else "f32"
    nrhs, p = 8, 5

    rng = np.random.default_rng(42)
    pts = rng.random((n, 3))
    weights = rng.standard_normal((n, nrhs))

    params = FmmParams(
        interpolation_order=p, max_points_per_cell=256,
        compression_type=FmmCompressionType.ACA, epsilon=10.0**-p,
    )
    kp = KernelParams(KernelType.LinearRbf)
    tree = api.FmmTree(pts, p, kp, adaptive_tree=False, sparse=True, params=params)
    tree.prepare_targets(pts, "src")
    binned = tree._ensure_scan_tables(tree._target_cache["src"])
    dev = tree._dev
    w_dev = jnp.asarray(weights)

    pull = lambda x: float(jnp.sum(x if isinstance(x, jnp.ndarray) else x[0]))

    # ---- pass-by-pass
    mult, w_sorted = api._upward(dev, w_dev, prec=prec)
    pull(mult)
    t_up = med_time(lambda: pull(api._upward(dev, w_dev, prec=prec)[0]))

    local = api._downward(dev, mult, w_sorted, kparams=kp, prec=prec)
    pull(local)
    t_down = med_time(lambda: pull(api._downward(dev, mult, w_sorted, kparams=kp, prec=prec)))

    leaf = lambda use_pallas: api._leaf_all(
        dev, binned["targets_pad"], binned["tgt_idx"], binned["tgt_mask"],
        binned["tcells"], local, mult, w_sorted,
        tree._p2p_args(binned, "f64", True)[0],
        tree._m2p_args(binned, "f64", True)[0], binned["nbr_tab"],
        binned["wtab"] if use_pallas else None,
        None,
        binned["inv_row"], binned["inv_slot"],
        kparams=kp, d=3, p=p,
        n_pad=binned["n_pad"], p2p_meta=binned["p2p_meta"],
        m2p_meta=tree._m2p_args(binned, "f64", True)[1], with_grads=False, prec=prec,
        use_pallas=use_pallas,
    )[0]
    pull(leaf(True))
    t_leaf_pal = med_time(lambda: pull(leaf(True)))
    pull(leaf(False))
    t_leaf_xla = med_time(lambda: pull(leaf(False)))

    # ---- fused
    vals = tree.evaluate_device(w_dev, "src", precision=prec)
    pull(vals)
    t_fused = med_time(lambda: pull(tree.evaluate_device(w_dev, "src", precision=prec)))

    # geometry facts
    print(f"n={n} prec={prec} nrhs={nrhs} p={p}")
    print(f"tree: ncells={tree.tree.num_cells} nleaves={len(tree.tree.leaf_cells)} "
          f"depth={tree.tree.depth}")
    for (wc, cs, cp), (rows, tab, mask) in zip(binned["p2p_meta"], binned["p2p_groups_host"]):
        m = np.asarray(mask)
        print(f"  p2p class S={wc}: rows={rows.shape[0]} chunk_scan={cs} "
              f"chunk_pallas={cp} fill={m.mean():.2f} pairs={int(m.sum()) * tab.shape[0] // max(tab.shape[0],1)}")
    tot_pairs = sum(int(np.asarray(mask).sum()) * binned["tgt_mask"].shape[1]
                    for (_, _, mask) in binned["p2p_groups_host"])
    print(f"  (upper bound pairs incl. row padding: {tot_pairs:.3e})")
    print(f"upward   {t_up*1e3:8.1f} ms")
    print(f"downward {t_down*1e3:8.1f} ms")
    print(f"leaf(pallas) {t_leaf_pal*1e3:8.1f} ms")
    print(f"leaf(xla)    {t_leaf_xla*1e3:8.1f} ms")
    print(f"fused    {t_fused*1e3:8.1f} ms   -> {n / t_fused:,.0f} pts/s")


if __name__ == "__main__":
    main()
