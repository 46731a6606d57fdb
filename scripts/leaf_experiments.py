"""One-off experiments for the leaf-pass hot spots (run on the real TPU).

A. slab kernel dot precision HIGHEST (6-pass) vs HIGH (3-pass) vs VPU manual
B. w-bucketing: f64-gather-then-cast vs cast-then-f32-gather
C. unbucket: 2-index f64 gather vs flat-index gather vs f32 gather
D. L2P: on-the-fly anterpolation weights vs cached table einsum
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ferreus_rbf_tpu.config import FmmCompressionType, FmmParams
    from ferreus_rbf_tpu.ops.fmm import api, cheb, p2p_pallas
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType

    n, nrhs, p = 100_000, 8, 5
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
    local = api._downward(dev, mult, w_sorted, kparams=kp, prec="f32").astype(jnp.float64)
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

    def chain(fn, x0):
        @jax.jit
        def run(x):
            def body(c, _):
                o = fn(c)
                probe = o.reshape(-1)[0]
                return c * (1.0 + 0.0 * probe.astype(c.dtype)), probe
            _, outs = jax.lax.scan(body, x, None, length=K)
            return outs
        return timeit(run, x0) / K

    w_tiles = jnp.where(
        dev["src_tile_mask"][..., None],
        w_sorted[dev["src_tile_idx"]].astype(jnp.float32),
        jnp.float32(0.0),
    ).transpose(0, 2, 1)
    tpts = binned["targets_pad"][binned["tgt_idx"]].astype(jnp.float32)
    nbr = binned["nbr_tab"]

    # ---------------- A: slab dot precision
    import ferreus_rbf_tpu.ops.fmm.p2p_pallas as pp

    def slab_with(precision):
        def kern(nbr_ref, t_ref, s_hbm, w_hbm, o_ref, s_scr, w_scr, sems,
                 *, phi_r2, d, u_max, s_leaf):
            i = pl.program_id(0)
            r_tot = pl.num_programs(0)
            one = jnp.int32(1); zero = jnp.int32(0)
            slot = jax.lax.rem(i, jnp.int32(2)); nxt = one - slot
            s_leaf_c = jnp.int32(s_leaf)

            def dma_pair(row, sl, u):
                l = nbr_ref[u, row]
                off = jax.lax.mul(u, s_leaf_c)
                return (
                    pltpu.make_async_copy(s_hbm.at[l], s_scr.at[sl, :, pl.ds(off, s_leaf)], sems.at[sl, u, zero]),
                    pltpu.make_async_copy(w_hbm.at[l], w_scr.at[sl, :, pl.ds(off, s_leaf)], sems.at[sl, u, one]),
                )

            def issue(row, sl):
                def one_u(_i, u32):
                    a, b = dma_pair(row, sl, u32)
                    a.start(); b.start()
                    return u32 + one
                jax.lax.fori_loop(0, u_max, one_u, zero)

            @pl.when(i == 0)
            def _():
                issue(jnp.int32(0), slot)

            @pl.when(i + 1 < r_tot)
            def _():
                issue(i + one, nxt)

            def waitall(_i, u32):
                a, b = dma_pair(i, slot, u32)
                a.wait(); b.wait()
                return u32 + one
            jax.lax.fori_loop(0, u_max, waitall, zero)

            tcol = t_ref[0, :, 0:1]
            srow = s_scr[slot, 0:1, :]
            dd = tcol - srow
            r2 = dd * dd
            for k2 in range(1, d):
                dd = t_ref[0, :, k2:k2+1] - s_scr[slot, k2:k2+1, :]
                r2 = r2 + dd * dd
            kmat = phi_r2(r2)
            dn = (((1,), (1,)), ((), ()))
            if precision == "bf16x3":
                # manual 3-pass split: k = kh + kl, w = wh + wl (bf16 halves);
                # kh·wh + kh·wl + kl·wh ~ f32 accuracy at 3 DEFAULT passes
                kh = kmat.astype(jnp.bfloat16).astype(jnp.float32)
                kl = kmat - kh
                wv = w_scr[slot]
                wh = wv.astype(jnp.bfloat16).astype(jnp.float32)
                wl = wv - wh
                acc = jax.lax.dot_general(kh, wh, dimension_numbers=dn,
                                          preferred_element_type=jnp.float32,
                                          precision=jax.lax.Precision.DEFAULT)
                acc = acc + jax.lax.dot_general(kh, wl, dimension_numbers=dn,
                                                preferred_element_type=jnp.float32,
                                                precision=jax.lax.Precision.DEFAULT)
                acc = acc + jax.lax.dot_general(kl, wh, dimension_numbers=dn,
                                                preferred_element_type=jnp.float32,
                                                precision=jax.lax.Precision.DEFAULT)
                o_ref[0] = acc
            else:
                o_ref[0] = jax.lax.dot_general(
                    kmat, w_scr[slot],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )

        @partial(jax.jit, static_argnames=())
        def call(wt):
            from ferreus_rbf_tpu.ops import kernels as _k
            r, t, d = tpts.shape
            _, d_pad, s = dev["src_tiles"].shape
            u = nbr.shape[0]
            nr = wt.shape[1]
            nrhs_pad = -(-nr // 8) * 8
            wt2 = jnp.pad(wt, ((0, 0), (0, nrhs_pad - nr), (0, 0))) if nr < nrhs_pad else wt
            phi = _k.make_kernel(kp, dtype=jnp.float32).phi_r2
            body = partial(kern, phi_r2=phi, d=3, u_max=u, s_leaf=s)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(r,),
                in_specs=[
                    pl.BlockSpec((1, t, d), lambda i, nbr_: (i, i * 0, i * 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, t, nrhs_pad), lambda i, nbr_: (i, i * 0, i * 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, d_pad, u * s), jnp.float32),
                    pltpu.VMEM((2, nrhs_pad, u * s), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, u, 2)),
                ],
            )
            return pl.pallas_call(
                body, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((r, t, nrhs_pad), jnp.float32),
            )(nbr, tpts, dev["src_tiles"], wt2)
        return call

    for prec_name, prec_v in (("HIGHEST", jax.lax.Precision.HIGHEST),
                              ("bf16x3", "bf16x3"),
                              ("DEFAULT", jax.lax.Precision.DEFAULT)):
        f = slab_with(prec_v)
        t = chain(f, w_tiles)
        # accuracy vs HIGHEST
        if prec_name == "HIGHEST":
            ref = np.asarray(f(w_tiles))
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(f(w_tiles)) - ref)) / np.max(np.abs(ref)))
        print(f"A slab dot {prec_name:8s}: {t*1e3:7.2f} ms  rel-vs-HIGHEST {err:.2e}")

    # ---------------- B: w-bucketing variants
    def bucket_f64(w):
        return jnp.where(dev["src_tile_mask"][..., None],
                         w[dev["src_tile_idx"]].astype(jnp.float32), jnp.float32(0.0)
                         ).transpose(0, 2, 1)

    def bucket_f32(w):
        w32 = w.astype(jnp.float32)
        g = w32[dev["src_tile_idx"]]
        return jnp.where(dev["src_tile_mask"][..., None], g, jnp.float32(0.0)).transpose(0, 2, 1)

    print(f"B bucket f64-gather: {chain(bucket_f64, w_sorted)*1e3:7.2f} ms")
    print(f"B bucket f32-gather: {chain(bucket_f32, w_sorted)*1e3:7.2f} ms")

    # ---------------- C: unbucket variants
    vals_b = jnp.asarray(rng.standard_normal((nbr.shape[1], tpts.shape[1], nrhs)))
    inv_row, inv_slot = binned["inv_row"], binned["inv_slot"]
    inv_flat = inv_row.astype(jnp.int32) * tpts.shape[1] + inv_slot.astype(jnp.int32)

    def unb_2idx(vb):
        return vb[inv_row, inv_slot]

    def unb_flat(vb):
        return vb.reshape(-1, nrhs)[inv_flat]

    def unb_flat_f32(vb):
        return vb.astype(jnp.float32).reshape(-1, nrhs)[inv_flat]

    def unb_scatter(vb):
        flat = vb.reshape(-1, nrhs)
        tgt = binned["tgt_idx"].reshape(-1)
        out = jnp.zeros((binned["n_pad"], nrhs), vb.dtype)
        return out.at[tgt].set(flat, mode="drop", unique_indices=False)

    print(f"C unbucket 2-idx f64:  {chain(unb_2idx, vals_b)*1e3:7.2f} ms")
    print(f"C unbucket flat f64:   {chain(unb_flat, vals_b)*1e3:7.2f} ms")
    print(f"C unbucket flat f32:   {chain(unb_flat_f32, vals_b)*1e3:7.2f} ms")
    print(f"C unbucket scatter:    {chain(unb_scatter, vals_b)*1e3:7.2f} ms")

    # ---------------- D: L2P cached-table einsum
    ct = jnp.float32
    nodes_t = dev["nodes_t"].astype(ct)

    @jax.jit
    def build_table():
        tp = binned["targets_pad"][binned["tgt_idx"]].astype(ct)
        centers = dev["cell_centers"][binned["tcells"]].astype(ct)
        lengths = dev["cell_lengths"][binned["tcells"]].astype(ct)
        w_t, _ = cheb.anterpolation_weights(tp, centers, lengths, nodes_t, 3, xp=jnp)
        return w_t

    table = build_table()
    table.block_until_ready()
    print("D table shape", table.shape, table.dtype,
          f"{table.size*4/1e6:.0f} MB")

    def l2p_cached(loc):
        lg = loc[binned["tcells"]].astype(ct)  # (R, p^d, r)
        return jnp.einsum("ltp,lpr->ltr", table, lg).astype(jnp.float64)

    def l2p_fly(loc):
        _, vals_b2, _ = api._l2p_impl(
            dev, binned["targets_pad"], binned["tgt_idx"], binned["tgt_mask"],
            binned["tcells"], loc, d=3, p=p, with_grads=False, prec="f32")
        return vals_b2

    print(f"D L2P on-the-fly:  {chain(l2p_fly, local)*1e3:7.2f} ms")
    print(f"D L2P cached:      {chain(l2p_cached, local)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
