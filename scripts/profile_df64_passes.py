"""Per-leg timing of the df64 far-field passes at config-2 scale.

Splits _downward into its M2L loop vs P2L/L2L tail, and _upward into P2M
vs M2M, so the pre-slicing work (round 4) targets the right leg. Chained
dispatch timing per the verify notes (block_until_ready lies on axon).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ferreus_rbf_tpu.config import FmmCompressionType, FmmParams
    from ferreus_rbf_tpu.ops.fmm import api
    from ferreus_rbf_tpu.ops.fmm.api import FmmTree
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType

    n, nrhs, p = 100_000, 8, 5
    rng = np.random.default_rng(42)
    pts = rng.random((n, 3))
    params = FmmParams(interpolation_order=p, max_points_per_cell=256,
                       compression_type=FmmCompressionType.ACA, epsilon=10.0**-p)
    tree = FmmTree(pts, p, KernelParams(KernelType.LinearRbf),
                   adaptive_tree=False, sparse=True, params=params)
    tree.prepare_targets(pts, "src")
    w_dev = jnp.asarray(rng.standard_normal((n, nrhs)))
    dev, kp = tree._dev, tree.kernel_params
    prec = tree._f64_prec
    print("prec:", prec)

    def _pull(x):
        return float(jnp.sum(x))

    def timed(label, fn, x0, K=8, reps=3):
        fn(x0)  # warm/compile
        _pull(fn(x0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            x = x0
            for _ in range(K):
                x = fn(x)
            _pull(x)
            ts.append((time.perf_counter() - t0) / K)
        ts.sort()
        print(f"{label}: {ts[len(ts)//2]*1e3:.1f} ms")
        return ts[len(ts)//2]

    mult, w_sorted = api._upward(dev, w_dev, prec=prec)
    _pull(mult)

    # upward total
    timed("upward (p2m+m2m)",
          lambda x: api._upward(dev, w_dev * (1.0 + 1e-15 * jnp.ravel(x)[0]), prec=prec)[0],
          mult)

    # downward total
    local = api._downward(dev, mult, w_sorted, kparams=kp, prec=prec)
    _pull(local)
    timed("downward (m2l+p2l+l2l)",
          lambda x: api._downward(dev, mult * (1.0 + 1e-15 * jnp.ravel(x)[0]), w_sorted, kparams=kp, prec=prec),
          local)

    # M2L loop variants (jit stripped versions). "slot" recompresses per
    # target slot (the pre-r4 formulation); "zall" pre-compresses each level
    # source once then gathers rank-k vectors per slot (the current
    # _downward); "zall_flat2d" additionally gathers lane-aligned (k*r)-
    # flattened rows.
    import functools

    @functools.partial(jax.jit, static_argnames=("variant",))
    def m2l_var(mult_in, *, variant):
        from ferreus_rbf_tpu.ops import df64 as df64_mod
        ct = jnp.float64
        K = api._DF64_KEEP
        mult_c = mult_in.astype(ct)
        local = jnp.zeros((mult_c.shape[0] + 1,) + mult_c.shape[1:], ct)
        mult_pad = jnp.concatenate(
            [mult_c, jnp.zeros((1,) + mult_c.shape[1:], ct)], axis=0)
        for u_stack, vt_stack, src_r, src_cells, level_cells in dev["m2l_levels"]:
            u_c = u_stack.astype(ct)
            vt_c = None if vt_stack is None else vt_stack.astype(ct)
            mult_src = mult_pad[src_cells]
            if vt_c is not None and variant in ("zall", "zall_flat2d"):
                g_cnt, k_r = vt_c.shape[0], vt_c.shape[1]
                n_src1 = mult_src.shape[0]
                r = mult_src.shape[2]
                z_all = df64_mod.ozaki_einsum(
                    "gkq,sqr->gskr", vt_c, mult_src, nsl=K, keep=K)
                offs = jnp.arange(g_cnt, dtype=jnp.int32)[:, None] * n_src1
                if variant == "zall_flat2d":
                    z2 = z_all.reshape(g_cnt * n_src1, k_r * r)
                    def _chunk(_, src_c, u_c=u_c, z2=z2, offs=offs,
                               k_r=k_r, r=r):
                        zg = z2[src_c + offs]
                        zg = zg.reshape(zg.shape[0], zg.shape[1], k_r, r)
                        return None, df64_mod.ozaki_einsum(
                            "gpk,gckr->cpr", u_c, zg, nsl=K, keep=K)
                else:
                    z_flat = z_all.reshape(g_cnt * n_src1, k_r, r)
                    def _chunk(_, src_c, u_c=u_c, z_flat=z_flat, offs=offs):
                        zg = z_flat[src_c + offs]
                        return None, df64_mod.ozaki_einsum(
                            "gpk,gckr->cpr", u_c, zg, nsl=K, keep=K)
            else:
                def _chunk(_, src_c, u_c=u_c, vt_c=vt_c, mult_src=mult_src):
                    x = mult_src[src_c]
                    z = x if vt_c is None else df64_mod.ozaki_einsum(
                        "gkq,gcqr->gckr", vt_c, x, nsl=K, keep=K)
                    return None, df64_mod.ozaki_einsum(
                        "gpk,gckr->cpr", u_c, z, nsl=K, keep=K)
            if src_r.shape[0] == 1:
                _, y_all = _chunk(None, src_r[0])
            else:
                _, y_c = jax.lax.scan(_chunk, None, src_r)
                y_all = y_c.reshape((-1,) + y_c.shape[2:])
            local = local.at[level_cells].add(y_all, mode="drop", unique_indices=True)
        return local

    if prec == "df64":
        base = None
        for variant in ("slot", "zall", "zall_flat2d"):
            loc0 = m2l_var(mult, variant=variant)
            _pull(loc0)
            if base is None:
                base = loc0
            else:
                import numpy as _np
                d = float(jnp.max(jnp.abs(loc0 - base)))
                print(f"  ({variant} vs slot: max abs diff {d:.3e})")
            timed(f"m2l[{variant}]",
                  lambda x, variant=variant: m2l_var(
                      mult * (1.0 + 1e-15 * jnp.ravel(x)[0]), variant=variant),
                  loc0)
    else:
        loc0 = m2l_var(mult, variant="slot")

    # P2L+L2L tail
    @functools.partial(jax.jit, static_argnames=("prec",))
    def tail_only(local_in, *, prec):
        return api._downward_tail(dev, local_in, w_sorted, kparams=kp, prec=prec)

    t0 = tail_only(loc0, prec=prec)
    _pull(t0)
    timed("p2l+l2l tail",
          lambda x: tail_only(loc0 * (1.0 + 1e-15 * jnp.ravel(x)[0]), prec=prec),
          t0)

    # level shapes for context
    for i, (u_stack, vt_stack, src_r, src_cells, level_cells) in enumerate(dev["m2l_levels"]):
        print(f"  m2l level {i}: U {u_stack.shape}, Vt {None if vt_stack is None else vt_stack.shape}, src_r {src_r.shape}, cells {level_cells.shape}")
    print("  m2m_groups:", [(a.shape, b.shape) for a, b in dev["m2m_groups"]])
    print("  p2l:", None if dev["p2l"] is None else [a.shape for a in dev["p2l"]])


if __name__ == "__main__":
    main()
