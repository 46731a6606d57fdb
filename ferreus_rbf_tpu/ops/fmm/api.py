"""FmmTree: the user-facing BBFMM evaluator, TPU-native.

Public surface mirrors ``ferreus_bbfmm::FmmTree`` (``bbfmm.rs:257-616``):
``set_weights`` (upward pass), ``evaluate`` / ``evaluate_with_gradients``
(downward + leaf pass), ``set_local_coefficients`` (full-tree downward pass,
amortised for repeated evaluation) and ``evaluate_leaves`` /
``evaluate_leaves_with_gradients`` (leaf pass only). Multi-RHS throughout.

Execution model (the TPU-first redesign):

* the octree, interaction lists and bucket/padding layout are built once on
  the host (``tree.py``) as flat index arrays;
* multipole/local coefficients live on device as one (ncells, p^d, nrhs)
  tensor;
* every pass is a batched einsum/gather pipeline jitted once per tree:
  P2M/L2P contract padded leaf-bucket weight tensors on the MXU, M2M/L2L are
  2^d (p^d, p^d) matmuls per level, M2L gathers permuted multipole columns
  per (level, reference-vector) group and applies the compressed (U, V^T)
  pair as two big matmuls, and the near-field P2P contracts phi(r2) tiles
  against source weights in fixed-size chunks;
* target batches are bucketed per leaf on the host with power-of-two shape
  quantisation so repeated calls (isosurfacing wavefronts, solver matvecs)
  reuse compiled programs; plan arrays are passed to the jitted passes as a
  pytree argument (not closure constants) to keep HLO small;
* the rayon-and-raw-pointer scatters of the reference become ``.at[].add``
  over disjoint or duplicate index sets.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...config import FmmCompressionType, FmmParams
from ..kernels import Kernel, KernelParams, make_kernel
from .. import df64 as df64_mod
from . import cheb, m2l, p2p_pallas, tree as tree_mod
from .tree import Octree, PointOutsideTreeError, calculate_tree_center_and_radius

__all__ = ["FmmTree", "PointOutsideTreeError", "KernelDoesNotSupportGradientsError"]

import functools as _functools
import os as _os

# df64 near-field accuracy/speed dial: number of slice-product DIAGONALS the
# split-dot contraction keeps (see p2p_pallas._df64_seg_dots). The w/m-plane
# slicing follows the dial (nsl = keep — the kernels never read plane
# j >= keep). keep=6 reaches ~1e-15 relative (measured,
# scripts/p2p_df64_bench.py); keep=5 drops one stacked dot + one slice plane
# for ~2e-13 — both far below the 1e-8 interpolant-match goal (BASELINE.md).
try:
    _DF64_KEEP = int(_os.environ.get("FERREUS_RBF_TPU_DF64_KEEP", "5"))
except ValueError as _e:
    raise ValueError(
        "FERREUS_RBF_TPU_DF64_KEEP must be an integer >= 1 (number of df64 "
        f"split-dot diagonals to keep), got {_os.environ['FERREUS_RBF_TPU_DF64_KEEP']!r}"
    ) from _e
_DF64_KEEP = max(1, _DF64_KEEP)


@_functools.lru_cache(maxsize=1)
def _zall_budget_bytes() -> int:
    """Max bytes for a level's df64 M2L rank pre-compression table before
    that level falls back to the slot-chunked two-step path
    (``FERREUS_RBF_TPU_ZALL_BYTES``, default 1.25 GB)."""
    return int(float(_os.environ.get("FERREUS_RBF_TPU_ZALL_BYTES", 1.25e9)))


def _far_keep_for(prec: str) -> int:
    """Far-field split-dot dial encoded in the prec string.

    ``"df64"`` runs every pass at the full near-field dial ``_DF64_KEEP``;
    ``"df64fK"`` (K a digit) runs the EXPANSION-MEDIATED passes — P2M, M2M,
    M2L, P2L, L2L, M2P, L2P — at keep=K while the direct near field (P2P)
    stays at ``_DF64_KEEP``. Tests and callers that pass ``"df64"``
    explicitly always get the full dial.
    """
    return _DF64_KEEP if prec == "df64" else max(1, int(prec[5:]))


def _f64_grade_prec(epsilon: float) -> str:
    """The f64-grade tier's prec string for an FMM plan with ``epsilon``.

    Every expansion-mediated contribution already carries O(epsilon)
    Chebyshev/ACA truncation error — in the reference too, whose f64
    arithmetic (``bbfmm.rs``) only guarantees the TRUNCATED value exactly.
    Rounding those passes at <= 0.01 * epsilon is therefore invisible in
    the result; only the u-list near field (exact in the reference) needs
    the full df64 dial. An ozaki contraction at keep=k drops diagonals at
    ~2^-8k of the leading product, so
        k_far = ceil((log2(1/epsilon) + log2(100)) / 8),  clamped [3, KEEP].
    eps 1e-5 -> 3, 1e-7 -> 4, 1e-9 -> 5. Override with
    ``FERREUS_RBF_TPU_FAR_KEEP`` ("full" or an integer dial).
    """
    env = _os.environ.get("FERREUS_RBF_TPU_FAR_KEEP")
    if env is not None:
        if env == "full":
            return "df64"
        k = max(1, min(int(env), _DF64_KEEP))
        return "df64" if k >= _DF64_KEEP else f"df64f{k}"
    import math

    k = math.ceil((math.log2(1.0 / max(float(epsilon), 1e-300)) + math.log2(100.0)) / 8.0)
    k = max(3, min(k, _DF64_KEEP))
    return "df64" if k >= _DF64_KEEP else f"df64f{k}"


class KernelDoesNotSupportGradientsError(ValueError):
    def __init__(self):
        super().__init__(
            "FMM evaluation failed: gradient evaluation requested but kernel "
            "does not support gradients"
        )


def _next_pow2(n) -> int:
    n = int(n)
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _chunk_m2l_level(u_stack, vt_stack, src_tab, level_cells, nnodes,
                     src_cells):
    """Device M2L level entry, target-slot layout, chunked over target slots.

    ``src_tab`` is (g, C): for m2l vector id g and target slot c it holds
    the LOCAL index into ``src_cells`` of the source cell (sentinel = the
    zero pad row) — well-defined because a vector id names a unique
    relative offset, so each (vid, tgt) pair has at most one source. This
    shape lets the downward pass reduce the vid axis INSIDE one dot_general
    (no per-pair intermediate, no non-unique scatter — the r1 profile
    showed the scatter-add was 11 ms of the 18.6 ms level cost). The slot
    axis is split into chunks so the gathered (g, C_chunk, p^d, r)
    multipole transient stays HBM-bounded.
    """
    g, c_pad = src_tab.shape
    # elements per chunked gather. Sized for the WORST precision mode: an
    # f64 dot on TPU lowers to 19 f32 split passes (observed f32[..., 19]
    # temporaries OOMing HBM at 100k pts), so the f64-mode transient is
    # ~150 bytes/element at r=1.
    budget = 1 << 23
    c_chunk = max(16, budget // max(g * nnodes, 1))
    c_chunk = 1 << (int(c_chunk).bit_length() - 1)
    c_chunk = min(c_chunk, c_pad)
    nchunk = (c_pad + c_chunk - 1) // c_chunk
    if c_pad % c_chunk:  # c_pad is pow2 and c_chunk <= c_pad, so it divides
        raise AssertionError((c_pad, c_chunk))
    src_r = src_tab.reshape(g, nchunk, c_chunk).transpose(1, 0, 2)
    return (
        jnp.asarray(u_stack),
        None if vt_stack is None else jnp.asarray(vt_stack),
        jnp.asarray(np.ascontiguousarray(src_r)),
        jnp.asarray(src_cells),
        jnp.asarray(level_cells),
    )


def _pallas_default() -> bool:
    """Use the fused Pallas near-field kernel on TPU backends.

    Env override ``FERREUS_RBF_TPU_PALLAS=0/1``. Only the f32 no-gradient
    inner-matvec path is affected; f64 and gradient paths always use the
    XLA scan.
    """
    import os

    env = os.environ.get("FERREUS_RBF_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# --------------------------------------------------------------------- jitted
# Module-level pass functions: all tree-specific data arrives in the `dev`
# pytree argument; only the kernel closures / dimensionality arrive statically.


from functools import partial as _partial


def _p2m_apply(mult, xs, pts_c, nodes_t, *, d, ct, wt_ct, df, kf,
               w_sorted=None):
    """Shared P2M body: anterpolate + contract each leaf chunk of ``xs``
    (idx, msk, ctr, len, cells[, wb]) into ``mult`` (scan when >1 chunk).
    Used by :func:`_upward` (full scan) and :func:`_sharded_upward` (each
    device's chunk slice)."""

    def p2m_chunk(mult_acc, sl):
        idx, msk, ctr, ln, cells = sl[:5]
        w_t, _ = cheb.anterpolation_weights(
            pts_c[idx].astype(wt_ct), ctr.astype(wt_ct), ln.astype(wt_ct),
            nodes_t.astype(wt_ct), d, xp=jnp
        )
        w_t = w_t.astype(ct)
        # Mask pad SLOTS on the weight side too: their garbage points sit
        # far outside the cell and the Chebyshev extrapolation explodes
        # (observed 1.7e11) — harmless against zero wb in exact arithmetic,
        # but it poisons the df64 split-dot's per-row scaling (the slot
        # axis is the contraction axis) and costs ~38 bits of resolution.
        w_t = jnp.where(msk[..., None], w_t, ct(0.0))
        if len(sl) == 6:
            wb = sl[5]  # pre-gathered, already masked
        else:
            wb = jnp.where(msk[..., None], w_sorted[idx].astype(ct), ct(0.0))
        if df:
            contrib = df64_mod.ozaki_einsum("lsp,lsr->lpr", w_t, wb, nsl=kf, keep=kf)
        else:
            contrib = jnp.einsum("lsp,lsr->lpr", w_t, wb)
        return mult_acc.at[cells].add(contrib, mode="drop"), None

    if xs[0].shape[0] == 1:
        mult, _ = p2m_chunk(mult, tuple(a[0] for a in xs))
    else:
        mult, _ = jax.lax.scan(p2m_chunk, mult, xs)
    return mult


def _m2m_apply(dev, mult, *, ct, df, kf):
    """Shared bottom-up M2M sweep over the plan's octant groups."""
    m2m_c = dev["m2m_ops"].astype(ct)
    for ch_t, pa_t in dev["m2m_groups"]:
        x = mult[ch_t]  # (2^d, cmax, p^d, r); pads gather row 0
        if df:
            contrib = df64_mod.ozaki_einsum("opq,ocqr->ocpr", m2m_c, x, nsl=kf, keep=kf)
        else:
            contrib = jnp.einsum("opq,ocqr->ocpr", m2m_c, x)
        mult = mult.at[pa_t].add(contrib, mode="drop")  # pads scatter-drop
    return mult


@_partial(jax.jit, static_argnames=("prec",))
def _upward(dev, weights, w_tiles=None, *, prec="f64"):
    """weights (N, nrhs), original point order -> (multipole, w_sorted).

    ``prec="f32"`` runs P2M/M2M in float32 (mixed-precision inner matvec);
    ``prec="df64"`` keeps f64 weight generation but runs the contractions
    as exact bf16 split dots (ozaki_einsum) — f64-grade results without
    XLA's 19-pass f64 dot emulation. The multipole expansion is upcast on
    return so downstream code always sees f64.

    P2M anterpolation weights are computed ON THE FLY per leaf chunk (a
    precomputed (nsl, smax, p^d) table costs 7.8 GB at 1M points) — the
    Chebyshev recurrences are a tiny fraction of the contraction cost.
    """
    df = prec.startswith("df64")
    kf = _far_keep_for(prec) if df else _DF64_KEEP
    ct = jnp.float32 if prec == "f32" else jnp.float64
    w_sorted = weights[dev["point_order"]]
    ncells = dev["cell_centers"].shape[0]
    nnodes = dev["m2m_ops"].shape[1]
    d = dev["cell_centers"].shape[1]
    nodes_t = dev["nodes_t"].astype(ct)
    pts_c = dev["pts_sorted"].astype(ct)
    mult = jnp.zeros((ncells + 1, nnodes, weights.shape[1]), ct)

    idx_r, msk_r, ctr_r, len_r, cells_r = dev["p2m_scan"]

    # Pre-gathered weight tiles (the fused matvec's ONE consolidated
    # gather) replace the per-chunk w_sorted[idx] gathers; reshaped into
    # the p2m scan's (nchunk, chunk, smax, r) layout by contiguous pad.
    wb_r = None
    if w_tiles is not None:
        # src_bucket_idx carries the zero-weight sentinel as its LAST row;
        # the p2m scan covers only the true leaves
        nsl = dev["src_bucket_idx"].shape[0] - 1
        smax = dev["src_bucket_idx"].shape[1]
        nsl_pad = idx_r.shape[0] * idx_r.shape[1]
        wb_all = w_tiles[:nsl, :smax, :].astype(ct)
        if nsl_pad > nsl:
            wb_all = jnp.pad(wb_all, ((0, nsl_pad - nsl), (0, 0), (0, 0)))
        wb_r = wb_all.reshape((idx_r.shape[0], idx_r.shape[1]) + wb_all.shape[1:])

    # Anterpolation-weight generation precision: XLA-emulated f64
    # elementwise recurrences dominate the df64 upward pass (measured
    # 17.5 of 72.5 ms at config-2 scale, round 4). At the kf=3 far dial
    # the pass's own rounding floor is ~2^-24, so f32 weight generation
    # (error ~1e-7 on weights that sum to 1) is already below it; kf>=4
    # dials keep f64 generation.
    wt_ct = jnp.float32 if (df and kf <= 3) else ct

    xs = (idx_r, msk_r, ctr_r, len_r, cells_r)
    if wb_r is not None:
        xs = xs + (wb_r,)
    mult = _p2m_apply(mult, xs, pts_c, nodes_t, d=d, ct=ct, wt_ct=wt_ct,
                      df=df, kf=kf, w_sorted=w_sorted)
    mult = mult[:-1]  # drop the pad-leaf sentinel row
    mult = _m2m_apply(dev, mult, ct=ct, df=df, kf=kf)
    return mult.astype(jnp.float64), w_sorted


def _sharded_upward(mesh, dev, weights, w_tiles, *, prec):
    """P2M with the leaf-chunk axis partitioned over "sp"; M2M replicated.

    The upward pass is NOT a small per-matvec cost (measured 7.0 of
    19.0 ms f32 / 17.5 of 72.5 ms df64 at 100k points, round 4 — the r1-r3
    sharding docs claimed otherwise and were wrong). P2M is leaf-parallel
    exactly like the near field (the reference's rayon leaf loop,
    ``bbfmm.rs:669-682``): each device anterpolates its own slice of the
    (nchunk, chunk) leaf tables into a local multipole accumulator and ONE
    ``psum`` over "sp" merges them — each leaf cell is written by exactly
    one chunk row, so every cell's value is produced by a single device
    and the psum adds it to zeros: n-device results stay BITWISE equal to
    the 1-device program. The psum moves the (ncells+1, p^d, nrhs) array
    (a few MB at 1M points) over ICI once per matvec. M2M stays
    replicated: it touches ~1/2^d of the cells with einsums too small to
    win back a collective.
    """
    from jax.sharding import PartitionSpec as P

    df = prec.startswith("df64")
    kf = _far_keep_for(prec) if df else _DF64_KEEP
    ct = jnp.float32 if prec == "f32" else jnp.float64
    wt_ct = jnp.float32 if (df and kf <= 3) else ct
    w_sorted = weights[dev["point_order"]]
    ncells = dev["cell_centers"].shape[0]
    nnodes = dev["m2m_ops"].shape[1]
    d = dev["cell_centers"].shape[1]
    nodes_t = dev["nodes_t"].astype(ct)
    pts_c = dev["pts_sorted"].astype(ct)

    idx_r, msk_r, ctr_r, len_r, cells_r = dev["p2m_scan"]
    nchunk, chunk = idx_r.shape[0], idx_r.shape[1]
    nsp = int(mesh.shape["sp"])
    ncp = -(-nchunk // nsp) * nsp  # pad chunks so the axis divides the mesh

    nsl = dev["src_bucket_idx"].shape[0] - 1
    smax = dev["src_bucket_idx"].shape[1]
    wb_all = w_tiles[:nsl, :smax, :].astype(ct)
    if ncp * chunk > nsl:
        wb_all = jnp.pad(wb_all, ((0, ncp * chunk - nsl), (0, 0), (0, 0)))
    wb_r = wb_all.reshape((ncp, chunk) + wb_all.shape[1:])

    def _padc(a, const):
        if ncp == nchunk:
            return a
        pad = [(0, ncp - nchunk)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad, constant_values=const)

    # pad-chunk values mirror the plan's sentinel rows (api plan build):
    # idx 0, mask False, centre/length 1, cell = the dropped sentinel row
    xs = (_padc(idx_r, 0), _padc(msk_r, False), _padc(ctr_r, 1.0),
          _padc(len_r, 1.0), _padc(cells_r, ncells), wb_r)

    def block(*xs_b):
        mult0 = jnp.zeros((ncells + 1, nnodes, weights.shape[1]), ct)
        mult_loc = _p2m_apply(mult0, xs_b, pts_c, nodes_t, d=d, ct=ct,
                              wt_ct=wt_ct, df=df, kf=kf)
        return jax.lax.psum(mult_loc, "sp")

    mult = jax.shard_map(
        block, mesh=mesh, in_specs=(P("sp"),) * 6, out_specs=P(),
        check_vma=False,
    )(*xs)
    mult = mult[:-1]
    mult = _m2m_apply(dev, mult, ct=ct, df=df, kf=kf)
    return mult.astype(jnp.float64), w_sorted


@_partial(jax.jit, static_argnames=("kparams", "prec"))
def _downward(dev, mult, w_sorted, w_tiles=None, *, kparams, prec="f64"):
    """Full-tree downward pass: M2L + P2L, then L2L top-down.

    ``prec="f32"`` runs the M2L/P2L/L2L matmuls in float32 (the
    mixed-precision solver's inner-iteration mode); ``prec="df64"`` runs
    them as exact bf16 split dots (f64-grade, no 19-pass f64 emulation).
    The result is upcast at the end so downstream code always sees f64.
    """
    df = prec.startswith("df64")
    kf = _far_keep_for(prec) if df else _DF64_KEEP
    ct = jnp.float32 if prec == "f32" else jnp.float64
    kernel = make_kernel(kparams, dtype=ct)
    mult_c = mult.astype(ct)
    local = jnp.zeros((mult_c.shape[0] + 1,) + mult_c.shape[1:], ct)
    # One fused contraction per level, scanned over target-slot chunks
    # (memory-bounded; see _chunk_m2l_level). Groups are per m2l *vector id*
    # with the symmetry permutation pre-folded into (U, Vt) at plan time
    # (see _build_plan) — no runtime permutation gathers. The target-slot
    # layout reduces the vid axis inside the dot_general, so no per-pair
    # (g, m, p^d, r) intermediate is written and the only scatter is one
    # unique-index add of the finished level block.
    mult_pad = jnp.concatenate(
        [mult_c, jnp.zeros((1,) + mult_c.shape[1:], ct)], axis=0
    )
    for u_stack, vt_stack, src_r, src_cells, level_cells in dev["m2l_levels"]:
        u_c = u_stack.astype(ct)  # (g, p^d, k)
        vt_c = None if vt_stack is None else vt_stack.astype(ct)  # (g, k, p^d)
        # Each level gathers its sources ONCE into a compact (S+1, p^d, r)
        # block (sentinel = the zero pad row); slot chunks then re-gather
        # from the compact block, not the whole-tree multipole table.
        mult_src = mult_pad[src_cells]  # (S+1, p^d, r): each source ONCE

        # The pre-compression table z_all is (g, S+1, k, r) f64 — ~2.2 GB
        # for the 32k-cell level of a 3M-point tree (plus its z_flat
        # reshape). Levels whose table would blow the budget fall back to
        # a slot-chunked two-step split-dot path: ~2x the Vt reads, zero
        # resident table (the 3M/10M memory plan needs the HBM more than
        # the reads; see docs/performance.md).
        z_bytes = 0
        if vt_c is not None:
            z_bytes = (vt_c.shape[0] * mult_src.shape[0] * vt_c.shape[1]
                       * mult_src.shape[2] * 8)
        if df and vt_c is not None and z_bytes > _zall_budget_bytes():
            def _level_chunk(_, src_c, u_c=u_c, vt_c=vt_c,
                             mult_src=mult_src, kf=kf):
                x = mult_src[src_c]  # (g, c_chunk, p^d, r)
                z = df64_mod.ozaki_einsum("gkq,gcqr->gckr", vt_c, x,
                                          nsl=kf, keep=kf)
                return None, df64_mod.ozaki_einsum(
                    "gpk,gckr->cpr", u_c, z, nsl=kf, keep=kf)
        elif df and vt_c is not None:
            # df64 rank pre-compression: push every level source through
            # every Vt ONCE (g x S split dots instead of g x n_slots — the
            # slot axis duplicates each source up to 8x), then gather only
            # rank-k vectors per slot. The gather indexes a FLATTENED
            # (g*(S+1), k*r) table: the g offset folds into the index (a
            # plain leading-axis gather) and the trailing k*r axes flatten
            # into ONE lane-aligned row. Both flattenings are load-bearing:
            # a (g, S+1, ...) batched middle-axis gather regressed 2x, and
            # a (g*(S+1), k, r) 3-D table regressed 1.4x — its 8-wide f64
            # trailing axis maps onto 8 of 128 vreg lanes (measured
            # slot/zall/zall_flat2d = 31.7/43.9/20.5 ms, bitwise equal;
            # r4 pass profiling, summarised in docs/performance.md).
            g_cnt, k_r = vt_c.shape[0], vt_c.shape[1]
            n_src1, _, n_r = mult_src.shape
            z_all = df64_mod.ozaki_einsum(
                "gkq,sqr->gskr", vt_c, mult_src,
                nsl=kf, keep=kf)
            z_flat = z_all.reshape(g_cnt * n_src1, k_r * n_r)
            offs = jnp.arange(g_cnt, dtype=jnp.int32)[:, None] * n_src1

            def _level_chunk(_, src_c, u_c=u_c, z_flat=z_flat, offs=offs,
                             k_r=k_r, n_r=n_r, kf=kf):
                z = z_flat[src_c + offs]  # (g, c_chunk, k*r)
                z = z.reshape(z.shape[0], z.shape[1], k_r, n_r)
                return None, df64_mod.ozaki_einsum(
                    "gpk,gckr->cpr", u_c, z, nsl=kf, keep=kf)
        else:
            def _level_chunk(_, src_c, u_c=u_c, vt_c=vt_c, mult_src=mult_src,
                             kf=kf):
                x = mult_src[src_c]  # (g, c_chunk, p^d|k source dim, r)
                if df:
                    z = x
                    return None, df64_mod.ozaki_einsum("gpk,gckr->cpr", u_c, z, nsl=kf, keep=kf)
                z = x if vt_c is None else jnp.einsum("gkq,gcqr->gckr", vt_c, x)
                # contract BOTH the vid and rank axes in one dot:
                # y[p, c, r] = sum_{g,k} U[g,p,k] z[g,c,k,r]
                y = jax.lax.dot_general(
                    u_c, z, dimension_numbers=(((0, 2), (0, 2)), ((), ()))
                )
                return None, y.transpose(1, 0, 2)  # (c_chunk, p^d, r)

        if src_r.shape[0] == 1:
            _, y_all = _level_chunk(None, src_r[0])
        else:
            _, y_c = jax.lax.scan(_level_chunk, None, src_r)
            y_all = y_c.reshape((-1,) + y_c.shape[2:])
        local = local.at[level_cells].add(y_all, mode="drop", unique_indices=True)

    return _downward_tail(dev, local, w_sorted, w_tiles, kparams=kparams, prec=prec)


def _downward_tail(dev, local, w_sorted, w_tiles=None, *, kparams, prec="f64"):
    """P2L (x-list) + top-down L2L on a populated local table.

    ``local`` arrives with the pad-target sentinel row still attached
    ((ncells + 1) rows — as the M2L loop or :func:`_sharded_m2l` leaves
    it); returns the finished (ncells, p^d, r) f64 local expansions.
    """
    df = prec.startswith("df64")
    kf = _far_keep_for(prec) if df else _DF64_KEEP
    ct = jnp.float32 if prec == "f32" else jnp.float64
    kernel = make_kernel(kparams, dtype=ct)
    local = local[:-1]  # drop the pad-target sentinel row

    p2l = dev["p2l"]
    if p2l is not None:
        # scanned over x-pair chunks: the (m, p^d, smax) kernel block for
        # all pairs at once is ~40 GB at 1M points
        tgt_r, src_row_r, centers_r, lengths_r = p2l

        smax = dev["src_bucket_idx"].shape[1]

        def p2l_chunk(loc, sl):
            tgt, src_row, centers, lengths = sl
            nodes_scaled = cheb.scale_nodes_to_cell(dev["nodes_nd"], centers, lengths, xp=jnp)
            sidx = dev["src_bucket_idx"][src_row]
            smask = dev["src_bucket_mask"][src_row]
            spts = dev["pts_sorted"][sidx]
            k = jnp.where(smask[:, None, :], kernel.pair(nodes_scaled, spts), ct(0.0))
            if w_tiles is not None:
                wvals = w_tiles[src_row, :smax, :].astype(ct)  # pre-masked
            else:
                wvals = jnp.where(smask[..., None], w_sorted[sidx].astype(ct), ct(0.0))
            if df:
                y = df64_mod.ozaki_einsum("mps,msr->mpr", k, wvals, nsl=kf, keep=kf)
            else:
                y = jnp.einsum("mps,msr->mpr", k, wvals)
            return loc.at[tgt].add(y, mode="drop"), None

        if tgt_r.shape[0] == 1:
            local, _ = p2l_chunk(local, tuple(a[0] for a in p2l))
        else:
            local, _ = jax.lax.scan(p2l_chunk, local, p2l)

    m2m_c = dev["m2m_ops"].astype(ct)
    for ch_t, pa_t in dev["l2l_groups"]:
        x = local[pa_t]  # (2^d, cmax, p^d, r); pads gather row 0
        if df:
            contrib = df64_mod.ozaki_einsum("opq,ocpr->ocqr", m2m_c, x, nsl=kf, keep=kf)
        else:
            contrib = jnp.einsum("opq,ocpr->ocqr", m2m_c, x)
        local = local.at[ch_t].add(contrib, mode="drop")  # pads scatter-drop
    return local.astype(jnp.float64)


def _l2p_impl(dev, targets, tgt_idx, tgt_mask, tcells, local, *, d, p, with_grads, prec="f64", ecs=1024):
    """L2P scanned over target-row chunks: the anterpolation-weight
    transient is (chunk, T, p^d), not (all rows, T, p^d) — the full table
    is ~4 GB at 1M targets with p=7. ``ecs`` (FmmParams.eval_chunk_size)
    linearly scales the transient budget; 1024 is the reference default."""
    df = prec.startswith("df64")
    kf = _far_keep_for(prec) if df else _DF64_KEEP
    ct = jnp.float32 if prec == "f32" else jnp.float64
    nodes_t = dev["nodes_t"].astype(ct)
    tpts = targets[tgt_idx]
    r = local.shape[-1]
    rows, t = tgt_idx.shape
    nnodes = local.shape[-2]
    # budget 1<<23 elements: the df64 tier's split-dot planes multiply the
    # per-chunk transient ~6x, and 1<<25 OOM'd a 16 GB chip at 3M points
    chunk = max(8, ((1 << 23) * max(int(ecs), 1) // 1024) // max(t * nnodes, 1))
    chunk = 1 << (int(chunk).bit_length() - 1)
    chunk = min(chunk, rows)  # rows is pow2-padded, so chunk divides it

    # reduced-precision weight generation at the kf=3 far dial (see
    # _upward: the f64-emulated recurrences dominate, not the dots)
    wt_ct = jnp.float32 if (df and kf <= 3) else ct

    def l2p_chunk(_, sl):
        tp, tc = sl
        centers = dev["cell_centers"][tc].astype(wt_ct)
        lengths = dev["cell_lengths"][tc].astype(wt_ct)
        loc = local[tc].astype(ct)
        w_t, dw_t = cheb.anterpolation_weights(
            tp.astype(wt_ct), centers, lengths, nodes_t.astype(wt_ct), d,
            xp=jnp, with_gradients=with_grads
        )
        w_t = w_t.astype(ct)
        if dw_t is not None:
            dw_t = dw_t.astype(ct)
        if df:
            vals = df64_mod.ozaki_einsum("ltp,lpr->ltr", w_t, loc, nsl=kf, keep=kf)
        else:
            # the f32 tier accumulates the whole leaf pass in f32 (halves
            # the HBM traffic of the adds + the unbucket gather); f64 out
            # for the accurate tiers
            vals = jnp.einsum("ltp,lpr->ltr", w_t, loc)
            if prec != "f32":
                vals = vals.astype(jnp.float64)
        if with_grads and df:
            # split-dot planes instead of the 19-pass emulated-f64 einsum:
            # the L2P leg of the df64 gradient tier
            grads = df64_mod.ozaki_einsum("ltdp,lpr->ltrd", dw_t, loc, nsl=kf, keep=kf)
        elif with_grads:
            grads = jnp.einsum("ltdp,lpr->ltrd", dw_t, loc).astype(jnp.float64)
        else:
            grads = jnp.zeros(vals.shape + (d,), jnp.float64)
        return None, (vals, grads)

    if chunk == rows:
        _, (vals_b, grads_b) = l2p_chunk(None, (tpts, tcells))
    else:
        nch = rows // chunk
        resh = lambda a: a.reshape((nch, chunk) + a.shape[1:])
        _, (v, g) = jax.lax.scan(l2p_chunk, None, (resh(tpts), resh(tcells)))
        vals_b = v.reshape((rows,) + v.shape[2:])
        grads_b = g.reshape((rows,) + g.shape[2:])
    return tpts, vals_b, grads_b


def _row_chunk_scan(kernel, with_grads, tpts_rows, tmask_rows, src_pts, src_mask, src_w, chunk):
    """Scan over row chunks: out[row] = sum_s phi(|t - s|) w_s, scatter-free.

    tpts_rows (R, T, d); src_pts (R, S, d); src_w (R, S, nrhs); R padded to a
    multiple of ``chunk``. Returns (R, T, nrhs) values (+ gradients).
    """

    def body(_, xs):
        tp, sp, sm, wv = xs
        if with_grads:
            k, g = kernel.pair_with_grad(tp, sp)
            k = jnp.where(sm[:, None, :], k, 0.0)
            g = jnp.where(sm[:, None, :, None], g, 0.0)
            vals = jnp.einsum("cts,csr->ctr", k, wv)
            grads = jnp.einsum("ctsd,csr->ctrd", g, wv)
            return None, (vals, grads)
        k = jnp.where(sm[:, None, :], kernel.pair(tp, sp), 0.0)
        vals = jnp.einsum("cts,csr->ctr", k, wv)
        return None, (vals, jnp.zeros(vals.shape + (tp.shape[-1],), jnp.float64))

    r = tpts_rows.shape[0]
    nc = r // chunk
    resh = lambda a: a.reshape((nc, chunk) + a.shape[1:])
    _, (vals, grads) = jax.lax.scan(
        body, None, (resh(tpts_rows), resh(src_pts), resh(src_mask), resh(src_w))
    )
    return vals.reshape((r,) + vals.shape[2:]), grads.reshape((r,) + grads.shape[2:])


def _near_field_class(
    kernel, kparams, pallas_nf, with_grads, ct,
    tpts, tgt_mask, src_coords, src_vals, rows, idx_tab, mask_tab, chunk,
):
    """One width class of the near field, scanned over ROW CHUNKS with the
    source gathers INSIDE the scan body — the fully-gathered (R, S, d+nrhs)
    tables are multi-GB at 1M points, so only one chunk is ever live.

    ``src_coords`` is either a (N, d) coordinate table (P2P: the sorted
    points) or a ``(centers, lengths, nodes_nd)`` tuple (M2P): the flat
    per-cell Chebyshev node table is (ncells * p^d, d) f64 — 1.4 GB at 10M
    points — so M2P nodes are recomputed per gathered index instead of
    stored (bitwise equal: same ``center + (length/2) * node`` f64 ops)."""
    virtual_nodes = isinstance(src_coords, tuple)
    if virtual_nodes:
        centers64, lengths64, nodes_nd64 = src_coords
        nnodes = nodes_nd64.shape[0]
    else:
        coords_c = src_coords.astype(ct)
    vals_c = src_vals.astype(ct)

    def body(_, xs):
        rws, sidx, smask = xs
        if virtual_nodes:
            c_idx = sidx // nnodes
            sp = (centers64[c_idx]
                  + (lengths64[c_idx][..., None] * 0.5)
                  * nodes_nd64[sidx % nnodes]).astype(ct)
        else:
            sp = coords_c[sidx]  # (chunk, S, d)
        wv = jnp.where(smask[..., None], vals_c[sidx], ct(0.0))
        tp = tpts[rws].astype(ct)
        if pallas_nf:
            vals = p2p_pallas.p2p_rows(
                tp, sp.transpose(0, 2, 1), wv.transpose(0, 2, 1), kparams=kparams
            )
            return None, (vals, jnp.zeros(vals.shape + (tp.shape[-1],), ct))
        if with_grads:
            k, g = kernel.pair_with_grad(tp, sp)
            k = jnp.where(smask[:, None, :], k, 0.0)
            g = jnp.where(smask[:, None, :, None], g, 0.0)
            vals = jnp.einsum("cts,csr->ctr", k, wv)
            grads = jnp.einsum("ctsd,csr->ctrd", g, wv)
            return None, (vals, grads)
        k = jnp.where(smask[:, None, :], kernel.pair(tp, sp), 0.0)
        vals = jnp.einsum("cts,csr->ctr", k, wv)
        return None, (vals, jnp.zeros(vals.shape + (tp.shape[-1],), ct))

    r = rows.shape[0]
    nc = r // chunk
    if nc <= 1:
        _, (vals, grads) = body(None, (rows, idx_tab, mask_tab))
        return vals, grads
    resh = lambda a: a.reshape((nc, chunk) + a.shape[1:])
    _, (vals, grads) = jax.lax.scan(
        body, None, (resh(rows), resh(idx_tab), resh(mask_tab))
    )
    return vals.reshape((r,) + vals.shape[2:]), grads.reshape((r,) + grads.shape[2:])


def _chunk_pair_rows(call, tpts_args, nbr_tab):
    """Scan a bucketed pair-kernel call over target-row chunks.

    The scalar-prefetched (U, R) neighbour table lives in the 1 MB SMEM;
    at 1M points R ~ 16k and the padded table is ~4 MB. Rows are split
    into chunks of <= 4096 (<= ~0.5 MB of SMEM) and the kernel scans over
    them — which also makes the compiled kernel shape independent of the
    total row count.

    ``tpts_args`` are the per-row (R, ...) leading-axis operands;
    ``call(chunked_tpts_args, nbr_chunk)`` returns a TUPLE of (Rc, ...)
    outputs.
    """
    r = tpts_args[0].shape[0]
    # SMEM budget ~450 KB for the prefetched table: the (U, Rc) i32 chunk
    # pads U up to the next multiple of 8 sublanes (observed U=58 on a
    # 1M-pt adaptive tree -> 64 x 4096 x 4 B = exactly the 1 MB SMEM)
    u_pad = -(-nbr_tab.shape[0] // 8) * 8
    # no fixed floor: a 512-row floor with a wide neighbour table (u_pad >
    # ~225 on strongly adaptive trees) would blow the budget and overflow
    # the 1 MB SMEM; let the chunk fall to small powers of two instead
    budget_rows = max(8, (450 * 1024) // (u_pad * 4))
    chunk = 1 << (budget_rows.bit_length() - 1)
    chunk = min(chunk, r)
    nc = r // chunk
    if nc <= 1:
        return call(tpts_args, nbr_tab)
    resh = lambda a: a.reshape((nc, chunk) + a.shape[1:])
    nbr_r = nbr_tab.reshape(nbr_tab.shape[0], nc, chunk).transpose(1, 0, 2)

    def body(_, sl):
        t_args = sl[:-1]
        nbr_c = sl[-1]
        return None, call(t_args, nbr_c)

    _, outs = jax.lax.scan(
        body, None, tuple(resh(a) for a in tpts_args) + (nbr_r,)
    )
    return tuple(o.reshape((r,) + o.shape[2:]) for o in outs)


@_partial(jax.jit, static_argnames=("kparams", "d", "p", "n_pad", "p2p_meta", "m2p_meta", "with_grads", "prec", "use_pallas", "ecs"))
def _leaf_all(
    dev, targets, tgt_idx, tgt_mask, tcells, local, mult, w_sorted,
    p2p_groups, m2p_groups, nbr_tab, wtab, upairs, inv_row, inv_slot,
    w_tiles_pre=None,
    *, kparams, d, p, n_pad,
    p2p_meta, m2p_meta, with_grads, prec="f64", use_pallas=False, ecs=1024,
):
    """The whole leaf pass as ONE compiled program.

    L2P is a direct bucket einsum. P2P on the Pallas path is *bucketed*:
    sources stay in their static per-leaf tiles (``dev["src_tiles"]``) and a
    scalar-prefetched (U, R) neighbour table drives the per-(row, leaf)
    DMA — no per-matvec coordinate/weight gathers (measured at ~90 ms per
    100k-pt matvec on v5e, 8x the kernel compute itself). The XLA fallback
    (gradients / f64) is target-row-major: each target bucket row owns the
    concatenation of its u-list source points padded to a power-of-two
    class, scanned in row chunks. M2P follows the same row-major scheme.
    No scatter appears in any loop.
    """
    ct = jnp.float32 if prec == "f32" else jnp.float64
    kernel = make_kernel(kparams, dtype=ct)
    # The fused Pallas near-field kernels cover the no-gradient paths
    # ("f32" = the solver's inner matvec; "df64" = the f64-grade tier);
    # gradients and CPU backends stay on the XLA scan.
    pallas_nf = use_pallas and prec == "f32" and not with_grads
    pallas_df = use_pallas and prec.startswith("df64") and not with_grads
    # f64-grade GRADIENT tier: the sorted pair-list kernels with gscale*dd
    # contractions (needs the pair triples — _p2p_args/_m2p_args fall back
    # to the f64 scan when they don't fit SMEM)
    pallas_df_g = use_pallas and prec.startswith("df64") and with_grads
    # far-field dial: expansion-mediated M2P runs at the (possibly reduced)
    # far keep; the direct near field always keeps the full dial
    kf = _far_keep_for(prec) if prec.startswith("df64") else _DF64_KEEP
    tpts, vals_b, grads_b = _l2p_impl(
        dev, targets, tgt_idx, tgt_mask, tcells, local, d=d, p=p,
        with_grads=with_grads, prec=prec, ecs=ecs
    )

    if pallas_nf and nbr_tab is not None:
        # bucket the weights once (nsl * smax * nrhs elements — tiny next
        # to the row-table gathers this path replaces); the fused matvec
        # passes the consolidated pre-gathered tiles instead
        if w_tiles_pre is not None:
            w_tiles = w_tiles_pre.astype(jnp.float32).transpose(0, 2, 1)
        else:
            w_tiles = jnp.where(
                dev["src_tile_mask"][..., None],
                w_sorted[dev["src_tile_idx"]].astype(jnp.float32),
                jnp.float32(0.0),
            ).transpose(0, 2, 1)
        # slab kernel: in-kernel gather of the whole u-list into one wide
        # VMEM dot per row (~1.9x the per-pair grid, measured); fall back
        # to the (R, U) pair grid when the double-buffered slab would not
        # leave VMEM headroom (u_max * smax_pad too large)
        u_max = nbr_tab.shape[0]
        nrhs_p = -(-w_tiles.shape[1] // 8) * 8
        slab_bytes = 2 * (8 + nrhs_p) * u_max * dev["src_tiles"].shape[2] * 4
        # u_max <= 64: the slab kernel's (2, U, 2) DMA semaphore scratch
        # lives in the 2 KB sflag space — 64 neighbours is its ceiling.
        # 4 MB slab budget: the segmented kernel body keeps <= ~10.4 MB of
        # (T, 8192) intermediates live, so scratch + stack stays under the
        # 16 MB scoped-VMEM limit.
        if slab_bytes <= (4 << 20) and u_max <= 64:
            (vals,) = _chunk_pair_rows(
                lambda t_args, nbr_c: (p2p_pallas.p2p_leaf_slab(
                    t_args[0], dev["src_tiles"], w_tiles, nbr_c, kparams=kparams),),
                (tpts.astype(jnp.float32),), nbr_tab,
            )
        else:
            (vals,) = _chunk_pair_rows(
                lambda t_args, nbr_c: (p2p_pallas.p2p_leaf_pairs(
                    t_args[0], dev["src_tiles"], w_tiles, nbr_c, kparams=kparams),),
                (tpts.astype(jnp.float32),), nbr_tab,
            )
        vals_b = vals_b + vals.astype(vals_b.dtype)
    elif pallas_df and nbr_tab is not None:
        if w_tiles_pre is not None:
            w_tiles64 = w_tiles_pre.astype(jnp.float64).transpose(0, 2, 1)
        else:
            w_tiles64 = jnp.where(
                dev["src_tile_mask"][..., None],
                w_sorted[dev["src_tile_idx"]],
                0.0,
            ).transpose(0, 2, 1)  # (nsl+1, nrhs, S) f64
        planes, _ = df64_mod.slice_planes(*df64_mod.from_f64(w_tiles64), (2,), _DF64_KEEP)
        w_planes = jnp.transpose(planes, (1, 0, 2, 3))  # (nsl+1, 6, nrhs, S)
        th, tl = df64_mod.from_f64(tpts)
        if upairs is not None:
            # sorted pair-list kernel: one grid step per true (row, leaf)
            # pair — skips the dense grid's sentinel steps (adaptive trees
            # have skewed u-list fill)
            pru, ptu, pfu = upairs
            oh, ol = p2p_pallas.p2p_pairlist_df64(
                th, tl, dev["src_tiles"], dev["src_tiles_lo"],
                w_planes, pru, ptu, pfu, kparams=kparams, nsl=_DF64_KEEP, keep=_DF64_KEEP,
            )
        else:
            oh, ol = _chunk_pair_rows(
                lambda t_args, nbr_c: p2p_pallas.p2p_leaf_pairs_df64(
                    t_args[0], t_args[1], dev["src_tiles"], dev["src_tiles_lo"],
                    w_planes, nbr_c, kparams=kparams, nsl=_DF64_KEEP, keep=_DF64_KEEP),
                (th, tl), nbr_tab,
            )
        # kernel output is (R, nrhs, T): weights-major so nrhs needs no pad
        vals_b = vals_b + df64_mod.to_f64(oh, ol).transpose(0, 2, 1)
    elif pallas_df_g and upairs is not None:
        w_tiles64 = jnp.where(
            dev["src_tile_mask"][..., None],
            w_sorted[dev["src_tile_idx"]],
            0.0,
        ).transpose(0, 2, 1)  # (nsl+1, nrhs, S) f64
        planes, _ = df64_mod.slice_planes(*df64_mod.from_f64(w_tiles64), (2,), _DF64_KEEP)
        w_planes = jnp.transpose(planes, (1, 0, 2, 3))
        th, tl = df64_mod.from_f64(tpts)
        pru, ptu, pfu = upairs
        oh, ol, goh, gol = p2p_pallas.p2p_pairlist_df64_grad(
            th, tl, dev["src_tiles"], dev["src_tiles_lo"],
            w_planes, pru, ptu, pfu, kparams=kparams, nsl=_DF64_KEEP, keep=_DF64_KEEP,
        )
        vals_b = vals_b + df64_mod.to_f64(oh, ol).transpose(0, 2, 1)
        nrhs_g = oh.shape[1]
        g = df64_mod.to_f64(goh, gol).reshape(goh.shape[0], d, nrhs_g, -1)
        grads_b = grads_b + g.transpose(0, 3, 2, 1)  # (R, T, nrhs, d)
    else:
        # P2P over concatenated neighbour-source tables
        for (rows, sidx_tab, smask_tab), (_s_class, c_scan, c_pal) in zip(p2p_groups, p2p_meta):
            vals, grads = _near_field_class(
                kernel, kparams, False, with_grads, ct,
                tpts, tgt_mask, dev["pts_sorted"], w_sorted, rows, sidx_tab, smask_tab,
                c_scan,
            )
            vals_b = vals_b.at[rows].add(vals.astype(vals_b.dtype), mode="drop", unique_indices=True)
            if with_grads:
                grads_b = grads_b.at[rows].add(grads.astype(jnp.float64), mode="drop", unique_indices=True)

    # M2P: on the Pallas route each w-list cell is a source TILE of its p^d
    # Chebyshev nodes with the cell's multipole coefficients as weights —
    # the same slab/pair kernels as P2P, driven by the (U_w, R) cell-tile
    # table. Multipole tiles rebuild per matvec by one contiguous gather
    # (no node-index scatter/gather tables on this path at all).
    if (pallas_nf or pallas_df or pallas_df_g) and wtab is not None:
        # ((U_w, R) tile table, (R,) counts, sorted pair list rows/tiles/first)
        wtab, wcnt, prows, ptiles, pfirst = wtab
        nw = dev["node_tiles"].shape[0] - 1
        s_node = dev["node_tiles"].shape[2]
        nnodes = mult.shape[1]
        nrhs = mult.shape[2]
        mgather = mult[dev["wtile_cells"]].transpose(0, 2, 1)  # (nw, nrhs, p^d)
        if pallas_nf:
            mtiles = jnp.zeros((nw + 1, nrhs, s_node), jnp.float32)
            mtiles = mtiles.at[:nw, :, :nnodes].set(mgather.astype(jnp.float32))
            # count-aware kernel: w-list sizes are highly SKEWED (most target
            # leaves have none, frontier leaves have dozens), so the in-kernel
            # loop that skips sentinel neighbours beats the dense (R, U) grid
            (mvals,) = _chunk_pair_rows(
                lambda t_args, nbr_c: (p2p_pallas.p2p_leaf_fused(
                    t_args[0], dev["node_tiles"], mtiles, nbr_c, t_args[1],
                    kparams=kparams),),
                (tpts.astype(jnp.float32), wcnt), wtab,
            )
            vals_b = vals_b + mvals.astype(vals_b.dtype)
        elif pallas_df_g:
            # df64 gradient M2P: the multipole contraction wants the target
            # derivative of phi(t - node), the same gscale * dd form as P2P
            # (_m2p_args only routes here when the pair triple fits SMEM)
            mt64 = jnp.zeros((nw + 1, nrhs, s_node), jnp.float64)
            mt64 = mt64.at[:nw, :, :nnodes].set(mgather)
            planes, _ = df64_mod.slice_planes(*df64_mod.from_f64(mt64), (2,), kf)
            m_planes = jnp.transpose(planes, (1, 0, 2, 3))
            th, tl = df64_mod.from_f64(tpts)
            oh, ol, goh, gol = p2p_pallas.p2p_pairlist_df64_grad(
                th.astype(jnp.float32), tl.astype(jnp.float32),
                dev["node_tiles"], dev["node_tiles_lo"],
                m_planes, prows, ptiles, pfirst, kparams=kparams, nsl=kf, keep=kf,
            )
            vals_b = vals_b + df64_mod.to_f64(oh, ol).transpose(0, 2, 1)
            g = df64_mod.to_f64(goh, gol).reshape(goh.shape[0], d, nrhs, -1)
            grads_b = grads_b + g.transpose(0, 3, 2, 1)
        else:
            mt64 = jnp.zeros((nw + 1, nrhs, s_node), jnp.float64)
            mt64 = mt64.at[:nw, :, :nnodes].set(mgather)
            planes, _ = df64_mod.slice_planes(*df64_mod.from_f64(mt64), (2,), kf)
            m_planes = jnp.transpose(planes, (1, 0, 2, 3))  # (nw+1, kf, nrhs, s_node)
            th, tl = df64_mod.from_f64(tpts)
            # pair-list kernel when the (rows, tiles, first) prefetch triple
            # fits SMEM: one grid step per TRUE pair instead of the dense
            # (R, U_w) grid — w-list fill is skewed, so sentinel steps would
            # dominate (measured 2x slower than even the f64 scan on the
            # albatite tree at U_w = 128)
            if prows.shape[0] * 12 <= (700 << 10):
                oh, ol = p2p_pallas.p2p_pairlist_df64(
                    th.astype(jnp.float32), tl.astype(jnp.float32),
                    dev["node_tiles"], dev["node_tiles_lo"],
                    m_planes, prows, ptiles, pfirst, kparams=kparams, nsl=kf, keep=kf,
                )
            else:
                oh, ol = _chunk_pair_rows(
                    lambda t_args, nbr_c: p2p_pallas.p2p_leaf_pairs_df64(
                        t_args[0], t_args[1], dev["node_tiles"], dev["node_tiles_lo"],
                        m_planes, nbr_c, kparams=kparams, nsl=kf, keep=kf),
                    (th, tl), wtab,
                )
            vals_b = vals_b + df64_mod.to_f64(oh, ol).transpose(0, 2, 1)
    else:
        # M2P over concatenated w-cell Chebyshev-node tables (gradients /
        # CPU backends / forced-off Pallas)
        mult_flat = mult.reshape(-1, mult.shape[-1])
        for (rows, nidx_tab, nmask_tab), (w_class, c_scan, c_pal) in zip(m2p_groups, m2p_meta):
            # the row kernel keeps a (T, w_class) phi tile in VMEM: big width
            # classes (observed 65536 on the albatite adaptive tree) must take
            # the scan path or the kernel overruns the 16 MB VMEM
            pal_ok = pallas_nf and tpts.shape[1] * w_class <= (1 << 20)
            vals, grads = _near_field_class(
                kernel, kparams, pal_ok, with_grads, ct,
                tpts, tgt_mask,
                (dev["cell_centers"], dev["cell_lengths"], dev["nodes_nd"]),
                mult_flat, rows, nidx_tab, nmask_tab,
                c_pal if pal_ok else c_scan,
            )
            vals_b = vals_b.at[rows].add(vals.astype(vals_b.dtype), mode="drop", unique_indices=True)
            if with_grads:
                grads_b = grads_b.at[rows].add(grads.astype(jnp.float64), mode="drop", unique_indices=True)

    return _unbucket_impl(
        inv_row, inv_slot, vals_b, grads_b, n_pad=n_pad, d=d, with_grads=with_grads
    )



@_partial(jax.jit, static_argnames=("kparams", "d", "p", "n_pad", "p2p_meta", "m2p_meta", "prec", "use_pallas", "ecs"))
def _matvec_fused(
    dev, weights, targets, tgt_idx, tgt_mask, tcells, p2p_groups, m2p_groups,
    nbr_tab, wtab, upairs, inv_row, inv_slot, *, kparams, d, p, n_pad, p2p_meta,
    m2p_meta, prec, use_pallas=False, ecs=1024
):
    """Upward + downward + leaf pass as ONE program (one queue entry over
    the host->device link per solver matvec).

    The weight TILES (bucketed per-leaf layout) are gathered ONCE from the
    user's weight array through the composed sorted->original index and
    shared by P2M, P2L and the near-field kernels — TPU gathers are
    latency-bound (~4 ms per 131k-row gather at config-2 scale), and the
    unconsolidated chain paid three of them per matvec.
    """
    ct = jnp.float32 if prec == "f32" else jnp.float64
    w_tiles_pre = jnp.where(
        dev["src_tile_mask"][..., None],
        weights.astype(ct)[dev["src_tile_orig_idx"]],
        ct(0.0),
    )  # (nsl+1, smax_pad, nrhs)
    mult, w_sorted = _upward(dev, weights, w_tiles_pre, prec=prec)
    local = _downward(dev, mult, w_sorted, w_tiles_pre, kparams=kparams, prec=prec)
    vals, _ = _leaf_all(
        dev, targets, tgt_idx, tgt_mask, tcells, local, mult, w_sorted,
        p2p_groups, m2p_groups, nbr_tab, wtab, upairs, inv_row, inv_slot,
        w_tiles_pre,
        kparams=kparams,
        d=d, p=p, n_pad=n_pad, p2p_meta=p2p_meta, m2p_meta=m2p_meta,
        with_grads=False, prec=prec, use_pallas=use_pallas, ecs=ecs,
    )
    return vals, mult, local, w_sorted


def _p2p_bucketed_xla(kernel, tpts, src_tiles, w_tiles, nbr_blk, ct, ecs):
    """Near field over the bucketed tile layout in plain XLA.

    Row-sharded twin of the Pallas pair kernels for backends/shards where
    Pallas is unavailable (CPU meshes, the multichip dryrun): for each
    target row gather its U neighbour tiles from the (L+1, ...) bucketed
    tables and contract in one einsum. ``tpts`` (Rb, T, d); ``src_tiles``
    (L+1, d, S) or (L+1, d_pad, S); ``w_tiles`` (L+1, nrhs, S) zero-weight
    padded (incl. the sentinel row); ``nbr_blk`` (U, Rb). Returns
    (Rb, T, nrhs) in ``ct``. Per-row reduction order is row-independent, so
    any row partitioning of the same inputs is bitwise identical.
    """
    u, rb = nbr_blk.shape
    t = tpts.shape[1]
    d = tpts.shape[2]
    s = src_tiles.shape[2]
    nbr_rows = nbr_blk.T  # (Rb, U)

    # bound the (c, T, U*S) phi transient like the scan paths do
    budget = (1 << 22) * max(int(ecs), 1) // 1024
    chunk = max(1, budget // max(t * u * s, 1))
    chunk = 1 << (int(chunk).bit_length() - 1)
    chunk = min(chunk, rb)

    coords = src_tiles.astype(ct)
    weights = w_tiles.astype(ct)

    def body(_, sl):
        tp, nbr_c = sl  # (c, T, d), (c, U)
        c = tp.shape[0]
        sp = coords[nbr_c]  # (c, U, dp, S)
        wv = weights[nbr_c]  # (c, U, nrhs, S)
        spc = sp.transpose(0, 2, 1, 3).reshape(c, sp.shape[2], u * s)
        wvc = wv.transpose(0, 2, 1, 3).reshape(c, wv.shape[2], u * s)
        r2 = None
        for i in range(d):
            dd = tp[:, :, i, None].astype(ct) - spc[:, i, None, :]
            r2 = dd * dd if r2 is None else r2 + dd * dd
        k = kernel.phi_r2(r2)  # (c, T, U*S)
        vals = jnp.einsum("cts,crs->ctr", k, wvc)
        return None, vals

    if chunk == rb:
        _, vals = body(None, (tpts, nbr_rows))
        return vals
    nc = rb // chunk
    resh = lambda a: a.reshape((nc, chunk) + a.shape[1:])
    _, vals = jax.lax.scan(body, None, (resh(tpts), resh(nbr_rows)))
    return vals.reshape((rb,) + vals.shape[2:])


@_partial(jax.jit, static_argnames=(
    "mesh", "kparams", "d", "p", "n_pad", "prec", "ecs", "use_pallas"))
def _matvec_fused_sharded(
    mesh, dev, weights, targets, tgt_idx, tgt_mask, tcells, nbr_tab, wtab,
    inv_row, inv_slot, *, kparams, d, p, n_pad, prec, ecs=1024,
    use_pallas=False,
):
    """Upward + downward + ROW-SHARDED leaf pass as one program.

    SURVEY §5.8(b): the per-iteration dominant cost — the near field (P2P +
    M2P) and L2P over the target bucket rows — is partitioned over the
    mesh's "sp" axis with ``jax.shard_map``; each device owns R/n_sp rows
    of the bucketed layout (targets, neighbour-table columns, outputs) and
    reads the replicated leaf/node tile tables. No collective is needed
    inside the leaf pass (row outputs are disjoint); the only cross-device
    traffic is GSPMD's gather for the final un-bucketing. P2M is
    leaf-chunk-sharded with one psum (:func:`_sharded_upward`) and M2L is
    target-slot-sharded when the slots divide the mesh
    (:func:`_sharded_m2l`); only M2M, P2L and L2L run replicated — at
    100k/f32 those are ~2 of 19 ms per matvec (cf. the rayon leaf loops at
    ``bbfmm.rs:1123-1357``; measured fractions + the scaling curve live in
    docs/sharding.md).

    With ``use_pallas`` (TPU backends) the per-device near field runs the
    SAME fused Pallas kernels as the single-chip path — slab/pair-grid P2P
    and the count-aware fused M2P for f32, the dense-grid df64 kernels for
    the f64-grade tier — so multi-chip keeps single-chip kernel speed
    (VERDICT r3 item 6). Otherwise the leaf math uses the bucketed-tile
    XLA formulation (:func:`_p2p_bucketed_xla`). Per-row reduction order
    is row-independent in both forms, so an n-device run is bitwise equal
    to the same program on one device.
    """
    from jax.sharding import PartitionSpec as P

    ct = jnp.float32 if prec == "f32" else jnp.float64
    df = prec.startswith("df64")
    kf = _far_keep_for(prec) if df else _DF64_KEEP
    kernel = make_kernel(kparams, dtype=ct)
    # one consolidated weight-tile gather (see _matvec_fused)
    w_tiles_pre = jnp.where(
        dev["src_tile_mask"][..., None],
        weights.astype(ct)[dev["src_tile_orig_idx"]],
        ct(0.0),
    )
    mult, w_sorted = _sharded_upward(mesh, dev, weights, w_tiles_pre, prec=prec)

    # M2L sharded over target slots when every level's padded slot count
    # divides the mesh; P2L/L2L stay replicated (cheap tail)
    nsp = int(mesh.shape["sp"])
    levels = dev["m2l_levels"]
    can_shard_m2l = bool(levels) and all(
        (src_r.shape[0] * src_r.shape[2]) % nsp == 0
        for (_u, _v, src_r, _s, _c) in levels
    )
    if can_shard_m2l:
        mult_c = mult.astype(ct)
        mult_pad = jnp.concatenate(
            [mult_c, jnp.zeros((1,) + mult_c.shape[1:], ct)], axis=0
        )
        local = _sharded_m2l(mesh, dev, mult_pad, ct=ct, df=df, kf=kf)
        local = _downward_tail(
            dev, local, w_sorted, w_tiles_pre, kparams=kparams, prec=prec
        )
    else:
        local = _downward(
            dev, mult, w_sorted, w_tiles_pre, kparams=kparams, prec=prec
        )

    # near-field weight tiles in kernel layout
    w_tiles = w_tiles_pre.transpose(0, 2, 1)  # (L+1, nrhs, S)
    pallas_nf = use_pallas and prec == "f32"
    pallas_df = use_pallas and df
    w_planes = None
    if pallas_df:
        w_tiles64 = w_tiles_pre.astype(jnp.float64).transpose(0, 2, 1)
        pl, _ = df64_mod.slice_planes(
            *df64_mod.from_f64(w_tiles64), (2,), _DF64_KEEP)
        w_planes = jnp.transpose(pl, (1, 0, 2, 3))  # (L+1, nsl, nrhs, S)

    # multipole tiles for the M2P leg (sentinel row = zero weights)
    m_planes = None
    wcnt = None
    if wtab is not None:
        wtab_dense, wcnt = wtab[0], wtab[1]
        nw = dev["node_tiles"].shape[0] - 1
        s_node = dev["node_tiles"].shape[2]
        nnodes = mult.shape[1]
        nrhs = mult.shape[2]
        mgather = mult[dev["wtile_cells"]].transpose(0, 2, 1).astype(ct)
        mtiles = jnp.zeros((nw + 1, nrhs, s_node), ct)
        mtiles = mtiles.at[:nw, :, :nnodes].set(mgather)
        if pallas_df:
            pl, _ = df64_mod.slice_planes(
                *df64_mod.from_f64(mtiles), (2,), kf)
            m_planes = jnp.transpose(pl, (1, 0, 2, 3))
    else:
        wtab_dense = None
        mtiles = None

    def _pallas_near(tpts_b, tiles, tiles_lo, w32, wpl, nbr_b, cnt_b,
                     keep=_DF64_KEEP):
        """Per-device near-field contraction via the fused Pallas kernels
        (same kernel selection rules as the single-chip `_leaf_all`)."""
        if pallas_nf:
            if cnt_b is not None:
                (o,) = _chunk_pair_rows(
                    lambda t_args, nbr_c: (p2p_pallas.p2p_leaf_fused(
                        t_args[0], tiles, w32, nbr_c, t_args[1],
                        kparams=kparams),),
                    (tpts_b.astype(jnp.float32), cnt_b), nbr_b,
                )
                return o
            u_max = nbr_b.shape[0]
            nrhs_p = -(-w32.shape[1] // 8) * 8
            slab_bytes = 2 * (8 + nrhs_p) * u_max * tiles.shape[2] * 4
            kfn = (p2p_pallas.p2p_leaf_slab
                   if slab_bytes <= (4 << 20) and u_max <= 64
                   else p2p_pallas.p2p_leaf_pairs)
            (o,) = _chunk_pair_rows(
                lambda t_args, nbr_c: (kfn(
                    t_args[0], tiles, w32, nbr_c, kparams=kparams),),
                (tpts_b.astype(jnp.float32),), nbr_b,
            )
            return o
        th, tl = df64_mod.from_f64(tpts_b)
        oh, ol = _chunk_pair_rows(
            lambda t_args, nbr_c: p2p_pallas.p2p_leaf_pairs_df64(
                t_args[0], t_args[1], tiles, tiles_lo, wpl, nbr_c,
                kparams=kparams, nsl=keep, keep=keep),
            (th, tl), nbr_b,
        )
        return df64_mod.to_f64(oh, ol).transpose(0, 2, 1)

    def leaf_block(tgt_idx_b, tgt_mask_b, tcells_b, nbr_b, wtab_b, wcnt_b):
        _, vals_b, _ = _l2p_impl(
            dev, targets, tgt_idx_b, tgt_mask_b, tcells_b, local,
            d=d, p=p, with_grads=False, prec=prec, ecs=ecs,
        )
        tpts_b = targets[tgt_idx_b]
        if pallas_nf or pallas_df:
            near = _pallas_near(
                tpts_b, dev["src_tiles"], dev["src_tiles_lo"],
                w_tiles.astype(jnp.float32) if pallas_nf else None,
                w_planes, nbr_b, None,
            )
        else:
            near = _p2p_bucketed_xla(
                kernel, tpts_b, dev["src_tiles"], w_tiles, nbr_b, ct, ecs
            )
        vals_b = vals_b + near.astype(vals_b.dtype)
        if wtab_b is not None:
            if pallas_nf or pallas_df:
                far = _pallas_near(
                    tpts_b, dev["node_tiles"], dev["node_tiles_lo"],
                    mtiles.astype(jnp.float32) if pallas_nf else None,
                    m_planes, wtab_b, wcnt_b if pallas_nf else None,
                    keep=kf,
                )
            else:
                far = _p2p_bucketed_xla(
                    kernel, tpts_b, dev["node_tiles"], mtiles, wtab_b, ct, ecs
                )
            vals_b = vals_b + far.astype(vals_b.dtype)
        return vals_b

    row_spec = P("sp")
    col_spec = P(None, "sp")  # (U, R) tables shard their ROW axis = columns
    in_specs = (row_spec, row_spec, row_spec, col_spec,
                col_spec if wtab_dense is not None else None,
                row_spec if wtab_dense is not None else None)
    args = (tgt_idx, tgt_mask, tcells, nbr_tab, wtab_dense, wcnt)
    if wtab_dense is None:
        fn = lambda a, b, c, nb: leaf_block(a, b, c, nb, None, None)
        in_specs = in_specs[:4]
        args = args[:4]
    else:
        fn = leaf_block
    vals_b = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=row_spec,
        check_vma=False,
    )(*args)

    vals, _ = _unbucket_impl(
        inv_row, inv_slot, vals_b, jnp.zeros((0,)), n_pad=n_pad, d=d,
        with_grads=False,
    )
    return vals, mult, local, w_sorted


def _sharded_m2l(mesh, dev, mult_pad, *, ct, df, kf=_DF64_KEEP):
    """M2L with each level's target-slot axis partitioned over "sp".

    SURVEY §5.8(b), second half: each device gathers/contracts its own
    1/n_sp of the target slots per level (slots are disjoint across
    devices and across levels), scatters into a device-local ``local``
    block, and one psum over "sp" reassembles the full local-expansion
    table for the (cheap, replicated) P2L/L2L tail. Per-slot math is
    identical to the replicated level loop, so results match it to the
    dot-tiling level and an n-device run matches a 1-device run of the
    same program bitwise.
    """
    from jax.sharding import PartitionSpec as P

    levels = dev["m2l_levels"]
    n_lv = len(levels)
    args = []
    in_specs = []
    has_vt = []
    for u_stack, vt_stack, src_r, src_cells, level_cells in levels:
        nchunk, g, c_chunk = src_r.shape
        # slot-major (c_pad, g) source table; slots shard over "sp"
        src_flat = src_r.transpose(0, 2, 1).reshape(nchunk * c_chunk, g)
        has_vt.append(vt_stack is not None)
        args.extend([
            u_stack,
            vt_stack if vt_stack is not None else jnp.zeros((1,), jnp.float64),
            src_flat,
            src_cells,
            level_cells,
        ])
        in_specs.extend([P(), P(), P("sp"), P(), P("sp")])

    def block_fn(*flat):
        local_part = jnp.zeros(mult_pad.shape, ct)
        for i in range(n_lv):
            u_stack, vt_pack, src_slots, src_cells, cells_b = (
                flat[5 * i : 5 * i + 5])
            u_c = u_stack.astype(ct)
            vt_c = vt_pack.astype(ct) if has_vt[i] else None
            mult_src = mult_pad[src_cells]  # replicated compact level block
            z_bytes = 0
            if vt_c is not None:
                z_bytes = (vt_c.shape[0] * mult_src.shape[0] * vt_c.shape[1]
                           * mult_src.shape[2] * 8)
            if df and vt_c is not None and z_bytes > _zall_budget_bytes():
                # same at-scale fallback as _downward: the replicated
                # z_all table would blow the per-device HBM budget, so
                # compress per slot block instead (2x Vt reads, no table)
                x = mult_src[src_slots.T]  # (g, c_b, q, r)
                z = df64_mod.ozaki_einsum("gkq,gcqr->gckr", vt_c, x,
                                          nsl=kf, keep=kf)
                y = df64_mod.ozaki_einsum("gpk,gckr->cpr", u_c, z,
                                          nsl=kf, keep=kf)
                local_part = local_part.at[cells_b].add(
                    y.astype(ct), mode="drop", unique_indices=True
                )
                continue
            if df and vt_c is not None:
                # rank pre-compression + lane-aligned flattened gather,
                # mirroring _downward: compress every level source through
                # every Vt once (replicated — the block is tiny), gather
                # (k*r)-flattened rank-k rows for this shard's slots
                g_cnt, k_r = vt_c.shape[0], vt_c.shape[1]
                n_src1, _, n_r = mult_src.shape
                z_all = df64_mod.ozaki_einsum(
                    "gkq,sqr->gskr", vt_c, mult_src,
                    nsl=kf, keep=kf)
                z_flat = z_all.reshape(g_cnt * n_src1, k_r * n_r)
                offs = jnp.arange(g_cnt, dtype=jnp.int32)[:, None] * n_src1
                z = z_flat[src_slots.T + offs]  # (g, c_b, k*r)
                z = z.reshape(z.shape[0], z.shape[1], k_r, n_r)
                y = df64_mod.ozaki_einsum(
                    "gpk,gckr->cpr", u_c, z, nsl=kf, keep=kf)
                local_part = local_part.at[cells_b].add(
                    y.astype(ct), mode="drop", unique_indices=True
                )
                continue
            x = mult_src[src_slots.T]  # (g, c_b, q|k, r)
            if df:
                z = x
                y = df64_mod.ozaki_einsum("gpk,gckr->cpr", u_c, z, nsl=kf, keep=kf)
            else:
                z = x if vt_c is None else jnp.einsum("gkq,gcqr->gckr", vt_c, x)
                y = jax.lax.dot_general(
                    u_c, z, dimension_numbers=(((0, 2), (0, 2)), ((), ()))
                ).transpose(1, 0, 2)
            local_part = local_part.at[cells_b].add(
                y.astype(ct), mode="drop", unique_indices=True
            )
        return jax.lax.psum(local_part, "sp")

    return jax.shard_map(
        block_fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(),
        check_vma=False,
    )(*args)



def _unbucket_impl(inv_row, inv_slot, vals_b, grads_b, *, n_pad, d, with_grads):
    # Each target index lives in exactly one (row, slot) of the bucket
    # layout, so un-bucketing is a GATHER through the plan-time inverse
    # tables — the scatter-add formulation cost 17.5 ms per 100k-pt matvec
    # on v5e because its shared pad sentinel forced the non-unique-indices
    # slow path. A single flattened index gathers measurably faster than
    # the 2-axis form (5.9 vs 6.5 ms f64 at 100k), and the f32 tier's
    # bucket values halve the gathered bytes again (4.3 ms); the result is
    # upcast so callers always see f64. Pad targets (n..n_pad) read
    # garbage slots; the host slices them off.
    t = vals_b.shape[1]
    flat = inv_row.astype(jnp.int32) * jnp.int32(t) + inv_slot.astype(jnp.int32)
    vals = vals_b.reshape(-1, vals_b.shape[-1])[flat].astype(jnp.float64)
    if with_grads:
        grads = grads_b.reshape((-1,) + grads_b.shape[2:])[flat]
        return vals, grads.reshape(n_pad, -1)
    return vals, jnp.zeros((0,), jnp.float64)


class FmmTree:
    """Black-box FMM over a fixed set of source points."""

    def __init__(
        self,
        source_points,
        interpolation_order: int,
        kernel_params: KernelParams,
        adaptive_tree: bool = True,
        sparse: bool = False,
        extents=None,
        params: FmmParams | None = None,
    ):
        pts = np.asarray(source_points, np.float64)
        if pts.ndim != 2 or pts.shape[1] not in (1, 2, 3):
            raise ValueError(f"Unsupported source point shape {pts.shape}")
        self._points = pts
        self.p = int(interpolation_order)
        self.d = pts.shape[1]
        self.nnodes = self.p**self.d
        self.kernel_params = kernel_params
        self.kernel: Kernel = make_kernel(kernel_params)  # device closures
        self.kernel_np: Kernel = make_kernel(kernel_params, xp=np)
        self.params = params if params is not None else FmmParams(
            interpolation_order=self.p, epsilon=10.0 ** (-self.p)
        )

        if extents is None:
            extents = np.concatenate([pts.min(axis=0), pts.max(axis=0)])
        center, radius = calculate_tree_center_and_radius(np.asarray(extents, np.float64))
        self._world_center = np.asarray(center, np.float64)

        from ...utils.telemetry import traced_stage

        with traced_stage("fmm_octree_build"):
            self.tree: Octree = tree_mod.build_tree(
                pts,
                center,
                radius,
                self.params.max_points_per_cell,
                store_empty_leaves=not sparse,
                dimensions=self.d,
                adaptive=adaptive_tree,
            )
        with traced_stage("fmm_operators"):
            self._build_operators()
        with traced_stage("fmm_plan"):
            self._build_plan()
        with traced_stage("fmm_device_state"):
            self._build_device_state()

        self.nrhs = 1
        self._multipole = None
        self._local = None
        self._weights_sorted = None
        self._target_cache = {}
        self._hwm = {}
        # capture the active mesh (parallel.use_mesh): when its "sp" axis
        # has >1 device the fused matvec runs the ROW-SHARDED leaf pass
        # (SURVEY §5.8(b)) so per-device near-field work shrinks
        from ...parallel import active_mesh, shard_axis_size

        mesh = active_mesh()
        self._mesh = (
            mesh if mesh is not None and shard_axis_size(mesh, "sp") > 1 else None
        )
        # fixed target-bucket width (leaves with more targets span rows)
        self._tmax = min(128, _next_pow2(max(self.smax, 8)))
        self._use_pallas = _pallas_default()
        # "f64"-grade requests route to the df64 split-precision tier on
        # TPU backends (native f64 dots are 19-pass emulated, ~19x slower
        # and OOM-prone); CPU backends keep true f64. The far-field dial is
        # epsilon-aware (see _f64_grade_prec): expansion-mediated passes run
        # at the keep that bounds their rounding <= 0.01 * epsilon — the
        # truncation error the reference's f64 arithmetic also carries —
        # while the direct near field keeps the full df64 dial. Tests that
        # need plan-exact df64 pass precision="df64" explicitly.
        self._f64_prec = (
            _f64_grade_prec(self.params.epsilon) if self._use_pallas else "f64"
        )

    # ------------------------------------------------------------ operators
    def _build_operators(self):
        t = self.tree
        nodes = cheb.chebyshev_nodes(self.p)
        self.nodes_t, _ = cheb.chebyshev_polynomials(nodes, self.p)
        self.nodes_nd = cheb.nodes_tensor_product(nodes, self.d)
        self.m2m_ops = cheb.m2m_transfer_matrices(self.p, self.d)
        self.perm_tables = m2l.build_permutation_tables(self.p, self.d)
        compression = {
            FmmCompressionType.None_: "None",
            FmmCompressionType.SVD: "SVD",
            FmmCompressionType.ACA: "ACA",
        }[self.params.compression_type]
        self.level_ops = m2l.build_level_operators(
            self.kernel_np, self.p, self.d, t.radius, t.depth, compression,
            self.params.epsilon,
        )

    # ------------------------------------------------------------ plan
    def _build_plan(self):
        t = self.tree
        d = self.d

        # --- source leaf buckets (P2M / P2P / P2L sources) ---------------
        counts = np.diff(t.leaf_offsets)
        smax = int(counts.max()) if counts.size else 1
        nsl = t.leaf_cells.size
        # one extra padding row (index nsl) with empty mask for chunk padding
        src_idx = np.zeros((nsl + 1, smax), np.int64)
        src_mask = np.zeros((nsl + 1, smax), bool)
        if nsl:
            sm = np.arange(smax)[None, :] < counts[:, None]
            src_idx[:nsl][sm] = (t.leaf_offsets[:-1, None] + np.arange(smax)[None, :])[sm]
            src_mask[:nsl] = sm
        self.smax = smax
        self.nsl = nsl
        self._src_counts = np.concatenate([counts, [0]]).astype(np.int64)
        self.src_leaf_cells = t.leaf_cells
        self.src_bucket_idx = src_idx  # into the SORTED point arrays
        self.src_bucket_mask = src_mask
        self.points_sorted = self._points[t.point_order]
        self.cell_to_src_row = np.full(t.num_cells, -1, np.int64)
        self.cell_to_src_row[t.leaf_cells] = np.arange(nsl)

        # --- M2M (has_points only) / L2L (all cells) level groups --------
        # One padded (2^d, cmax) child/parent table PER LEVEL: all octants'
        # transfers run as ONE batched einsum + ONE scatter instead of 2^d
        # small op pairs (32 dispatch-bound micro-ops per pass on a depth-4
        # 3D tree — measured ~3 ms each of pure serialization). Pad slots
        # gather row 0 (harmless) and scatter to the drop index num_cells.
        def octant_groups(cells, scatter_child: bool):
            octants = t.child_octant[cells]
            no = 1 << d
            cnt = np.bincount(octants, minlength=no)
            cmax = max(int(cnt.max()), 1)
            ch_t = np.full((no, cmax), t.num_cells if scatter_child else 0,
                           np.int64)
            pa_t = np.full((no, cmax), 0 if scatter_child else t.num_cells,
                           np.int64)
            for o in range(no):
                sel = cells[octants == o]
                ch_t[o, : sel.size] = sel
                pa_t[o, : sel.size] = t.parent[sel]
            return ch_t, pa_t

        self.m2m_groups = []  # deep -> shallow; gathers ch, scatters pa
        self.l2l_groups = []  # SHALLOW -> deep; gathers pa, scatters ch
        for level in range(t.depth, 0, -1):
            cells = t.cells_at_level(level)
            if cells.size == 0:
                continue
            up_cells = cells[t.has_points[cells]]
            if up_cells.size:
                self.m2m_groups.append(octant_groups(up_cells, scatter_child=False))
        for level in range(1, t.depth + 1):
            cells = t.cells_at_level(level)
            if cells.size:
                self.l2l_groups.append(octant_groups(cells, scatter_child=True))

        # --- M2L: stacked groups per (level, m2l vector id) ----------------
        # TPU redesign note: an earlier variant grouped by *reference* class
        # and applied the Messner symmetry permutations at runtime with
        # take_along_axis — measured at ~285 ms per permutation gather at
        # 100k points (10x the matmuls). Instead the permutations are folded
        # into the operators ON THE HOST: each distinct m2l vector id gets
        # its own (U_v, Vt_v) obtained by permuting the reference
        # compression's rows/columns once at setup, so the downward pass is
        # pure batched matmul + gather/scatter with no runtime permutation.
        # Symmetry still saves setup work (16 ACA compressions instead of
        # 316 in 3D), exactly like the reference's scheme — only the
        # application site moves from run time to plan time.
        pt = self.perm_tables
        vp = t.v_pairs
        if vp.shape[0]:
            vp = vp[t.has_points[vp[:, 1]]]
        lv = t.levels[vp[:, 0]] if vp.shape[0] else np.zeros(0, np.int64)
        self.m2l_levels = []  # (level, U_stack, Vt_stack|None, tgt, src)
        nnodes = self.nnodes
        for level in range(2, t.depth + 1):
            sel = vp[lv == level] if vp.shape[0] else vp
            if sel.shape[0] == 0:
                continue
            vids = sel[:, 2]
            present = np.unique(vids)
            g = len(present)
            # target-slot layout: one column per target cell at this level,
            # one row per vector id; each (vid, tgt) has at most ONE source
            # (a vid names a relative offset), sentinel = num_cells (the
            # zero-multipole pad row) elsewhere. See _chunk_m2l_level.
            level_cells = np.unique(sel[:, 0])
            c_pad = _next_pow2(level_cells.size)
            slot_of = np.full(t.num_cells + 1, -1, np.int64)
            slot_of[level_cells] = np.arange(level_cells.size)
            # pad slots use DISTINCT out-of-range indices (dropped by the
            # scatter) so the level add keeps unique_indices=True honest
            cells_pad = t.num_cells + 1 + np.arange(c_pad)
            cells_pad[: level_cells.size] = level_cells
            # source cells indexed LOCALLY: each level gathers its compact
            # (S + 1, p^d, r) multipole block once (`mult_src`), and the
            # slot table points into it (sentinel = S, the zero pad row).
            # This is what lets the df64 tier compress ALL level sources
            # through every Vt in one plain matmul (`_df64_zall`) and
            # gather only rank-k vectors per slot — the old global table
            # gathered each source's full p^d multipole up to 189 times.
            src_list = np.unique(sel[:, 1])
            n_src = src_list.size
            src_cells = np.concatenate(
                [src_list, [t.num_cells]]).astype(np.int32)
            local_of = np.full(t.num_cells + 1, n_src, np.int64)
            local_of[src_list] = np.arange(n_src)
            src_tab = np.full((g, c_pad), n_src, np.int32)
            vid_row = np.full(int(present.max()) + 1, -1, np.int64)
            vid_row[present] = np.arange(g)
            src_tab[vid_row[vids], slot_of[sel[:, 0]]] = local_of[sel[:, 1]]
            dense = self.level_ops[level][0][1] is None
            rmax = (
                nnodes
                if dense
                else max(self.level_ops[level][r][0].shape[1] for r in range(pt.num_reference))
            )
            u_stack = np.zeros((g, nnodes, rmax))
            vt_stack = None if dense else np.zeros((g, rmax, nnodes))
            for gi, v in enumerate(present):
                u, vt = self.level_ops[level][pt.ref_lookup[v]]
                pid = pt.perm_lookup[v]
                rows = pt.perm_indices[pid]
                inv = pt.inverse_perm[pid]
                if dense:
                    # runtime was y = (K @ x[rows])[inv]; fold both gathers
                    k2 = np.zeros_like(u)
                    k2[:, rows] = u
                    u_stack[gi] = k2[inv]
                else:
                    # y = (U @ (Vt @ x[rows]))[inv]  ->  U_v = U[inv],
                    # Vt_v[:, rows] = Vt
                    u_stack[gi, :, : u.shape[1]] = u[inv]
                    vt2 = np.zeros((vt.shape[0], nnodes))
                    vt2[:, rows] = vt
                    vt_stack[gi, : vt.shape[0]] = vt2
            self.m2l_levels.append(
                (level, u_stack, vt_stack, src_tab, cells_pad, src_cells))

        # --- P2L groups (x list) ------------------------------------------
        xp = t.x_pairs
        if xp.shape[0]:
            rows = self.cell_to_src_row[xp[:, 1]]
            keep = rows >= 0
            self.p2l_tgt = xp[keep, 0]
            self.p2l_src_row = rows[keep]
        else:
            self.p2l_tgt = np.zeros(0, np.int64)
            self.p2l_src_row = np.zeros(0, np.int64)

        # --- u/w pair lookup sorted by target cell ------------------------
        self._u_sorted = t.u_pairs[np.argsort(t.u_pairs[:, 0], kind="stable")]
        self._w_sorted = t.w_pairs[np.argsort(t.w_pairs[:, 0], kind="stable")]

        all_cells = np.arange(t.num_cells)
        self.cell_centers = t.cell_centers(all_cells)
        self.cell_lengths = t.cell_lengths(all_cells)

    # ------------------------------------------------------- device state
    def _build_device_state(self):
        d = self.d

        # All device-side geometry is stored RELATIVE to the tree centre.
        # The kernels are translation-invariant, so f64 results are
        # unchanged, but the f32 inner-matvec path becomes safe for
        # real-world coordinates (UTM eastings/northings ~1e6-1e7 with
        # metre-scale extents would lose ~3 decimal digits in a raw f32
        # cast — measured as a 1.8e-3 solver stagnation floor on the
        # albatite dataset).
        center = self._world_center
        src_bucket_idx = jnp.asarray(self.src_bucket_idx.astype(np.int32))
        src_bucket_mask = jnp.asarray(self.src_bucket_mask)
        pts_sorted = jnp.asarray(self.points_sorted - center)
        cell_centers_c = self.cell_centers - center
        src_centers = cell_centers_c[self.src_leaf_cells]
        src_lengths = self.cell_lengths[self.src_leaf_cells]

        # P2M scan plan: (nchunk, chunk) leaf tables; weights are computed
        # on the fly inside _upward (see there for why). Chunk sized so the
        # per-chunk (chunk, smax, p^d) transient stays ~256 MB in f64.
        nsl = self.nsl
        # 1<<23: see the L2P chunk comment (df64 transient headroom at 3M)
        chunk = max(8, (1 << 23) // max(self.smax * self.nnodes, 1))
        chunk = 1 << (int(chunk).bit_length() - 1)
        nsl_pad = ((nsl + chunk - 1) // chunk) * chunk
        chunk = min(chunk, nsl_pad)
        idx_t = np.zeros((nsl_pad, self.smax), np.int32)
        msk_t = np.zeros((nsl_pad, self.smax), bool)
        ctr_t = np.ones((nsl_pad, d))
        len_t = np.ones(nsl_pad)
        cells_t = np.full(nsl_pad, self.tree.num_cells, np.int32)
        idx_t[:nsl] = self.src_bucket_idx[:nsl]
        msk_t[:nsl] = self.src_bucket_mask[:nsl]
        ctr_t[:nsl] = src_centers
        len_t[:nsl] = src_lengths
        cells_t[:nsl] = self.src_leaf_cells
        resh = lambda a: jnp.asarray(a.reshape((nsl_pad // chunk, chunk) + a.shape[1:]))
        p2m_scan = (resh(idx_t), resh(msk_t), resh(ctr_t), resh(len_t), resh(cells_t))

        p2l = None
        if self.p2l_tgt.size:
            # (nchunk, chunk) x-pair tables for the scanned P2L (see
            # _downward); pad pairs use an out-of-range drop target.
            m = self.p2l_tgt.size
            pc = max(8, (1 << 27) // max(self.nnodes * self.smax, 1))
            pc = 1 << (int(pc).bit_length() - 1)
            m_pad = ((m + pc - 1) // pc) * pc
            pc = min(pc, m_pad)
            tgt_t = np.full(m_pad, self.tree.num_cells + 1, np.int32)
            srcr_t = np.zeros(m_pad, np.int32)
            ctr_t2 = np.ones((m_pad, d))
            len_t2 = np.ones(m_pad)
            tgt_t[:m] = self.p2l_tgt
            srcr_t[:m] = self.p2l_src_row
            ctr_t2[:m] = cell_centers_c[self.p2l_tgt]
            len_t2[:m] = self.cell_lengths[self.p2l_tgt]
            resh2 = lambda a: jnp.asarray(a.reshape((m_pad // pc, pc) + a.shape[1:]))
            p2l = (resh2(tgt_t), resh2(srcr_t), resh2(ctr_t2), resh2(len_t2))

        # Static bucketed source-coordinate tiles (nsl+1, 8, smax_pad) for
        # the gather-free Pallas near field, stored as an (hi, lo) f32 pair
        # of the f64 coordinates (the hi plane doubles as the f32 kernel's
        # input). Tile L = nsl is the zero-weight sentinel neighbour.
        # Padded slots sit at the tree centre — phi is finite there for
        # every registry kernel and the zero weight kills the contribution.
        # The sublane axis pads d -> 8 and the lane axis smax -> a multiple
        # of 128: the slab kernel's manual DMA slices must be tile-aligned.
        smax_pad = -(-self.smax // 128) * 128
        tiles64 = np.zeros((nsl + 1, 8, smax_pad), np.float64)
        tiles64[:nsl, :d, : self.smax] = np.where(
            self.src_bucket_mask[:nsl, None, :],
            (self.points_sorted - center)[self.src_bucket_idx[:nsl]].transpose(0, 2, 1),
            0.0,
        )
        src_tiles = tiles64.astype(np.float32)
        src_tiles_lo = (tiles64 - src_tiles.astype(np.float64)).astype(np.float32)
        self.smax_pad = smax_pad
        # lane-padded bucket index/mask for building the matching weight
        # tiles each matvec (int32: n < 2^31)
        tile_idx = np.zeros((nsl + 1, smax_pad), np.int32)
        tile_mask = np.zeros((nsl + 1, smax_pad), bool)
        tile_idx[:, : self.smax] = self.src_bucket_idx
        tile_mask[:, : self.smax] = self.src_bucket_mask
        # composed sorted->original index: lets the fused matvec gather the
        # weight TILES directly from the user's weight array in ONE gather
        # (TPU gathers are latency-bound: the old w_sorted -> P2M-bucket ->
        # P2P-tile chain paid three of them per matvec)
        tile_orig_idx = self.tree.point_order.astype(np.int32)[tile_idx]

        self._dev = {
            "point_order": jnp.asarray(self.tree.point_order),
            "pts_sorted": pts_sorted,
            "src_bucket_idx": src_bucket_idx,
            "src_bucket_mask": src_bucket_mask,
            "src_tiles": jnp.asarray(src_tiles),
            "src_tiles_lo": jnp.asarray(src_tiles_lo),
            "src_tile_idx": jnp.asarray(tile_idx),
            "src_tile_mask": jnp.asarray(tile_mask),
            "src_tile_orig_idx": jnp.asarray(tile_orig_idx),
            "src_leaf_cells": jnp.asarray(self.src_leaf_cells),
            "p2m_scan": p2m_scan,
            "m2m_ops": jnp.asarray(self.m2m_ops),
            "m2m_groups": [
                (jnp.asarray(ch_t), jnp.asarray(pa_t))
                for ch_t, pa_t in self.m2m_groups
            ],
            "l2l_groups": [
                (jnp.asarray(ch_t), jnp.asarray(pa_t))
                for ch_t, pa_t in self.l2l_groups
            ],
            "m2l_levels": [
                _chunk_m2l_level(u_stack, vt_stack, tgt, src, self.nnodes, sc)
                for (_level, u_stack, vt_stack, tgt, src, sc) in self.m2l_levels
            ],
            "p2l": p2l,
            "nodes_nd": jnp.asarray(self.nodes_nd),
            "cell_centers": jnp.asarray(cell_centers_c),
            "cell_lengths": jnp.asarray(self.cell_lengths),
            # NOTE: the flat per-cell Chebyshev node table ((ncells * p^d,
            # d) f64 — 1.4 GB at 10M points) is NOT stored; the M2P
            # fallback recomputes gathered nodes from (centers, lengths,
            # nodes_nd) inside _near_field_class, bitwise-identically.
        }

        self._dev["nodes_t"] = jnp.asarray(self.nodes_t)

        # --- M2P cell-node tiles for the Pallas near field ----------------
        # Adaptive trees evaluate w-list cells' multipoles directly at the
        # targets (``bbfmm.rs:1254`` M2P); the Pallas route treats each such
        # cell as a source tile of its p^d Chebyshev nodes — same kernels as
        # P2P, with the cell's multipole coefficients as the weights. Only
        # cells that appear in any w-list get a tile; the sentinel row nw is
        # the zero-weight pad. Multipole tiles are rebuilt per matvec from
        # ``mult`` by one small gather (cells are node-contiguous).
        wc = self._w_sorted[:, 1]
        wc = np.unique(wc[self.tree.has_points[wc]]) if wc.size else wc
        nw = int(wc.size)
        self._cell_to_wtile = None
        # The two (nw+1, 8, s_node) f32 tile copies reach 2.1 GB at 10M
        # points; above the budget the M2P reroutes to the scan path with
        # on-the-fly node computation (_near_field_class virtual nodes) —
        # slower per w-cell, zero resident tiles.
        s_node = -(-self.nnodes // 128) * 128
        nt_bytes = (nw + 1) * 8 * s_node * 4 * 2
        self._m2p_tiles_gated = False
        if nw and nt_bytes > int(float(_os.environ.get(
                "FERREUS_RBF_TPU_NODETILE_BYTES", 1.5e9))):
            nw = 0
            self._m2p_tiles_gated = True
        self._m2p_nw = nw
        if nw:
            node_xyz = np.asarray(
                cheb.scale_nodes_to_cell(
                    self.nodes_nd, cell_centers_c[wc], self.cell_lengths[wc]
                )
            )  # (nw, nnodes, d)
            nt64 = np.zeros((nw + 1, 8, s_node))
            nt64[:nw, :d, : self.nnodes] = node_xyz.transpose(0, 2, 1)
            node_tiles = nt64.astype(np.float32)
            self._dev["node_tiles"] = jnp.asarray(node_tiles)
            self._dev["node_tiles_lo"] = jnp.asarray(
                (nt64 - node_tiles.astype(np.float64)).astype(np.float32)
            )
            self._dev["wtile_cells"] = jnp.asarray(wc)
            cmap = np.full(self.tree.num_cells, nw, np.int32)
            cmap[wc] = np.arange(nw, dtype=np.int32)
            self._cell_to_wtile = cmap

    # ---------------------------------------------------------- weights
    @property
    def source_points(self) -> np.ndarray:
        return self._points

    def set_weights(self, weights) -> None:
        """Upward pass (P2M + M2M) over cells with sources."""
        w = jnp.asarray(np.asarray(weights, np.float64).reshape(self._points.shape[0], -1))
        self.nrhs = int(w.shape[1])
        self._multipole, self._weights_sorted = _upward(self._dev, w, prec=self._f64_prec)
        self._local = None

    def set_local_coefficients(self, weights) -> None:
        """Full-tree downward pass; enables ``evaluate_leaves``."""
        if self._multipole is None:
            self.set_weights(weights)
        self._local = _downward(self._dev, self._multipole, self._weights_sorted, kparams=self.kernel_params, prec=self._f64_prec)

    # --------------------------------------------------------- evaluation
    _HWM_FLOORS = {"ntl": 32, "nchunks": 2, "m2p": 128, "n": 1024, "m2p_u": 4,
                   "m2p_pairs": 64, "p2p_pairs": 64}

    def _hwm_pad(self, key: str, n: int) -> int:
        """Monotonic high-water-mark padding: shapes only ever grow (to the
        next power of two, from a per-key floor), so the number of distinct
        compiled programs per tree is O(log max) rather than one per batch
        size."""
        cur = self._hwm.get(key, self._HWM_FLOORS.get(key, 0))
        if n <= cur:
            self._hwm[key] = cur
            return cur
        new = _next_pow2(n)
        self._hwm[key] = new
        return new

    def _bin_targets(self, target_points, reuse_key=None):
        """Host-side target bucketing with high-water-mark shape padding.

        Builds, per target bucket row, the concatenated u-list source-point
        index table and the concatenated w-list Chebyshev-node index table,
        each grouped into power-of-two width classes for the scatter-free
        row-major near-field scans.
        """
        if reuse_key is not None and reuse_key in self._target_cache:
            return self._target_cache[reuse_key]

        targets = np.asarray(target_points, np.float64)
        n = targets.shape[0]
        leaf_of_target = self.tree.points_to_leaves(targets)
        tcells_u, tinv = np.unique(leaf_of_target, return_inverse=True)
        order = np.argsort(tinv, kind="stable")
        counts = np.bincount(tinv, minlength=tcells_u.size)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        nc = tcells_u.size

        def _concat_ranges(starts, lens):
            """Vectorised concat of [arange(s, s+l) for s, l in zip(...)]."""
            total = int(lens.sum())
            if total == 0:
                return np.zeros(0, np.int64)
            off = np.cumsum(lens) - lens
            return (
                np.arange(total, dtype=np.int64)
                - np.repeat(off, lens)
                + np.repeat(starts, lens)
            )

        # fixed bucket width: leaves holding more targets span several rows.
        # All row tables are built with vectorised repeat/cumsum idioms —
        # the per-leaf Python loops this replaces were O(10^4-10^5)
        # iterations per new target set at 1M-3M targets.
        tmax = self._tmax
        nrow_per_cell = -(-counts // tmax)
        ntl = int(nrow_per_cell.sum())
        # per row: its cell (as index into tcells_u), rank within the cell
        rcell = np.repeat(np.arange(nc), nrow_per_cell)
        rrank = _concat_ranges(np.zeros(nc, np.int64), nrow_per_cell)
        rstart = offsets[rcell] + rrank * tmax
        rlen = np.minimum(counts[rcell] - rrank * tmax, tmax)

        ntl_pad = self._hwm_pad("ntl", ntl)
        # int32 indices: the (ntl_pad, T) table is 67 MB in i64 at 3M points
        tgt_idx = np.zeros((ntl_pad, tmax), np.int32)
        tgt_mask = np.zeros((ntl_pad, tmax), bool)
        tcells_pad = np.zeros(ntl_pad, np.int64)
        slot = np.arange(tmax)
        rmask = slot[None, :] < rlen[:, None]  # (ntl, tmax)
        gpos = rstart[:, None] + slot[None, :]
        tgt_idx[:ntl][rmask] = order[gpos[rmask]]
        tgt_mask[:ntl] = rmask
        tcells_pad[:ntl] = tcells_u[rcell]

        # --- per-CELL concatenated source / node index lists --------------
        # One flat array + per-cell offsets each, in tcells_u order.
        t = self.tree
        loff = t.leaf_offsets
        nnodes = self.nnodes
        leaf_counts = np.diff(loff)

        # u list -> neighbour source-leaf rows per cell (flat)
        lo_u = np.searchsorted(self._u_sorted[:, 0], tcells_u)
        hi_u = np.searchsorted(self._u_sorted[:, 0], tcells_u, side="right")
        pair_pos = _concat_ranges(lo_u, hi_u - lo_u)
        pair_cell = np.repeat(np.arange(nc), hi_u - lo_u)
        srows_all = self.cell_to_src_row[self._u_sorted[pair_pos, 1]]
        keep = srows_all >= 0
        flat_srows = srows_all[keep]
        srow_cell = pair_cell[keep]
        nbr_cnt_c = np.bincount(srow_cell, minlength=nc)
        nbr_off_c = np.cumsum(nbr_cnt_c) - nbr_cnt_c

        # concat of each neighbour leaf's point range, grouped by cell
        src_lens = leaf_counts[flat_srows]

        # w list -> Chebyshev-node ids per cell (flat)
        lo_w = np.searchsorted(self._w_sorted[:, 0], tcells_u)
        hi_w = np.searchsorted(self._w_sorted[:, 0], tcells_u, side="right")
        wpos = _concat_ranges(lo_w, hi_w - lo_w)
        wcell = np.repeat(np.arange(nc), hi_w - lo_w)
        wcat_all = self._w_sorted[wpos, 1]
        wkeep = t.has_points[wcat_all]

        def build_groups(flat, width_c, off_c, kind):
            """Group rows by pow2 width class; build padded index tables."""
            widths = width_c[rcell]  # per row (rows of one cell share width)
            groups = []
            meta = []
            for w_class in sorted({int(_next_pow2(max(int(w), 1))) for w in np.unique(widths) if w > 0}):
                sel = np.nonzero(
                    (widths > 0)
                    & (np.maximum(widths, 1) <= w_class)
                    & (np.maximum(widths, 1) > w_class // 2)
                )[0]
                if sel.size == 0:
                    continue
                # Two row-chunk sizes: the XLA-scan path materialises a
                # (chunk, T, w_class) kernel matrix so its chunk is bounded
                # by that; the Pallas path keeps the kernel matrix in VMEM
                # and is bounded only by the gathered (chunk, w_class)
                # coordinate/weight slabs. FmmParams.eval_chunk_size scales
                # both budgets linearly (1024 = reference default = the
                # HBM-safe budgets below).
                ecs = max(int(self.params.eval_chunk_size), 1)
                chunk_scan = max(1, ((1 << 22) * ecs // 1024) // max(tmax * w_class, 1))
                chunk_scan = 1 << (int(chunk_scan).bit_length() - 1)
                chunk_pallas = max(8, ((1 << 23) * ecs // 1024) // max(w_class, 1))
                chunk_pallas = 1 << (int(chunk_pallas).bit_length() - 1)
                g = self._hwm_pad(f"{kind}_rows_{w_class}", sel.size)
                chunk_scan = min(chunk_scan, g)
                chunk_pallas = min(chunk_pallas, g)  # pow2: both divide g
                # pad slots use DISTINCT out-of-range indices (dropped) so
                # the class adds keep unique_indices=True honest
                rsel = (ntl_pad + np.arange(g)).astype(np.int32)
                rsel[: sel.size] = sel
                tab = np.zeros((g, w_class), np.int32)
                mask = np.zeros((g, w_class), bool)
                w_sel = widths[sel]
                cmask = np.arange(w_class)[None, :] < w_sel[:, None]
                pos = off_c[rcell[sel]][:, None] + np.arange(w_class)[None, :]
                tab[: sel.size][cmask] = flat[pos[cmask]]
                mask[: sel.size] = cmask
                groups.append((rsel, tab, mask))
                meta.append((w_class, chunk_scan, chunk_pallas))
            return tuple(groups), tuple(meta)

        # P2P/M2P scan tables are built (and uploaded) LAZILY on the first
        # scan-path call (f32 gradients / CPU backends / forced-off Pallas):
        # the Pallas route never reads them, they are GB-scale at 1M+ points
        # (rows x w_class int32 per width class), and their construction is
        # the dominant host binning cost (~10 s per 500k targets).
        def _scan_builder(binned):
            flat_src = _concat_ranges(loff[flat_srows], src_lens)
            width_src_c = np.zeros(nc, np.int64)
            np.add.at(width_src_c, srow_cell, src_lens)
            srcoff_c = np.cumsum(width_src_c) - width_src_c
            flat_nodes = _concat_ranges(
                wcat_all[wkeep] * nnodes,
                np.full(int(wkeep.sum()), nnodes, np.int64),
            )
            width_node_c = np.bincount(wcell[wkeep], minlength=nc) * nnodes
            nodeoff_c = np.cumsum(width_node_c) - width_node_c
            binned["p2p_groups_host"], binned["p2p_meta"] = build_groups(
                flat_src, width_src_c, srcoff_c, "p2p")
            binned["m2p_groups_host"], binned["m2p_meta"] = build_groups(
                flat_nodes, width_node_c, nodeoff_c, "m2p")

        # Per-row w-list cell-tile table for the Pallas M2P ((U_w, ntl_pad)
        # int32, transposed for SMEM like nbr_tab; sentinel = the zero tile).
        wtab_t = None
        if self._cell_to_wtile is not None:
            wcells_flat = wcat_all[wkeep]
            wcell_grp = wcell[wkeep]
            wcnt_c = np.bincount(wcell_grp, minlength=nc)
            if wcnt_c.size and wcnt_c.max() > 0:
                woff_c = np.cumsum(wcnt_c) - wcnt_c
                uw_max = self._hwm_pad("m2p_u", int(wcnt_c.max()))
                wtab = np.full((ntl_pad, uw_max), self._m2p_nw, np.int32)
                wcnt_row = wcnt_c[rcell]
                wmask = np.arange(uw_max)[None, :] < wcnt_row[:, None]
                wpos2 = woff_c[rcell][:, None] + np.arange(uw_max)[None, :]
                wtab[:ntl][wmask] = self._cell_to_wtile[wcells_flat[wpos2[wmask]]]
                wcnt_pad = np.zeros(ntl_pad, np.int32)
                wcnt_pad[:ntl] = wcnt_row
                # sorted (row, tile) pair list for the df64 M2P kernel: one
                # sentinel pair per row (initialises every output block) +
                # the true pairs; pads ride on the last row's sentinel
                rows_true = np.repeat(np.arange(ntl, dtype=np.int64), wcnt_row)
                pos_true = _concat_ranges(woff_c[rcell], wcnt_row)
                tiles_true = self._cell_to_wtile[wcells_flat[pos_true]]
                prows = np.concatenate(
                    [np.arange(ntl_pad, dtype=np.int64), rows_true]
                )
                ptiles = np.concatenate(
                    [np.full(ntl_pad, self._m2p_nw, np.int64), tiles_true]
                )
                order_p = np.argsort(prows, kind="stable")
                prows = prows[order_p]
                ptiles = ptiles[order_p]
                npairs = self._hwm_pad("m2p_pairs", prows.size)
                pr = np.full(npairs, ntl_pad - 1, np.int32)
                pr[: prows.size] = prows
                pt = np.full(npairs, self._m2p_nw, np.int32)
                pt[: prows.size] = ptiles
                pf = np.zeros(npairs, np.int32)
                pf[0] = 1
                pf[1 : prows.size] = prows[1:] != prows[:-1]
                wtab_t = (
                    jnp.asarray(np.ascontiguousarray(wtab.T)),
                    jnp.asarray(wcnt_pad),
                    jnp.asarray(pr),
                    jnp.asarray(pt),
                    jnp.asarray(pf),
                )

        # Per-row u-list leaf-tile table for the gather-free Pallas P2P:
        # (U, ntl_pad) int32, TRANSPOSED for SMEM (see p2p_leaf_pairs),
        # sentinel nsl = the zero-weight padding tile.
        u_max = max(int(nbr_cnt_c.max()) if nc else 0, 1)
        nbr_tab = np.full((ntl_pad, u_max), self.nsl, np.int32)
        nbr_cnt_row = nbr_cnt_c[rcell]
        nmask = np.arange(u_max)[None, :] < nbr_cnt_row[:, None]
        npos = nbr_off_c[rcell][:, None] + np.arange(u_max)[None, :]
        nbr_tab[:ntl][nmask] = flat_srows[npos[nmask]]

        # Sorted u-list (row, leaf-tile) pair list for the df64 P2P kernel
        # (same scheme as the M2P pair list); built only when the prefetch
        # triple fits SMEM — large trees keep the dense (R, U) grid, whose
        # fill is near-uniform there anyway.
        upairs_t = None
        total_u = int(nbr_cnt_row.sum())
        if (ntl_pad + total_u) * 12 <= (700 << 10):
            rows_u = np.repeat(np.arange(ntl, dtype=np.int64), nbr_cnt_row)
            pos_u = _concat_ranges(nbr_off_c[rcell], nbr_cnt_row)
            tiles_u = flat_srows[pos_u]
            pru = np.concatenate([np.arange(ntl_pad, dtype=np.int64), rows_u])
            ptu = np.concatenate([np.full(ntl_pad, self.nsl, np.int64), tiles_u])
            order_u = np.argsort(pru, kind="stable")
            pru = pru[order_u]
            ptu = ptu[order_u]
            npu = self._hwm_pad("p2p_pairs", pru.size)
            pru_p = np.full(npu, ntl_pad - 1, np.int32)
            pru_p[: pru.size] = pru
            ptu_p = np.full(npu, self.nsl, np.int32)
            ptu_p[: pru.size] = ptu
            pfu = np.zeros(npu, np.int32)
            pfu[0] = 1
            pfu[1 : pru.size] = pru[1:] != pru[:-1]
            upairs_t = (jnp.asarray(pru_p), jnp.asarray(ptu_p), jnp.asarray(pfu))

        n_pad = self._hwm_pad("n", n)
        targets_pad = np.zeros((n_pad, targets.shape[1]))
        targets_pad[:n] = targets - self._world_center  # tree-centred (see _build_device_state)

        # inverse of the (row, slot) bucketing: un-bucketing is a gather
        # (see _unbucket_impl); pad targets read (0, 0) and are sliced off
        inv_row = np.zeros(n_pad, np.int32)
        inv_slot = np.zeros(n_pad, np.int32)
        rr, ss = np.nonzero(tgt_mask)
        inv_row[tgt_idx[rr, ss]] = rr
        inv_slot[tgt_idx[rr, ss]] = ss

        binned = {
            "targets_pad": jnp.asarray(targets_pad),
            "tcells": jnp.asarray(tcells_pad),
            "tgt_idx": jnp.asarray(tgt_idx),
            "tgt_mask": jnp.asarray(tgt_mask),
            "nbr_tab": jnp.asarray(np.ascontiguousarray(nbr_tab.T)),
            "inv_row": jnp.asarray(inv_row),
            "inv_slot": jnp.asarray(inv_slot),
            "_scan_builder": _scan_builder,
            "wtab": wtab_t,
            "upairs": upairs_t,
            "n_pad": n_pad,
            "ntargets": n,
        }
        if reuse_key is not None:
            self._target_cache[reuse_key] = binned
        return binned


    def _leaf_pass(self, targets, binned, with_grads: bool):
        """Fused leaf pass; returns host arrays."""
        n = binned["ntargets"]
        # gradients ride the df64 pair-list kernels on the Pallas route
        # (f64 scan elsewhere); values always take the tier's native prec
        prec = self._f64_prec
        vals, grads = self._leaf_pass_device(binned, with_grads, prec=prec)
        if with_grads:
            return np.asarray(vals)[:n], np.asarray(grads)[:n]
        return np.asarray(vals)[:n], None

    def _check_gradients(self):
        if not self.kernel.supports_gradients:
            raise KernelDoesNotSupportGradientsError()

    # ------------------------------------------------- device-resident path
    def prepare_targets(self, target_points, reuse_key) -> None:
        """Bind a named target set for the device-resident matvec path."""
        self._bin_targets(target_points, reuse_key)


    def _ensure_scan_tables(self, binned):
        """Build the XLA-scan index tables on first scan-path use."""
        if "p2p_groups_host" not in binned:
            binned["_scan_builder"](binned)
        return binned

    def _p2p_args(self, binned, prec: str, with_grads: bool):
        """(p2p_groups, p2p_meta, upairs) for a leaf-pass call.

        The Pallas near-field route covers prec in {"f32", "df64"} without
        gradients; it never touches the scan tables, so they are omitted
        from the program entirely (empty static meta). The sorted u-list
        pair triple rides along only for the df64 tier (which has the
        pair-list kernel). Scan-path callers get the device copies,
        uploaded once per target set.
        """
        if with_grads:
            # gradient tier: the sorted-pair-list df64 kernel only (no dense
            # grid variant) — scan fallback when the triple didn't fit SMEM
            if self._use_pallas and prec.startswith("df64") and binned["upairs"] is not None:
                return (), (), binned["upairs"]
        elif self._use_pallas and (prec == "f32" or prec.startswith("df64")):
            return (), (), (binned["upairs"] if prec.startswith("df64") else None)
        if "p2p_groups_dev" not in binned:
            self._ensure_scan_tables(binned)
            binned["p2p_groups_dev"] = tuple(
                tuple(jnp.asarray(a) for a in grp)
                for grp in binned["p2p_groups_host"]
            )
        return binned["p2p_groups_dev"], binned["p2p_meta"], None

    def _m2p_args(self, binned, prec: str, with_grads: bool):
        """(m2p_groups, m2p_meta, wtab) for a leaf-pass call.

        On the Pallas route the w-list runs through the cell-tile kernels
        driven by ``wtab``; the node-index scan tables are omitted from the
        program entirely. Scan-path callers get the device copies, uploaded
        once per target set, and no wtab.
        """
        wtab = binned["wtab"]
        if with_grads:
            # gradient tier needs the pair-list kernel, whose (rows, tiles,
            # first) prefetch triple must fit SMEM; scan fallback otherwise
            if (
                self._use_pallas and prec.startswith("df64") and wtab is not None
                and int(wtab[2].shape[0]) * 12 <= (700 << 10)
            ):
                return (), (), wtab
        elif (self._use_pallas and (prec == "f32" or prec.startswith("df64"))
              and not self._m2p_tiles_gated):
            # when the node-tile budget gated the tiles off (huge trees),
            # M2P must route through the scan tables below instead of the
            # (absent) tile kernels
            return (), (), wtab
        if "m2p_groups_dev" not in binned:
            self._ensure_scan_tables(binned)
            binned["m2p_groups_dev"] = tuple(
                tuple(jnp.asarray(a) for a in grp)
                for grp in binned["m2p_groups_host"]
            )
        return binned["m2p_groups_dev"], binned["m2p_meta"], None

    def _leaf_pass_device(self, binned, with_grads: bool, prec: str = "f64"):
        p2p_groups, p2p_meta, upairs = self._p2p_args(binned, prec, with_grads)
        m2p_groups, m2p_meta, wtab = self._m2p_args(binned, prec, with_grads)
        return _leaf_all(
            self._dev,
            binned["targets_pad"],
            binned["tgt_idx"],
            binned["tgt_mask"],
            binned["tcells"],
            self._local,
            self._multipole,
            self._weights_sorted,
            p2p_groups,
            m2p_groups,
            binned["nbr_tab"],
            wtab,
            upairs,
            binned["inv_row"],
            binned["inv_slot"],
            kparams=self.kernel_params,
            d=self.d,
            p=self.p,
            n_pad=binned["n_pad"],
            p2p_meta=p2p_meta,
            m2p_meta=m2p_meta,
            with_grads=with_grads,
            prec=prec,
            use_pallas=self._use_pallas,
            ecs=int(self.params.eval_chunk_size),
        )

    def evaluate_device(self, weights_dev, reuse_key, precision: str = "f64"):
        """Full matvec at a prepared target set, device in -> device out.

        One fused dispatch (upward + downward + leaf): no host transfers and
        a single device-queue entry — intended for the solver hot loop where
        weights, values and residuals all live in HBM. ``precision="f32"``
        runs the M2L/P2P/M2P contractions in float32 (~1e-6 relative), the
        inner mode of the mixed-precision refined solver. ``precision="f64"``
        is bit-exact f64 on CPU backends; on TPU backends it routes to the
        df64 split-precision tier (~1e-13 relative — see docs/precision.md).
        Set ``FERREUS_RBF_TPU_PALLAS=0`` to force true f64 end to end.
        """
        binned = self._target_cache[reuse_key]
        if precision == "f64":
            precision = self._f64_prec
        if self._mesh is not None:
            nsp = int(self._mesh.shape["sp"])
            if int(binned["tgt_idx"].shape[0]) % nsp == 0:
                wtab_s = binned["wtab"]
                vals, mult, local, wsorted = _matvec_fused_sharded(
                    self._mesh,
                    self._dev,
                    weights_dev,
                    binned["targets_pad"],
                    binned["tgt_idx"],
                    binned["tgt_mask"],
                    binned["tcells"],
                    binned["nbr_tab"],
                    wtab_s,
                    binned["inv_row"],
                    binned["inv_slot"],
                    kparams=self.kernel_params,
                    d=self.d,
                    p=self.p,
                    n_pad=binned["n_pad"],
                    prec=precision,
                    ecs=int(self.params.eval_chunk_size),
                    use_pallas=self._use_pallas,
                )
                self._multipole, self._local, self._weights_sorted = (
                    mult, local, wsorted,
                )
                return vals[: binned["ntargets"]]

        p2p_groups, p2p_meta, upairs = self._p2p_args(binned, precision, False)
        m2p_groups, m2p_meta, wtab = self._m2p_args(binned, precision, False)
        vals, mult, local, wsorted = _matvec_fused(
            self._dev,
            weights_dev,
            binned["targets_pad"],
            binned["tgt_idx"],
            binned["tgt_mask"],
            binned["tcells"],
            p2p_groups,
            m2p_groups,
            binned["nbr_tab"],
            wtab,
            upairs,
            binned["inv_row"],
            binned["inv_slot"],
            kparams=self.kernel_params,
            d=self.d,
            p=self.p,
            n_pad=binned["n_pad"],
            p2p_meta=p2p_meta,
            m2p_meta=m2p_meta,
            prec=precision,
            use_pallas=self._use_pallas,
            ecs=int(self.params.eval_chunk_size),
        )
        self._multipole, self._local, self._weights_sorted = mult, local, wsorted
        return vals[: binned["ntargets"]]

    def evaluate(self, weights, target_points, reuse_key=None) -> np.ndarray:
        """Downward + leaf pass at ``target_points`` (full mode)."""
        if self._multipole is None:
            self.set_weights(weights)
        binned = self._bin_targets(target_points, reuse_key)
        self._local = _downward(self._dev, self._multipole, self._weights_sorted, kparams=self.kernel_params, prec=self._f64_prec)
        vals, _ = self._leaf_pass(target_points, binned, with_grads=False)
        return vals

    def evaluate_with_gradients(self, weights, target_points, reuse_key=None):
        self._check_gradients()
        if self._multipole is None:
            self.set_weights(weights)
        binned = self._bin_targets(target_points, reuse_key)
        self._local = _downward(self._dev, self._multipole, self._weights_sorted, kparams=self.kernel_params, prec=self._f64_prec)
        return self._leaf_pass(target_points, binned, with_grads=True)

    def evaluate_leaves(self, weights, target_points, reuse_key=None) -> np.ndarray:
        """Leaf pass only (after ``set_local_coefficients``)."""
        if self._local is None:
            raise RuntimeError("call set_local_coefficients before evaluate_leaves")
        binned = self._bin_targets(target_points, reuse_key)
        vals, _ = self._leaf_pass(target_points, binned, with_grads=False)
        return vals

    def evaluate_leaves_with_gradients(self, weights, target_points, reuse_key=None):
        self._check_gradients()
        if self._local is None:
            raise RuntimeError("call set_local_coefficients before evaluate_leaves")
        binned = self._bin_targets(target_points, reuse_key)
        return self._leaf_pass(target_points, binned, with_grads=True)
