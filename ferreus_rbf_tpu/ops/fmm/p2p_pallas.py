"""Pallas TPU kernel for the FMM near-field (P2P / M2P) row pass.

The XLA path (``api._row_chunk_scan``) materialises the (rows, T, S) kernel
matrix in HBM between the elementwise distance/phi computation and the
(T, S) @ (S, nrhs) contraction, and serialises row chunks through
``lax.scan``. This kernel fuses distance -> phi(r^2) -> MXU contraction in
VMEM with one grid program per target-bucket row, so the kernel matrix never
leaves the chip and rows pipeline through the scalar core's DMA prefetcher.

Replaces the hot inner loop of the reference's rayon-parallel direct pass
(``ferreus_bbfmm/src/fmm_evaluator.rs`` near-field) with an on-chip fused
tile — the TPU analogue of its cache-blocked SIMD loop.

Layout choices (TPU tiling is (sublane, lane) = (8, 128) for f32):
- targets stay (R, T, d): T = 64 rows of d lanes — small block either way.
- sources arrive TRANSPOSED as (R, d, S): d sublanes x S lanes, so a
  4096-wide source table costs 8 x S lanes of VMEM instead of S x 128.
- weights arrive TRANSPOSED as (R, nrhs, S) for the same reason; the
  contraction runs as dot_general((T, S), (nrhs, S), contract on S).

Padded sources must carry zero weights (the caller already zeroes them);
phi(r^2) is finite at the pad coordinates for every registry kernel, so the
zero weight kills the contribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _f32_dot(k, w, dn=(((1,), (1,)), ((), ()))):
    """f32-grade contraction via a manual bf16x3 split (3 DEFAULT MXU
    passes: kh*wh + kh*wl + kl*wh).

    Mosaic rejects ``Precision.HIGH`` in-kernel, and HIGHEST (6 bf16
    passes) doubles the MXU time of the near-field dot for nothing the
    f32 tier can use: measured 11.9 -> 10.8 ms on the config-2 slab pass
    at 4e-6 relative error vs HIGHEST — well inside the tier's ~1e-7
    kernel-evaluation noise floor.
    """
    kh = k.astype(jnp.bfloat16).astype(jnp.float32)
    kl = k - kh
    wh = w.astype(jnp.bfloat16).astype(jnp.float32)
    wl = w - wh
    p = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return p(kh, wh) + p(kh, wl) + p(kl, wh)


def _row_kernel(t_ref, s_ref, w_ref, o_ref, *, phi_r2, d):
    # t_ref (1, T, d); s_ref (1, d, S); w_ref (1, nrhs, S); o_ref (1, T, nrhs)
    tcol = t_ref[0, :, 0:1]
    srow = s_ref[0, 0:1, :]
    dd = tcol - srow
    r2 = dd * dd
    for i in range(1, d):
        dd = t_ref[0, :, i : i + 1] - s_ref[0, i : i + 1, :]
        r2 = r2 + dd * dd
    k = phi_r2(r2)  # (T, S)
    o_ref[0] = _f32_dot(k, w_ref[0])


def _pair_kernel(nbr_ref, t_ref, s_ref, w_ref, o_ref, *, phi_r2, d, nu):
    # grid (R, U); t_ref (1, T, d); s_ref (1, d, S); w_ref (1, nrhs, S);
    # o_ref (1, T, nrhs) revisited across the U axis (accumulate).
    u = pl.program_id(1)
    tcol = t_ref[0, :, 0:1]
    srow = s_ref[0, 0:1, :]
    dd = tcol - srow
    r2 = dd * dd
    for i in range(1, d):
        dd = t_ref[0, :, i : i + 1] - s_ref[0, i : i + 1, :]
        r2 = r2 + dd * dd
    k = phi_r2(r2)  # (T, S)
    acc = _f32_dot(k, w_ref[0])

    @pl.when(u == 0)
    def _():
        o_ref[0] = acc

    @pl.when(u != 0)
    def _():
        o_ref[0] = o_ref[0] + acc


@functools.partial(jax.jit, static_argnames=("kparams", "interpret"))
def p2p_leaf_pairs(tgt_tiles, src_coords_t, src_w_t, nbr_tab, *, kparams, interpret=False):
    """Near-field pass tiled by (target row, neighbour leaf) pairs.

    The source data stays in its BUCKETED layout — ``src_coords_t``
    (L+1, d, S) and ``src_w_t`` (L+1, nrhs, S) with padded entries (and the
    sentinel row L) zero-weighted — and the per-pair tiles are DMA'd into
    VMEM directly by the Pallas pipeline via a scalar-prefetched neighbour
    table ``nbr_tab`` (R, U) of source-bucket rows. This removes the
    multi-hundred-MB per-matvec XLA gather + transpose of concatenated
    source slabs that the row-table formulation required (each leaf's
    points were duplicated into ~27 neighbour tables); HBM traffic drops to
    one read of each leaf tile per neighbour relation.

    tgt_tiles (R, T, d) f32; nbr_tab (U, R) int32 — TRANSPOSED so the
    scalar-prefetch table's lane axis is the long row axis (an (R, U) table
    pads U up to 128 lanes and overflows the 1 MB SMEM at a few thousand
    rows). Returns (R, T, nrhs) f32.
    """
    from .. import kernels as _k

    r, t, d = tgt_tiles.shape
    _, dd, s = src_coords_t.shape
    nrhs = src_w_t.shape[1]
    u = nbr_tab.shape[0]
    # Mosaic cannot lower sub-8-lane dot accumulators ("only constant
    # accumulators supported" at nrhs=1 — the solver's single-RHS
    # matvec); pad the RHS axis to a multiple of 8 like the slab kernel.
    nrhs_pad = -(-nrhs // 8) * 8
    if nrhs < nrhs_pad:
        src_w_t = jnp.pad(src_w_t, ((0, 0), (0, nrhs_pad - nrhs), (0, 0)))
    phi = _k.make_kernel(kparams, dtype=jnp.float32).phi_r2
    body = functools.partial(_pair_kernel, phi_r2=phi, d=d, nu=u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, u),
        in_specs=[
            # index-map returns must be uniformly i32 (x64 literals fail to
            # legalize in Mosaic), hence i * 0 instead of 0
            pl.BlockSpec((1, t, d), lambda i, j, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec(
                (1, dd, s), lambda i, j, nbr: (nbr[j, i], i * 0, i * 0), memory_space=_VMEM
            ),
            pl.BlockSpec(
                (1, nrhs_pad, s), lambda i, j, nbr: (nbr[j, i], i * 0, i * 0), memory_space=_VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t, nrhs_pad), lambda i, j, nbr: (i, i * 0, i * 0), memory_space=_VMEM
        ),
    )
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, t, nrhs_pad), jnp.float32),
        interpret=interpret,
    )(
        nbr_tab,
        tgt_tiles.astype(jnp.float32),
        src_coords_t.astype(jnp.float32),
        src_w_t.astype(jnp.float32),
    )
    return out[..., :nrhs] if nrhs_pad != nrhs else out


def _df64_slice_rows(mh, ml, nsl):
    """Slice a (T, S) df64 matrix into nsl bf16-representable planes with
    the scale sigma shared per TARGET ROW (slice-product exactness needs
    sigma constant along the contraction axis)."""
    from .. import df64 as dd

    m = jnp.max(jnp.abs(mh), axis=1, keepdims=True)
    sigma = jnp.exp2(jnp.floor(jnp.log2(jnp.maximum(m, 1e-30))) + 1.0)
    resid = mh
    planes = []
    for k in range(nsl):
        c = sigma * jnp.float32(1.5 * (1 << 15))
        s = (resid + c) - c
        resid = resid - s
        if k == 2:
            resid, ml = dd.two_sum(resid, ml)
        planes.append(s)  # bf16-representable by construction
        sigma = sigma * jnp.float32(1.0 / 256.0)
    return planes


def _df64_seg_dots(planes, wp, nsl, keep):
    """Exact split dots against the prefetched w planes, diagonal-wise df64
    combine: returns the (nrhs, T) df64 (hi, lo) partial.

    Both operands hold bf16-representable values, so an f32 dot at
    DEFAULT precision (one bf16 MXU pass, f32 accumulation) is exact
    for contractions of <= 256 terms (16-bit products + 8 carry bits =
    the 24-bit f32 significand). Leaves can exceed 256 points (uniform
    trees cap depth, adaptive trees settle oversized cells at
    MAXIMUM_LEVEL, max_points_per_cell is user-settable), so the S axis
    is chunked to <= 256 and segment partials accumulate in df64 — same
    scheme as ``df64.ozaki_dot``. The dot runs WEIGHTS-major, output
    (nrhs, T): with T on the lane axis Mosaic lowers any nrhs (an
    (T, nrhs=1) output hit "only constant accumulators supported"), and
    the caller needs no RHS padding — 8x less w-plane memory for
    single-RHS solves.

    MXU issue shape (the round-4 throughput fix): instead of one small
    (nrhs, lc) x (T, lc) dot per PLANE PAIR (21 issues at keep=6 — small
    dots are issue-latency-bound, the same effect the f32 slab kernel
    measured), the w planes j = 0..keep-i-1 are stacked along the dot's
    M axis, so ONE (keep-i)*nrhs-row dot per phi plane i computes every
    needed product for that plane: keep issues per segment instead of
    keep*(keep+1)/2, with ~3.5x the MXU row utilisation. Products on
    diagonal k = i+j share the scale 2^(-8k) * leading, so summing
    WITHIN a diagonal in f32 rounds at ~2^(-24-8k) of the result
    (harmless; k = 0 has a single pair and stays exact); only the
    ``keep`` across-diagonal adds per segment run in df64.
    """
    from .. import df64 as dd

    s_len = planes[0].shape[1]
    nrhs = wp.shape[1]
    nseg = -(-s_len // 256)
    acc_h = None
    acc_l = None
    for seg in range(nseg):
        lo_s = seg * 256
        hi_s = min(lo_s + 256, s_len)
        lc = hi_s - lo_s
        prods = []
        for i in range(min(keep, nsl)):
            nj = min(keep - i, nsl)
            wblk = (
                wp[:nj, :, lo_s:hi_s]
                .astype(jnp.float32)
                .reshape(nj * nrhs, lc)
            )
            prods.append(
                jax.lax.dot_general(
                    wblk,
                    planes[i][:, lo_s:hi_s],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (nj * nrhs, T): row block j is w_plane[j] x phi_plane[i]
            )
        for k in range(keep):
            diag = None
            for i in range(min(k + 1, nsl)):
                j = k - i
                if j >= nsl:
                    continue
                part = prods[i][j * nrhs : (j + 1) * nrhs]
                diag = part if diag is None else diag + part
            if diag is None:
                continue
            if acc_h is None:
                acc_h, acc_l = diag, jnp.zeros_like(diag)
            else:
                acc_h, acc_l = dd.add(acc_h, acc_l, diag, jnp.zeros_like(diag))
    return acc_h, acc_l


def _df64_r2(th, tl, sh, sl, d, keep_diffs=False):
    """(T, S) squared distance in df64 from (T, d) hi/lo targets and (d, S)
    hi/lo sources (ARRAYS, not refs — the slab kernel slices scratch);
    optionally also the per-dim df64 displacement matrices (t - s) the
    gradient contraction needs.

    EFT budget (the VPU dominates this kernel, so every chain is trimmed):
    the displacement stays UNNORMALISED (|dl| <= ~2^-23 |dh| instead of
    <= ulp/2 — sqr only loses the ~2^-46 |dh|^2 cross term, below the
    slice-dot floor), the per-dim squares sum through a two_sum cascade on
    the hi words with the lo words accumulated in plain f32, and one
    quick_two_sum at the end renormalises for phi. ~40% fewer VPU ops than
    per-dim dd.add chains.
    """
    from .. import df64 as dd

    diffs = []
    qhs, qls = [], []
    for i in range(d):
        dh, e = dd.two_sum(th[:, i : i + 1], -sh[i : i + 1, :])
        dl = e + (tl[:, i : i + 1] - sl[i : i + 1, :])
        if keep_diffs:
            diffs.append((dh, dl))
        qh, ql = dd.sqr_prod(dh)
        qhs.append(qh)
        qls.append(ql + 2.0 * (dh * dl))
    r2h, r2l = qhs[0], qls[0]
    for i in range(1, d):
        r2h, e = dd.two_sum(r2h, qhs[i])
        r2l = r2l + (e + qls[i])
    r2h, r2l = dd.quick_two_sum(r2h, r2l)
    return r2h, r2l, diffs


def _df64_tile_acc(th, tl, sh, sl, wp, *, phi_df64, d, nsl, keep):
    """Shared df64 near-field tile math: df64 distances/phi on the VPU +
    exact bf16 split-dot contraction on the MXU (see ops/df64.py).
    Returns the (nrhs, T) df64 (hi, lo) partial for one (row, tile) pair.
    All operands are arrays: th/tl (T, d), sh/sl (d, S), wp (nsl, nrhs, S)."""
    r2h, r2l, _ = _df64_r2(th, tl, sh, sl, d)
    ph, plo = phi_df64(r2h, r2l)  # (T, S) df64
    planes = _df64_slice_rows(ph, plo, nsl)
    return _df64_seg_dots(planes, wp, nsl, keep)


def _df64_tile_acc_grad(th, tl, sh, sl, wp,
                        *, phi_df64, gscale_df64, d, nsl, keep):
    """Values AND gradients for one (row, tile) pair in df64.

    grad phi at displacement dd = t - s is ``gscale(r2) * dd`` per dim, so
    the gradient runs d extra slice+dot pipelines over G_i = gscale * dd_i.
    Returns ((nrhs, T) hi, lo, (d*nrhs, T) hi, lo) with dims stacked along
    the sublane axis (dim-major: row = dim * nrhs + rhs).
    """
    from .. import df64 as dd

    r2h, r2l, diffs = _df64_r2(th, tl, sh, sl, d, keep_diffs=True)
    ph, plo = phi_df64(r2h, r2l)
    vh, vl = _df64_seg_dots(_df64_slice_rows(ph, plo, nsl), wp, nsl, keep)
    gh, gl = gscale_df64(r2h, r2l)
    g_hs, g_ls = [], []
    for dh, dl in diffs:
        mh, ml = dd.mul(gh, gl, dh, dl)
        ah, al = _df64_seg_dots(_df64_slice_rows(mh, ml, nsl), wp, nsl, keep)
        g_hs.append(ah)
        g_ls.append(al)
    return vh, vl, jnp.concatenate(g_hs, axis=0), jnp.concatenate(g_ls, axis=0)


def _pair_kernel_df64(nbr_ref, th_ref, tl_ref, sh_ref, sl_ref, wp_ref,
                      oh_ref, ol_ref, *, phi_df64, d, nsl, keep):
    """f64-grade near-field tile over the dense (R, U) pair grid.

    Out blocks (1, T, nrhs) x2 revisited across U with df64 accumulation.
    w planes arrive pre-sliced per leaf tile (sigma shared along the source
    axis, as slice-product exactness requires)."""
    from .. import df64 as dd

    u = pl.program_id(1)
    acc_h, acc_l = _df64_tile_acc(
        th_ref[0], tl_ref[0], sh_ref[0], sl_ref[0], wp_ref[0],
        phi_df64=phi_df64, d=d, nsl=nsl, keep=keep,
    )

    @pl.when(u == 0)
    def _():
        oh_ref[0] = acc_h
        ol_ref[0] = acc_l

    @pl.when(u != 0)
    def _():
        nh, nl = dd.add(oh_ref[0], ol_ref[0], acc_h, acc_l)
        oh_ref[0] = nh
        ol_ref[0] = nl


def _pairlist_kernel_df64(rows_ref, tiles_ref, first_ref, th_ref, tl_ref,
                          sh_ref, sl_ref, wp_ref, oh_ref, ol_ref,
                          *, phi_df64, d, nsl, keep):
    """f64-grade near field over a SORTED (row, tile) pair list.

    One grid step per true pair (plus one sentinel pair per row so every
    output block is initialised); out blocks follow ``rows`` — consecutive
    same-row steps accumulate in VMEM, ``first`` flags the row's first pair.
    Beats the dense (R, U) grid when pair fill is skewed (w-lists: most
    target leaves have none, frontier leaves have dozens)."""
    from .. import df64 as dd

    i = pl.program_id(0)
    acc_h, acc_l = _df64_tile_acc(
        th_ref[0], tl_ref[0], sh_ref[0], sl_ref[0], wp_ref[0],
        phi_df64=phi_df64, d=d, nsl=nsl, keep=keep,
    )
    first = first_ref[i]

    @pl.when(first != 0)
    def _():
        oh_ref[0] = acc_h
        ol_ref[0] = acc_l

    @pl.when(first == 0)
    def _():
        nh, nl = dd.add(oh_ref[0], ol_ref[0], acc_h, acc_l)
        oh_ref[0] = nh
        ol_ref[0] = nl


def _fused_rows_kernel(nbr_ref, cnt_ref, t_ref, s_hbm, w_hbm, o_ref,
                       s_scr, w_scr, sems, *, phi_r2, d, u_max):
    """One grid step = one target row; the neighbour loop runs IN-kernel
    with double-buffered manual DMA from the HBM-resident leaf tables.

    Versus the (R, U) grid pair kernel this removes the per-step grid
    overhead (~0.19 us x 27 steps/row) and skips sentinel neighbours
    entirely (the per-row true count arrives via scalar prefetch), at the
    price of hand-rolled DMA. Layouts as in :func:`p2p_leaf_pairs`.
    """
    i = pl.program_id(0)
    nu = cnt_ref[i]
    nrhs = o_ref.shape[2]
    one = jnp.int32(1)
    zero = jnp.int32(0)

    def start(slot, u):
        # index literals must be i32: under x64 a bare 0/1 lowers to i64
        # and Mosaic's memref_slice rejects it
        l = nbr_ref[u, i]
        pltpu.make_async_copy(s_hbm.at[l], s_scr.at[slot], sems.at[slot, zero]).start()
        pltpu.make_async_copy(w_hbm.at[l], w_scr.at[slot], sems.at[slot, one]).start()

    @pl.when(nu > 0)
    def _():
        start(jnp.int32(0), jnp.int32(0))

    def body(u, carry):
        # the buffer slot is carried and flipped explicitly: a `u % 2` on
        # the induction variable trips a promotion recursion in the kernel
        # tracer under x64
        acc, slot = carry
        nxt = one - slot

        @pl.when(u + one < nu)
        def _():
            start(nxt, u + one)

        l = nbr_ref[u, i]
        pltpu.make_async_copy(s_hbm.at[l], s_scr.at[slot], sems.at[slot, zero]).wait()
        pltpu.make_async_copy(w_hbm.at[l], w_scr.at[slot], sems.at[slot, one]).wait()
        tcol = t_ref[0, :, 0:1]
        srow = s_scr[slot, 0:1, :]
        dd = tcol - srow
        r2 = dd * dd
        for k in range(1, d):
            dd = t_ref[0, :, k : k + 1] - s_scr[slot, k : k + 1, :]
            r2 = r2 + dd * dd
        kmat = phi_r2(r2)
        acc = acc + _f32_dot(kmat, w_scr[slot])
        return acc, nxt

    acc, _ = jax.lax.fori_loop(
        0, nu, body,
        (jnp.zeros((t_ref.shape[1], nrhs), jnp.float32), jnp.int32(0)),
    )
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("kparams", "interpret"))
def p2p_leaf_fused(tgt_tiles, src_coords_t, src_w_t, nbr_tab, nbr_cnt,
                   *, kparams, interpret=False):
    """Near-field pass, one program per target row, in-kernel DMA loop.

    tgt_tiles (R, T, d) f32; src_coords_t (L+1, d, S); src_w_t
    (L+1, nrhs, S) zero-weight padded; nbr_tab (U, R) int32 (transposed,
    see :func:`p2p_leaf_pairs`); nbr_cnt (R,) int32 true neighbour counts.
    Returns (R, T, nrhs) f32.

    Manual DMA slices must be tile-aligned (Mosaic rejects a (1, 3, S)
    slice of an (L, 3, S) f32 memref: sublane dim not a multiple of the
    (8, 128) tiling), so the sublane axes are padded here — d up to 8 and
    nrhs up to a multiple of 8; the pad rows cost nothing (zero weights,
    finite phi) and the output is sliced back.
    """
    from .. import kernels as _k

    r, t, d = tgt_tiles.shape
    _, dd_, s = src_coords_t.shape
    nrhs = src_w_t.shape[1]
    u = nbr_tab.shape[0]
    d_pad = 8
    nrhs_pad = -(-nrhs // 8) * 8
    if dd_ < d_pad:
        src_coords_t = jnp.pad(src_coords_t, ((0, 0), (0, d_pad - dd_), (0, 0)))
    if nrhs < nrhs_pad:
        src_w_t = jnp.pad(src_w_t, ((0, 0), (0, nrhs_pad - nrhs), (0, 0)))
    phi = _k.make_kernel(kparams, dtype=jnp.float32).phi_r2
    body = functools.partial(_fused_rows_kernel, phi_r2=phi, d=d, u_max=u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, nbr, cnt: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # leaf coords stay off-pipeline
            pl.BlockSpec(memory_space=pl.ANY),  # leaf weights stay off-pipeline
        ],
        out_specs=pl.BlockSpec(
            (1, t, nrhs_pad), lambda i, nbr, cnt: (i, i * 0, i * 0), memory_space=_VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, s), jnp.float32),
            pltpu.VMEM((2, nrhs_pad, s), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, t, nrhs_pad), jnp.float32),
        interpret=interpret,
    )(
        nbr_tab,
        nbr_cnt,
        tgt_tiles.astype(jnp.float32),
        src_coords_t.astype(jnp.float32),
        src_w_t.astype(jnp.float32),
    )
    return out[..., :nrhs] if nrhs_pad != nrhs else out


def _slab_rows_kernel(nbr_ref, t_ref, s_hbm, w_hbm, o_ref, s_scr, w_scr,
                      sems, *, phi_r2, d, u_max, s_leaf):
    """One grid step = one target row: the row's whole u-list is DMA-
    gathered into a contiguous (d, U*S) VMEM slab (double-buffered across
    grid steps), then ONE wide phi + dot pair runs per row.

    This recovers the pre-gathered row kernel's throughput (measured ~12 ms
    vs ~22.5 ms for per-(row, leaf) dots at config-2 scale — small MXU dots
    are issue-latency-bound) without the multi-hundred-MB XLA gather the
    row tables needed: the gather happens on-chip, overlapped with compute.
    Sentinel neighbours DMA the zero-weight pad tile — no count needed.
    """
    i = pl.program_id(0)
    r_tot = pl.num_programs(0)
    one = jnp.int32(1)
    zero = jnp.int32(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nxt = one - slot
    s_leaf_c = jnp.int32(s_leaf)

    def dma_pair(row, sl, u):
        l = nbr_ref[u, row]
        off = jax.lax.mul(u, s_leaf_c)
        return (
            pltpu.make_async_copy(
                s_hbm.at[l], s_scr.at[sl, :, pl.ds(off, s_leaf)],
                sems.at[sl, u, zero],
            ),
            pltpu.make_async_copy(
                w_hbm.at[l], w_scr.at[sl, :, pl.ds(off, s_leaf)],
                sems.at[sl, u, one],
            ),
        )

    def issue(row, sl):
        # carry an i32 counter instead of the fori induction var: under x64
        # the induction var is i64 and any conversion/arithmetic on it trips
        # a promotion recursion inside the kernel tracer
        def one_u(_i, u32):
            a, b = dma_pair(row, sl, u32)
            a.start()
            b.start()
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
        a.wait()
        b.wait()
        return u32 + one

    jax.lax.fori_loop(0, u_max, waitall, zero)

    # Segment the (T, U*S) contraction: the phi chain keeps ~2-3 (T, W)
    # f32 intermediates live, so an unsegmented slab blows the 16 MB
    # scoped-VMEM stack once U*S crosses ~10k lanes (seen at u_max=58 on
    # adaptive 1M-point trees). 8192-lane segments bound the stack at
    # ~10 MB while leaving the config-2 slab (27*256 = 6912) in ONE
    # segment — the single wide dot that won its throughput.
    total = u_max * s_leaf
    seg_w = min(max(1, 8192 // s_leaf) * s_leaf, total)
    acc = None
    for lo in range(0, total, seg_w):
        hi = min(lo + seg_w, total)
        tcol = t_ref[0, :, 0:1]
        dd = tcol - s_scr[slot, 0:1, lo:hi]
        r2 = dd * dd
        for k in range(1, d):
            dd = t_ref[0, :, k : k + 1] - s_scr[slot, k : k + 1, lo:hi]
            r2 = r2 + dd * dd
        kmat = phi_r2(r2)  # (T, W)
        part = _f32_dot(kmat, w_scr[slot, :, lo:hi])
        acc = part if acc is None else acc + part
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("kparams", "interpret"))
def p2p_leaf_slab(tgt_tiles, src_coords_t, src_w_t, nbr_tab, *, kparams,
                  interpret=False):
    """Near-field pass: in-kernel slab gather + one wide dot per row.

    tgt_tiles (R, T, d) f32; src_coords_t (L+1, d_pad, S) with d_pad a
    multiple of 8 and S a multiple of 128 (DMA slices must be tile-
    aligned); src_w_t (L+1, nrhs, S) zero-weight padded incl. the sentinel
    row L; nbr_tab (U, R) int32 sentinel-padded. Returns (R, T, nrhs) f32.
    """
    from .. import kernels as _k

    r, t, d = tgt_tiles.shape
    _, d_pad, s = src_coords_t.shape
    nrhs = src_w_t.shape[1]
    u = nbr_tab.shape[0]
    if d_pad % 8 or s % 128:
        raise ValueError(f"slab kernel needs aligned tiles, got ({d_pad}, {s})")
    nrhs_pad = -(-nrhs // 8) * 8
    if nrhs < nrhs_pad:
        src_w_t = jnp.pad(src_w_t, ((0, 0), (0, nrhs_pad - nrhs), (0, 0)))
    phi = _k.make_kernel(kparams, dtype=jnp.float32).phi_r2
    body = functools.partial(
        _slab_rows_kernel, phi_r2=phi, d=d, u_max=u, s_leaf=s
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, t, nrhs_pad), lambda i, nbr: (i, i * 0, i * 0), memory_space=_VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, u * s), jnp.float32),
            pltpu.VMEM((2, nrhs_pad, u * s), jnp.float32),
            pltpu.SemaphoreType.DMA((2, u, 2)),
        ],
    )
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, t, nrhs_pad), jnp.float32),
        interpret=interpret,
    )(
        nbr_tab,
        tgt_tiles.astype(jnp.float32),
        src_coords_t.astype(jnp.float32),
        src_w_t.astype(jnp.float32),
    )
    return out[..., :nrhs] if nrhs_pad != nrhs else out


@functools.partial(jax.jit, static_argnames=("kparams", "nsl", "keep", "interpret"))
def p2p_leaf_pairs_df64(tgt_hi, tgt_lo, src_hi, src_lo, w_planes, nbr_tab,
                        *, kparams, nsl=6, keep=6, interpret=False):
    """f64-grade bucketed near field (layout as :func:`p2p_leaf_pairs`).

    tgt_hi/lo (R, T, d) f32; src_hi/lo (L+1, d, S) f32; w_planes
    (L+1, nsl, nrhs, S) bf16 pre-sliced per tile (``df64.slice_planes``
    along S, sentinel tile zero); nbr_tab (U, R) int32. Returns the
    result TRANSPOSED as (R, nrhs, T) hi/lo f32 pairs — combine with
    ``df64.to_f64`` and swap the last axes. Replaces the reference's f64 near field
    (``bbfmm.rs:1162``) at VPU/MXU rates instead of XLA's 19-pass f64
    dot emulation.
    """
    from .. import kernels as _k

    r, t, d = tgt_hi.shape
    _, dd_, s = src_hi.shape
    nrhs = w_planes.shape[2]
    u = nbr_tab.shape[0]
    phi = _k.make_phi_df64(kparams)
    body = functools.partial(_pair_kernel_df64, phi_df64=phi, d=d, nsl=nsl, keep=keep)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r, u),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, j, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec((1, t, d), lambda i, j, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec((1, dd_, s), lambda i, j, nbr: (nbr[j, i], i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec((1, dd_, s), lambda i, j, nbr: (nbr[j, i], i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec((1, nsl, nrhs, s), lambda i, j, nbr: (nbr[j, i], i * 0, i * 0, i * 0), memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nrhs, t), lambda i, j, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec((1, nrhs, t), lambda i, j, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
        ),
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
        ),
        interpret=interpret,
    )(nbr_tab, tgt_hi, tgt_lo, src_hi, src_lo, w_planes)


@functools.partial(jax.jit, static_argnames=("kparams", "nsl", "keep", "interpret"))
def p2p_pairlist_df64(tgt_hi, tgt_lo, src_hi, src_lo, w_planes, pair_rows,
                      pair_tiles, pair_first, *, kparams, nsl=6, keep=6,
                      interpret=False):
    """f64-grade near field driven by a sorted (row, tile) pair list.

    tgt_hi/lo (R, T, d) f32; src_hi/lo (L+1, d_pad, S) f32; w_planes
    (L+1, nsl, nrhs, S) bf16-representable pre-sliced tiles; pair_rows /
    pair_tiles / pair_first (P,) int32 — SORTED by row, every row 0..R-1
    present at least once (sentinel tile L = zero weights), ``pair_first``
    nonzero on each row's first pair. Returns (R, nrhs, T) hi/lo f32 pairs
    (combine with ``df64.to_f64`` and swap the last axes).
    """
    from .. import kernels as _k

    r, t, d = tgt_hi.shape
    _, dd_, s = src_hi.shape
    nrhs = w_planes.shape[2]
    np_ = pair_rows.shape[0]
    phi = _k.make_phi_df64(kparams)
    body = functools.partial(_pairlist_kernel_df64, phi_df64=phi, d=d, nsl=nsl, keep=keep)
    z = lambda i: i * 0  # index-map literals must stay i32 (see above)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, t, d), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, dd_, s), lambda i, rw, tl, fr: (tl[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, dd_, s), lambda i, rw, tl, fr: (tl[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, nsl, nrhs, s), lambda i, rw, tl, fr: (tl[i], z(i), z(i), z(i)), memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nrhs, t), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, nrhs, t), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
        ),
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
        ),
        interpret=interpret,
    )(pair_rows, pair_tiles, pair_first, tgt_hi, tgt_lo, src_hi, src_lo, w_planes)


def _pairlist_kernel_df64_grad(rows_ref, tiles_ref, first_ref, th_ref, tl_ref,
                               sh_ref, sl_ref, wp_ref, oh_ref, ol_ref,
                               gh_ref, gl_ref, *, phi_df64, gscale_df64, d,
                               nsl, keep):
    """f64-grade near field WITH GRADIENTS over a sorted (row, tile) pair
    list (layout as :func:`_pairlist_kernel_df64`; extra out blocks
    (1, d*nrhs, T) x2 accumulate the per-dim gradient partials)."""
    from .. import df64 as dd

    i = pl.program_id(0)
    vh, vl, gah, gal = _df64_tile_acc_grad(
        th_ref[0], tl_ref[0], sh_ref[0], sl_ref[0], wp_ref[0],
        phi_df64=phi_df64, gscale_df64=gscale_df64, d=d, nsl=nsl, keep=keep,
    )
    first = first_ref[i]

    @pl.when(first != 0)
    def _():
        oh_ref[0] = vh
        ol_ref[0] = vl
        gh_ref[0] = gah
        gl_ref[0] = gal

    @pl.when(first == 0)
    def _():
        nh, nl = dd.add(oh_ref[0], ol_ref[0], vh, vl)
        oh_ref[0] = nh
        ol_ref[0] = nl
        ngh, ngl = dd.add(gh_ref[0], gl_ref[0], gah, gal)
        gh_ref[0] = ngh
        gl_ref[0] = ngl


@functools.partial(jax.jit, static_argnames=("kparams", "nsl", "keep", "interpret"))
def p2p_pairlist_df64_grad(tgt_hi, tgt_lo, src_hi, src_lo, w_planes,
                           pair_rows, pair_tiles, pair_first, *, kparams,
                           nsl=6, keep=6, interpret=False):
    """f64-grade near field with gradients, sorted (row, tile) pair list.

    Operand layout as :func:`p2p_pairlist_df64`. Returns
    ``(vals_hi, vals_lo, grads_hi, grads_lo)`` with vals (R, nrhs, T) and
    grads (R, d*nrhs, T) dim-major (row = dim * nrhs + rhs) — combine with
    ``df64.to_f64``. The TPU tier for the reference's native-f64 gradient
    evaluation (``bbfmm.rs:434-516``, ``rbf_kernels.rs:265-300``): RMT seed
    projection and user gradient calls run here instead of the 19-pass
    emulated-f64 XLA scan.
    """
    from .. import kernels as _k

    r, t, d = tgt_hi.shape
    _, dd_, s = src_hi.shape
    nrhs = w_planes.shape[2]
    np_ = pair_rows.shape[0]
    phi = _k.make_phi_df64(kparams)
    gsc = _k.make_gscale_df64(kparams)
    body = functools.partial(_pairlist_kernel_df64_grad, phi_df64=phi,
                             gscale_df64=gsc, d=d, nsl=nsl, keep=keep)
    z = lambda i: i * 0  # index-map literals must stay i32 (see above)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, t, d), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, dd_, s), lambda i, rw, tl, fr: (tl[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, dd_, s), lambda i, rw, tl, fr: (tl[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, nsl, nrhs, s), lambda i, rw, tl, fr: (tl[i], z(i), z(i), z(i)), memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nrhs, t), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, nrhs, t), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, d * nrhs, t), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
            pl.BlockSpec((1, d * nrhs, t), lambda i, rw, tl, fr: (rw[i], z(i), z(i)), memory_space=_VMEM),
        ),
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
            jax.ShapeDtypeStruct((r, d * nrhs, t), jnp.float32),
            jax.ShapeDtypeStruct((r, d * nrhs, t), jnp.float32),
        ),
        interpret=interpret,
    )(pair_rows, pair_tiles, pair_first, tgt_hi, tgt_lo, src_hi, src_lo, w_planes)


@functools.partial(jax.jit, static_argnames=("kparams", "interpret"))
def p2p_rows(tpts_rows, src_pts_t, src_w_t, *, kparams, interpret=False):
    """Fused near-field row pass.

    tpts_rows (R, T, d) f32; src_pts_t (R, d, S) f32; src_w_t (R, nrhs, S)
    f32 with padded sources zero-weighted. Returns (R, T, nrhs) f32 values
    ``out[r, t] = sum_s phi(|tpts[r, t] - src[r, s]|) * w[r, s]``.
    """
    from .. import kernels as _k

    r, t, d = tpts_rows.shape
    s = src_pts_t.shape[2]
    nrhs = src_w_t.shape[1]
    phi = _k.make_kernel(kparams, dtype=jnp.float32).phi_r2
    body = functools.partial(_row_kernel, phi_r2=phi, d=d)
    # Index-map constants must be i32: under jax_enable_x64 a literal 0
    # becomes i64 while program_id stays i32, and Mosaic fails to legalize
    # the mixed (i32, i64, i64) index-map return.
    imap = lambda i: (i, i * 0, i * 0)
    return pl.pallas_call(
        body,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, t, d), imap, memory_space=_VMEM),
            pl.BlockSpec((1, d, s), imap, memory_space=_VMEM),
            pl.BlockSpec((1, nrhs, s), imap, memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, nrhs), imap, memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((r, t, nrhs), jnp.float32),
        interpret=interpret,
    )(
        tpts_rows.astype(jnp.float32),
        src_pts_t.astype(jnp.float32),
        src_w_t.astype(jnp.float32),
    )


def _slab_kernel_df64(nbr_ref, th_ref, tl_ref, sh_hbm, sl_hbm, wp_hbm,
                      oh_ref, ol_ref, sh_scr, sl_scr, wp_scr, sems,
                      *, phi_df64, d, nsl, keep, u_max, s_leaf):
    """f64-grade near field, ONE grid step per target row.

    The row's whole u-list — coord tiles (hi + lo) and pre-sliced w planes —
    is DMA-gathered into double-buffered VMEM slabs while the previous row
    computes; the per-tile df64 math (identical to
    :func:`_pair_kernel_df64`) then runs tile-by-tile with the (nrhs, T)
    df64 accumulator in REGISTERS. Versus the dense (R, U) pair grid this
    removes (U-1)/U of the grid steps, all out-block VMEM revisits, and the
    repeated target-block fetches — the same restructuring that took the
    f32 path from 22.5 ms to 12 ms at config-2 scale.
    """
    from .. import df64 as dd

    i = pl.program_id(0)
    r_tot = pl.num_programs(0)
    one = jnp.int32(1)
    zero = jnp.int32(0)
    two = jnp.int32(2)
    slot = jax.lax.rem(i, jnp.int32(2))
    nxt = one - slot
    s_leaf_c = jnp.int32(s_leaf)

    def dma_triple(row, sl_, u):
        l = nbr_ref[u, row]
        off = jax.lax.mul(u, s_leaf_c)
        return (
            pltpu.make_async_copy(
                sh_hbm.at[l], sh_scr.at[sl_, :, pl.ds(off, s_leaf)],
                sems.at[sl_, u, zero],
            ),
            pltpu.make_async_copy(
                sl_hbm.at[l], sl_scr.at[sl_, :, pl.ds(off, s_leaf)],
                sems.at[sl_, u, one],
            ),
            pltpu.make_async_copy(
                wp_hbm.at[l], wp_scr.at[sl_, :, :, pl.ds(off, s_leaf)],
                sems.at[sl_, u, two],
            ),
        )

    def issue(row, sl_):
        # i32 counter carried explicitly (x64 induction vars trip a
        # promotion recursion in the kernel tracer, cf. _slab_rows_kernel)
        def one_u(_i, u32):
            for dma in dma_triple(row, sl_, u32):
                dma.start()
            return u32 + one

        jax.lax.fori_loop(0, u_max, one_u, zero)

    @pl.when(i == 0)
    def _():
        issue(jnp.int32(0), slot)

    @pl.when(i + 1 < r_tot)
    def _():
        issue(i + one, nxt)

    th = th_ref[0]
    tl = tl_ref[0]
    nrhs = oh_ref.shape[1]
    t = th.shape[0]

    def u_body(_i, carry):
        acc_h, acc_l, u32 = carry
        for dma in dma_triple(i, slot, u32):
            dma.wait()
        off = jax.lax.mul(u32, s_leaf_c)
        sh = sh_scr[slot, :, pl.ds(off, s_leaf)]
        sl = sl_scr[slot, :, pl.ds(off, s_leaf)]
        wp = wp_scr[slot, :, :, pl.ds(off, s_leaf)]
        ph, plo = _df64_tile_acc(
            th, tl, sh, sl, wp, phi_df64=phi_df64, d=d, nsl=nsl, keep=keep,
        )
        acc_h, acc_l = dd.add(acc_h, acc_l, ph, plo)
        return acc_h, acc_l, u32 + one

    acc_h, acc_l, _ = jax.lax.fori_loop(
        0, u_max, u_body,
        (jnp.zeros((nrhs, t), jnp.float32), jnp.zeros((nrhs, t), jnp.float32),
         zero),
    )
    oh_ref[0] = acc_h
    ol_ref[0] = acc_l


@functools.partial(jax.jit, static_argnames=("kparams", "nsl", "keep", "interpret"))
def p2p_leaf_slab_df64(tgt_hi, tgt_lo, src_hi, src_lo, w_planes, nbr_tab,
                       *, kparams, nsl=6, keep=6, interpret=False):
    """f64-grade near field with in-kernel slab DMA (one program per row).

    Operand layout as :func:`p2p_leaf_pairs_df64`: tgt_hi/lo (R, T, d) f32;
    src_hi/lo (L+1, d_pad, S) f32 with d_pad a multiple of 8 and S a
    multiple of 128 (manual DMA slices must be tile-aligned); w_planes
    (L+1, nsl, nrhs, S) bf16 pre-sliced per tile; nbr_tab (U, R) int32
    sentinel-padded (sentinel tile = zero weights). Returns (R, nrhs, T)
    hi/lo f32 pairs — combine with ``df64.to_f64`` and swap the last axes.
    Replaces the reference's f64 near field (``bbfmm.rs:1162``).
    """
    from .. import kernels as _k

    r, t, d = tgt_hi.shape
    _, d_pad, s = src_hi.shape
    nrhs = w_planes.shape[2]
    u = nbr_tab.shape[0]
    if d_pad % 8 or s % 128:
        raise ValueError(f"df64 slab kernel needs aligned tiles, got ({d_pad}, {s})")
    phi = _k.make_phi_df64(kparams)
    body = functools.partial(
        _slab_kernel_df64, phi_df64=phi, d=d, nsl=nsl, keep=keep,
        u_max=u, s_leaf=s,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec((1, t, d), lambda i, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # coord hi tiles stay off-pipeline
            pl.BlockSpec(memory_space=pl.ANY),  # coord lo tiles
            pl.BlockSpec(memory_space=pl.ANY),  # w planes
        ],
        out_specs=(
            pl.BlockSpec((1, nrhs, t), lambda i, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
            pl.BlockSpec((1, nrhs, t), lambda i, nbr: (i, i * 0, i * 0), memory_space=_VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d_pad, u * s), jnp.float32),
            pltpu.VMEM((2, d_pad, u * s), jnp.float32),
            pltpu.VMEM((2, nsl, nrhs, u * s), w_planes.dtype),
            pltpu.SemaphoreType.DMA((2, u, 3)),
        ],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
            jax.ShapeDtypeStruct((r, nrhs, t), jnp.float32),
        ),
        interpret=interpret,
    )(nbr_tab, tgt_hi, tgt_lo, src_hi, src_lo, w_planes)
