"""Double-float (df64) arithmetic and exact split matmuls for TPU.

TPUs have no native f64: XLA emulates each f64 dot as ~19 f32 passes
(measured: the 100k-pt M2L needs 19.6 GB of f32[..., 19] temporaries and
OOMs a 16 GB chip). This module provides the TPU-native alternative used by
the framework's "f64-grade" evaluation tier:

* **df64 scalars**: a value is an (hi, lo) pair of f32 with
  ``|lo| <= ulp(hi)/2``, giving ~49 significand bits. Elementwise ops are
  error-free-transformation chains (Dekker/Knuth; no FMA dependency, the
  TPU VPU does not expose one through Pallas) and run on the VPU at f32
  rates, inside or outside Pallas kernels.
* **Exact split dots (Ozaki-style)**: each operand is sliced into ``nsl``
  bf16 planes aligned to a power-of-two grid shared along the contraction
  axis. bf16 significands are 8 bits, so every sliced product has <= 16
  significant bits and an f32 MXU accumulation of up to 256 terms is EXACT
  (16 + 8 carry bits = 24 = f32 significand). Summing the O(nsl^2) partial
  dots in df64 reconstructs the f64-grade result from plain bf16 MXU
  matmuls — ~21 native passes for ~1e-13 worst-case relative error instead
  of XLA's 19-pass f32 emulation per dot.

Replaces the arithmetic (not the algorithms) of the reference's f64 paths:
``ferreus_bbfmm/src/bbfmm.rs`` passes and ``rbf_kernels.rs`` evaluations
are all plain f64 on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def _part_budget_bytes() -> int:
    """Max bytes for one ozaki plane-product partial before the free axis
    is chunked (``FERREUS_RBF_TPU_OZAKI_BYTES``, default 768 MB)."""
    return int(float(os.environ.get("FERREUS_RBF_TPU_OZAKI_BYTES", 768e6)))

_SPLIT = np.float32(4097.0)  # 2^12 + 1: Dekker split constant for f32


# ---------------------------------------------------------------- EFT cores
def two_sum(a, b):
    """Error-free a + b = s + e (Knuth; 6 flops, no magnitude assumption)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b = s + e assuming |a| >= |b| (3 flops)."""
    s = a + b
    return s, b - (s - a)


def _dekker_split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e via Dekker splitting (no FMA)."""
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def sqr_prod(a):
    """Error-free a * a = p + e with a SINGLE Dekker split (two_prod(a, a)
    splits the same operand twice — 4 extra VPU ops the near-field r^2
    chain pays per dim per element)."""
    p = a * a
    ah, al = _dekker_split(a)
    e = ((ah * ah - p) + 2.0 * (ah * al)) + al * al
    return p, e


# ------------------------------------------------------------- df64 algebra
def from_f64(x):
    """f64 array -> (hi, lo) f32 pair (XLA side only; Pallas has no f64)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def add(ahi, alo, bhi, blo):
    s, e = two_sum(ahi, bhi)
    e = e + (alo + blo)
    return quick_two_sum(s, e)


def neg(hi, lo):
    return -hi, -lo


def sub(ahi, alo, bhi, blo):
    return add(ahi, alo, -bhi, -blo)


def mul(ahi, alo, bhi, blo):
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return quick_two_sum(p, e)


def mul_f32(ahi, alo, b):
    """df64 * plain f32."""
    p, e = two_prod(ahi, b)
    e = e + alo * b
    return quick_two_sum(p, e)


def sqr(hi, lo):
    p, e = sqr_prod(hi)
    e = e + 2.0 * (hi * lo)
    return quick_two_sum(p, e)


def sqrt(hi, lo):
    """df64 sqrt: f32 seed + one error-corrected Newton step (Karp).

    Exact-zero and subnormal-small inputs return 0 cleanly; negative
    rounding dust is clamped. The residual uses that h - y^2 is EXACT in
    f32 (y is the rounded sqrt, so h and y2h agree to ~2^-23 — Sterbenz),
    replacing the full df64 add chain of the naive form.
    """
    h = jnp.maximum(hi, 0.0)
    y = jnp.sqrt(h)
    y2h, y2l = sqr_prod(y)
    rh = ((h - y2h) - y2l) + lo
    denom = jnp.maximum(2.0 * y, jnp.float32(np.finfo(np.float32).tiny))
    corr = jnp.where(y > 0, rh / denom, 0.0)
    return quick_two_sum(y, corr)


def recip(hi, lo):
    """df64 reciprocal: f32 seed + one df64 Newton step."""
    y = 1.0 / hi
    # e = 1 - x*y (df64)
    pyh, pyl = mul_f32(hi, lo, y)
    eh, el = add(jnp.float32(1.0), jnp.float32(0.0), -pyh, -pyl)
    # y' = y + y*e
    ch, cl = mul_f32(eh, el, y)
    return add(ch, cl, y, jnp.zeros_like(y))


def div(ahi, alo, bhi, blo):
    rh, rl = recip(bhi, blo)
    return mul(ahi, alo, rh, rl)


_LN2_HI = np.float32(0.6931471805599453)
_LN2_LO = np.float32(0.6931471805599453 - np.float64(np.float32(0.6931471805599453)))
_SQRT_HALF = np.float32(0.7071067811865476)
# atanh series 2*(t + t^3/3 + t^5/5 + ...) coefficients 1/(2k+1) as f32 pairs
_LOG_COEFS = [
    (np.float32(1.0 / k), np.float32(1.0 / k - np.float64(np.float32(1.0 / k))))
    for k in range(21, 0, -2)
]


def log(hi, lo):
    """df64 natural log via exponent extraction + atanh series.

    x = 2^e * m with m in [1/sqrt2, sqrt2); ln x = e ln2 + 2 atanh(t) with
    t = (m-1)/(m+1), |t| <= 0.1716, so 10 series terms reach ~2^-49. A
    Newton polish on an f32 log seed cannot work here: the f32 exp's
    rounding is a ~6e-8 bias the iteration inherits. Used by the
    thin-plate-spline kernel (phi = r^2 ln r).
    """
    h = jnp.maximum(hi, np.finfo(np.float32).tiny)
    bits = jax.lax.bitcast_convert_type(h, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 126  # mantissa in [0.5, 1)
    m_h = jax.lax.bitcast_convert_type(
        (bits & np.int32(-2139095041)) | np.int32(126 << 23), jnp.float32
    )
    # exact power-of-two rescale of the low word (jnp.clip does not trace
    # inside Pallas kernels — use lax.max/min directly)
    e_field = jax.lax.min(
        jax.lax.max((127 - e).astype(jnp.int32), jnp.int32(1)), jnp.int32(254)
    )
    scale = jax.lax.bitcast_convert_type(e_field << 23, jnp.float32)
    m_l = lo * scale
    # keep m in [1/sqrt2, sqrt2)
    small = m_h < _SQRT_HALF
    m_h = jnp.where(small, m_h * 2.0, m_h)
    m_l = jnp.where(small, m_l * 2.0, m_l)
    e = jnp.where(small, e - 1, e).astype(jnp.float32)

    num = add(m_h, m_l, jnp.float32(-1.0), jnp.float32(0.0))
    den = add(m_h, m_l, jnp.float32(1.0), jnp.float32(0.0))
    th, tl = div(*num, *den)
    t2h, t2l = sqr(th, tl)
    sh = jnp.full_like(th, _LOG_COEFS[0][0])
    sl = jnp.full_like(th, _LOG_COEFS[0][1])
    for ch, cl in _LOG_COEFS[1:]:
        sh, sl = mul(sh, sl, t2h, t2l)
        sh, sl = add(sh, sl, jnp.full_like(th, ch), jnp.full_like(th, cl))
    lnm_h, lnm_l = mul(th, tl, sh, sl)
    lnm_h, lnm_l = lnm_h * 2.0, lnm_l * 2.0  # exact
    e2h, e2l = mul_f32(jnp.full_like(th, _LN2_HI), jnp.full_like(th, _LN2_LO), e)
    return add(e2h, e2l, lnm_h, lnm_l)


# ------------------------------------------------- exact bf16 slice matmuls
def _pow2_ceil_f32(m):
    """Smallest power of two >= m (elementwise, f32 bit tricks; m > 0)."""
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    exp = (bits >> 23) & 0xFF
    frac = bits & 0x7FFFFF
    exp = jnp.where(frac != 0, exp + 1, exp)
    return jax.lax.bitcast_convert_type((exp << 23), jnp.float32)


def slice_planes(hi, lo, reduce_axes, nsl):
    """Split a df64 array into ``nsl`` bf16 planes, exactly representable on
    a power-of-two grid shared along ``reduce_axes``.

    Returns (planes, sigma0) where planes is an (nsl, ...) bf16 array and
    sum_k planes[k] reproduces hi+lo to ~8*nsl significant bits relative to
    the max over ``reduce_axes``. Plane k holds 8-bit chunks aligned at
    sigma0 * 2^(-8k), so any product planes_a[i] * planes_b[j] of two such
    slicings is exact in f32 and accumulates exactly over <= 256 terms.
    """
    m = jnp.max(jnp.abs(hi), axis=reduce_axes, keepdims=True)
    sigma0 = _pow2_ceil_f32(jnp.maximum(m, np.finfo(np.float32).tiny))
    planes = []
    # extraction constant: adding C = 1.5 * sigma * 2^15 rounds to the
    # sigma*2^-8 grid (bf16 keeps 8 significand bits)
    resid_h = hi
    resid_l = lo
    sigma = sigma0
    for k in range(nsl):
        c = sigma * jnp.float32(1.5 * (1 << 15))
        s = (resid_h + c) - c
        resid_h = resid_h - s  # exact: s is resid_h rounded to a coarser grid
        if k == 2:
            # hi is exhausted to ~2^-24 of sigma0 here: fold in lo once
            resid_h, resid_l = two_sum(resid_h, resid_l)
        planes.append(s.astype(jnp.bfloat16))
        sigma = sigma * jnp.float32(1.0 / 256.0)
    return jnp.stack(planes), sigma0


_MAX_ACCUM = 256  # 2^(24 - 2*8): the exact-f32-accumulation bound for
# products of 8-bit (bf16) slices


def _canon(x, contract, batch):
    """Transpose/reshape to (B, M, L): batch, free, contraction flattened."""
    free = [i for i in range(x.ndim) if i not in contract and i not in batch]
    perm = list(batch) + free + list(contract)
    xt = jnp.transpose(x, perm)
    bsh = [x.shape[i] for i in batch]
    fsh = [x.shape[i] for i in free]
    csh = [x.shape[i] for i in contract]
    B = int(np.prod(bsh)) if bsh else 1
    M = int(np.prod(fsh)) if fsh else 1
    L = int(np.prod(csh)) if csh else 1
    return xt.reshape(B, M, L), fsh


def ozaki_dot(a64, b64, dimension_numbers, nsl=6, keep=None):
    """f64-grade dot_general from native bf16 MXU passes. f64 in / f64 out.

    Operands are canonicalised to (B, M, L) x (B, N, L), the contraction
    axis is chunked to <= 256 (the exact-accumulation bound for products of
    8-bit slices in f32), each slice-pair dot lands exactly in f32, and
    partials accumulate in an f64 output tensor (output-sized, so the f64
    emulation cost is negligible). Returns (B, M, N)-shaped f64 restored to
    dot_general's natural output order by the caller.

    Plane-pair products on diagonal k = i+j share the scale 2^(-8k) x
    leading, so they may sum in f32 before the f64 upcast (rounding
    ~2^(-24-8k) of the result — harmless for k >= 1; k = 0 is a single
    exact pair). Three MXU issue strategies exploit that, picked by shape
    (mirrors the plane-stacking the Pallas near-field kernels use,
    ``p2p_pallas._df64_seg_dots``):

    * **contraction-stacked** (L small: keep*L <= 256): diagonal k's pairs
      concatenate along the contraction axis — ONE dot per diagonal whose
      f32 accumulation is still EXACT (<= 256 stacked terms). ``keep``
      MXU passes instead of keep*(keep+1)/2, each still inside one
      128-lane tile (e.g. the rank-19 M2L expansion dot).
    * **M-stacked** (nsl*M <= 128): all a-planes concatenate along M once;
      ONE dot per b-plane computes every (i, j) block for that j in rows
      the MXU pads away anyway — the big b operand is read keep times
      instead of once per pair (the rank-compression M2L dot: M = 19).
    * **N-stacked** (nsl*N <= 128): mirror image for small N (the P2M
      anterpolation: N = nrhs).
    * fallback: one dot per plane pair, f32 sums within a diagonal.
    """
    (ac, bc), (ab, bb) = dimension_numbers
    keep = nsl if keep is None else keep
    a, a_free = _canon(a64, tuple(ac), tuple(ab))
    b, b_free = _canon(b64, tuple(bc), tuple(bb))
    B, M, L = a.shape
    N = b.shape[1]
    g = -(-L // _MAX_ACCUM)
    lc = -(-L // g)  # per-chunk contraction length <= 256

    # Output-chunking guard: the plane-product partials below are f32
    # tensors of up to (B, g, nsl*M, N), and XLA keeps several diagonals
    # alive under remat. At large adaptive-tree levels (200k+ points at
    # p >= 7; any 2M+ fit) ONE partial exceeds 4 GB and the program OOMs
    # the 16 GB chip at compile time — surfaced by the tunneled compile
    # helper as an opaque HTTP 500 (this killed every 3M config-5 attempt
    # in rounds 1-4). When the predicted partial exceeds the budget, chunk
    # the larger free axis and lax.map the chunks sequentially so only one
    # partial set is live at a time. Bitwise identical: each chunk runs
    # the same exact split-dot path on a row/column subset.
    if g == 1 and keep * lc <= _MAX_ACCUM:
        part_bytes = 4 * B * M * N
    elif nsl * M <= max(128, N):
        part_bytes = 4 * B * g * nsl * M * N
    elif nsl * N <= max(128, M):
        part_bytes = 4 * B * g * M * nsl * N
    else:
        part_bytes = 4 * B * g * M * N
    budget = _part_budget_bytes()
    if part_bytes > budget and max(M, N) > 1:
        dn = (((2,), (2,)), ((0,), (0,)))
        n_ch = int(min(-(-part_bytes // budget), max(M, N)))
        if N >= M:
            nc = -(-N // n_ch)
            n_ch = -(-N // nc)
            bp = jnp.pad(b, ((0, 0), (0, n_ch * nc - N), (0, 0)))
            bs = bp.reshape(B, n_ch, nc, L).transpose(1, 0, 2, 3)
            out_ch = jax.lax.map(
                lambda bc_: ozaki_dot(a, bc_, dn, nsl=nsl, keep=keep)[0], bs)
            out = out_ch.transpose(1, 2, 0, 3).reshape(B, M, n_ch * nc)
            return out[:, :, :N], a_free, b_free
        mc = -(-M // n_ch)
        n_ch = -(-M // mc)
        ap = jnp.pad(a, ((0, 0), (0, n_ch * mc - M), (0, 0)))
        as_ = ap.reshape(B, n_ch, mc, L).transpose(1, 0, 2, 3)
        out_ch = jax.lax.map(
            lambda ac_: ozaki_dot(ac_, b, dn, nsl=nsl, keep=keep)[0], as_)
        out = out_ch.transpose(1, 0, 2, 3).reshape(B, n_ch * mc, N)
        return out[:, :M], a_free, b_free
    if g * lc != L:
        pad = g * lc - L
        a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
    a = a.reshape(B, M, g, lc)
    b = b.reshape(B, N, g, lc)

    ah, al = from_f64(a)
    bh, bl = from_f64(b)
    a_planes, _ = slice_planes(ah, al, (3,), nsl)  # (nsl, B, M, g, lc)
    b_planes, _ = slice_planes(bh, bl, (3,), nsl)

    if g == 1 and keep * lc <= _MAX_ACCUM:
        # contraction-stacked: one EXACT dot per diagonal
        af = a_planes[:, :, :, 0, :]  # (nsl, B, M, lc)
        bf = b_planes[:, :, :, 0, :]
        out = None
        for k in range(keep):
            pairs = [(i, k - i) for i in range(min(k + 1, nsl)) if k - i < nsl]
            if not pairs:
                continue
            ak = (af[pairs[0][0]] if len(pairs) == 1
                  else jnp.concatenate([af[i] for i, _ in pairs], axis=2))
            bk = (bf[pairs[0][1]] if len(pairs) == 1
                  else jnp.concatenate([bf[j] for _, j in pairs], axis=2))
            part = jax.lax.dot_general(
                ak, bk, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (B, M, N), exact in f32
            d64 = part.astype(jnp.float64)
            out = d64 if out is None else out + d64
        return out, a_free, b_free

    # Stacking trades a-side reads/flops for b-side reads: the stacked
    # operand is read once per OPPOSITE plane (keep passes) instead of once
    # per plane pair (~keep^2/2). Free when the stack still fits the MXU's
    # padded 128 rows; still a win whenever the stacked side stays no larger
    # than the other side (these dots are HBM-traffic-bound, not FLOP-bound
    # — the M2L rank dots run ~1% of MXU peak).
    stack_axis = None
    if nsl * M <= max(128, N):
        stack_axis = "m"
    elif nsl * N <= max(128, M):
        stack_axis = "n"
    diags = [None] * keep
    if stack_axis == "m":
        A = a_planes.transpose(1, 3, 0, 2, 4).reshape(B, g, nsl * M, lc)
        for j in range(keep):
            part = jax.lax.dot_general(
                A, b_planes[j].transpose(0, 2, 1, 3),
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (B, g, nsl*M, N)
            for i in range(min(keep - j, nsl)):
                blk = part[:, :, i * M : (i + 1) * M]
                k = i + j
                diags[k] = blk if diags[k] is None else diags[k] + blk
    elif stack_axis == "n":
        Bst = b_planes.transpose(1, 3, 0, 2, 4).reshape(B, g, nsl * N, lc)
        for i in range(keep):
            part = jax.lax.dot_general(
                a_planes[i].transpose(0, 2, 1, 3), Bst,
                dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (B, g, M, nsl*N)
            for j in range(min(keep - i, nsl)):
                blk = part[..., j * N : (j + 1) * N]
                k = i + j
                diags[k] = blk if diags[k] is None else diags[k] + blk
    else:
        for k in range(keep):
            for i in range(min(k + 1, nsl)):
                j = k - i
                if j >= nsl:
                    continue
                part = jax.lax.dot_general(
                    a_planes[i].transpose(0, 2, 1, 3),  # (B, g, M, lc)
                    b_planes[j].transpose(0, 2, 1, 3),  # (B, g, N, lc)
                    dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (B, g, M, N), exact in f32
                diags[k] = part if diags[k] is None else diags[k] + part
    out = None
    for dk in diags:
        if dk is None:
            continue
        d64 = dk.astype(jnp.float64)
        out = d64 if out is None else out + d64
    out = out.sum(axis=1)  # exact: f64 accumulation of the diagonal partials
    return out, a_free, b_free


def ozaki_einsum(spec, a64, b64, nsl=6, keep=None):
    """f64-in/f64-out einsum with f64-grade accuracy via ozaki_dot.

    Only specs expressible as a single dot_general are supported (no
    diagonal/repeated indices within one operand).
    """
    lhs, rhs = spec.split("->")[0].split(",")
    out_spec = spec.split("->")[1]
    contract = [c for c in lhs if c in rhs and c not in out_spec]
    batch = [c for c in lhs if c in rhs and c in out_spec]
    ac = tuple(lhs.index(c) for c in contract)
    bc = tuple(rhs.index(c) for c in contract)
    ab = tuple(lhs.index(c) for c in batch)
    bb = tuple(rhs.index(c) for c in batch)
    res, _, _ = ozaki_dot(a64, b64, ((ac, bc), (ab, bb)), nsl=nsl, keep=keep)
    # res is (B, M, N); restore batch/free shapes then the requested order
    lhs_free = [c for c in lhs if c not in contract and c not in batch]
    rhs_free = [c for c in rhs if c not in contract and c not in batch]
    bsh = [a64.shape[lhs.index(c)] for c in batch]
    fsh = [a64.shape[lhs.index(c)] for c in lhs_free]
    nsh = [b64.shape[rhs.index(c)] for c in rhs_free]
    res = res.reshape(tuple(bsh) + tuple(fsh) + tuple(nsh))
    natural = "".join(batch) + "".join(lhs_free) + "".join(rhs_free)
    if natural != out_spec:
        res = jnp.einsum(f"{natural}->{out_spec}", res)
    return res
