"""FMM evaluator error budget: truncation vs precision attribution.

Answers the question VERDICT r4 item 4 left open: when an interpolant's
values differ from a true-f64 dense oracle at scale (1.3e-05 at 1M points
vs 5e-7 small-scale), is the error (a) Chebyshev/ACA truncation of the
far field — which the Rust reference shares, its f64 arithmetic only
reproduces the TRUNCATED value (``/root/reference/ferreus_bbfmm/src/
chebyshev.rs:723-786``, ``bbfmm.rs:864-986``) — or (b) this framework's
own df64 split-precision arithmetic / far-field dial / accumulation order?

The sweep holds the points + weights fixed and varies ONE axis at a time:

- ``interpolation_order`` p: truncation scales ~10^-p; anything that does
  not move with p is not truncation.
- precision tier at fixed p: ``"df64"`` (full near+far dial) vs the plan's
  epsilon-dialed far field (``tree._f64_prec``, e.g. ``"df64f4"``) vs
  ``"f32"``. If full-dial and dialed errors coincide, the far-field dial
  contributes nothing at this epsilon; the gap to f32 shows what the df64
  tier buys.

Every variant is compared to the same dense numpy-f64 oracle (exact kernel
sums, no FMM, no df64) on a sampled target subset.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..kernels import make_kernel
from .api import FmmTree
from ...config import FmmCompressionType, FmmParams


def dense_oracle(pts, weights, kparams, sample_idx, chunk_bytes=2e9):
    """Dense numpy-f64 kernel sum at ``pts[sample_idx]`` — the exact value."""
    pts = np.asarray(pts, np.float64)
    w = np.asarray(weights, np.float64)
    if w.ndim == 1:
        w = w[:, None]
    targets = pts[sample_idx]
    kernel = make_kernel(kparams, xp=np)
    n = pts.shape[0]
    chunk = max(1, int(chunk_bytes // (n * 8)))
    return np.concatenate([
        kernel.pair(targets[s : s + chunk], pts) @ w
        for s in range(0, targets.shape[0], chunk)
    ])


def fmm_error_budget(
    pts,
    weights,
    kparams,
    orders=(5, 7, 9),
    n_sample=256,
    seed=3,
    adaptive_tree=True,
    max_points_per_cell=256,
):
    """Max relative FMM-vs-dense error per (order, precision-tier) variant.

    Returns ``{"n", "n_sample", "entries": [{"p", "prec", "err"}...],
    "verdict"}`` where ``verdict`` names the dominant error source:
    ``"cheb_truncation"`` if the error tracks p at fixed precision,
    ``"far_dial"`` if the dialed far field is measurably above the full
    dial, ``"df64_floor"`` if neither moves it.
    """
    pts = np.asarray(pts, np.float64)
    w = np.asarray(weights, np.float64)
    if w.ndim == 1:
        w = w[:, None]
    n = pts.shape[0]
    rng = np.random.default_rng(seed)
    sample_idx = np.sort(rng.choice(n, size=min(n_sample, n), replace=False))
    oracle = dense_oracle(pts, w, kparams, sample_idx)
    scale = max(float(np.max(np.abs(oracle))), 1e-300)
    sample_pts = pts[sample_idx]
    w_dev = jnp.asarray(w)

    entries = []
    by_key = {}
    for p in orders:
        params = FmmParams(
            interpolation_order=int(p),
            max_points_per_cell=max_points_per_cell,
            compression_type=FmmCompressionType.ACA,
            epsilon=10.0 ** (-int(p)),
        )
        tree = FmmTree(pts, int(p), kparams, adaptive_tree=adaptive_tree,
                       sparse=True, params=params)
        tree.prepare_targets(sample_pts, "sample")
        # dialed far field (what the f64-grade tier actually runs), the
        # full df64 dial, and f32 — at the plan's own epsilon
        precs = {"dialed": tree._f64_prec, "full": "df64", "f32": "f32"}
        for label, prec in precs.items():
            vals = np.asarray(tree.evaluate_device(w_dev, "sample",
                                                   precision=prec))
            err = float(np.max(np.abs(vals - oracle)) / scale)
            entries.append({"p": int(p), "prec": label,
                            "prec_str": prec, "err": float(f"{err:.3e}")})
            by_key[(int(p), label)] = err
        del tree

    # attribution: does the dialed error track p (truncation), exceed the
    # full dial at fixed p (far dial), or sit on a p-independent floor?
    ps = sorted({e["p"] for e in entries})
    dialed = [by_key[(p, "dialed")] for p in ps]
    full = [by_key[(p, "full")] for p in ps]
    tracks_p = len(ps) >= 2 and dialed[-1] < 0.1 * dialed[0]
    dial_gap = max(
        (by_key[(p, "dialed")] / max(by_key[(p, "full")], 1e-300) for p in ps)
    )
    if tracks_p and dial_gap < 3.0:
        verdict = "cheb_truncation"
    elif dial_gap >= 3.0:
        verdict = "far_dial"
    else:
        verdict = "df64_floor"
    return {
        "n": int(n),
        "n_sample": int(sample_idx.size),
        "entries": entries,
        "dial_over_full_max": float(f"{dial_gap:.2f}"),
        "tracks_p": bool(tracks_p),
        "verdict": verdict,
        "note": "err = max rel FMM-vs-dense-f64 at the sample; 'dialed' is "
                "the f64-grade tier's epsilon-keyed far field, 'full' the "
                "full df64 dial, each at that plan's own epsilon=1e-p",
    }
