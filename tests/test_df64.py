"""df64 (double-float) arithmetic and exact bf16 split-dot tests.

The TPU f64-grade tier is built on these primitives; each op is checked
against numpy f64 at ~2^-45 relative accuracy (df64 carries ~49 bits).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ferreus_rbf_tpu.ops import df64


def _rel(a, b):
    return np.max(np.abs(np.asarray(a) - b) / np.maximum(np.abs(b), 1e-300))


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_from_to_roundtrip(rng):
    x = rng.standard_normal(1000) * 10.0 ** rng.integers(-6, 6, 1000)
    hi, lo = df64.from_f64(jnp.asarray(x))
    assert _rel(df64.to_f64(hi, lo), x) < 1e-14


def test_add_mul_sub_div(rng):
    # df64's contract: error relative to OPERAND magnitude ~2^-48 (for a
    # cancelled a+b the relative-to-result error is legitimately larger)
    a = rng.standard_normal(2000) * 10.0 ** rng.integers(-3, 3, 2000)
    b = rng.standard_normal(2000) * 10.0 ** rng.integers(-3, 3, 2000)
    ah, al = df64.from_f64(jnp.asarray(a))
    bh, bl = df64.from_f64(jnp.asarray(b))
    mag = np.maximum(np.abs(a), np.abs(b))

    def relmag(got, ref):
        return np.max(np.abs(np.asarray(got) - ref) / mag)

    assert relmag(df64.to_f64(*df64.add(ah, al, bh, bl)), a + b) < 3e-14
    assert relmag(df64.to_f64(*df64.sub(ah, al, bh, bl)), a - b) < 3e-14
    assert _rel(df64.to_f64(*df64.mul(ah, al, bh, bl)), a * b) < 3e-13
    assert _rel(df64.to_f64(*df64.div(ah, al, bh, bl)), a / b) < 3e-12


def test_cancellation_add(rng):
    # the whole point of df64: catastrophic f32 cancellation (f32 would
    # leave ~1e-7 absolute error; df64 leaves ~1e-14 of operand scale)
    a = 1.0 + rng.random(100) * 1e-7
    b = -np.ones(100)
    ah, al = df64.from_f64(jnp.asarray(a))
    bh, bl = df64.from_f64(jnp.asarray(b))
    got = np.asarray(df64.to_f64(*df64.add(ah, al, bh, bl)))
    assert np.max(np.abs(got - (a + b))) < 1e-14  # absolute vs scale 1.0


def test_sqrt_sqr_recip_log(rng):
    x = np.abs(rng.standard_normal(2000)) * 10.0 ** rng.integers(-4, 4, 2000)
    xh, xl = df64.from_f64(jnp.asarray(x))
    assert _rel(df64.to_f64(*df64.sqrt(xh, xl)), np.sqrt(x)) < 3e-14
    assert _rel(df64.to_f64(*df64.sqr(xh, xl)), x * x) < 3e-14
    assert _rel(df64.to_f64(*df64.recip(xh, xl)), 1.0 / x) < 3e-14
    # log error is absolute ~2^-47 (relative blows up near ln x = 0)
    got = np.asarray(df64.to_f64(*df64.log(xh, xl)))
    assert np.max(np.abs(got - np.log(x)) / np.maximum(np.abs(np.log(x)), 1.0)) < 1e-13


def test_sqrt_zero():
    xh = jnp.asarray(np.float32([0.0, 1e-30, 4.0]))
    xl = jnp.zeros_like(xh)
    out = df64.to_f64(*df64.sqrt(xh, xl))
    assert np.all(np.isfinite(out))
    assert out[0] == 0.0 and abs(out[2] - 2.0) < 1e-14


def test_ozaki_einsum_matches_f64(rng):
    a = rng.standard_normal((64, 96)) * 10.0 ** rng.integers(-2, 3, (64, 96))
    b = rng.standard_normal((96, 32)) * 10.0 ** rng.integers(-2, 3, (96, 32))
    ref = a @ b
    got = np.asarray(df64.ozaki_einsum("ik,kj->ij", jnp.asarray(a), jnp.asarray(b)))
    # error is relative to the row/col magnitude scale, so normalise by the
    # product of operand scales, not by tiny cancellation-prone outputs
    scale = np.abs(a) @ np.abs(b)
    err = np.max(np.abs(got - ref) / np.maximum(scale, 1e-300))
    assert err < 1e-12, err


def test_ozaki_einsum_batched(rng):
    # spec with batch + free dims on both sides (the M2L shape)
    a = rng.standard_normal((5, 17, 40))  # (g, p, k)
    b = rng.standard_normal((5, 11, 40, 3))  # (g, c, k, r)
    ref = np.einsum("gpk,gckr->gcpr", a, b)
    got = np.asarray(
        df64.ozaki_einsum("gpk,gckr->gcpr", jnp.asarray(a), jnp.asarray(b))
    )
    scale = np.einsum("gpk,gckr->gcpr", np.abs(a), np.abs(b))
    err = np.max(np.abs(got - ref) / np.maximum(scale, 1e-300))
    assert err < 1e-12, err


@pytest.mark.parametrize("kt", [
    "LinearRbf", "ThinPlateSplineRbf", "CubicRbf", "Spheroidal3Rbf",
    "Spheroidal5Rbf", "Spheroidal7Rbf", "Spheroidal9Rbf", "Laplacian",
    "OneOverR2", "OneOverR4",
])
def test_phi_df64_matches_f64(rng, kt):
    from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType, make_kernel, make_phi_df64

    kp = KernelParams(KernelType(kt), base_range=2.0, total_sill=1.3)
    r2 = np.concatenate([
        np.abs(rng.standard_normal(500)) * 10.0 ** rng.integers(-6, 4, 500),
        [0.0, 1e-30, 1.0, 4.0],
    ])
    ref = make_kernel(kp, xp=np).phi_r2(r2)
    h, lo = df64.from_f64(jnp.asarray(r2))
    got = np.asarray(df64.to_f64(*make_phi_df64(kp)(h, lo)))
    scale = np.maximum(np.abs(ref), np.max(np.abs(ref)) * 1e-6)
    assert np.max(np.abs(got - ref) / scale) < 5e-13, kt


@pytest.mark.parametrize("k", [256, 6004])
def test_ozaki_dot_long_contraction_exact_accumulation(rng, k):
    # 256 is the exact-accumulation boundary for bf16 slice products in
    # f32; 6004 (the 100k-pt M2L fused-contraction length) exercises the
    # contraction chunking + f64 partial reduction
    a = rng.standard_normal((8, k))
    b = rng.standard_normal((k, 8))
    got = np.asarray(df64.ozaki_einsum("ik,kj->ij", jnp.asarray(a), jnp.asarray(b)))
    scale = np.abs(a) @ np.abs(b)
    err = np.max(np.abs(got - a @ b) / scale)
    assert err < 1e-12, err


def test_ozaki_chunked_bitwise_equal(rng, monkeypatch):
    """The output-chunking guard (big-level OOM fix, round 5) must be
    invisible: a tiny partial budget forces the lax.map chunked path, whose
    result is BITWISE equal to the unchunked one — each output element runs
    the identical exact split-dot contraction on a row/column subset."""
    for spec, ash, bsh in [
        ("gkq,sqr->gskr", (7, 27, 125), (333, 125, 2)),  # rank pre-compression
        ("gpk,gckr->cpr", (16, 65, 27), (16, 97, 27, 2)),  # M2L expansion
        ("mps,msr->mpr", (5, 64, 96), (5, 96, 3)),  # P2L kernel block
    ]:
        a = jnp.asarray(rng.standard_normal(ash))
        b = jnp.asarray(rng.standard_normal(bsh))
        ref = df64.ozaki_einsum(spec, a, b, nsl=4, keep=4)
        df64._part_budget_bytes.cache_clear()
        monkeypatch.setenv("FERREUS_RBF_TPU_OZAKI_BYTES", "100000")
        try:
            chunked = df64.ozaki_einsum(spec, a, b, nsl=4, keep=4)
        finally:
            df64._part_budget_bytes.cache_clear()
            monkeypatch.delenv("FERREUS_RBF_TPU_OZAKI_BYTES")
        assert bool(jnp.all(ref == chunked)), spec
