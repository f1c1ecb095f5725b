"""Fixed-point requant: the uint32-limb JAX path must equal the int64 NumPy
path bit-for-bit, and both must equal exact rational arithmetic.

This is the lever that closes the round-1 TPU int8 mask divergence (~0.25 %
of pixels flipped by f32 requant-multiplier ties; fidelity bar set by the
reference's golden outputs, /root/reference/infur/src/predict_onnx.rs:371-381).
"""

import numpy as np
import pytest

from infur_tpu.onnx.requant import (decompose_multiplier, requant_jnp,
                                    requant_ref)

I32 = np.iinfo(np.int32)
EDGE_ACCS = np.array([0, 1, -1, 2, -2, I32.max, I32.min, I32.min + 1,
                      2**30, -(2**30), 12345678, -12345678], np.int64)


def exact_requant(acc: int, q: int, shift: int, zp: int, lo: int, hi: int) -> int:
    """Ground truth via Python bignums: round-half-away-from-zero of
    acc * q / 2**shift, then +zp and saturate."""
    mag = abs(acc)
    r = (mag * q + (1 << (shift - 1))) >> shift
    y = (-r if acc < 0 else r) + zp
    return max(lo, min(hi, y))


def test_decompose_accuracy():
    rng = np.random.default_rng(0)
    m = 10.0 ** rng.uniform(-8, 5, size=256)
    q, shift = decompose_multiplier(m)
    approx = q.astype(np.float64) * 2.0 ** (-shift.astype(np.float64))
    assert np.all(np.abs(approx / m - 1.0) <= 2.0 ** -30)
    assert np.all((q >= 2**30) & (q < 2**31))
    assert np.all((shift >= 1) & (shift <= 62))


def test_decompose_rejects_bad():
    for bad in (0.0, -1.0, np.inf, np.nan, 2.0**40, 2.0**-40):
        with pytest.raises(ValueError):
            decompose_multiplier(bad)


def test_ref_matches_exact_bignum():
    rng = np.random.default_rng(1)
    accs = np.concatenate([EDGE_ACCS,
                           rng.integers(I32.min, I32.max, 500, np.int64)])
    for m in (1e-6, 3.7e-4, 0.11, 0.999, 1.5, 200.0):
        q, shift = decompose_multiplier(m)
        for zp, dt in ((128, np.uint8), (0, np.int8), (-7, np.int8)):
            got = requant_ref(accs, q, shift, zp, dt)
            info = np.iinfo(dt)
            want = [exact_requant(int(a), int(q), int(shift), zp,
                                  info.min, info.max) for a in accs]
            np.testing.assert_array_equal(got, np.asarray(want, dt))


def test_jnp_matches_ref_randomized():
    rng = np.random.default_rng(2)
    accs = np.concatenate([EDGE_ACCS,
                           rng.integers(I32.min, I32.max, 4000, np.int64)])
    ms = np.concatenate([10.0 ** rng.uniform(-8, 4, 40),
                         [2.0**-31, 2.0**-20, 0.5, 1.0 - 2.0**-24, 1.0, 2.0]])
    for m in ms:
        q, shift = decompose_multiplier(m)
        for zp, dt in ((128, np.uint8), (0, np.int8)):
            ref = requant_ref(accs, q, shift, zp, dt)
            dev = np.asarray(requant_jnp(accs.astype(np.int32), q, shift,
                                         zp, dt))
            np.testing.assert_array_equal(dev, ref, err_msg=f"m={m!r}")


def test_jnp_matches_ref_per_channel():
    """Per-channel multipliers broadcast over an NCHW accumulator — the
    QLinearConv shape."""
    rng = np.random.default_rng(3)
    acc = rng.integers(I32.min, I32.max, (2, 8, 5, 5), np.int64)
    m = 10.0 ** rng.uniform(-6, 0, 8)
    q, shift = decompose_multiplier(m)
    q4, s4 = q.reshape(1, -1, 1, 1), shift.reshape(1, -1, 1, 1)
    ref = requant_ref(acc, q4, s4, 128, np.uint8)
    dev = np.asarray(requant_jnp(acc.astype(np.int32), q4, s4, 128, np.uint8))
    np.testing.assert_array_equal(dev, ref)


def test_jnp_matches_ref_under_jit():
    import jax

    rng = np.random.default_rng(4)
    acc = rng.integers(I32.min, I32.max, 512, np.int64).astype(np.int32)
    q, shift = decompose_multiplier(0.0371)
    fn = jax.jit(lambda a: requant_jnp(a, q, shift, 128, np.uint8))
    np.testing.assert_array_equal(np.asarray(fn(acc)),
                                  requant_ref(acc, q, shift, 128, np.uint8))


def test_jnp_shift_specialization_boundary():
    """The static >=33 fast path (low product word dropped) vs the general
    dual-branch path: pin both against the NumPy reference exactly at the
    specialization boundary and on a mixed-shift channel vector."""
    rng = np.random.default_rng(7)
    accs = np.concatenate([EDGE_ACCS,
                           rng.integers(I32.min, I32.max, 2000, np.int64)])
    for shift_target in (32, 33, 34, 62):
        m = 0.9999 * 2.0 ** (31 - shift_target) / (1 << 30) * (1 << 30)
        q, shift = decompose_multiplier(m)
        assert int(shift) in (shift_target, shift_target - 1)
        ref = requant_ref(accs, q, shift, 7, np.int8)
        dev = np.asarray(requant_jnp(accs.astype(np.int32), q, shift,
                                     7, np.int8))
        np.testing.assert_array_equal(dev, ref)
    # mixed 32/33 per-channel: must take the general path, still exact
    m = np.asarray([2.0 ** -1.01, 2.0 ** -2.01])
    q, shift = decompose_multiplier(m)
    assert set(shift.tolist()) == {32, 33}
    acc = rng.integers(I32.min, I32.max, (64, 2), np.int64)
    ref = requant_ref(acc, q, shift, 0, np.int8)
    dev = np.asarray(requant_jnp(acc.astype(np.int32), q, shift, 0, np.int8))
    np.testing.assert_array_equal(dev, ref)


def test_shl20_specialization_exact():
    """fixed_round_shl20_jnp(v, q, s) == fixed_round_ref(v << 20, q, s)
    over the whole QLinearAdd input domain and a multiplier sweep."""
    from infur_tpu.onnx.requant import (fixed_round_ref,
                                        fixed_round_shl20_jnp)

    v = np.arange(-511, 512, dtype=np.int64)
    rng = np.random.default_rng(11)
    ms = np.concatenate([10.0 ** rng.uniform(-4, 2, 24),
                         [2.0**-31, 0.5, 1.0, 2.0, 1.0 - 2.0**-24]])
    for m in ms:
        q, shift = decompose_multiplier(m)
        ref = fixed_round_ref(v << 20, q, shift)
        got = np.asarray(fixed_round_shl20_jnp(v.astype(np.int32), q, shift))
        np.testing.assert_array_equal(got, ref, err_msg=f"m={m!r}")


def test_add_rescale_exact_full_domain():
    """add_rescale_jnp == add_rescale_ref over the whole QLinearAdd input
    domain (|v| <= 255) for a multiplier sweep incl. the e=1/e=31 edges,
    and the decomposition stays inside int32 at the extremes."""
    from infur_tpu.onnx.requant import (add_rescale_jnp, add_rescale_ref,
                                        decompose_add_rescale)

    v = np.arange(-255, 256, dtype=np.int64)
    rng = np.random.default_rng(13)
    ms = np.concatenate([10.0 ** rng.uniform(-4, 1.8, 24),
                         [2.0**-23, 127.9, 0.5, 1.0, 2.0, 1.0 - 2.0**-24]])
    for m in ms:
        d = decompose_add_rescale(m)
        assert d is not None, m
        q22, e = d
        assert 1 << 21 <= q22 < 1 << 22 and 1 <= e <= 31
        # int32 safety: worst-case |v*q22| + 2**(e-1) must fit
        assert 255 * q22 + (1 << (e - 1)) < 2**31
        ref = add_rescale_ref(v, q22, e)
        got = np.asarray(add_rescale_jnp(v.astype(np.int32), q22, e))
        np.testing.assert_array_equal(got, ref, err_msg=f"m={m!r}")
        # the grid value is within a hair of the real-valued rescale
        ideal = v.astype(np.float64) * m * (1 << 14)
        assert np.abs(ref - ideal).max() <= 0.5 + abs(ideal).max() * 2.0**-21


def test_add_rescale_rejects_out_of_range():
    from infur_tpu.onnx.requant import decompose_add_rescale

    assert decompose_add_rescale(300.0) is None       # e < 1
    assert decompose_add_rescale(2.0**-26) is None    # e > 31
    assert decompose_add_rescale(0.0) is None
    assert decompose_add_rescale(float("nan")) is None
    assert decompose_add_rescale(float("inf")) is None


def test_qlinear_add_three_executors_agree():
    """Oracle / importer / NHWC executor compute identical QLinearAdd
    integers through the q22 fast path AND at a fallback multiplier."""
    from infur_tpu.onnx import GraphBuilder, import_model, run_model
    from infur_tpu.onnx.qexec import compile_qexec

    rng = np.random.default_rng(5)
    for a_s, b_s, y_s in ((0.013, 0.02, 0.017),     # q22 path
                          (0.013, 0.02, 1e-7)):     # huge m -> fallback
        g = GraphBuilder("qadd")
        x = g.input("x", np.uint8, (1, 4, 6, 6))
        yv = rng.integers(0, 256, (1, 4, 6, 6), dtype=np.uint8)
        yc = g.init("yconst", yv)
        out = g.node("QLinearAdd",
                     [x, g.init("as_", np.float32(a_s)),
                      g.init("az", np.uint8(131)), yc,
                      g.init("bs", np.float32(b_s)),
                      g.init("bz", np.uint8(120)),
                      g.init("ys", np.float32(y_s)),
                      g.init("yz", np.uint8(128))],
                     domain="com.microsoft")
        g.output(out, np.uint8, (1, 4, 6, 6))
        model = g.model()
        feed = {"x": rng.integers(0, 256, (1, 4, 6, 6), dtype=np.uint8)}
        want = run_model(model, feed)[out]
        got_imp = np.asarray(import_model(model)(feed)[out])
        np.testing.assert_array_equal(got_imp, want)
        try:
            got_q = np.asarray(compile_qexec(model)(feed)[out])
        except Exception:
            continue  # qexec may reject the fallback multiplier; fine
        np.testing.assert_array_equal(got_q, want)
