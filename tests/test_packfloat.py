"""Bit-packing tests: half floats, UF11/UF10, RGB9E5."""

import numpy as np
import pytest

from cuttlefish_tpu.packfloat import (
    f32_to_half_bits,
    f32_to_ufloat_bits,
    half_bits_to_f32,
    pack_b10g11r11,
    pack_rgb9e5,
    ufloat_bits_to_f32,
    unpack_b10g11r11,
    unpack_rgb9e5,
)


def test_half_roundtrip():
    x = np.array([0.0, 1.0, -1.0, 0.5, 65504.0, 1e-8, 3.14159], np.float32)
    bits = f32_to_half_bits(x)
    back = half_bits_to_f32(bits)
    np.testing.assert_array_equal(back, x.astype(np.float16).astype(np.float32))


@pytest.mark.parametrize("man_bits", [5, 6])
def test_ufloat_exact_values(man_bits):
    # Values exactly representable must round-trip.
    exps = np.arange(-14, 15)
    mants = np.array([0, 1, (1 << man_bits) - 1])
    vals = np.array(
        [(1.0 + m / (1 << man_bits)) * 2.0**e for e in exps for m in mants],
        np.float32,
    )
    bits = f32_to_ufloat_bits(vals, man_bits)
    back = ufloat_bits_to_f32(bits, man_bits)
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("man_bits", [5, 6])
def test_ufloat_against_half_reference(man_bits):
    # For man_bits<=10 and exponent range shared with f16, converting via the
    # f16 rounding then checking error bound: our conversion must round to the
    # nearest representable value.
    rng = np.random.default_rng(42)
    vals = rng.uniform(0, 60000, 10000).astype(np.float32)
    bits = f32_to_ufloat_bits(vals, man_bits)
    back = ufloat_bits_to_f32(bits, man_bits)
    # Max relative error of round-to-nearest is half ulp.
    ulp = 2.0 ** -(man_bits + 1)
    rel = np.abs(back - vals) / np.maximum(vals, 1e-10)
    assert rel.max() <= ulp * 1.0001


def test_ufloat_specials():
    assert f32_to_ufloat_bits(np.float32(-1.0), 6) == 0
    assert f32_to_ufloat_bits(np.float32(np.nan), 6) == 0
    assert f32_to_ufloat_bits(np.float32(np.inf), 6) == (31 << 6)
    assert f32_to_ufloat_bits(np.float32(1e30), 6) == (31 << 6)
    assert f32_to_ufloat_bits(np.float32(0.0), 6) == 0
    # Denormal round-trip.
    tiny = np.float32(2.0**-17)
    bits = f32_to_ufloat_bits(tiny, 6)
    assert ufloat_bits_to_f32(bits, 6) == tiny


def test_b10g11r11_roundtrip():
    rgb = np.array(
        [[0.0, 0.5, 1.0], [100.0, 3.75, 0.25], [65000.0, 1e-6, 2.0]], np.float32
    )
    packed = pack_b10g11r11(rgb)
    back = unpack_b10g11r11(packed)
    rel = np.abs(back - rgb) / np.maximum(rgb, 1e-10)
    # Normal range: half-ulp relative error; below 2^-14 values are denormal
    # with absolute step 2^-20/2^-19.
    normal = rgb >= 2.0**-14
    assert rel[normal].max() < 0.02
    assert np.abs(back - rgb)[~normal].max() <= 2.0**-19


def test_rgb9e5_exact():
    # Spec: values with shared exponent representable exactly round-trip.
    rgb = np.array([[1.0, 0.5, 0.25], [4.0, 2.0, 1.0]], np.float32)
    packed = pack_rgb9e5(rgb)
    back = unpack_rgb9e5(packed)
    np.testing.assert_allclose(back, rgb, rtol=2e-3)
    # Zero maps to zero.
    assert pack_rgb9e5(np.zeros((1, 3), np.float32))[0] == 0


def test_rgb9e5_max():
    packed = pack_rgb9e5(np.array([[70000.0, 0.0, 0.0]], np.float32))
    back = unpack_rgb9e5(packed)
    assert back[0, 0] == pytest.approx(65408.0, rel=1e-6)


def test_jnp_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, (256, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(pack_b10g11r11(vals, jnp)), pack_b10g11r11(vals)
    )
    np.testing.assert_array_equal(
        np.asarray(pack_rgb9e5(vals, jnp)), pack_rgb9e5(vals)
    )
