"""Color math golden values (reference: lib/test/ImageTest.cpp:140-154)."""

import numpy as np
import pytest

from cuttlefish_tpu.color import linear_to_srgb, srgb_to_linear, to_grayscale


def test_linear_to_srgb_goldens():
    assert linear_to_srgb(0.0) == pytest.approx(0.0, abs=1e-15)
    assert float(linear_to_srgb(0.01)) == pytest.approx(0.0998528227341283, abs=1e-13)
    assert float(linear_to_srgb(0.75)) == pytest.approx(0.8808250210903, abs=1e-13)
    assert float(linear_to_srgb(1.0)) == pytest.approx(1.0, abs=1e-13)


def test_srgb_to_linear_goldens():
    assert srgb_to_linear(0.0) == pytest.approx(0.0, abs=1e-15)
    assert float(srgb_to_linear(0.01)) == pytest.approx(0.000773993808049536, abs=1e-15)
    assert float(srgb_to_linear(0.25)) == pytest.approx(0.0508760881715568, abs=1e-13)
    assert float(srgb_to_linear(0.75)) == pytest.approx(0.522521553968392, abs=1e-13)
    assert float(srgb_to_linear(1.0)) == pytest.approx(1.0, abs=1e-13)


def test_roundtrip():
    x = np.linspace(0, 1, 1000)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-12)


def test_grayscale_rec709():
    assert to_grayscale(1.0, 0.0, 0.0) == pytest.approx(0.2126)
    assert to_grayscale(0.0, 1.0, 0.0) == pytest.approx(0.7152)
    assert to_grayscale(0.0, 0.0, 1.0) == pytest.approx(0.0722)
    assert to_grayscale(1.0, 1.0, 1.0) == pytest.approx(1.0)


def test_jnp_matches_numpy():
    import jax.numpy as jnp

    x = np.linspace(0, 1, 257, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(srgb_to_linear(x, jnp)), srgb_to_linear(x), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(linear_to_srgb(x, jnp)), linear_to_srgb(x), rtol=1e-5, atol=1e-6
    )
