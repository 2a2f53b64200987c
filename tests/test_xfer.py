"""Complex-safe transfer helper tests."""

import numpy as np

from tpu_gnss.utils import xfer


def test_roundtrip(rng):
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)
         ).astype(np.complex64)
    dev = xfer.to_device_complex(x)
    assert dev.dtype.name == "complex64"
    back = xfer.from_device_complex(dev)
    np.testing.assert_allclose(back, x, atol=0)


def test_accepts_real_input(rng):
    x = rng.standard_normal(64)
    dev = xfer.to_device_complex(x)
    back = xfer.from_device_complex(dev)
    np.testing.assert_allclose(back.real, x, atol=1e-7)
    np.testing.assert_allclose(back.imag, 0.0, atol=0)


def test_2d(rng):
    x = (rng.standard_normal((4, 8)) + 1j * rng.standard_normal((4, 8))
         ).astype(np.complex64)
    np.testing.assert_allclose(
        xfer.from_device_complex(xfer.to_device_complex(x)), x, atol=0)


def test_iq4_roundtrip(rng):
    """int4 packed transfer: values within one quantization step."""
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    scale = 7.0 / (3.0 * np.sqrt(np.mean(np.abs(x) ** 2) / 2))
    got = np.asarray(xfer.to_device_complex_i4(x, scale))
    step = 1.0 / scale
    # clipping at +-7 steps affects the >3-sigma tail only
    inside = (np.abs(x.real) < 6.9 * step) & (np.abs(x.imag) < 6.9 * step)
    assert inside.mean() > 0.95
    np.testing.assert_allclose(got.real[inside], x.real[inside],
                               atol=0.501 * step)
    np.testing.assert_allclose(got.imag[inside], x.imag[inside],
                               atol=0.501 * step)


def test_iq4_from_raw_bytes(rng):
    """to_device_iq4 on capture bytes tracks to_device_iq8 within a step."""
    raw = rng.integers(-90, 90, 8192).astype(np.int8)
    a8 = np.asarray(xfer.to_device_iq8(raw, signed=True, remove_dc=False))
    a4 = np.asarray(xfer.to_device_iq4(raw, signed=True, remove_dc=False))
    x = raw.astype(np.float32)
    rms = np.sqrt(np.mean(x[:65536] ** 2))
    step = 3.0 * rms / 7.0
    err = np.abs(a4 - a8)
    assert np.percentile(err, 99) < 0.75 * step
