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
