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


def test_iq2_codes_and_levels():
    """2-bit sign/magnitude: exact code->level mapping on crafted bytes."""
    # components: +weak, +strong, -weak, -strong (threshold = rms)
    raw = np.array([2, 100, -2, -100, 2, 100, -2, -100], np.int8)
    rms = np.sqrt(np.mean(raw.astype(np.float64) ** 2))
    step = rms / 1.887
    got = np.asarray(xfer.to_device_iq2(raw, signed=True,
                                        remove_dc=False))
    want_comp = np.array([1, 3, -1, -3, 1, 3, -1, -3], np.float64) * step
    np.testing.assert_allclose(got.real, want_comp[0::2], rtol=1e-6)
    np.testing.assert_allclose(got.imag, want_comp[1::2], rtol=1e-6)


def test_iq2_preserves_rms_and_tracks_iq8(rng):
    """Amplitude (RMS) preserved and correlation with the exact signal
    high: the quantization-loss budget for the 2-bit link path.

    For a Gaussian input, 2-bit sign/magnitude at a 1-sigma threshold
    keeps correlation rho ~ 0.93 with the exact waveform -> SNR loss
    -20*log10(rho) ~ 0.6 dB, matching the classic GNSS 2-bit ADC
    budget the docstring claims.
    """
    raw = np.clip(np.rint(rng.standard_normal(65536) * 30), -127,
                  127).astype(np.int8)
    a8 = np.asarray(xfer.to_device_iq8(raw, signed=True, remove_dc=False))
    a2 = np.asarray(xfer.to_device_iq2(raw, signed=True, remove_dc=False))
    # RMS preserved within a few percent
    r8 = np.sqrt(np.mean(np.abs(a8) ** 2))
    r2 = np.sqrt(np.mean(np.abs(a2) ** 2))
    assert abs(r2 / r8 - 1.0) < 0.05, (r2, r8)
    # correlation (per complex sample) -> implied SNR loss < 0.8 dB
    rho = np.abs(np.vdot(a2, a8)) / (np.linalg.norm(a2)
                                     * np.linalg.norm(a8))
    loss_db = -20.0 * np.log10(rho)
    assert loss_db < 0.8, f"2-bit quantization loss {loss_db:.2f} dB"


def test_iq2_complex_matches_byte_path(rng):
    """to_device_complex_i2 (host complex) == to_device_iq2 (capture
    bytes) on the same underlying samples."""
    raw = np.clip(np.rint(rng.standard_normal(4096) * 40), -127,
                  127).astype(np.int8)
    x = raw[0::2].astype(np.float32) + 1j * raw[1::2].astype(np.float32)
    a = np.asarray(xfer.to_device_iq2(raw, signed=True, remove_dc=False))
    b = np.asarray(xfer.to_device_complex_i2(x))
    np.testing.assert_allclose(a, b, rtol=1e-5)
