"""Host<->device transfer helpers.

Some JAX backends (notably the tunneled single-chip TPU used in this
environment) cannot transfer complex dtypes across the host/device boundary,
while on-device complex compute is fully supported.  All framework code
therefore moves complex data as float32 re/im planes and combines/splits
on device.  On backends with working complex transfers these helpers are
still correct, just marginally less direct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return (re + 1j * im).astype(jnp.complex64)


def to_device_complex(x: np.ndarray) -> jax.Array:
    """Transfer a host complex array to device as float32 planes."""
    x = np.asarray(x)
    return _combine(jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32)),
                    jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32)))


@jax.jit
def _combine_dequant(re_i8: jnp.ndarray, im_i8: jnp.ndarray,
                     inv_scale: jnp.ndarray) -> jnp.ndarray:
    re = re_i8.astype(jnp.float32) * inv_scale
    im = im_i8.astype(jnp.float32) * inv_scale
    return (re + 1j * im).astype(jnp.complex64)


def to_device_complex_i8(x: np.ndarray, scale: float) -> jax.Array:
    """Quantized transfer: complex host array -> int8 planes -> device.

    4x less host->device traffic than float32 planes — the difference
    between ~1x and >4x realtime when the device link is a tunnel.  The
    dequantize (x ~= i8 / scale) runs on device, so amplitudes (and
    everything downstream: correlator powers, AGC, watchdog ratios) are
    preserved up to the quantization step 1/scale.  Callers pick
    ``scale`` so the step is far below the noise floor (e.g.
    ``127 / (6 * rms)``).
    """
    x = np.asarray(x)
    q = lambda a: np.clip(np.rint(a * scale), -127, 127).astype(np.int8)
    return _combine_dequant(jnp.asarray(q(x.real)), jnp.asarray(q(x.imag)),
                            jnp.float32(1.0 / scale))


@jax.jit
def _split(c: jnp.ndarray):
    return jnp.real(c).astype(jnp.float32), jnp.imag(c).astype(jnp.float32)


def from_device_complex(c: jax.Array) -> np.ndarray:
    """Fetch a device complex array to host via float32 planes."""
    re, im = _split(c)
    return np.asarray(re) + 1j * np.asarray(im)
