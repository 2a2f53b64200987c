"""I/O loader and converter tests."""

import numpy as np
import pytest

from tpu_gnss.config import NOTTINGHAM, SYNTHETIC
from tpu_gnss.io import loaders

from . import oracle


def test_unpack_pack_roundtrip(rng):
    bits = rng.integers(0, 2, size=8 * 1000).astype(np.uint8)
    packed = loaders.pack_1bit(bits)
    got = loaders.unpack_1bit(packed)
    np.testing.assert_array_equal(got, bits)


def test_unpack_lsb_first():
    # byte 0b00000001 -> first sample is 1
    got = loaders.unpack_1bit(bytes([0b00000001, 0b10000000]))
    np.testing.assert_array_equal(got[:8], [1, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(got[8:], [0, 0, 0, 0, 0, 0, 0, 1])


def test_native_matches_numpy(rng):
    pytest.importorskip("ctypes")
    from tpu_gnss.io import native
    raw = rng.integers(0, 256, size=4096).astype(np.uint8)
    np.testing.assert_array_equal(native.unpack_1bit(raw),
                                  np.unpackbits(raw, bitorder="little"))
    bip = native.unpack_1bit_bipolar(raw)
    np.testing.assert_array_equal(bip, 1 - 2 * np.unpackbits(raw, bitorder="little").astype(np.int8))


def test_native_pack(rng):
    from tpu_gnss.io import native
    bits = rng.integers(0, 2, size=8 * 257).astype(np.uint8)
    np.testing.assert_array_equal(native.pack_1bit(bits),
                                  np.packbits(bits, bitorder="little"))


@pytest.mark.parametrize("cfg", [NOTTINGHAM, SYNTHETIC])
def test_mixer_matches_loop_oracle(cfg, rng):
    bits = rng.integers(0, 2, size=5000).astype(np.uint8)
    want = oracle.mix_block(bits, cfg.fc, cfg.fs)
    got = loaders.mix_1bit_block(bits, cfg)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_unpack_mix(rng):
    from tpu_gnss.io import native
    cfg = NOTTINGHAM
    raw = rng.integers(0, 256, size=625).astype(np.uint8)  # 5000 samples
    bits = np.unpackbits(raw, bitorder="little")
    want = oracle.mix_block(bits, cfg.fc, cfg.fs)
    i_tbl, q_tbl = loaders.LO_TABLES["offline"]
    out_i, out_q = native.unpack_mix_1bit(raw, i_tbl, q_tbl, cfg.lo_rate)
    np.testing.assert_allclose(out_i, want.real, atol=1e-6)
    np.testing.assert_allclose(out_q, want.imag, atol=1e-6)


def test_iq_loaders(tmp_path, rng):
    n = 1024
    i8 = rng.integers(-100, 100, size=2 * n).astype(np.int8)
    p = tmp_path / "iq8.bin"
    i8.tofile(p)
    y = loaders.load_int8_iq(str(p), remove_dc=False)
    np.testing.assert_allclose(y.real, i8[0::2], atol=1e-6)
    np.testing.assert_allclose(y.imag, i8[1::2], atol=1e-6)

    u8 = rng.integers(0, 256, size=2 * n).astype(np.uint8)
    p2 = tmp_path / "iqu8.bin"
    u8.tofile(p2)
    y2 = loaders.load_uint8_iq(str(p2), remove_dc=False)
    np.testing.assert_allclose(y2.real, u8[0::2].astype(np.float32) - 128.0, atol=1e-6)


def test_convert_1bit_to_iq8(tmp_path, rng):
    bits = rng.integers(0, 2, size=4096).astype(np.uint8)
    src = tmp_path / "cap.bin"
    src.write_bytes(loaders.pack_1bit(bits))
    dst = tmp_path / "out.bin"
    loaders.convert_1bit_to_iq8(str(src), str(dst), gain=100)
    out = np.fromfile(dst, dtype=np.int8)
    s = 1 - 2 * bits.astype(np.int32)
    lo_i = np.tile([1, 0, -1, 0], 1024)
    lo_q = np.tile([0, 1, 0, -1], 1024)
    np.testing.assert_array_equal(out[0::2], np.clip(s * lo_i * 100, -127, 127))
    np.testing.assert_array_equal(out[1::2], np.clip(s * lo_q * 100, -127, 127))


def test_real_to_1bit_convention():
    y = np.array([1.0, -1.0, 0.5, -0.5])
    np.testing.assert_array_equal(loaders.real_to_1bit(y), [0, 1, 0, 1])


def test_native_iq_to_1bit_matches_numpy(tmp_path, rng):
    """Streamed native SDR-capture converters == the numpy reference."""
    from tpu_gnss.io import loaders, native

    # rtl-sdr style uint8 pairs with a DC offset
    n = 40000
    raw_u8 = (rng.normal(30, 18, 2 * n) + 128 + 7).clip(0, 255).astype(
        np.uint8)
    f_in = tmp_path / "rtl.bin"
    f_in.write_bytes(raw_u8.tobytes())
    fc, fs = 0.62e6, 2.8e6
    native.convert_iq_to_1bit(str(f_in), str(tmp_path / "n.bin"),
                              is_signed=False, fc_over_fs=fc / fs)
    y = loaders.load_uint8_iq(str(f_in))
    want = loaders.pack_1bit(loaders.iq_to_real_1bit(y, fc, fs))
    got = (tmp_path / "n.bin").read_bytes()
    g = np.frombuffer(got, np.uint8)
    w = np.frombuffer(want, np.uint8)
    mismatch = np.unpackbits(g ^ w).sum() / n
    assert mismatch < 1e-4, mismatch  # trig rounding only

    # HackRF style int8 pairs, via the loaders entry point (native path)
    raw_i8 = rng.normal(0, 25, 2 * n).clip(-127, 127).astype(np.int8)
    f_in2 = tmp_path / "hackrf.bin"
    f_in2.write_bytes(raw_i8.tobytes())
    loaders.convert_hackrf_to_1bit(str(f_in2), str(tmp_path / "h.bin"),
                                   fc=2.6e6, fs=10e6)
    y2 = loaders.load_int8_iq(str(f_in2))
    want2 = loaders.pack_1bit(loaders.iq_to_real_1bit(y2, 2.6e6, 10e6))
    g2 = np.frombuffer((tmp_path / "h.bin").read_bytes(), np.uint8)
    w2 = np.frombuffer(want2, np.uint8)
    mismatch2 = np.unpackbits(g2 ^ w2).sum() / n
    assert mismatch2 < 1e-4, mismatch2

    # mix=False branch (tuned-offset capture): bit-exact
    loaders.convert_rtlsdr_to_1bit(str(f_in), str(tmp_path / "r.bin"),
                                   mix=False)
    want3 = loaders.pack_1bit(loaders.real_to_1bit(np.real(y)))
    assert (tmp_path / "r.bin").read_bytes() == bytes(want3)
