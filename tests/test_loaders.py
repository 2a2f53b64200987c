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
