"""C/A code generation unit tests.

Oracles: published IS-GPS-200 first-10-chip octal words, Gold-code
structural properties, and an independent loop-form LFSR simulation
(tests/oracle.py).
"""

import numpy as np

from tpu_gnss.signal import cacode

from . import oracle

# First 10 chips of each C/A code as octal words (IS-GPS-200 Table 3-I,
# widely published).  Subset we assert verbatim.
KNOWN_OCTAL = {
    1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744, 5: 0o1133,
    6: 0o1455, 7: 0o1131, 8: 0o1454, 9: 0o1626, 10: 0o1504,
    20: 0o1715, 32: 0o1712,
}


def first10_word(row):
    v = 0
    for c in row[:10]:
        v = (v << 1) | int(c)
    return v


def test_known_octal_prefixes():
    tbl = cacode.code_table()
    for prn, want in KNOWN_OCTAL.items():
        assert first10_word(tbl[prn - 1]) == want, prn


def test_matches_loop_oracle():
    tbl = cacode.code_table()
    for prn in (1, 8, 17, 29, 32):
        t1, t2 = cacode.taps(prn)
        np.testing.assert_array_equal(tbl[prn - 1], oracle.ca_chips(t1, t2))


def test_balance_and_period():
    tbl = cacode.code_table()
    # Gold codes of period 1023 have 512 ones / 511 zeros
    assert (tbl.sum(axis=1) == 512).all()
    assert tbl.shape == (32, 1023)


def test_gold_cross_correlation_levels():
    """C/A cross-correlations only take values {-65, -1, 63}."""
    tbl = 1.0 - 2.0 * cacode.code_table().astype(np.float64)
    f = np.fft.fft(tbl, axis=1)
    # circular cross-correlation of PRN1 against PRN2..5 at all lags
    for j in range(1, 5):
        xc = np.round(np.fft.ifft(f[0] * np.conj(f[j])).real).astype(int)
        assert set(np.unique(xc)) <= {-65, -1, 63}
    # autocorrelation peak
    ac = np.round(np.fft.ifft(f[0] * np.conj(f[0])).real).astype(int)
    assert ac[0] == 1023
    assert set(np.unique(ac[1:])) <= {-65, -1, 63}


def test_g1_state_table_roundtrip():
    tbl = cacode.g1_state_table()
    assert len(np.unique(tbl)) == 1023
    for k in (0, 1, 7, 511, 1022):
        assert cacode.chips_from_g1_state(int(tbl[k])) == k
    # all-ones initial state is chip 0 (register starts at 0x3FF)
    assert tbl[0] == 0x3FF


def test_resample_matches_loop_oracle():
    for fs in (5.456e6, 8.184e6, 10e6, 2.8e6):
        t1, t2 = cacode.taps(1)
        want = oracle.replica(t1, t2, fs, 4096)
        got = cacode.resample(cacode.code_table()[0], fs, 4096)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_resample_batched():
    tbl = cacode.code_table()
    batch = cacode.resample(tbl[:3], 5.456e6, 1000)
    single = np.stack([cacode.resample(tbl[i], 5.456e6, 1000) for i in range(3)])
    np.testing.assert_array_equal(batch, single)


def test_taps_word():
    assert cacode.taps_word(1) == 2 | (6 << 8)
