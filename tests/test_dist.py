"""Multi-device sharded acquisition tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_gnss.config import ReceiverConfig
from tpu_gnss.acquire import search as S
from tpu_gnss.dist import shard
from tpu_gnss.signal import synth

SMALL = ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=5000.0, fft_len=4096)


@pytest.fixture(scope="module")
def fixture_block():
    sv = synth.SvSignal(prn=17, doppler_hz=2 * SMALL.dop_bin_hz,
                        code_phase_chips=417.0)
    iq = synth.synth_baseband([sv], SMALL.fs, SMALL.fft_len, noise_std=1.0,
                              seed=21)
    return synth.baseband_to_1bit_if(iq, SMALL.fc, SMALL.fs)


def test_doppler_sharded_matches_single(fixture_block):
    cfg = SMALL
    searcher = S.Searcher(cfg, dop_chunk=4)
    want = searcher.acquire_bits(fixture_block)

    mesh = shard.make_mesh(8, axes=("dop",))
    iq = S.mix_baseband(jnp.asarray(fixture_block, jnp.uint8), cfg.lo_rate)
    data_fft = jnp.fft.fft(iq)
    dops = shard.pad_dops(np.arange(-cfg.dop_max_bin, cfg.dop_max_bin + 1,
                                    dtype=np.int32), 8, 4)
    got = shard.acquire_from_fft_sharded(
        data_fft, searcher.code_ffts, jnp.asarray(dops), mesh=mesh,
        lags=cfg.lags, dop_chunk=4)

    np.testing.assert_array_equal(np.asarray(got.lo_shift),
                                  np.asarray(want.lo_shift))
    np.testing.assert_array_equal(np.asarray(got.ca_shift),
                                  np.asarray(want.ca_shift))
    np.testing.assert_allclose(np.asarray(got.snr), np.asarray(want.snr),
                               rtol=1e-5)


def test_block_doppler_sharded(fixture_block):
    cfg = SMALL
    searcher = S.Searcher(cfg, dop_chunk=4)
    # 4 blocks (repeat the fixture with variations), mesh (blk=2, dop=4)
    rng = np.random.default_rng(0)
    blocks = np.stack([fixture_block,
                       rng.integers(0, 2, cfg.fft_len).astype(np.uint8),
                       fixture_block,
                       rng.integers(0, 2, cfg.fft_len).astype(np.uint8)])
    mesh = shard.make_mesh(8, axes=("blk", "dop"), shape=(2, 4))
    dops = shard.pad_dops(np.arange(-cfg.dop_max_bin, cfg.dop_max_bin + 1,
                                    dtype=np.int32), 4, 4)
    got = shard.acquire_blocks_sharded(
        jnp.asarray(blocks), searcher.code_ffts, jnp.asarray(dops),
        mesh=mesh, lo_rate=cfg.lo_rate, lags=cfg.lags, dop_chunk=4)

    for b in (0, 2):
        want = searcher.acquire_bits(blocks[b])
        np.testing.assert_array_equal(np.asarray(got.lo_shift[b]),
                                      np.asarray(want.lo_shift))
        np.testing.assert_array_equal(np.asarray(got.ca_shift[b]),
                                      np.asarray(want.ca_shift))
    # signal block detects PRN 17, noise blocks do not
    assert float(got.snr[0][16]) > 50
    assert float(np.max(np.asarray(got.snr[1]))) < 25
