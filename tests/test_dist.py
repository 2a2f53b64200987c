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


def test_channel_sharded_tracking_matches_single():
    """Tracking with channels sharded over 8 devices == single-device."""
    from tpu_gnss.signal import synth
    from tpu_gnss.track import channel as tc

    fs = 2.048e6
    svs = [synth.SvSignal(prn=p, doppler_hz=300.0 * i - 1000.0,
                          code_phase_chips=100.0 * i)
           for i, p in enumerate([2, 5, 9, 12, 17, 21, 25, 30])]
    iq = synth.synth_baseband(svs, fs, 50 * 2048, noise_std=0.4, seed=31)
    state = tc.init_state(8)
    for ch, sv in enumerate(svs):
        state = tc.start_channel(state, ch, sv.doppler_hz,
                                 sv.code_phase_chips)
    tables = jnp.asarray(tc.channel_code_tables([s.prn for s in svs], 8))
    gains = (tc.second_order_gains(18.0), tc.second_order_gains(2.0))

    want_state, want_out = tc.track_epochs(
        jnp.asarray(iq), state, tables, fs=fs,
        pll_gains=gains[0], dll_gains=gains[1])

    mesh = shard.make_mesh(8, axes=("blk",))
    got_state, got_out = shard.track_epochs_sharded(
        jnp.asarray(iq), state, tables, mesh=mesh, fs=fs,
        pll_gains=gains[0], dll_gains=gains[1])

    np.testing.assert_allclose(np.asarray(got_out.ip),
                               np.asarray(want_out.ip), rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_state.code_phase),
                               np.asarray(want_state.code_phase),
                               rtol=0, atol=1e-3)


def test_folded_mxu_sharded_matches_single():
    """Sharded folded-MXU acquisition == single-device mxu engine."""
    from tpu_gnss.acquire import folded as F

    cfg = ReceiverConfig(fs=1.024e6, fc=0.256e6, max_fo=5000.0,
                         fft_len=4096)
    s = F.FoldedSearcher(cfg, n_coherent=4, dop_chunk=2)
    svs = [synth.SvSignal(prn=17, doppler_hz=1500.0,
                          code_phase_chips=417.0)]
    rng = np.random.default_rng(4)
    iq0 = synth.synth_baseband(svs, cfg.fs, s.block_len, noise_std=0.8,
                               seed=4)
    noise = (rng.standard_normal(s.block_len)
             + 1j * rng.standard_normal(s.block_len)).astype(np.complex64)
    blocks = jnp.asarray(np.stack([iq0, noise, iq0, noise]))

    want = s.acquire(iq=jnp.asarray(iq0), engine="mxu")

    mesh = shard.make_mesh(8, axes=("blk", "dop"), shape=(2, 4))
    cw_r, cw_i = s.mxu_code_planes()
    dops = shard.pad_dops(np.asarray(s.dops_hz), 4, 2)
    got = shard.acquire_folded_sharded(
        blocks, cw_r, cw_i, jnp.asarray(dops), mesh=mesh, fs=cfg.fs,
        lo_rate=cfg.lo_rate, n_coherent=s.n_coherent, dop_chunk=2,
        period=s.period, nf=s.nf, from_bits=False, interpret=True)

    for b in (0, 2):
        assert int(got.ca_shift[b][16]) == int(want.ca_shift[16])
        assert float(got.doppler_hz[b][16]) == float(want.doppler_hz[16])
        np.testing.assert_allclose(float(got.snr[b][16]),
                                   float(want.snr[16]), rtol=1e-4)
    assert float(np.max(np.asarray(got.snr[1]))) < 25


@pytest.mark.slow
def test_distributed_receiver_full_chain_equality():
    """The WHOLE streaming receiver on a mesh (VERDICT r3 #1): the same
    capture goes stream -> fixes with Doppler-sharded cold acquisition
    and a channel-sharded tracking bank on a 4-device mesh, and the fix
    sequence must equal the single-device run (same engine family).

    The reference's defining integration — search + 12 channels + solve
    cooperating across two processors (c/main.cpp:66-68, over the SPI
    link c/spi.cpp:34-53) — here as ONE process_source loop whose heavy
    stages run as mesh collectives."""
    from tpu_gnss.receiver import Receiver
    from .test_e2e import build_scene, FS

    iq, ephs, rx = build_scene(duration=20.0, n_sv=6)
    cfg = ReceiverConfig(fs=FS, fc=FS / 4, max_fo=5000.0, fft_len=4096,
                         snr_threshold=20.0)
    mesh = shard.make_mesh(4, axes=("dop",))

    # single-device run on the same engine family (fused kernel +
    # shared refinement arithmetic) so the comparison isolates the
    # sharding, not the engine
    single = Receiver(cfg, acq_engine="mxu").process_iq(iq,
                                                        max_channels=12)
    dist = Receiver(cfg, mesh=mesh).process_iq(iq, max_channels=12)

    assert dist.solutions and single.solutions
    assert ([s.snap_epoch for s in dist.solutions]
            == [s.snap_epoch for s in single.solutions])
    prns_d = sorted(r.prn for r in dist.channels)
    prns_s = sorted(r.prn for r in single.channels)
    assert prns_d == prns_s, (prns_d, prns_s)
    for a, b in zip(dist.solutions, single.solutions):
        d = np.linalg.norm([a.x - b.x, a.y - b.y, a.z - b.z])
        assert d < 1.0, f"sharded fix differs from single-device by {d:.2f} m"
    err = np.linalg.norm(
        np.array([dist.solutions[-1].x, dist.solutions[-1].y,
                  dist.solutions[-1].z]) - np.array(rx))
    assert err < 8.0, f"distributed fix error {err:.1f} m"
