"""Streaming source / prefetcher tests."""

import numpy as np
import pytest

from tpu_gnss.config import ReceiverConfig, SYNTHETIC
from tpu_gnss.io import loaders, stream
from tpu_gnss.signal import synth

SMALL = ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=5000.0, fft_len=4096)


def test_file_source_1bit_matches_loader(tmp_path, rng):
    bits = rng.integers(0, 2, 16384).astype(np.uint8)
    path = tmp_path / "cap.bin"
    path.write_bytes(loaders.pack_1bit(bits))
    src = stream.FileSource1Bit(str(path), SMALL, per_block_phase=True)
    blocks = list(src.blocks(4096))
    assert len(blocks) == 4
    want = loaders.mix_1bit_block(bits[:4096], SMALL)
    np.testing.assert_allclose(blocks[0], want, atol=1e-6)


def test_file_source_continuous_phase(tmp_path, rng):
    """Continuous mode: concatenated blocks == one whole-stream mix."""
    bits = rng.integers(0, 2, 8192).astype(np.uint8)
    path = tmp_path / "cap.bin"
    path.write_bytes(loaders.pack_1bit(bits))
    src = stream.FileSource1Bit(str(path), SMALL, per_block_phase=False)
    got = np.concatenate(list(src.blocks(2048)))
    want = loaders.mix_1bit_block(bits, SMALL)  # phase runs across all 8192
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_iq_source(tmp_path, rng):
    iq = rng.integers(-100, 100, 8192).astype(np.int8)
    path = tmp_path / "iq.bin"
    iq.tofile(path)
    src = stream.IQFileSource(str(path), 2.048e6, dtype="int8",
                              remove_dc=False)
    blocks = list(src.blocks(1024))
    assert len(blocks) == 4
    np.testing.assert_allclose(blocks[0].real, iq[0:2048:2], atol=1e-6)


def test_synth_source_phase_continuity():
    """Blocks from SynthSource must be phase-continuous across boundaries."""
    sv = synth.SvSignal(prn=4, doppler_hz=777.0, code_phase_chips=100.0)
    src = stream.SynthSource([sv], 2.048e6, noise_std=0.0)
    it = src.blocks(2048)
    two = np.concatenate([next(it), next(it)])
    whole = synth.synth_baseband([sv], 2.048e6, 4096, noise_std=0.0)
    np.testing.assert_allclose(two, whole, atol=2e-3)


def test_prefetcher_order(tmp_path, rng):
    bits = rng.integers(0, 2, 4096 * 4).astype(np.uint8)
    path = tmp_path / "cap.bin"
    path.write_bytes(loaders.pack_1bit(bits))
    src = stream.FileSource1Bit(str(path), SMALL)
    direct = list(src.blocks(4096))
    src2 = stream.FileSource1Bit(str(path), SMALL)
    fetched = list(stream.Prefetcher(src2, 4096))
    assert len(fetched) == len(direct)
    for a, b in zip(fetched, direct):
        np.testing.assert_array_equal(a, b)


def test_receiver_packed_path_equals_bits_path(tmp_path, rng):
    """The packed-word uplink (1 bit/sample) must be bit-identical to
    the unpacked-bytes uplink end to end: same mix math on device, same
    detections, same correlator histories."""
    from tpu_gnss.receiver import Receiver

    fs = SMALL.fs
    svs = [synth.SvSignal(prn=9, doppler_hz=500.0, code_phase_chips=300.0),
           synth.SvSignal(prn=17, doppler_hz=-1200.0, code_phase_chips=10.0)]
    iq = synth.synth_baseband(svs, fs, int(3.0 * fs), noise_std=0.4, seed=4)
    bits = synth.baseband_to_1bit_if(iq, SMALL.fc, fs)
    path = tmp_path / "cap.bin"
    path.write_bytes(loaders.pack_1bit(bits))

    class NoPacked(stream.SampleSource):
        """Same file source with the packed uplink hidden."""
        def __init__(self, inner):
            self._inner = inner
            self.fs = inner.fs
        def blocks(self, block_len):
            return self._inner.blocks(block_len)
        def bit_blocks(self, block_len):
            return self._inner.bit_blocks(block_len)

    res_p = Receiver(SMALL).process_source(
        stream.FileSource1Bit(str(path), SMALL), chunk_s=1.0)
    res_b = Receiver(SMALL).process_source(
        NoPacked(stream.FileSource1Bit(str(path), SMALL)), chunk_s=1.0)

    assert ([d["prn"] for d in res_p.detections]
            == [d["prn"] for d in res_b.detections])
    assert len(res_p.channels) == len(res_b.channels)
    for a, b in zip(res_p.channels, res_b.channels):
        assert (a.prn, a.start_epoch) == (b.prn, b.start_epoch)
        # same math, but two distinct XLA programs (packed unpack+mix vs
        # byte mix) fuse differently -> last-ulp rounding drift only
        np.testing.assert_allclose(a.ip_hist, b.ip_hist,
                                   rtol=2e-4, atol=0.5)
        np.testing.assert_allclose(a.code_freq_hist, b.code_freq_hist,
                                   rtol=2e-4, atol=1e-3)


def test_receiver_process_source_smoke():
    """Streaming receiver over a synth source: acquires and tracks."""
    from tpu_gnss.receiver import Receiver
    svs = [synth.SvSignal(prn=9, doppler_hz=500.0, code_phase_chips=300.0),
           synth.SvSignal(prn=17, doppler_hz=-1200.0, code_phase_chips=10.0)]
    src = stream.SynthSource(svs, SMALL.fs, noise_std=0.5)
    recv = Receiver(SMALL)
    out = recv.process_source(src, max_duration_s=1.0)
    prns = sorted(d["prn"] for d in out.detections)
    assert prns == [9, 17]
    # both channels kept lock for the full second
    for r in out.channels:
        ip = np.asarray(r.ip_hist[-100:])
        assert np.abs(ip).mean() > 0.4 * 2048


def test_reacquisition_after_signal_loss():
    """A vanished SV is dropped by the watchdog and re-acquired when it
    returns (SignalLost -> SearchEnable loop analog)."""
    from tpu_gnss.receiver import Receiver
    from tpu_gnss.io.stream import SampleSource

    fs = SMALL.fs
    sv_a = synth.SvSignal(prn=9, doppler_hz=500.0, code_phase_chips=300.0)
    sv_b = synth.SvSignal(prn=17, doppler_hz=-1200.0, code_phase_chips=10.0)
    seg1 = synth.synth_baseband([sv_a, sv_b], fs, int(3.0 * fs),
                                noise_std=0.4, seed=1)
    # PRN 17 disappears for 4 s...
    seg2 = synth.synth_baseband([sv_a], fs, int(4.0 * fs),
                                noise_std=0.4, seed=2)
    # ...and returns (fresh phase - a re-acquisition, not a reappearance)
    sv_b2 = synth.SvSignal(prn=17, doppler_hz=-1200.0, code_phase_chips=555.0)
    seg3 = synth.synth_baseband([sv_a, sv_b2], fs, int(4.0 * fs),
                                noise_std=0.4, seed=3)
    iq = np.concatenate([seg1, seg2, seg3])

    class ArraySource(SampleSource):
        def __init__(self, data, fs):
            self.data, self.fs = data, fs
        def blocks(self, block_len):
            for i in range(0, len(self.data) - block_len + 1, block_len):
                yield self.data[i:i + block_len]

    recv = Receiver(SMALL, los_timeout_s=1.0, reacq_interval_s=2.0)
    out = recv.process_source(ArraySource(iq, fs))
    prn17 = [r for r in out.channels if r.prn == 17]
    assert len(prn17) >= 2, "PRN 17 must be lost and re-acquired"
    assert prn17[0].lost
    re = prn17[-1]
    assert re.start_epoch > 3000
    ip = np.asarray(re.ip_hist[-100:])
    assert np.abs(ip).mean() > 0.4 * 2048, "re-acquired channel must track"


def test_prefetcher_propagates_reader_errors(tmp_path):
    """A reader exception must surface to the consumer, not masquerade
    as a clean EOF (regression: try/finally swallowed it)."""
    from tpu_gnss.io.stream import Prefetcher

    class Boom:
        def blocks(self, n):
            yield np.zeros(n, np.complex64)
            raise OSError("disk died")

    it = iter(Prefetcher(Boom(), 64))
    next(it)
    with pytest.raises(OSError, match="disk died"):
        next(it)


def test_1bit_source_continuous_phase_matches_oneshot(tmp_path):
    """Phase-continuous streaming mix == mixing the whole capture once."""
    from tpu_gnss.config import SYNTHETIC
    from tpu_gnss.io import loaders
    from tpu_gnss.io.stream import FileSource1Bit
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 4096, dtype=np.uint8)
    path = tmp_path / "cap.bin"
    path.write_bytes(np.packbits(bits, bitorder="little").tobytes())
    full = loaders.mix_1bit_block(bits, SYNTHETIC)
    src = FileSource1Bit(str(path), SYNTHETIC, per_block_phase=False)
    got = np.concatenate(list(src.blocks(1024)))
    np.testing.assert_array_equal(got, full)


def test_array_path_frees_lost_channels():
    """process_iq (array path) must free dead channels and re-acquire —
    regression for the process_iq/process_source drift where the array
    path's watchdog marked channels lost but never stopped them."""
    from tpu_gnss.receiver import Receiver

    fs = SMALL.fs
    sv_a = synth.SvSignal(prn=9, doppler_hz=500.0, code_phase_chips=300.0)
    sv_b = synth.SvSignal(prn=17, doppler_hz=-1200.0, code_phase_chips=10.0)
    seg1 = synth.synth_baseband([sv_a, sv_b], fs, int(3.0 * fs),
                                noise_std=0.4, seed=1)
    seg2 = synth.synth_baseband([sv_a], fs, int(4.0 * fs),
                                noise_std=0.4, seed=2)
    sv_b2 = synth.SvSignal(prn=17, doppler_hz=-1200.0, code_phase_chips=555.0)
    seg3 = synth.synth_baseband([sv_a, sv_b2], fs, int(4.0 * fs),
                                noise_std=0.4, seed=3)
    iq = np.concatenate([seg1, seg2, seg3])

    recv = Receiver(SMALL, los_timeout_s=1.0, reacq_interval_s=2.0)
    out = recv.process_iq(iq, max_channels=4, chunk_s=1.0)
    prn17 = [r for r in out.channels if r.prn == 17]
    assert len(prn17) >= 2, "PRN 17 must be lost and re-acquired"
    assert prn17[0].lost
    re = prn17[-1]
    assert re.start_epoch > 3000
    ip = np.asarray(re.ip_hist[-100:])
    assert np.abs(ip).mean() > 0.4 * 2048, "re-acquired channel must track"


def test_weak_signal_escalation_in_receiver():
    """A signal the single-block cold search misses is still acquired via
    the receiver's non-coherent escalation (SURVEY §5 sensitivity)."""
    from tpu_gnss.config import ReceiverConfig
    from tpu_gnss.receiver import Receiver

    cfg = ReceiverConfig(fs=2.048e6, fc=0.512e6, max_fo=5000.0,
                         fft_len=4096, snr_threshold=25.0)
    sv = synth.SvSignal(prn=9, doppler_hz=500.0, code_phase_chips=300.0)
    iq = synth.synth_baseband([sv], cfg.fs, int(0.2 * cfg.fs),
                              noise_std=13.0, seed=0)

    # single-block search misses at this noise (that's the premise)
    no_esc = Receiver(cfg, weak_noncoherent=1)
    assert no_esc._cold_detections(iq) == []

    recv = Receiver(cfg, weak_noncoherent=4)
    dets = recv._cold_detections(iq)
    assert [d["prn"] for d in dets] == [9]
    assert dets[0]["snr"] >= cfg.snr_threshold
    assert abs(dets[0]["doppler_hz"] - 500.0) < 80.0
