"""Smoke test for the full-receiver CLI (the live `gps` binary analog).

Regression: the ChannelRecord history refactor (python lists -> ndarray
properties) broke `if r.ip_hist` truth-tests in the CLI dashboard and
--iq-log paths with "truth value of an array is ambiguous" — no test
drove the CLI end-to-end.  This one runs main() in-process on a short
1-bit capture and exercises the dashboard, IQ log, NMEA and checkpoint
paths.
"""

import numpy as np
import pytest

from tpu_gnss.cli import run_receiver
from tpu_gnss.io import loaders
from tpu_gnss.signal.synth import baseband_to_1bit_if

from .test_e2e import FS, build_scene


@pytest.mark.slow
def test_run_receiver_cli_smoke(tmp_path, capsys):
    iq, ephs, rx = build_scene(duration=8.0)
    fc = FS / 4
    cap = tmp_path / "cap.bin"
    cap.write_bytes(loaders.pack_1bit(baseband_to_1bit_if(iq, fc, FS)))

    iq_log = tmp_path / "iq.npz"
    nmea = tmp_path / "track.nmea"
    ckpt = tmp_path / "state.npz"
    rc = run_receiver.main([
        str(cap), str(fc), str(FS), "5000",
        "--fft-len", "4096", "--threshold", "17",
        "--iq-log", str(iq_log), "--nmea-out", str(nmea),
        "--checkpoint", str(ckpt)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "acquired" in out
    # channels tracked -> dashboard bars printed (the crash path)
    assert "PRN" in out
    assert iq_log.exists()
    d = np.load(iq_log)
    assert any(k.endswith("_ip") for k in d.files), d.files
    assert ckpt.exists()
    # 8 s cold cannot fix -> no sentences, but the file path must have
    # been handled without error
    assert "NMEA sentences" in out


def test_preset_flag_parses(tmp_path, capsys):
    """--preset is accepted and the missing-file path errors cleanly."""
    rc = run_receiver.main([str(tmp_path / "nope.bin"),
                            "--preset", "synthetic"])
    assert rc == 2   # clean missing-file error, not a crash
    assert "not found" in capsys.readouterr().err


@pytest.mark.slow
def test_run_receiver_cli_follow(tmp_path, capsys):
    """--follow wiring: tail a file another thread is writing, finish on
    the .done sidecar, report the follow summary."""
    import threading
    import time

    iq, ephs, rx = build_scene(duration=4.0)
    fc = FS / 4
    payload = loaders.pack_1bit(baseband_to_1bit_if(iq, fc, FS))
    cap = tmp_path / "live.bin"
    cap.write_bytes(b"")

    def writer():
        step = len(payload) // 8
        with open(cap, "ab") as f:
            for i in range(0, len(payload), step):
                f.write(payload[i: i + step])
                f.flush()
                time.sleep(0.01)
        (tmp_path / "live.bin.done").touch()

    t = threading.Thread(target=writer)
    t.start()
    rc = run_receiver.main([
        str(cap), str(fc), str(FS), "5000",
        "--fft-len", "4096", "--threshold", "17",
        "--follow", "--stall-timeout", "30"])
    t.join()
    out = capsys.readouterr().out
    assert rc == 0
    assert "follow ended: end of stream" in out
    assert "acquired" in out


@pytest.mark.slow
def test_run_receiver_cli_directed_warm_start(tmp_path, capsys):
    """--warm-start with a checkpoint holding almanac + last fix prints
    and applies the directed search; the in-receiver fallback keeps an
    under-delivering directed set harmless (rc 0, SVs acquired)."""
    from tpu_gnss.nav.almanac import Almanac
    from tpu_gnss.utils.checkpoint import save_state

    iq, ephs, rx = build_scene(duration=8.0)
    fc = FS / 4
    cap = tmp_path / "cap.bin"
    cap.write_bytes(loaders.pack_1bit(baseband_to_1bit_if(iq, fc, FS)))

    ckpt = tmp_path / "prev.npz"
    save_state(
        str(ckpt),
        ephemerides={k + 2: e for k, e in enumerate(ephs)},
        almanac={k + 2: Almanac.from_ephemeris(k + 2, e)
                 for k, e in enumerate(ephs)},
        meta=dict(last_fix=dict(ecef=list(map(float, rx)),
                                tow=302400.0 + 90.0)))
    rc = run_receiver.main([
        str(cap), str(fc), str(FS), "5000",
        "--fft-len", "4096", "--threshold", "17",
        "--warm-start", str(ckpt)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "directed search: almanac predicts PRNs" in out
    assert "acquired" in out


def test_rtltcp_scheme_connect_error(capsys):
    """rtltcp:// with no server is a clean CLI error, not a traceback."""
    rc = run_receiver.main(["rtltcp://127.0.0.1:1", "--stall-timeout", "1"])
    assert rc == 2
    assert "rtl_tcp connect failed" in capsys.readouterr().err


@pytest.mark.slow
def test_cli_rtltcp_warm_start_full_loop(tmp_path, capsys):
    """The CLI glue of the live-dongle session, end to end through
    ``run_receiver.main()``: a previous session's checkpoint
    (ephemerides + almanac + last fix with wall timestamp) feeds the
    visibility-directed warm start, the capture arrives over the
    rtl_tcp socket with a 50 kHz oscillator offset, fixes stream live
    into the NMEA file, and the final track carries the decoded week
    and broadcast leap seconds.  (The receiver-level composition is
    tests/test_stream.py::test_live_sky_rehearsal_combined; this one
    drives the actual CLI paths: checkpoint load, prediction print,
    --tow override, live + end-of-run NMEA, checkpoint save.)"""
    import time

    from tests.test_e2e import T_OE, TRUTH_LLA, build_scene
    from tests.test_stream import _rtltcp_server
    from tpu_gnss.cli import nmea as nmea_mod
    from tpu_gnss.cli import nmea_out
    from tpu_gnss.nav.almanac import Almanac
    from tpu_gnss.pvt import solve as ps
    from tpu_gnss.signal import rfchannel
    from tpu_gnss.utils.checkpoint import load_state, save_state

    iq, ephs, rx = build_scene(duration=26.0, noise=0.5, leap_s=18)
    rxed = rfchannel.apply_channel(iq, FS, freq_offset_hz=50e3,
                                   delay_samples=99.0, gain=1.1)
    scale = 100.0 / max(np.abs(rxed.real).max(), np.abs(rxed.imag).max())
    raw = np.empty(2 * len(rxed), np.uint8)
    raw[0::2] = np.clip(np.rint(rxed.real * scale), -127, 127) + 128
    raw[1::2] = np.clip(np.rint(rxed.imag * scale), -127, 127) + 128

    # previous session's checkpoint: validated ephemerides, the almanac
    # store they imply, and the last fix (+ wall timestamp for aging)
    ckpt = tmp_path / "prev.npz"
    save_state(str(ckpt),
               ephemerides={k + 2: e for k, e in enumerate(ephs)},
               almanac={k + 2: Almanac.from_ephemeris(k + 2, e)
                        for k, e in enumerate(ephs)},
               meta=dict(last_fix=dict(ecef=list(np.asarray(rx)),
                                       tow=float(T_OE + 60.0),
                                       wall=time.time())))

    port, t, _ = _rtltcp_server(raw.tobytes(), send_timeout_s=600.0)
    nmea_path = tmp_path / "live.nmea"
    out_ckpt = tmp_path / "next.npz"
    rc = run_receiver.main([
        f"rtltcp://127.0.0.1:{port}", str(FS / 4), str(FS), "100000",
        "--fft-len", "4096", "--threshold", "17",
        "--warm-start", str(ckpt), "--tow", str(T_OE + 90.0),
        "--nmea-out", str(nmea_path), "--checkpoint", str(out_ckpt),
        "--stall-timeout", "30"])
    t.join(timeout=10)
    out = capsys.readouterr().out
    assert rc == 0
    assert "rtl_tcp: connected" in out
    assert "warm start: ephemerides for PRNs" in out
    # the almanac prediction ran (directed subset or an explained
    # fallback — this constellation is mostly below the horizon)
    assert ("directed search: almanac predicts" in out
            or "almanac present but" in out)
    assert "[fix t=" in out, "no live fixes printed"

    # the NMEA track parses back to the truth with true-UTC timestamps
    st = nmea_mod.NmeaState()
    gga_times = []
    for line in nmea_mod.read_sentences(str(nmea_path)):
        assert nmea_mod.checksum_ok(line), line
        if line.startswith("$GPGGA"):
            gga_times.append(line.split(",")[1])
        st.feed(line)
    assert abs(st.lat - TRUTH_LLA[0]) < 0.01
    assert abs(st.lon - TRUTH_LLA[1]) < 0.01
    # final burst carries the broadcast -18 s (decoded in-stream from
    # page 18 at ~25.5 s of the scene)
    lat, lon, alt = TRUTH_LLA
    truth_ecef = ps.geodetic_to_ecef(lat, lon, alt)
    assert gga_times, "no GGA emitted"
    # reconstruct the expected final timestamp: last fix t_rx unknown
    # here, but the -18 s shift is visible as week-resolved UTC in the
    # file tail vs a leap-less render of the same burst — assert via
    # the saved checkpoint's last fix instead
    nxt = load_state(str(out_ckpt))
    last = nxt["meta"]["last_fix"]
    assert "wall" in last          # aging timestamp persisted forward
    t18 = nmea_out.gps_to_utc(900, last["tow"], leap_s=18)
    assert gga_times[-1].startswith(
        f"{t18.hour:02d}{t18.minute:02d}{t18.second:02d}"), (
        gga_times[-1], t18)
    # and the next session's almanac store was collected
    assert nxt.get("almanac"), "almanac store not persisted"


@pytest.mark.slow
def test_cli_link_mode_int2(tmp_path, capsys):
    """--link int2 routes the 8-bit capture through the 2-bit uplink
    end to end from the CLI."""
    iq, ephs, rx = build_scene(duration=8.0)
    raw = np.empty(2 * len(iq), np.int8)
    scale = 100.0 / max(np.abs(iq.real).max(), np.abs(iq.imag).max())
    raw[0::2] = np.clip(np.rint(iq.real * scale), -127, 127)
    raw[1::2] = np.clip(np.rint(iq.imag * scale), -127, 127)
    cap = tmp_path / "cap_iq8.bin"
    raw.tofile(cap)
    rc = run_receiver.main([
        str(cap), str(FS / 4), str(FS), "5000", "--format", "iq8",
        "--link", "int2", "--fft-len", "4096", "--threshold", "17"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "acquired" in out and "PRN" in out
