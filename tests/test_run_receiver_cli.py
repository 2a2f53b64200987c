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
