"""TRUE reference-binary golden parity.

Builds the reference's own gps_test (c/test_search_offline.cpp +
c/search_offline.cpp) against our fftw3f shim
(tpu_gnss/native/fftw_shim), runs it on the checked-in synthetic capture,
and diffs its block tables character-for-character against the golden
snapshot our CLI is held to (tests/golden/gps_sig_tmp_compat.txt,
validated against cli.gps_test in test_cli.py) — closing the
ref-binary == snapshot == our-CLI chain with the actually-compiled
upstream program instead of a reimplemented oracle.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "tools", "build_ref_gps_test.sh")
GOLDEN = os.path.join(REPO, "tests", "golden", "gps_sig_tmp_compat.txt")

# All 12 golden runs are diffed (VERDICT r2 #8).  The shim FFT was the
# cost: modular twiddle stepping + -O3 -fcx-limited-range (bit-identical
# arithmetic, see shim_fft.cpp / build_ref_gps_test.sh) brought a run
# from ~10 s to ~3.5 s.
RUNS = 12
SAMPLES_PER_BLOCK = 40960    # 10 whole 512-byte packets per Sample()
BLOCKS_PER_RUN = 32          # one block per PRN in the reference sweep


@pytest.mark.slow
def test_reference_binary_matches_golden(tmp_path, synth_fixture_path):
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    binary = str(tmp_path / "ref_gps_test")
    build = subprocess.run(["bash", BUILD, binary],
                           capture_output=True, text=True)
    assert build.returncode == 0, build.stderr[-2000:]

    # truncate the fixture to exactly the golden's 12 runs (the file
    # holds a few hundred leftover samples beyond them)
    n_bytes = RUNS * BLOCKS_PER_RUN * SAMPLES_PER_BLOCK // 8
    trunc = tmp_path / "fixture.bin"
    with open(synth_fixture_path, "rb") as f:
        trunc.write_bytes(f.read(n_bytes))

    run = subprocess.run(
        [binary, str(trunc), "2.046e6", "8.184e6", "5000"],
        capture_output=True, text=True, timeout=600)
    assert run.returncode == 0, run.stderr[-2000:]

    # reference output: 6-line banner, then 6 lines per run
    ref_lines = run.stdout.splitlines()
    banner_end = next(i for i, ln in enumerate(ref_lines)
                      if ln.startswith(" 0 satellite:"))
    ref_tables = ref_lines[banner_end: banner_end + 6 * RUNS]
    with open(GOLDEN) as f:
        golden = [ln.rstrip("\n") for ln in f][: 6 * RUNS]
    assert len(ref_tables) == len(golden) == 6 * RUNS
    for i, (got, want) in enumerate(zip(ref_tables, golden)):
        assert got.rstrip() == want.rstrip(), (
            f"line {i}:\nref:    {got!r}\ngolden: {want!r}")


@pytest.mark.slow
def test_reference_binary_vs_cli_nottingham_format(tmp_path):
    """Binary-vs-binary parity on the NOTTINGHAM format (VERDICT r2 #4).

    Synthesizes a 5-SV 1-bit capture at fs=5.456 MHz / IF=4.092 MHz
    targeting the published table values (PRN 1/21/29/30/31,
    'Raw GPS signal samples...html':79-83), runs BOTH the shim-built
    reference binary and cli.gps_test --mode compat on the SAME file
    with the SAME argv, and diffs their block tables line-for-line —
    the two parity mechanisms (ref binary, golden snapshot) finally
    meet on the real capture's format.
    """
    import contextlib
    import io

    import numpy as np

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from tpu_gnss.config import NOTTINGHAM as cfg
    from tpu_gnss.io import loaders
    from tpu_gnss.signal import synth

    golden = [  # (prn, lo_shift, ca_shift) from BASELINE.md
        (1, 6, 1465), (21, 8, 686), (29, -9, 3868),
        (30, -9, 2998), (31, -8, 2337)]
    svs = [synth.SvSignal(prn=prn, doppler_hz=lo * cfg.dop_bin_hz,
                          code_phase_chips=ca * 1023.0 / cfg.lags,
                          amplitude=1.0)
           for prn, lo, ca in golden]
    # one compat run = 32 blocks of ceil(40000/4096)*4096 = 40960 samples
    n = 32 * 40960
    iq = synth.synth_baseband(svs, cfg.fs, n, noise_std=1.5, seed=29)
    bits = synth.baseband_to_1bit_if(iq, cfg.fc, cfg.fs)
    cap = tmp_path / "nottingham_synth.bin"
    cap.write_bytes(loaders.pack_1bit(bits))

    binary = str(tmp_path / "ref_gps_test")
    build = subprocess.run(["bash", BUILD, binary],
                           capture_output=True, text=True)
    assert build.returncode == 0, build.stderr[-2000:]
    run = subprocess.run([binary, str(cap), "4.092e6", "5.456e6", "5000"],
                         capture_output=True, text=True, timeout=600)
    assert run.returncode == 0, run.stderr[-2000:]
    ref_lines = run.stdout.splitlines()
    start = next(i for i, ln in enumerate(ref_lines)
                 if ln.startswith(" 0 satellite:"))
    ref_tables = [ln.rstrip() for ln in ref_lines[start: start + 6]]

    from tpu_gnss.cli.gps_test import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main([str(cap), "4.092e6", "5.456e6", "5000", "--max-runs", "1"])
    got = buf.getvalue().splitlines()
    start = next(i for i, ln in enumerate(got)
                 if ln.startswith(" 0 satellite:"))
    got_tables = [ln.rstrip() for ln in got[start: start + 6]]

    for i, (ours, ref) in enumerate(zip(got_tables, ref_tables)):
        assert ours == ref, (
            f"line {i}:\nours: {ours!r}\nref:  {ref!r}")
    # and the published 5-SV constellation is what both report
    det = [int(x) + 1 for x in ref_tables[0].split(":")[1].split()]
    assert det == [prn for prn, _, _ in golden]
