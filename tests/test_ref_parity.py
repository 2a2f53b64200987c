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

RUNS = 2                     # reference runs to compare (~10 s each)
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

    # truncate the fixture so the reference binary (interpreted-speed
    # shim FFT) finishes in ~20 s instead of minutes
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
