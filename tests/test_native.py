"""Native-code CI: build the orbit counter with ASan+UBSan and run its
self-checks (SURVEY.md §5 sanitizers)."""

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "orca")


@pytest.mark.slow
def test_orbits_under_sanitizers(tmp_path):
    exe = str(tmp_path / "test_orbits_san")
    subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17",
         "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
         os.path.join(SRC, "orbits.cpp"), os.path.join(SRC, "test_orbits.cpp"),
         "-o", exe],
        check=True, capture_output=True, timeout=120,
    )
    res = subprocess.run([exe], capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "passed" in res.stdout
