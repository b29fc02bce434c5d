"""Build and run the native loader test binary under ASan+UBSan and TSan.

The reference's async-PS design tolerated races by construction; our C++
loader is the one concurrent native component, so it gets sanitizer coverage
(SURVEY.md §5). Skipped when g++ or the sanitizer runtimes are unavailable.
"""

import subprocess
from pathlib import Path

import pytest

NATIVE = Path(__file__).parent.parent / "rectpu" / "io" / "native"
SOURCES = [str(NATIVE / "farmhash.cc"), str(NATIVE / "csv_loader.cc"),
           str(NATIVE / "json_columns.cc"), str(NATIVE / "loader_test_main.cc")]


def _build_and_run(tmp_path, sanitize: str):
    out = tmp_path / f"loader_test_{sanitize.replace(',', '_')}"
    cmd = ["g++", "-O1", "-g", "-std=c++17", "-pthread", f"-fsanitize={sanitize}",
           "-fno-omit-frame-pointer", *SOURCES, "-o", str(out)]
    build = subprocess.run(cmd, capture_output=True, text=True)
    if build.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {build.stderr[-300:]}")
    run = subprocess.run([str(out)], capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, f"sanitizer run failed:\n{run.stdout}\n{run.stderr}"
    assert "loader_test ok" in run.stdout


def test_asan_ubsan(tmp_path):
    _build_and_run(tmp_path, "address,undefined")


def test_tsan(tmp_path):
    _build_and_run(tmp_path, "thread")
