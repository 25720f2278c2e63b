"""Drive the C++ unit-test tier from pytest.

The reference runs a gtest suite over its native templates
(`/root/reference/srcs/cmake/tests.cmake`, `tests/cpp/test_quiver_cpu.cpp`);
our native host runtime gets the same treatment via a dependency-free
assert harness (`tests/cpp/test_quiver_host.cpp`) built with make. This
wrapper keeps it inside `pytest tests/` so CI needs one command.
"""
import shutil
import subprocess
from pathlib import Path

import pytest

CPP_DIR = Path(__file__).resolve().parent / "cpp"


@pytest.mark.skipif(shutil.which("g++") is None or shutil.which("make") is None,
                    reason="no C++ toolchain")
def test_cpp_host_runtime():
    build = subprocess.run(["make", "-C", str(CPP_DIR), "test_quiver_host"],
                           capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stderr
    run = subprocess.run([str(CPP_DIR / "test_quiver_host")],
                         capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "all C++ host-runtime tests passed" in run.stdout
