"""AddressSanitizer-instrumented native resolver under a randomized
long-run equivalence fuzz (>=1e5 candidate decisions vs the Python
golden).  Parity with the reference's ASAN build option
(`CMakeLists.txt:339-351`) — plus the fuzz harness the reference lacks.

The ASAN runtime must be loaded before libc, so the fuzz runs in a
subprocess with LD_PRELOAD=libasan.
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _libasan():
    try:
        out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True, check=True)
        path = out.stdout.strip()
        return path if os.path.isabs(path) and os.path.exists(path) else None
    except (OSError, subprocess.CalledProcessError):
        return None


@pytest.mark.skipif(_libasan() is None, reason="no ASAN toolchain")
def test_asan_fuzz_native_resolver():
    env = dict(os.environ)
    env.update(LTESNIFFER_NATIVE_ASAN="1",
               LD_PRELOAD=_libasan(),
               # python itself is not ASAN-clean at exit; memory errors in
               # the resolver still abort the process with an ASAN report
               ASAN_OPTIONS="detect_leaks=0,abort_on_error=1",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "asan_resolver_fuzz.py"), "400"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "native == python golden" in r.stdout
    assert "ERROR: AddressSanitizer" not in r.stderr
