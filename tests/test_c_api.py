"""C API test: build libipopt_tpu_c.so + the hs071 C example and run it —
the same gate as the reference's make test (exit 0 + "EXIT: Optimal Solution
Found.", test/run_unitTests.in:33-41)."""
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(ROOT, "native", "build")


@pytest.mark.skipif(shutil.which("cmake") is None or shutil.which("ninja") is None,
                    reason="cmake/ninja not available")
def test_hs071_through_c_api():
    os.makedirs(BUILD, exist_ok=True)
    subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=BUILD, check=True,
                   capture_output=True)
    subprocess.run(["ninja"], cwd=BUILD, check=True, capture_output=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([os.path.join(BUILD, "hs071_c")], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "EXIT: Optimal Solution Found." in out.stdout
