"""Gate for the REAL 2-process ``jax.distributed`` smoke (VERDICT r4 #1).

Everything multi-host in the framework used to be covered only by
mocked-``process_index`` unit tests; this test spawns the actual
2-process x 4-virtual-CPU-device cluster (Gloo collectives over
localhost) via scripts/multiprocess_smoke.py and requires every stage to
pass: per-host sharded input, the GSPMD adversarial train step, the
explicit shard_map APR step, the multi-host sharded-eval tile loop, and
the bulk sharded serve — each checked against single-device oracles
inside the workers.

The subprocess isolation matters: the smoke needs its own jax runtime
(CPU platform, 4 local devices, distributed initialized), which must not
leak into this suite's 8-virtual-device session.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multiprocess_smoke.py")


def _can_bind_localhost() -> bool:
    try:
        s = socket.socket()
        s.bind(("localhost", 0))
        s.close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _can_bind_localhost(),
                    reason="cannot bind a localhost port for the "
                           "jax.distributed coordinator")
def test_two_process_distributed_smoke():
    env = dict(os.environ)
    # the smoke's workers pick their own platform/device-count via
    # jax.config; scrub this suite's CPU forcing so nothing fights it
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--timeout", "240"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env)
    assert proc.returncode == 0, (
        f"multiprocess smoke failed:\n{proc.stdout}\n{proc.stderr}")
    assert "MULTIPROCESS SMOKE OK" in proc.stdout
