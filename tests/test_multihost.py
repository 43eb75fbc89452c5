"""Multi-host (2-process) witness generation smoke.

Runs scripts/multihost_smoke.py as a subprocess fleet: 2 OS processes with
jax.distributed.initialize over a local coordinator, a 4-device global mesh
(2 virtual CPU devices per process), the sharded int_mul witness step with a
cross-process psum digest, and bit-exact table equality vs single-process
emission (north star: 1 host and N hosts produce identical witness tables;
the reference itself is single-process — /root/reference/src/context.rs:326).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_two_process_smoke():
    env = dict(os.environ)
    # the workers set their own device counts; drop the conftest's 8-device
    # flag so it cannot fight the workers' (parent process re-imports jax
    # only for the single-process reference, which any device count serves)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost smoke ok" in proc.stdout
