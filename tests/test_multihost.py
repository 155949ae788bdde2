"""Multi-host (DCN) dryrun as a test: scripts/dryrun_multihost.py spawns two
`jax.distributed` CPU processes forming ONE global mesh and asserts
retrieval-index parity for the sharded top-k across the process boundary
(SURVEY §5 "across pods/hosts, DCN carries the same collectives").

Heavier than a unit test (two fresh interpreters + gloo setup, ~1-2 min);
marked slow-ish via the timeout and skipped where subprocess spawning is
unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "dryrun_multihost.py")


@pytest.mark.timeout(600)
def test_multihost_dryrun_parity():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # children force cpu via jax.config
    out = subprocess.run([sys.executable, SCRIPT], capture_output=True,
                         text=True, timeout=580, env=env)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIHOST PASS" in out.stdout
    # both children verified parity locally
    assert out.stdout.count("parity ok") == 2
