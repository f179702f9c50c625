"""Executed multi-host (multi-process) distributed runtime test.

`parallel/mesh.init_distributed` is the multi-host scale-out entry point
(SURVEY.md §5: the reference has no distributed backend at all).  A REAL
two-process `jax.distributed` cluster forms over localhost (Gloo CPU
collectives, 4 virtual devices per process = 8 global), each process
feeds its own half of a global batch, and one training step runs with
the gradient all-reduce crossing the process boundary.  The resulting
loss and post-step parameter checksum must match a single-process
8-device run of the SAME global batch — proving the cross-host step
computes the same mathematics as the single-host one.

The harness lives in `crimac_unet_tpu/parallel/multihost_check.py`
(shared with `__graft_entry__.dryrun_multichip`, whose MULTICHIP
artifact witnesses the same proof for the driver); the worker/oracle
subprocesses carry the detailed asserts (process_count == 2, 8 global /
4 local devices, mesh spanning both processes), and any mismatch raises
out of `run_two_process_check`.
"""

import numpy as np
import pytest


def test_two_process_cluster_matches_single_process():
    from crimac_unet_tpu.parallel.multihost_check import \
        run_two_process_check

    res = run_two_process_check(timeout=600)
    # run_two_process_check raises on worker failure, cross-process
    # disagreement, or oracle mismatch; the returned oracle numbers must
    # be finite real results, not degenerate zeros
    assert np.isfinite(res["loss"]) and res["loss"] > 0
    assert np.isfinite(res["checksum"]) and res["checksum"] > 0


def test_harness_detects_wrong_cluster_shape():
    """The harness subprocesses really check cluster/mesh shape: an
    oracle run given only 2 virtual devices must fail its 8-device mesh
    construction, not silently pass (guards the delegated-assert design
    above).  A dead-coordinator worker is NOT used here — jax.distributed
    blocks indefinitely waiting for the coordinator."""
    import subprocess
    import sys

    from crimac_unet_tpu.parallel import multihost_check as mc

    p = subprocess.run(
        [sys.executable, "-m", "crimac_unet_tpu.parallel.multihost_check",
         "--oracle"],
        capture_output=True, text=True, env=mc._env(2), timeout=300)
    assert p.returncode != 0
    assert "RESULT" not in p.stdout
