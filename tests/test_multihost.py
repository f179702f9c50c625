"""Executed multi-host (multi-process) distributed runtime test.

`parallel/mesh.init_distributed` is the multi-host scale-out entry point
(SURVEY.md §5: the reference has no distributed backend at all); until
now it was only exercised as the single-host no-op.  Here a REAL
two-process `jax.distributed` cluster forms over localhost (Gloo CPU
collectives, 4 virtual devices per process = 8 global), each process
feeds its own half of a global batch, and one training step runs with
the gradient all-reduce crossing the process boundary.  The resulting
loss and post-step parameter checksum must match a single-process
8-device run of the SAME global batch — proving the cross-host step
computes the same mathematics as the single-host one.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

# worker + oracle share one step implementation so the comparison can
# only fail on distribution, not on drift between two copies
COMMON = """
import numpy as np

def run_step(mesh, make_global):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.pipeline import engine

    config = {"patch_size": [32, 32],
              "frequencies": [18, 38, 120, 200], "lr": 0.005,
              "lr_step": 1000, "lr_reduction": 0.5, "momentum": 0.95,
              "depth": 2, "start_filts": 4, "compute_dtype": "float32"}
    model = UNet(n_classes=3, depth=2, start_filts=4)
    repl = NamedSharding(mesh, P())
    state = jax.jit(
        lambda: engine.init_train_state(model, config,
                                        jax.random.PRNGKey(0)),
        out_shardings=repl)()
    train_step = engine.make_train_step(model, config)

    B = 8  # global batch: one patch per global device
    rng = np.random.RandomState(0)
    data_g = rng.lognormal(np.log(1e-6), 2.0,
                           (B, 4, 32, 32)).astype(np.float32)
    labels_g = rng.choice([0, 27, 1], size=(B, 32, 32)).astype(np.int32)
    data = make_global(data_g, P("data"))
    labels = make_global(labels_g, P("data"))
    state, loss = train_step(state, data, labels, jax.random.PRNGKey(1))
    loss = float(loss)
    # order-insensitive parameter fingerprint, replicated on every host
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                         for l in leaves))
    return loss, checksum
"""

WORKER = COMMON + """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
from crimac_unet_tpu.parallel.mesh import get_mesh, init_distributed
ok = init_distributed(coordinator_address=sys.argv[2],
                      num_processes=2, process_id=pid)
assert ok, "init_distributed returned False with explicit args"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

mesh = get_mesh()
assert mesh.devices.size == 8, "mesh must span both processes"

from jax.sharding import NamedSharding, PartitionSpec as P

def make_global(arr, spec):
    # each process contributes ITS OWN half of the global batch: the
    # all-reduce must cross the process boundary to agree with the oracle
    n = arr.shape[0]
    lo, hi = pid * n // 2, (pid + 1) * n // 2
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.ascontiguousarray(arr[lo:hi]),
        arr.shape)

loss, checksum = run_step(mesh, make_global)
import json
print("RESULT" + json.dumps({"pid": pid, "loss": loss,
                             "checksum": checksum}), flush=True)
"""

ORACLE = COMMON + """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from crimac_unet_tpu.parallel.mesh import get_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = get_mesh(8)

def make_global(arr, spec):
    return jax.device_put(arr, NamedSharding(mesh, spec))

loss, checksum = run_step(mesh, make_global)
import json
print("RESULT" + json.dumps({"loss": loss, "checksum": checksum}),
      flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_local):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        .replace("--xla_force_host_platform_device_count=8",
                                 "").strip()
                        + f" --xla_force_host_platform_device_count="
                          f"{n_local}").strip()
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _result(stdout, tag="RESULT"):
    for line in stdout.splitlines():
        if line.startswith(tag):
            return json.loads(line[len(tag):])
    raise AssertionError(f"no {tag} line in:\n{stdout[-2000:]}")


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(i), addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(4), cwd=str(REPO)) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = [_result(o) for o in outs]

    oracle = subprocess.run(
        [sys.executable, "-c", ORACLE], capture_output=True, text=True,
        env=_env(8), cwd=str(REPO), timeout=600)
    assert oracle.returncode == 0, oracle.stdout[-3000:] + \
        oracle.stderr[-2000:]
    ref = _result(oracle.stdout)

    # both processes see the SAME replicated loss/params...
    assert results[0]["loss"] == pytest.approx(results[1]["loss"],
                                               abs=1e-9)
    assert results[0]["checksum"] == pytest.approx(
        results[1]["checksum"], abs=1e-6)
    # ...and they match the single-process oracle on the same global
    # batch: the gradient all-reduce genuinely crossed processes (each
    # worker fed only half the batch — without the cross-host reduce the
    # loss would differ in the first decimals, not the seventh)
    assert results[0]["loss"] == pytest.approx(ref["loss"], rel=1e-5)
    assert results[0]["checksum"] == pytest.approx(ref["checksum"],
                                                   rel=1e-6)
