"""Packaging: the framework must install and run from a built wheel.

The reference ships as a bare source tree (no setup.py/pyproject —
/root/reference has only requirements files); a production framework must
be pip-installable, so this is a capability the rebuild ADDS.  The wheel
is pure-Python: the native chunkio library ships as source and is built
on demand at runtime (or skipped, falling back to ctypes-libblosc /
pure-numpy codecs)."""

import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(args, **kw):
    proc = subprocess.run(args, capture_output=True, text=True,
                          timeout=600, **kw)
    assert proc.returncode == 0, \
        f"{args} failed:\nSTDOUT:{proc.stdout[-3000:]}\n" \
        f"STDERR:{proc.stderr[-3000:]}"
    return proc


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    out = tmp_path_factory.mktemp("wheel")
    _run([sys.executable, "-m", "pip", "wheel", "--no-build-isolation",
          "--no-deps", "--no-index", "-w", str(out), str(REPO)])
    wheels = list(out.glob("crimac_unet_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    return wheels[0]


def test_wheel_contents(wheel):
    names = zipfile.ZipFile(wheel).namelist()
    # runtime-essential data files ride along
    for probe in ("crimac_unet_tpu/configs/config_baseline.yaml",
                  "crimac_unet_tpu/native/chunkio.cc",
                  "crimac_unet_tpu/native/Makefile",
                  "crimac_unet_tpu/pipeline/inference.py",
                  "crimac_unet_tpu/data/zarrlite.py"):
        assert probe in names, probe
    # no build artifacts or test files leak into the distribution
    assert not [n for n in names
                if "/build/" in n or n.endswith(".so")
                or n.startswith("tests/")], names
    entry = next(n for n in names if n.endswith("entry_points.txt"))
    eps = zipfile.ZipFile(wheel).read(entry).decode()
    for script in ("crimac-train", "crimac-evaluate", "crimac-save-predict",
                   "crimac-selfcheck", "crimac-export",
                   "crimac-school-eval"):
        assert script in eps, (script, eps)


def test_installed_wheel_runs(wheel, tmp_path):
    """Install to an isolated --target dir and drive the selfcheck CLI
    from there — the import graph, package data lookup (configs) and the
    codec fallback chain must all work outside the source tree."""
    site = tmp_path / "site"
    _run([sys.executable, "-m", "pip", "install", "--no-deps", "--no-index",
          "--target", str(site), str(wheel)])
    env = dict(os.environ)
    # the installed tree FIRST; keep the axon site for the TPU plugin but
    # drop the repo itself so the test can't pass via the source tree
    env["PYTHONPATH"] = os.pathsep.join(
        [str(site)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p and Path(p).resolve() != REPO])
    env["CRIMAC_JAX_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import crimac_unet_tpu, sys;"
         "assert crimac_unet_tpu.__file__.startswith(sys.argv[1]),"
         " crimac_unet_tpu.__file__;"
         "from crimac_unet_tpu.selfcheck import main;"
         "sys.exit(main(['--skip-device']))",
         str(site)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert proc.returncode == 0, \
        f"selfcheck from installed wheel failed:\n{proc.stdout[-3000:]}\n" \
        f"{proc.stderr[-3000:]}"
    assert "SELFCHECK PASSED" in proc.stdout
