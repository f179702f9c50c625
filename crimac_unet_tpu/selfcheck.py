"""Deployment self-check: ``python -m crimac_unet_tpu.selfcheck``.

The reference's deployment story gives an operator no way to ask "does
this box work?" short of launching a full survey run (reference
dockerscript.py runs the whole pipeline or nothing).  This prints a
pass/fail report over everything the framework needs at runtime —
Python/JAX versions, the accelerator backend, the Blosc codec backend
(native chunkio -> ctypes libblosc -> pure-numpy), zarr round-trip on
the real codec, and a tiny end-to-end predict on synthetic data — and
exits nonzero if any required piece is broken.

``--skip-device`` checks only the host-side stack (useful when the
accelerator is intentionally absent, e.g. a data-prep box).
"""

from __future__ import annotations

import sys
import tempfile
import time


class _Report:
    def __init__(self):
        self.failed = False

    def line(self, name: str, ok: bool, detail: str, required=True):
        mark = "ok  " if ok else ("FAIL" if required else "warn")
        if not ok and required:
            self.failed = True
        print(f"[{mark}] {name:<22} {detail}")


def _check_versions(rep: _Report) -> None:
    import jax
    import numpy as np
    rep.line("python", sys.version_info >= (3, 10),
             sys.version.split()[0])
    rep.line("jax", True, jax.__version__)
    rep.line("numpy", True, np.__version__)


def _check_device(rep: _Report) -> None:
    import jax
    import jax.numpy as jnp
    t = time.time()
    try:
        devs = jax.devices()
        kind = getattr(devs[0], "device_kind", devs[0].platform)
        got = float(jnp.arange(8.0).sum())
        rep.line("device", got == 28.0,
                 f"{len(devs)}x {kind} (probe {time.time() - t:.1f}s)")
    except Exception as exc:  # backend init failures are the point here
        rep.line("device", False, f"backend unavailable: {exc}")


def _check_codec(rep: _Report) -> None:
    import numpy as np

    from .data import blosc_codec as bc
    backend = bc.backend()
    # 'pure' = no binary codec (compression unavailable, slow decode) —
    # exactly the degraded state this warn line exists to surface
    rep.line("blosc backend", bc.available(), backend,
             required=False)
    if not bc.available():
        return
    raw = np.arange(4096, dtype=np.float32).tobytes()
    frame = bc.compress(raw, typesize=4)
    ok = bc.decompress(frame) == raw
    rep.line("blosc roundtrip", ok,
             f"{len(raw)} -> {len(frame)} bytes")


def _check_zarr(rep: _Report) -> None:
    import numpy as np

    from .data import blosc_codec as bc
    from .data.zarrlite import ZArray, ZGroup, consolidate_metadata
    with tempfile.TemporaryDirectory() as tmp:
        g = ZGroup.create(tmp + "/t.zarr")
        comp = "blosc-zstd" if bc.available() else "zlib"
        a = g.create_array("x", (0, 64), (32, 64), np.float16,
                           fill_value=0, dims=["ping_time", "range"],
                           compressor=comp)
        data = np.random.RandomState(0).rand(50, 64).astype(np.float16)
        a.append(data, axis=0)
        consolidate_metadata(tmp + "/t.zarr")
        back = ZGroup.open_consolidated(tmp + "/t.zarr")["x"][:]
        ok = np.array_equal(back, data)
        rep.line("zarr store", ok,
                 f"append+consolidate+read, codec {comp}")
        del a, g, back
        # separate handle so Windows-style open-handle issues would show
        ok2 = np.array_equal(ZArray.open(tmp + "/t.zarr/x")[:], data)
        rep.line("zarr reopen", ok2, "per-array metadata path")


def _check_end_to_end(rep: _Report, device: bool) -> None:
    import numpy as np

    import jax

    from .data.fixtures import make_zarr_survey
    from .data.zarr_reader import DataReaderZarr
    from .models.unet import build_unet
    from .pipeline.inference import (GriddedRunner,
                                     save_survey_predictions_zarr)
    from .data.zarrlite import ZGroup
    t = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        sv = make_zarr_survey(tmp + "/z", year=2017, n_echograms=1,
                              H=64, W=96, seed=0)
        reader = DataReaderZarr(sv)
        cfg = {"patch_size": [32, 32], "patch_overlap": 4,
               "frequencies": [18, 38, 120, 200], "depth": 2,
               "start_filts": 8, "fwd_batch": 8}
        model = build_unet(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               np.zeros((1, 32, 32, 4), np.float32),
                               train=False)
        runner = GriddedRunner(model, variables, cfg)
        out = tmp + "/pred.zarr"
        save_survey_predictions_zarr(runner, reader, out,
                                     preload_n_pings=96)
        a = ZGroup.open(out)["annotation"][:]
        ok = (a.shape == (2, 96, 64) and np.isfinite(a).all()
              and 0.0 <= a.min() and a.max() <= 1.0)
        where = "device" if device else "host backend"
        rep.line("end-to-end predict", ok,
                 f"96 pings -> {a.shape} f16 on {where} "
                 f"({time.time() - t:.1f}s incl. compile)")

        # school detection over the store just written (host-only,
        # exercises the from-predictions consumer + union-find CC);
        # its own try/except so a failure is reported under ITS name,
        # not swallowed into the predict line by main()'s wrapper
        t = time.time()
        try:
            from .pipeline.school_eval import detect_store_schools
            dets = detect_store_schools(out, reader, prob_threshold=0.2)
            n = sum(len(d) for d in dets.values())
            ok2 = (set(dets) == {0, 1}
                   and all(d["n_pixels"] >= 1
                           and d["bounding_box"][0] <= d["bounding_box"][1]
                           and d["bounding_box"][2] <= d["bounding_box"][3]
                           for ch in dets.values() for d in ch))
            rep.line("school detection (store)", ok2,
                     f"{n} components across 2 categories "
                     f"({time.time() - t:.1f}s, host-only)")
        except Exception as exc:
            rep.line("school detection (store)", False, repr(exc))


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--skip-device", action="store_true",
                   help="host-side checks only (no accelerator probe; "
                        "runs the end-to-end check on the CPU backend)")
    args = p.parse_args(argv)
    if args.skip_device:
        # must happen before jax initializes a backend
        import os
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")

    rep = _Report()
    _check_versions(rep)
    if not args.skip_device:
        _check_device(rep)
    _check_codec(rep)
    _check_zarr(rep)
    try:
        _check_end_to_end(rep, device=not args.skip_device)
    except Exception as exc:
        rep.line("end-to-end predict", False, repr(exc))
    print("SELFCHECK " + ("FAILED" if rep.failed else "PASSED"))
    return 1 if rep.failed else 0


if __name__ == "__main__":
    sys.exit(main())
