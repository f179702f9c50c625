"""Machine-level path configuration via ``setpyenv.json``.

Keeps the reference contract (crimac_unet/paths.py:11-58): a JSON file with
keys ``path_to_echograms``, ``path_to_zarr_files``, ``path_to_korona_data``,
``path_to_korona_transducer_depths``, ``path_to_trained_model``,
``syspath``.  Unlike the reference, nothing is loaded (and no RNG is seeded)
at import time; paths are resolved lazily and can be overridden
programmatically, which makes the module testable.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

_ENV_KEY = "CRIMAC_SETPYENV"
_overrides: dict = {}


def set_paths(**kwargs) -> None:
    """Programmatic override (tests, notebooks, docker entry point)."""
    _overrides.update(kwargs)


# parse cache keyed by (resolved file, mtime): path accessors are called
# per reader construction, and a json parse per call is pure I/O churn;
# the re-stat each call keeps edits (and CRIMAC_SETPYENV/cwd changes)
# visible without a manual reset
_cache: dict = {}


def _load_setpyenv() -> dict:
    candidates = []
    if os.environ.get(_ENV_KEY):
        candidates.append(Path(os.environ[_ENV_KEY]))
    candidates.append(Path.cwd() / "setpyenv.json")
    candidates.append(Path(__file__).resolve().parent.parent / "setpyenv.json")
    for cand in candidates:
        if cand.is_file():
            key = (str(cand), cand.stat().st_mtime_ns)
            if key not in _cache:
                _cache.clear()  # one live entry; stale files don't pile up
                with open(cand) as f:
                    _cache[key] = json.load(f)
            return _cache[key]
    return {}


def _get(key: str, default: str | None = None) -> str | None:
    if key in _overrides:
        return _overrides[key]
    env = _load_setpyenv()
    if key in env:
        return env[key]
    return default


def path_to_echograms() -> str | None:
    return _get("path_to_echograms")


def path_to_zarr_files() -> str | None:
    return _get("path_to_zarr_files")


def path_to_korona_data() -> str | None:
    return _get("path_to_korona_data")


def path_to_korona_transducer_depths() -> str | None:
    return _get("path_to_korona_transducer_depths")


def path_to_trained_model() -> str | None:
    return _get("path_to_trained_model")
