"""Curated bad-file exclusion lists.

Counterpart of reference data/missing_korona_depth_measurements.py:5-41: a
list of echogram names excluded because Korona depth files are missing or
have deviating shapes.  The concrete names are survey-installation specific;
configure them per deployment via ``excluded_names.txt`` next to the
echogram root (one name per line) or programmatically through
``get_echograms(excluded_names=...)``.
"""

from __future__ import annotations

import os

# populated per deployment; empty by default
depth_excluded_echograms: list = []


def load_exclusion_file(path_to_echograms) -> list:
    """Read ``excluded_names.txt`` from an echogram root if present."""
    path = os.path.join(str(path_to_echograms), "excluded_names.txt")
    if not os.path.isfile(path):
        return list(depth_excluded_echograms)
    with open(path) as f:
        names = [line.strip() for line in f if line.strip()
                 and not line.startswith("#")]
    return list(depth_excluded_echograms) + names
