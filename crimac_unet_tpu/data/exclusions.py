"""Curated bad-file exclusion lists.

Counterpart of reference data/missing_korona_depth_measurements.py:5-41.
The concrete echogram names below are a data contract — they reproduce the
paper's data selection (echograms whose Korona/LSSS depth-measurement files
are missing or have shapes deviating from the echogram), so they are kept
verbatim like the constants table.  Deployments can extend the list via
``excluded_names.txt`` next to the echogram root (one name per line) or
programmatically through ``get_echograms(excluded_names=...)``.
"""

from __future__ import annotations

import os

# Missing Korona depth measurement files
# (reference missing_korona_depth_measurements.py:4-21)
depths_missing = [
    "2009107-D20090509-T133323",
    "2009107-D20090511-T064417",
    "2009107-D20090512-T193310",
    "2009107-D20090518-T185324",
    "2010205-D20100421-T022743",
    "2010205-D20100421-T183034",
    "2010205-D20100424-T053033",
    "2010205-D20100424-T105017",
    "2010205-D20100503-T071455",
    "2010205-D20100505-T132336",
    "2010205-D20100506-T071245",
    "2010205-D20100507-T075742",
    "2010205-D20100507-T155257",
    "2010205-D20100509-T193347",
    "2017843-D20170502-T064950",
    "2017843-D20170502-T073220",
]

# Depth measurement files whose shape deviates from the echogram shape
# (reference missing_korona_depth_measurements.py:24-37)
depths_shape_discrepancies = [
    "2008205-D20080513-T215110",
    "2008205-D20080514-T224500",
    "2008205-D20080515-T060032",
    "2010205-D20100422-T073220",
    "2010205-D20100423-T121059",
    "2010205-D20100426-T153105",
    "2010205-D20100429-T080945",
    "2010205-D20100429-T170312",
    "2010205-D20100508-T191340",
    "2018823-D20180503-T075932",
    "2018823-D20180506-T130501",
    "2018823-D20180513-T035302",
]

# Combined default exclusion list (reference :40-41): these echograms are
# excluded when building memmap reader sets.
depth_excluded_echograms: list = depths_missing + depths_shape_discrepancies


def load_exclusion_file(path_to_echograms) -> list:
    """Curated defaults + ``excluded_names.txt`` from an echogram root."""
    path = os.path.join(str(path_to_echograms), "excluded_names.txt")
    if not os.path.isfile(path):
        return list(depth_excluded_echograms)
    with open(path) as f:
        names = [s for s in (line.strip() for line in f)
                 if s and not s.startswith("#")]
    return list(depth_excluded_echograms) + names
