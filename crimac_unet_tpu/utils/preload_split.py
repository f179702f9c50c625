"""Ping-range chunking for chunked sliding-window processing.

Matches reference utils/preload_data_split.py:22-30: near-equal linspace
splits of each valid range, each at most ``max_n_pings`` wide.
"""

from __future__ import annotations

import numpy as np


def get_data_split(valid_pings_ranges, max_n_pings: int = 1000) -> np.ndarray:
    splits = []
    for start, end in valid_pings_ranges:
        n_splits = np.ceil((end - start) / max_n_pings)
        split_range = np.linspace(start, end, int(n_splits + 1)).astype(int)
        splits.extend([[split_range[i], split_range[i + 1]]
                       for i in range(len(split_range) - 1)])
    return np.array(splits)
