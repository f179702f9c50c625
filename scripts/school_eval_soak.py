"""Streaming-detector scale check (host-only, no TPU).

Feeds a synthetic 50k-ping x 1000-range sandeel probability stream —
generated chunk-by-chunk, never materialized dense — through
pipeline/school_eval.StreamingDetector and reports wall time, peak RSS
delta and detection count, then cross-checks a slice of the stream
against the dense path.

Run:  python scripts/school_eval_soak.py [n_pings]
"""

import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crimac_unet_tpu.pipeline.school_eval import (StreamingDetector,
                                                  detect_schools)

N_RANGE = 1000
CHUNK = 1000


def chunk_probs(rng, x0, w):
    """Speckle + a few coherent blobs per chunk (blobs are chunk-local;
    cross-border connectivity comes from the dense speckle field)."""
    probs = np.where(rng.rand(N_RANGE, w) < 0.02,
                     rng.uniform(0.5, 1.0, (N_RANGE, w)),
                     0.0).astype(np.float32)
    for _ in range(6):
        y, x = rng.randint(0, N_RANGE - 12), rng.randint(0, w - 12)
        probs[y:y + rng.randint(3, 12), x:x + rng.randint(3, 12)] = \
            rng.uniform(0.6, 1.0)
    return probs


def main():
    n_pings = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    rng = np.random.RandomState(0)
    det = StreamingDetector(0.5, min_area=2)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    for x0 in range(0, n_pings, CHUNK):
        det.add_chunk(chunk_probs(rng, x0, min(CHUNK, n_pings - x0)), x0)
    dets = det.finalize()
    dt = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(f"streamed {n_pings} pings x {N_RANGE} range "
          f"({n_pings * N_RANGE / 1e6:.0f} Mpx, dense would be "
          f"{n_pings * N_RANGE * 4 / 1e9:.1f} GB f32): "
          f"{len(dets)} detections in {dt:.1f}s, "
          f"{n_pings / dt:.0f} pings/s, peak-RSS delta "
          f"{(rss1 - rss0) / 1024:.0f} MB")

    # correctness cross-check on a dense-feasible slice with the SAME
    # generator (includes cross-chunk components)
    rng = np.random.RandomState(0)
    W = 4000
    sl = np.concatenate([chunk_probs(rng, x0, CHUNK)
                         for x0 in range(0, W, CHUNK)], axis=1)
    det2 = StreamingDetector(0.5, min_area=2)
    for x0 in range(0, W, CHUNK):
        det2.add_chunk(sl[:, x0:x0 + CHUNK], x0)
    key = lambda d: (tuple(d["bounding_box"]), d["n_pixels"])
    a = sorted(map(key, det2.finalize()))
    b = sorted(map(key, detect_schools(sl, 0.5, min_area=2)))
    assert a == b, "streamed != dense on the cross-check slice"
    print(f"cross-check: streamed == dense on {W}-ping slice "
          f"({len(a)} detections)")


if __name__ == "__main__":
    main()
