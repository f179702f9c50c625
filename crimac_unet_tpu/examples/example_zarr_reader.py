"""Executable walkthrough of the zarr survey reader
(counterpart of reference examples/example_zarr_reader.py:25-63).

Runs self-contained on a synthetic survey:

    python -m crimac_unet_tpu.examples.example_zarr_reader [survey_sv.zarr]
"""

import sys
import tempfile

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if argv:
        sv_path = argv[0]
    else:
        from ..data.fixtures import make_zarr_survey
        tmp = tempfile.mkdtemp()
        sv_path = make_zarr_survey(tmp, year=2017, n_echograms=2, H=100,
                                   W=300, seed=0)
        print(f"(no survey given; generated a synthetic one at {sv_path})")

    from ..data.zarr_reader import DataReaderZarr
    reader = DataReaderZarr(sv_path)

    print("Survey:", reader.name, "| year:", reader.year)
    print("Shape (pings, range):", reader.shape)
    print("Frequencies:", list(reader.frequencies))
    print("Fish categories:", reader.fish_categories)
    print("Valid ping ranges:", reader.get_valid_pings().tolist())

    slab = reader.get_data_slice(idx_ping=0, n_pings=min(100,
                                                         reader.shape[0]))
    print("Data slice (freq, ping, range):", slab.shape,
          "| sv range: %.3g .. %.3g" % (np.nanmin(slab), np.nanmax(slab)))

    labels = reader.get_label_slice(0, min(100, reader.shape[0]))
    uniq, counts = np.unique(labels[np.isfinite(labels)],
                             return_counts=True)
    print("Label histogram:", dict(zip(uniq.tolist(), counts.tolist())))

    seabed = reader.get_seabed(0, min(100, reader.shape[0]))
    print("Seabed rows (first 10 pings):", seabed[:10].tolist())

    schools = reader.get_fish_schools()
    print(f"{len(schools)} valid schools; first rows:")
    print(schools.head(3).to_string())


if __name__ == "__main__":
    main()
