"""Executable walkthrough of the raw-data onboarding chain:
EK60 .raw (+ .bot bottom + LSSS .snap labels) -> .mat-contract arrays ->
memmap echogram dir -> Echogram reader (the pipeline the reference runs
through ~940 LoC of offline MATLAB, data_preprocessing/generate_mat_*.m).

Runs self-contained on synthetic datagram streams:

    python -m crimac_unet_tpu.examples.example_ek60_onboarding
"""

import os
import sys
import tempfile

import numpy as np


def main(argv=None):
    from ..data import ek60
    from ..data.mat_to_memmap import convert_mat_file
    from ..data.memmap_reader import Echogram

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    times = 1.5e9 + np.arange(40) * 1.0

    # 1. synthesize a raw survey file trio (in production these come from
    #    the echosounder + LSSS interpretation)
    sv = rng.lognormal(np.log(1e-6), 1.0, (80, 40, 4))
    raw = ek60.write_raw_fixture(os.path.join(tmp, "demo.raw"), sv,
                                 [18, 38, 120, 200], times,
                                 heave=0.2 * rng.randn(40))
    dr = 1500.0 * 1e-4 / 2.0
    bot = ek60.write_bot_fixture(os.path.join(tmp, "demo.bot"), times,
                                 np.full((40, 4), 70 * dr))
    snap = ek60.write_snap_fixture(os.path.join(tmp, "demo.snap"), [{
        "x": [5, 20, 20, 5],
        "y": np.array([20 * dr, 20 * dr, 40 * dr, 40 * dr]) + 5.0,
        "species": [(27, 1.0)],
    }])
    print("raw bytes:", os.path.getsize(raw), "| bot:",
          os.path.getsize(bot), "| snap:", os.path.getsize(snap))

    # 2. parse + convert + assemble onto the common grid
    arrays = ek60.raw_to_arrays(raw, bot_path=bot, snap_path=snap,
                                range_frequency=200)
    print("keys:", sorted(arrays))
    print("sv:", arrays["sv"].shape, "| labeled px:",
          int((arrays["I"] > 0).sum()), "| range max:",
          float(arrays["range"][-1]))

    # 3. write the .mat contract and feed the memmap converter
    mat = ek60.raw_to_matfile(raw, os.path.join(tmp, "demo.mat"),
                              bot_path=bot, snap_path=snap,
                              range_frequency=200)
    out_dir = os.path.join(tmp, "2017843-D20170427-T062615")
    os.makedirs(out_dir)
    n_schools = convert_mat_file(mat, out_dir)
    print("converted to", out_dir, "| school objects:", n_schools)

    # 4. the result is a standard echogram dir
    e = Echogram(out_dir)
    print("Echogram shape (range, ping):", e.shape, "| freqs:",
          list(e.frequencies.astype(int)))
    print("seabed row at ping 0:", int(e.get_seabed(0, 1)[0]))
    return e


if __name__ == "__main__":
    main(sys.argv[1:])
