"""Class indices and sentinel label values.

Values match the reference contract (crimac_unet/constants.py:19-33) exactly:
the sentinel algebra (which negative code wins where) is load-bearing for
loss masking, metric masking, and prediction stitching.
"""

# Class indices
BACKGROUND = 0
SANDEEL = 1
OTHER = 2

N_CLASSES = 3

# Sentinel label values (all negative, never valid classes)
LABEL_IGNORE_VAL = -100          # generic "do not train / do not score"
LABEL_BOUNDARY_VAL = -100        # crop extends outside the data array
LABEL_OVERLAP_VAL = -70          # overlap frame between neighbouring grid patches
LABEL_SEABED_MASK_VAL = -50      # below the (padded) seabed line
LABEL_REFINE_BOUNDARY_VAL = -30  # low-frequency-response pixels inside schools
LABEL_UNUSED_SPECIES = -10       # species the model is not trained on

# Fill value for data pixels outside the data array (before the dB transform)
DATA_BOUNDARY_VAL = 0.0

# Raw annotation category codes on disk (zarr labels / memmap labels.dat)
RAW_BACKGROUND = 0
RAW_SANDEEL = 27
RAW_OTHER = 1

# Default acoustic channels (kHz)
DEFAULT_FREQUENCIES = (18, 38, 120, 200)

# Pixels added below the seabed line when masking (reference
# batch/label_transforms/mask_label_seabed.py:59 `seabed_pad=10`)
SEABED_PAD = 10


# the reference config spells the trace eval mode 'fish'
# (evaluate.py CLI); shared by pipeline/evaluate.py and data/partition.py
# so the synonym cannot drift (review finding r3)
EVAL_MODE_MAP = {"all": "all", "region": "region", "fish": "trace",
                 "trace": "trace"}
