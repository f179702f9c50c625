"""Reference-name compatibility layer.

Users migrating from `CRIMAC-classifiers-unet` can import the familiar
names from here; each maps to this framework's equivalent (see SURVEY.md §2
for the component mapping and DIVERGENCES.md for behavioral notes).
"""

# L0 — config / paths
from .config import (config_args_to_markdown, get_argparse_parser,
                     get_experiment_name_from_args, load_yaml_config,
                     parse_config_options)
from .utils.general import fix_seeds, get_datetime_str

# L1 — readers
from .data.memmap_reader import Echogram, get_echograms
from .data.zarr_reader import DataReaderZarr, get_zarr_readers


def get_data_readers(years="all", frequencies=(18, 38, 120, 200),
                     minimum_shape=50, mode="zarr", **kw):
    """(reference data/data_reader.py:1190-1194)"""
    if mode == "memm":
        return get_echograms(years=years, frequencies=frequencies,
                             minimum_shape=minimum_shape, **kw)
    return get_zarr_readers(years, frequencies, minimum_shape, **kw)


# L2 — partitioning
from .data.partition import DataMemm, DataZarr

# L3 — samplers
from .data.samplers import (Background, BackgroundSeabed,
                            BackgroundSeabedZarr, BackgroundZarr, Gridded,
                            School, SchoolSeabed, SchoolSeabedZarr,
                            SchoolZarr, Seabed, SeabedZarr)
from .ops.patches import grid_centers as get_data_grid_centers

# L4 — dataset / transforms (host batch production + device ops)
from .data.dataset import BatchPrefetcher, RandomPatchDataset as Dataset
from .ops import augment, data_ops, label_ops
from .ops.data_ops import (db, db_with_limits, db_with_limits_scaled,
                           remove_nan_inf, set_data_border_value)
from .ops.label_ops import (convert_label_indexing, mask_label_overlap,
                            mask_label_seabed, refine_label_boundary,
                            set_label_ignore_val)

# L5 — models
from .models.unet import UNet, UNet as UNet_Baseline, build_unet
from .models.torch_import import (load_torch_checkpoint,
                                  torch_state_dict_to_flax)

# L6 — pipeline engine
from .pipeline.segpipe import SegPipeUNet
from .pipeline.inference import (GriddedRunner, evaluate_reader,
                                 predict_reader,
                                 save_reader_predictions_memm,
                                 save_survey_predictions_zarr)
from .data.meta_channels import get_in_channels

# aux
from .utils.combine_functions import CombineFunctions
from .utils.preload_split import get_data_split
from .utils.interp import (get_grid as getGrid, linear_interpolation,
                           nearest_interpolation)
from .utils.grids import patch_coord_to_data_coord, random_point_containing
