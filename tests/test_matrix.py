"""Configuration-matrix integration tests.

The serving surface is a cross-product of orthogonal knobs —
``data_mode`` (memm/zarr) x ``infer_mode`` (patch/slab) x ``static_grid``
x ``transfer_dtype`` (float32/bfloat16/uint8) x ``output_dtype``
(float16/uint8) x metadata injection (none/early/late) x mesh size —
and each knob's contract is proven in its own suite against the exact
baseline.  What those per-feature suites do NOT pin is the DEEP
combinations production configs actually run (config_serving.yaml turns
four knobs at once).  This module runs the full-survey predict path for
a battery of multi-knob combinations against the exact-parity baseline
(patch + float32 transfer + float16 output + per-chunk grids) and
asserts, per combo:

* it runs end-to-end (no shape/jit/meta plumbing error),
* chunk boundaries agree with the baseline split,
* the written-pixel mask obeys the combo's documented mask law
  (bit-identical, or zero-set growth only by the uint8-output rounding
  law), and
* probabilities stay within the combo's documented divergence bound
  (each cited to the measurement/test that established it).

Geometry is slab-aligned (patch 32, overlap 4 -> stride 24, depth 2 ->
alignment 2) so the slab combos sit in their documented
interior-parity regime (DIVERGENCES.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crimac_unet_tpu.data.fixtures import make_survey_dir, make_zarr_survey
from crimac_unet_tpu.data.memmap_reader import get_echograms
from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
from crimac_unet_tpu.models.unet import build_unet
from crimac_unet_tpu.ops import metrics as M
from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                evaluate_reader,
                                                predict_reader)

WH = WW = 32
OVERLAP = 4          # stride 24; depth 2 -> alignment 2: slab-aligned
PRELOAD = 70         # survey W=160 -> 3 chunks (exercises the tail chunk)

BASE_CFG = {"patch_size": [WH, WW], "patch_overlap": OVERLAP,
            "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
            "depth": 2, "start_filts": 4,
            # exact-parity baseline knobs (overridden per combo)
            "transfer_dtype": "float32", "output_dtype": "float16",
            "infer_mode": "patch", "static_grid": False}

_ON_CPU = jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="module")
def surveys(tmp_path_factory):
    root = tmp_path_factory.mktemp("matrix")
    sv = make_zarr_survey(root / "zarr", year=2017, n_echograms=1, H=90,
                          W=160, seed=41, n_schools=4)
    make_survey_dir(root / "memm", year=2017, n_echograms=2, H=90, W=80,
                    seed=43, n_schools=3)
    zarr_reader = DataReaderZarr(sv)
    memm_readers = get_echograms(years=[2017],
                                 path_to_echograms=str(root / "memm"),
                                 minimum_shape=WH)
    return zarr_reader, memm_readers


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_unet(BASE_CFG)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, WH, WW, 4)),
                   train=False)
    return model, v


def _full_predict(model, variables, reader, overrides):
    """Full-survey prediction under a config combo: list of
    (start, end, (2, n_range, w) float16) chunks."""
    runner = GriddedRunner(model, variables, dict(BASE_CFG, **overrides))
    return [(s, e, np.asarray(p, np.float32))
            for s, e, p, _ in predict_reader(runner, reader, PRELOAD)]


def _assert_combo(base, out, name, mask_law, mean_tol, max_tol):
    """Chunk-by-chunk comparison of a combo against the exact baseline."""
    assert len(out) == len(base) > 1, name
    for (s, e, p0), (s2, e2, p1) in zip(base, out):
        assert (s2, e2) == (s, e), name
        assert np.isfinite(p1).all(), name
        z0, z1 = p0 == 0, p1 == 0
        if mask_law == "equal":
            np.testing.assert_array_equal(z0, z1, err_msg=name)
        else:  # "grow-small": uint8 d2h codes — the zero set may only
            # grow, and only by pixels whose baseline probability is
            # within the combined transfer+output quantization envelope
            assert (p1[z0] == 0).all(), name
            extra = z1 & ~z0
            if extra.any():
                assert p0[extra].max() < max_tol + 0.5 / 255 + 1e-3, \
                    (name, p0[extra].max())
        written = ~z0 & ~z1
        assert written.any(), name
        d = np.abs(p0 - p1)[written]
        assert d.mean() <= mean_tol, (name, d.mean())
        assert d.max() <= max_tol, (name, d.max())


# Each combo: (name, config overrides, mask law, mean tol, max tol).
# Bounds cite the per-feature suite/measurement that established them:
#  * bfloat16 h2d: <=0.02 dB perturbation (test_transfer_dtype default)
#  * uint8 h2d: <=0.147 dB perturbation -> max<0.15, mean<0.01
#    (test_transfer_dtype_uint8_mode; BASELINE.md u8_bound)
#  * uint8 d2h: |dprob| <= 1/510 + f16 rounding (test_output_dtype_uint8)
#  * static_grid (patch): bit-identical on CPU
#    (test_static_grid_output_identical)
#  * slab @ aligned geometry: interior-exact, border-bounded
#    (test_slab_infer_mode_matches_patch_interior; trained-weights
#    end-metric bound |dF1| < 5e-6, BASELINE.md)
COMBOS = [
    ("bf16-static", dict(transfer_dtype="bfloat16", static_grid=True),
     "equal", 5e-3, 0.08),
    ("u8in-static", dict(transfer_dtype="uint8", static_grid=True),
     "equal", 0.01, 0.15),
    ("u8out-static", dict(output_dtype="uint8", static_grid=True),
     "grow-small", 2e-3, 0.5 / 255 + 1e-3),
    ("u8in-u8out", dict(transfer_dtype="uint8", output_dtype="uint8"),
     "grow-small", 0.012, 0.16),
    ("slab-static", dict(infer_mode="slab", static_grid=True),
     "equal", 0.02, 0.6),
    ("slab-bf16", dict(infer_mode="slab", transfer_dtype="bfloat16"),
     "equal", 0.02, 0.6),
    # the full serving stack (config_serving.yaml turns all four)
    ("serving-stack", dict(infer_mode="slab", static_grid=True,
                           transfer_dtype="uint8", output_dtype="uint8"),
     "grow-small", 0.03, 0.65),
    ("serving-stack-patch", dict(static_grid=True, transfer_dtype="uint8",
                                 output_dtype="uint8"),
     "grow-small", 0.012, 0.16),
]


@pytest.fixture(scope="module")
def zarr_baseline(surveys, model_and_vars):
    reader, _ = surveys
    model, v = model_and_vars
    return _full_predict(model, v, reader, {})


@pytest.mark.parametrize("name,ov,mask_law,mean_tol,max_tol",
                         COMBOS, ids=[c[0] for c in COMBOS])
def test_zarr_combo_matrix(surveys, model_and_vars, zarr_baseline, name, ov,
                           mask_law, mean_tol, max_tol):
    reader, _ = surveys
    model, v = model_and_vars
    out = _full_predict(model, v, reader, ov)
    _assert_combo(zarr_baseline, out, name, mask_law, mean_tol, max_tol)


def test_zarr_static_grid_bit_identical_on_cpu(surveys, model_and_vars,
                                               zarr_baseline):
    """static_grid alone (patch mode) is semantically bit-identical —
    on the CPU backend the float programs are bit-stable across the
    padded shapes, so the combo must reproduce the baseline EXACTLY."""
    if not _ON_CPU:
        pytest.skip("bit-identity only guaranteed on the CPU backend "
                    "(TPU conv tiling shifts f16-ulp under shape changes)")
    reader, _ = surveys
    model, v = model_and_vars
    out = _full_predict(model, v, reader, dict(static_grid=True))
    for (s, e, p0), (s2, e2, p1) in zip(zarr_baseline, out):
        np.testing.assert_array_equal(p0, p1)


def test_memm_serving_stack(surveys, model_and_vars):
    """The full serving stack on the MEMMAP format (exercises the
    border_zero branch + per-echogram readers under static_grid +
    quantized transfer both ways)."""
    _, memm_readers = surveys
    model, v = model_and_vars
    for ech in memm_readers:
        base = _full_predict(model, v, ech, {})
        out = _full_predict(model, v, ech, dict(
            infer_mode="slab", static_grid=True,
            transfer_dtype="uint8", output_dtype="uint8"))
        _assert_combo(base, out, "memm-serving-stack", "grow-small",
                      0.03, 0.65)


@pytest.mark.parametrize("late", [False, True],
                         ids=["early-meta", "late-meta"])
def test_meta_serving_stack(surveys, model_and_vars, late):
    """Metadata models under the full serving stack: early-concat and
    late-MLP injection composed with slab + static_grid + uint8 h2d.
    (uint8 d2h is orthogonal to meta and covered above; the meta
    channels themselves always ride float32 — only the acoustic slab is
    quantized, data/meta_channels.py.)"""
    from crimac_unet_tpu.data.meta_channels import get_in_channels
    _, memm_readers = surveys
    meta = {"portion_year": True, "portion_day": False, "depth_rel": True,
            "depth_abs_surface": True, "depth_abs_seabed": True,
            "time_diff": True}
    cfg = dict(BASE_CFG, meta_channels=meta, late_meta_inject=late)
    model = build_unet(cfg)
    Mc = get_in_channels(meta)
    if late:
        v = model.init(jax.random.PRNGKey(9), jnp.zeros((1, WH, WW, 4)),
                       meta=jnp.zeros((1, WH, WW, Mc)), train=False)
    else:
        v = model.init(jax.random.PRNGKey(9),
                       jnp.zeros((1, WH, WW, 4 + Mc)), train=False)
    ech = memm_readers[0]
    base = [(s, e, np.asarray(p, np.float32)) for s, e, p, _ in
            predict_reader(GriddedRunner(model, v, cfg), ech, PRELOAD)]
    out = [(s, e, np.asarray(p, np.float32)) for s, e, p, _ in
           predict_reader(GriddedRunner(model, v, dict(
               cfg, infer_mode="slab", static_grid=True,
               transfer_dtype="uint8")), ech, PRELOAD)]
    _assert_combo(base, out, f"meta-serving late={late}", "equal",
                  0.03, 0.65)


def test_mesh_serving_stack(surveys, model_and_vars, zarr_baseline):
    """The serving stack on an 8-device mesh (sequence-parallel slab +
    static_grid + uint8 both ways): sharding must not move outputs
    beyond the single-device serving stack's own envelope."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    reader, _ = surveys
    model, v = model_and_vars
    single = _full_predict(model, v, reader, dict(
        infer_mode="slab", static_grid=True,
        transfer_dtype="uint8", output_dtype="uint8"))
    sharded = _full_predict(model, v, reader, dict(
        infer_mode="slab", static_grid=True,
        transfer_dtype="uint8", output_dtype="uint8", mesh_devices=8))
    for (s, e, p0), (s2, e2, p1) in zip(single, sharded):
        assert (s2, e2) == (s, e)
        # same math, same values: GSPMD halo exchanges are exact on CPU;
        # uint8 lattices collapse any sub-ulp drift to code equality
        if _ON_CPU:
            np.testing.assert_array_equal(p0, p1)
        else:
            np.testing.assert_allclose(p0, p1, atol=1 / 255 + 1e-3)


@pytest.mark.parametrize("eval_mode", ["all", "region", "trace"])
def test_eval_mode_transfer_dtype_matrix(surveys, model_and_vars,
                                         eval_mode):
    """Quantized-transfer evaluation across ALL THREE eval modes: the
    label chain (and hence the scored-pixel selection and class split)
    is bit-exact under any transfer_dtype — proven for 'all' in
    test_eval_parity; region/trace additionally thread the keep mask
    through the quantized path."""
    reader, _ = surveys
    model, v = model_and_vars
    hists = {}
    for td in ("float32", "uint8"):
        runner = GriddedRunner(model, v, dict(BASE_CFG, transfer_dtype=td))
        h = evaluate_reader(runner, reader, M.new_histogram(),
                            eval_mode=eval_mode, chunk_cols=4)
        hists[td] = np.asarray(h).astype(np.int64)
    f32, u8 = hists["float32"], hists["uint8"]
    assert f32.sum() > 0
    # scored-pixel count and positive/negative split identical: only
    # the PROBABILITY each pixel lands on may move under quantization
    np.testing.assert_array_equal(f32.sum(axis=1), u8.sum(axis=1))
    # and the probability movement stays inside the u8 envelope: compare
    # max-F1 of the two curves
    f1a, _ = M.max_f1(M.pr_curve_from_histogram(f32))
    f1b, _ = M.max_f1(M.pr_curve_from_histogram(u8))
    assert abs(f1a - f1b) < 0.05, (f1a, f1b)
