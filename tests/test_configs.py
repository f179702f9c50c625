"""The shipped YAML presets: loadable, reference-key-complete, honest.

The baseline preset mirrors the reference YAML key-for-key
(crimac_unet/configs/config_baseline.yaml:1-74); the serving preset must
differ from it ONLY in the keys its header documents — anything else
drifting silently would ship an undocumented behavior change."""

from pathlib import Path

import yaml

from crimac_unet_tpu.config import CONFIG_DEFAULTS, load_yaml_config

CONFIGS = Path(__file__).resolve().parent.parent / \
    "crimac_unet_tpu" / "configs"

# every key of the reference YAML (SURVEY.md §2 "Baseline config")
REFERENCE_KEYS = {
    "random_seed", "frequencies", "data_mode", "num_workers", "patch_size",
    "meta_channels", "late_meta_inject", "loss_type", "batch_size", "lr",
    "lr_reduction", "momentum", "test_iter", "log_step", "lr_step",
    "iterations", "partition_train", "train_surveys", "validation_surveys",
    "save_model_params", "eval_mode", "partition_predict",
    "evaluation_surveys", "labels_available", "patch_overlap",
    "preload_n_pings", "save_prediction_surveys", "resume_writing",
    "save_labels",
}


def test_baseline_config_loads_and_covers_reference_keys():
    cfg = load_yaml_config(CONFIGS / "config_baseline.yaml")
    missing = REFERENCE_KEYS - set(cfg)
    assert not missing, missing
    # reference values preserved (spot contract, config_baseline.yaml:5-40)
    assert cfg["frequencies"] == [18, 38, 120, 200]
    assert cfg["patch_size"] == [256, 256]
    assert cfg["patch_overlap"] == 20
    assert cfg["preload_n_pings"] == 1000
    assert (cfg["batch_size"], cfg["lr"], cfg["momentum"]) == (4, 0.005, 0.95)
    # defaults stay in sync with the shipped baseline where both define a key
    for k, v in CONFIG_DEFAULTS.items():
        if k in cfg and k not in ("partition_predict",):
            assert cfg[k] == v, (k, cfg[k], v)


def test_serving_preset_differs_only_in_documented_keys():
    base = load_yaml_config(CONFIGS / "config_baseline.yaml")
    serving = load_yaml_config(CONFIGS / "config_serving.yaml")
    assert REFERENCE_KEYS <= set(serving)
    documented = {"infer_mode", "static_grid", "save_labels", "data_mode",
                  "resume_writing", "transfer_dtype", "output_dtype",
                  "alignment_warning"}
    diff = {k for k in set(base) | set(serving)
            if base.get(k) != serving.get(k)}
    assert diff <= documented, diff - documented
    assert serving["infer_mode"] == "slab"
    assert serving["static_grid"] is True
    assert serving["save_labels"] is False
    # serving ships 8-bit dB-code transfers AND 8-bit probability codes
    # back (measured bounds in DIVERGENCES.md / scripts/u8_bound.py);
    # baseline stays bfloat16 in / float16 out
    assert serving["transfer_dtype"] == "uint8"
    assert serving["output_dtype"] == "uint8"
    assert base["transfer_dtype"] == "bfloat16"
    assert base["output_dtype"] == "float16"
    # the tiling contract (and with it the measured |dF1| < 5e-6 bound
    # geometry) is unchanged
    assert serving["patch_size"] == base["patch_size"]
    assert serving["patch_overlap"] == base["patch_overlap"]
    # the r4 trained-weights tiling A/B (overlap 16 vs 20 at this exact
    # preset: no accuracy/extent/speed benefit from alignment) lets the
    # preset opt out of the per-run misalignment warning
    assert serving["alignment_warning"] is False


def test_serving_preset_runner_does_not_warn():
    """Building the serving-preset runner fires NO misalignment warning
    (VERDICT r3 #5: the preset paid a warning tax on every run), while a
    plain slab config at the same tiling still warns — the guard stays
    for anyone who did not read the A/B."""
    import warnings

    import jax
    import jax.numpy as jnp

    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import GriddedRunner

    serving = load_yaml_config(CONFIGS / "config_serving.yaml")
    cfg = dict(serving, depth=2, start_filts=4, mesh_devices=1)
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, 32, 4)), train=False)
    # odd overlap: misaligned at ANY depth (the tiny depth-2 model used
    # here has alignment 2, which the preset's own 20/216 satisfies — a
    # no-warning check at the preset geometry would be vacuous), so BOTH
    # arms below genuinely exercise the warning predicate and only the
    # alignment_warning flag differs
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        GriddedRunner(model, v, dict(cfg, patch_overlap=5))
    assert not any("misaligned" in str(x.message) for x in w), \
        [str(x.message) for x in w]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        GriddedRunner(model, v, dict(cfg, alignment_warning=True,
                                     patch_overlap=5))
    assert any("misaligned" in str(x.message) for x in w)


def test_fast_train_preset_is_the_rescaled_reference_recipe():
    """config_fast_train.yaml: the reference recipe at batch 16 with the
    IDENTICAL sample budget and proportionally rescaled schedule (measured
    F1-parity 1.66x wall win, scripts/fast_recipe.py / BASELINE.md r3).
    Every invariant of the rescaling is asserted so the preset cannot
    drift into a different training semantics silently."""
    base = load_yaml_config(CONFIGS / "config_baseline.yaml")
    fast = load_yaml_config(CONFIGS / "config_fast_train.yaml")
    assert REFERENCE_KEYS <= set(fast)
    documented = {"batch_size", "lr", "iterations", "lr_step", "log_step",
                  "test_iter"}
    diff = {k for k in set(base) | set(fast) if base.get(k) != fast.get(k)}
    assert diff <= documented, diff - documented
    scale = fast["batch_size"] // base["batch_size"]
    assert scale == 4
    # equal sample budget, equal decay-per-sample, same validation
    # cadence and pixel count, linear LR scaling
    assert fast["iterations"] * fast["batch_size"] == \
        base["iterations"] * base["batch_size"]
    assert fast["lr_step"] * scale == base["lr_step"]
    assert fast["log_step"] * scale == base["log_step"]
    assert fast["test_iter"] * scale == base["test_iter"]
    # sqrt LR scaling (r5): linear (lr * scale) proved unstable at these
    # class weights — two draws at F1 0.651/0.669 vs sqrt's 0.7236
    # (docs/SESSIONS.md round 5); sqrt(4) == 2
    assert fast["lr"] == base["lr"] * 2


def test_meta_train_preset_differs_only_in_meta_channels():
    """config_meta_train.yaml: the baseline recipe with the six metadata
    channel families enabled (early injection) — nothing else may drift."""
    base = load_yaml_config(CONFIGS / "config_baseline.yaml")
    meta = load_yaml_config(CONFIGS / "config_meta_train.yaml")
    assert REFERENCE_KEYS <= set(meta)
    diff = {k for k in set(base) | set(meta) if base.get(k) != meta.get(k)}
    assert diff == {"meta_channels"}, diff
    from crimac_unet_tpu.data.meta_channels import (META_CHANNEL_KEYS,
                                                    get_in_channels,
                                                    validate_meta_channels)
    validate_meta_channels(meta["meta_channels"])
    assert set(meta["meta_channels"]) == META_CHANNEL_KEYS
    assert all(meta["meta_channels"].values())
    assert get_in_channels(meta["meta_channels"]) == 7
    assert meta["late_meta_inject"] is False
    assert meta["data_mode"] == "memm"  # metadata is memmap-only


def test_yaml_roundtrip_keys_are_plain_scalars():
    """Presets must survive yaml.safe_load/safe_dump untouched (the CLI
    writes merged configs back out for experiment provenance)."""
    for name in ("config_baseline.yaml", "config_serving.yaml",
                 "config_fast_train.yaml"):
        cfg = load_yaml_config(CONFIGS / name)
        again = yaml.safe_load(yaml.safe_dump(cfg))
        assert again == cfg, name
