"""AOT serving export: the inference forward as a portable StableHLO
artifact (``jax.export``).

The reference's deployment story is a Docker image that runs its full
torch pipeline end-to-end (reference dockerscript.py, Dockerfile); the
model cannot leave the Python/torch stack.  This module lowers the
trained serving forward ONCE — non-finite scrub -> dB transform with
limits -> BatchNorm-folded U-Net (bf16 MXU compute) -> softmax — and
serializes it to bytes.  The artifact is self-contained (weights are
embedded as constants): any process with jax installed can deserialize
and run it on TPU or CPU with no flax, no model source, and no
checkpoint parsing, and the batch dimension is symbolic so one artifact
serves any batch size.

Input contract: NHWC patches ``(batch, *patch_size,
len(frequencies))``, frequency channels in ascending order (the reader
contract); metadata models (``meta_channels`` / ``late_meta_inject``)
export as TWO-input artifacts with a second float32 NHWC meta input of
``get_in_channels`` channels (build it with the live runner's meta laws,
inference.py ``_build_meta_inputs``); the acoustic input DTYPE follows
the config's ``transfer_dtype`` —
float32 raw sv (export default: exact), bfloat16 raw sv (the live
runner's default h2d quantization, <=0.02 dB), or uint8 host-computed
dB codes (the serving preset; quantize with
``pipeline.inference._quantize_db_u8``).  Output: float32 softmax
probabilities ``(batch, *patch_size, 3)``, or — with ``output_dtype:
uint8`` (the serving preset's d2h quantization) — uint8 codes
``round(p * 255)`` of the same shape (dequantize with ``code / 255``;
|dprob| <= 1/510, DIVERGENCES.md "uint8 output codes") — the same
program as
``make_serving_forward`` (bit-equal, tests/test_export.py) and
``GriddedRunner``'s patch forward up to float reassociation in the
runner's ``lax.map``/sharding wrapper (assert_allclose atol=2e-7 in the
same tests).  One pipeline difference: memm-format surveys zero dB-space
pixels outside the data extent between the dB transform and the net
(``border_zero``, inference.py) — the artifact cannot reproduce that
(the mask is patch-position knowledge it does not receive), so it
matches the ZARR serving path; ``export_checkpoint`` warns on
``data_mode: memm`` configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# artifact header: identifies the format and pins the calling convention
# we wrote, so a loader failure is a clear error instead of a
# deserialization crash on arbitrary bytes
_MAGIC = b"CRIMACX1"


def make_serving_forward(model, variables, config):
    """(fn, folded_variables): the serving forward closed over nothing.

    ``fn(variables, x)`` — or ``fn(variables, x, meta)`` for metadata
    models — maps NHWC input patches to softmax
    probabilities with the exact predict-path semantics
    (pipeline/inference.py ``_net_db_input``: raw-sv inputs are scrubbed
    and dB-transformed; uint8 inputs — ``transfer_dtype: uint8``, the
    serving preset — are host-computed dB codes and only dequantize) +
    folded-BN eval forward + softmax.  BN is folded unless the model
    already runs bare convs or ``fold_bn: false``.  The artifact's input
    dtype follows ``transfer_dtype`` (see :func:`_export_input_dtype`),
    so a deployment host feeds the exported program exactly what the
    live GriddedRunner would put on device.
    """
    # mirror the runner's gate (inference.py: get_in_channels(...) > 0):
    # an all-false meta_channels dict is a plain no-meta model
    from ..data.meta_channels import get_in_channels, validate_meta_channels
    validate_meta_channels(config.get("meta_channels"))
    n_meta = get_in_channels(config.get("meta_channels"))
    late = bool(config.get("late_meta_inject"))
    if late and n_meta == 0:
        raise ValueError(
            "late_meta_inject with zero metadata channels cannot export "
            "(the model demands a meta input the config never produces — "
            "the live runner rejects this combination too)")
    from ..models.fold_bn import fold_for_serving
    model, folded = fold_for_serving(model, variables, config)
    od = str(config.get("output_dtype", "float16"))
    if od == "float32":
        raise ValueError(
            "output_dtype 'float32' is not a setting: the default "
            "('float16') artifact already RETURNS float32 softmax "
            "probabilities — 'float16' names the live pipeline's d2h/"
            "on-disk dtype, and the quantization to it happens only at "
            "the zarr write.  Use the default, or 'uint8' for "
            "round(p*255) codes.")
    if od not in ("float16", "uint8"):
        raise ValueError(f"output_dtype must be 'float16' or 'uint8', "
                         f"got {od!r}")

    def _tail(logits):
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if od == "uint8":
            # the serving preset's d2h probability quantization — ONE
            # shared law with the live path (inference._quantize_prob_u8):
            # codes round(p*255), dequant = code/255, half the output
            # bytes, |dprob| <= 1/510 (DIVERGENCES.md "uint8 output codes")
            from .inference import _quantize_prob_u8
            return _quantize_prob_u8(probs)
        return probs

    if n_meta > 0:
        # metadata artifact: TWO inputs — acoustic patches in
        # transfer_dtype plus float32 NHWC meta channels (the live path
        # never quantizes meta).  The host builds meta exactly like the
        # live runner (inference._build_meta_inputs laws).
        def fn(variables, x, meta):
            from .inference import _net_db_input
            d = _net_db_input(x, use_meta=True)
            if late:
                logits = model.apply(variables, d, meta=meta, train=False)
            else:
                logits = model.apply(
                    variables, jnp.concatenate([d, meta], axis=-1),
                    train=False)
            return _tail(logits)

        return fn, folded

    def fn(variables, x):
        # ONE shared input transform with the live predict/eval paths
        # (scrub + dB for raw sv; dequantize for uint8 dB codes)
        from .inference import _net_db_input
        d = _net_db_input(x, use_meta=False)
        logits = model.apply(variables, d, train=False)
        return _tail(logits)

    return fn, folded


def _export_input_dtype(config):
    """Artifact input dtype from ``transfer_dtype`` — float32 (exact,
    default for export), bfloat16 (the live default h2d quantization), or
    uint8 (the serving preset's host-computed dB codes)."""
    td = str(config.get("transfer_dtype", "float32"))
    table = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "uint8": jnp.uint8}
    if td not in table:
        raise ValueError(f"transfer_dtype must be one of {sorted(table)}, "
                         f"got {td!r}")
    return table[td]


def export_predictor(model, variables, config, *, batch=None,
                     platforms=None):
    """Lower + export the serving forward; returns ``jax.export.Exported``.

    batch: int for a fixed batch, None (default) for a symbolic batch
    dimension — one artifact serves every batch size.
    platforms: sequence of lowering platforms (e.g. ``("cpu", "tpu")``)
    for a cross-platform artifact; None lowers for the default backend
    only.
    """
    from jax import export as jexport

    from ..data.meta_channels import get_in_channels

    fn, folded = make_serving_forward(model, variables, config)
    wh, ww = (int(s) for s in config["patch_size"])
    n_ch = len(config["frequencies"])
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    x_spec = jax.ShapeDtypeStruct((b, wh, ww, n_ch),
                                  _export_input_dtype(config))
    n_meta = get_in_channels(config.get("meta_channels"))
    specs = (x_spec,) if n_meta == 0 else \
        (x_spec, jax.ShapeDtypeStruct((b, wh, ww, n_meta), jnp.float32))
    return _export(fn, folded, specs, platforms)


def export_slab_predictor(model, variables, config, *, platforms=None):
    """Export the fully-convolutional SLAB serving forward
    (``infer_mode: slab`` — README "Inference", DIVERGENCES.md).

    The U-Net is shape-agnostic, so one artifact serves WHOLE chunks of
    any geometry: batch, range, and ping dims are all symbolic, with
    range/ping constrained to multiples of ``2**(depth-1)`` (the
    pooling alignment the slab path pads to).  Feeding an unaligned
    shape fails at call time with a shape-constraint error rather than
    computing garbage.
    """
    from jax import export as jexport

    from ..data.meta_channels import get_in_channels

    fn, folded = make_serving_forward(model, variables, config)
    # pooling alignment comes from the MODEL's depth (the quantity the
    # slab path itself pads to, inference.py _predict_slab), not the
    # config — a config whose depth key disagrees with the model built
    # from it would constrain the artifact to the wrong multiples
    align = 2 ** (int(getattr(model, "depth", config.get("depth", 5)))
                  - 1)
    n_ch = len(config["frequencies"])
    b, h, w = jexport.symbolic_shape(f"b, {align}*h, {align}*w")
    x_spec = jax.ShapeDtypeStruct((b, h, w, n_ch),
                                  _export_input_dtype(config))
    n_meta = get_in_channels(config.get("meta_channels"))
    specs = (x_spec,) if n_meta == 0 else \
        (x_spec, jax.ShapeDtypeStruct((b, h, w, n_meta), jnp.float32))
    return _export(fn, folded, specs, platforms)


def _export(fn, folded, specs, platforms):
    """Shared lower/export tail for both artifact flavors; ``specs`` is
    the tuple of input ShapeDtypeStructs (acoustic patches, and the
    float32 meta channels for metadata artifacts)."""
    from jax import export as jexport

    jitted = jax.jit(lambda *xs: fn(folded, *xs))
    platforms = tuple(platforms) if platforms is not None else None
    return jexport.export(jitted, platforms=platforms)(*specs)


def save_exported(exported, path) -> None:
    """Serialize an ``Exported`` to ``path`` (self-contained bytes).

    Atomic (temp file + os.replace), like the checkpoint writer
    (engine.save_checkpoint): re-exporting over a live serving artifact
    or crashing mid-write must never leave a truncated file behind."""
    import os

    data = exported.serialize()
    path = str(path)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(data)
    os.replace(tmp, path)


def load_predictor(path):
    """Deserialize a saved artifact -> callable ``predict(x) -> probs``.

    Needs only jax (no flax / model source / checkpoint).  The callable
    is jitted; under multi-platform artifacts XLA picks the current
    default backend.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        header = f.read(len(_MAGIC))
        if header != _MAGIC:
            raise ValueError(
                f"{path} is not a crimac_unet_tpu export artifact "
                f"(missing {_MAGIC!r} header)")
        # read the payload straight into the one buffer deserialize
        # needs — a 31M-param artifact is >120 MB; slicing a whole-file
        # read would hold three copies at peak
        payload = bytearray(f.read())
    exported = jexport.deserialize(payload)
    return jax.jit(exported.call)


def export_checkpoint(checkpoint_path, config, out_path, *, batch=None,
                      platforms=None, mode="patch"):
    """One-call deployment export: checkpoint file -> serving artifact.

    Loads a framework msgpack checkpoint (or a reference ``.pt`` state
    dict — ``load_checkpoint`` handles both), builds the configured
    U-Net, and writes the serialized serving forward to ``out_path``.
    ``mode``: 'patch' (fixed ``patch_size`` windows, ``batch`` fixed or
    symbolic) or 'slab' (whole-chunk fully-convolutional, all dims
    symbolic — ``batch`` must be None).  Returns the ``Exported``.
    """
    from ..models.unet import build_unet
    from .engine import load_checkpoint

    payload = load_checkpoint(checkpoint_path)
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}
    model = build_unet(config)
    if config.get("data_mode") == "memm":
        import warnings
        warnings.warn(
            "exporting from a data_mode: memm config — the artifact "
            "reproduces the ZARR serving path; the memm predict path "
            "additionally zeroes dB-space pixels outside the data extent "
            "(border_zero), which the artifact cannot replicate, so "
            "probabilities near data boundaries will differ from the "
            "live memm runner", stacklevel=2)
    if mode == "slab":
        if batch is not None:
            raise ValueError(
                "mode='slab' artifacts have a symbolic batch dimension; "
                "a fixed --batch cannot be honored — drop it")
        exported = export_slab_predictor(model, variables, config,
                                         platforms=platforms)
    elif mode == "patch":
        exported = export_predictor(model, variables, config,
                                    batch=batch, platforms=platforms)
    else:
        raise ValueError(f"unknown export mode {mode!r}: "
                         "expected 'patch' or 'slab'")
    save_exported(exported, out_path)
    return exported


def main(argv=None):
    """CLI: checkpoint + config -> serving artifact.

    python -m crimac_unet_tpu.pipeline.export --yaml_path cfg.yaml \\
        --checkpoint_path best.msgpack --out unet.stablehlo \\
        [--batch N] [--platforms cpu tpu]
    """
    import argparse

    from ..config import load_yaml_config, parse_config_options

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--yaml_path", required=True)
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=None,
                   help="fixed batch size (default: symbolic)")
    p.add_argument("--mode", choices=("patch", "slab"), default="patch",
                   help="patch: fixed patch_size windows; slab: "
                        "whole-chunk fully-convolutional (symbolic "
                        "pooling-aligned range/ping dims)")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms, e.g. cpu tpu "
                        "(default: current backend)")
    args = p.parse_args(argv)
    config = parse_config_options(load_yaml_config(args.yaml_path))
    exported = export_checkpoint(args.checkpoint_path, config, args.out,
                                 batch=args.batch, mode=args.mode,
                                 platforms=args.platforms)
    import os
    size = os.path.getsize(args.out)
    print(f"wrote {args.out}: {size / 1e6:.1f} MB, "
          f"platforms {list(exported.platforms)}, "
          f"input {exported.in_avals[0].shape}")


if __name__ == "__main__":
    main()
