"""Import reference PyTorch ``.pt`` checkpoints into the Flax U-Net.

The reference ships production weights as plain ``state_dict`` files
(e.g. ``paper_v2_heave_2.pt``, reference README.md:96; saved at
pipeline.py:199-203/:336-341).  This maps their parameter naming

    down_convs.{i}.main.{0,3}   conv weights      -> down{i}/unit{1,2}/conv
    down_convs.{i}.main.{1,4}   batchnorm         -> down{i}/unit{1,2}/bn
    up_convs.{i}.{upconv,conv1,conv2,bn1,bn2}     -> up{i}/...
    conv_final                                    -> conv_final
    post_processing_weights.main.{0,2,4}          -> meta_mlp/fc{1,2,3}

onto our NHWC module tree, with layout conversion:
  Conv2d          (O, I, kh, kw) -> (kh, kw, I, O)
  ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O) spatially flipped
  Linear          (O, I)         -> (I, O)
"""

from __future__ import annotations

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[prefix + ".bias"])}


def _convT(sd, prefix):
    # torch ConvTranspose2d correlates with the kernel spatially flipped
    # relative to flax.linen.ConvTranspose; flip kh/kw to compensate
    # (verified numerically in tests/test_model.py).
    kernel = _np(sd[prefix + ".weight"]).transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(kernel),
            "bias": _np(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    params = {"scale": _np(sd[prefix + ".weight"]),
              "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def _dense(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).T,
            "bias": _np(sd[prefix + ".bias"])}


def torch_state_dict_to_flax(sd: dict) -> dict:
    """-> {'params': ..., 'batch_stats': ...} variables for models.unet.UNet."""
    depth = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("down_convs."))
    params: dict = {}
    stats: dict = {}

    for i in range(depth):
        p = f"down_convs.{i}.main"
        u1_bn_p, u1_bn_s = _bn(sd, f"{p}.1")
        u2_bn_p, u2_bn_s = _bn(sd, f"{p}.4")
        params[f"down{i}"] = {"unit1": {"conv": _conv(sd, f"{p}.0"),
                                        "bn": u1_bn_p},
                              "unit2": {"conv": _conv(sd, f"{p}.3"),
                                        "bn": u2_bn_p}}
        stats[f"down{i}"] = {"unit1": {"bn": u1_bn_s},
                             "unit2": {"bn": u2_bn_s}}

    for i in range(depth - 1):
        p = f"up_convs.{i}"
        bn1_p, bn1_s = _bn(sd, f"{p}.bn1")
        bn2_p, bn2_s = _bn(sd, f"{p}.bn2")
        params[f"up{i}"] = {"upconv": _convT(sd, f"{p}.upconv"),
                            "unit1": {"conv": _conv(sd, f"{p}.conv1"),
                                      "bn": bn1_p},
                            "unit2": {"conv": _conv(sd, f"{p}.conv2"),
                                      "bn": bn2_p}}
        stats[f"up{i}"] = {"unit1": {"bn": bn1_s}, "unit2": {"bn": bn2_s}}

    params["conv_final"] = _conv(sd, "conv_final")

    if any(k.startswith("post_processing_weights") for k in sd):
        params["meta_mlp"] = {
            "fc1": _dense(sd, "post_processing_weights.main.0"),
            "fc2": _dense(sd, "post_processing_weights.main.2"),
            "fc3": _dense(sd, "post_processing_weights.main.4"),
        }

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path) -> dict:
    """Load a reference ``.pt`` state_dict file (requires torch)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_flax(sd)


# ================================================================== export
def flax_to_torch_state_dict(variables: dict) -> dict:
    """Inverse of :func:`torch_state_dict_to_flax`: export our Flax
    variables to the reference's ``state_dict`` naming/layout so a model
    trained HERE can be deployed with the reference torch pipeline
    (``UNet_Baseline``/``UNet_LateMetInject.load_state_dict``,
    reference pipeline.py:109-130).  Returns plain numpy arrays; pass
    through ``save_torch_checkpoint`` to write a loadable ``.pt``.

    Requires unfolded BatchNorm variables (params + batch_stats), i.e. a
    training checkpoint — a BN-folded serving parameter tree has no
    torch equivalent."""
    params = variables["params"]
    stats = variables.get("batch_stats") or {}
    if not stats:
        raise ValueError(
            "flax_to_torch_state_dict needs unfolded batch_stats (a "
            "training checkpoint); BN-folded serving params cannot be "
            "exported to the reference's state_dict format")
    sd: dict = {}

    def put_conv(prefix, p):
        sd[prefix + ".weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"], np.float32).transpose(3, 2, 0, 1))
        sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)

    def put_convT(prefix, p):
        k = np.asarray(p["kernel"], np.float32)[::-1, ::-1]
        sd[prefix + ".weight"] = np.ascontiguousarray(
            k.transpose(2, 3, 0, 1))
        sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)

    def put_bn(prefix, p, s):
        sd[prefix + ".weight"] = np.asarray(p["scale"], np.float32)
        sd[prefix + ".bias"] = np.asarray(p["bias"], np.float32)
        sd[prefix + ".running_mean"] = np.asarray(s["mean"], np.float32)
        sd[prefix + ".running_var"] = np.asarray(s["var"], np.float32)
        # torch tracks batch count; the reference never reads it but
        # load_state_dict(strict=True) requires the key
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

    depth = 1 + max(int(k[4:]) for k in params if k.startswith("down"))
    for i in range(depth):
        fp, fs = params[f"down{i}"], stats[f"down{i}"]
        p = f"down_convs.{i}.main"
        put_conv(f"{p}.0", fp["unit1"]["conv"])
        put_bn(f"{p}.1", fp["unit1"]["bn"], fs["unit1"]["bn"])
        put_conv(f"{p}.3", fp["unit2"]["conv"])
        put_bn(f"{p}.4", fp["unit2"]["bn"], fs["unit2"]["bn"])

    for i in range(depth - 1):
        fp, fs = params[f"up{i}"], stats[f"up{i}"]
        p = f"up_convs.{i}"
        put_convT(f"{p}.upconv", fp["upconv"])
        put_conv(f"{p}.conv1", fp["unit1"]["conv"])
        put_bn(f"{p}.bn1", fp["unit1"]["bn"], fs["unit1"]["bn"])
        put_conv(f"{p}.conv2", fp["unit2"]["conv"])
        put_bn(f"{p}.bn2", fp["unit2"]["bn"], fs["unit2"]["bn"])

    put_conv("conv_final", params["conv_final"])

    if "meta_mlp" in params:
        for i, fc in ((0, "fc1"), (2, "fc2"), (4, "fc3")):
            p = f"post_processing_weights.main.{i}"
            sd[p + ".weight"] = np.ascontiguousarray(
                np.asarray(params["meta_mlp"][fc]["kernel"],
                           np.float32).T)
            sd[p + ".bias"] = np.asarray(params["meta_mlp"][fc]["bias"],
                                         np.float32)

    return sd


def save_torch_checkpoint(variables: dict, path) -> None:
    """Write a reference-loadable ``.pt`` state_dict (requires torch)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(variables).items()}
    torch.save(sd, str(path))
