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
