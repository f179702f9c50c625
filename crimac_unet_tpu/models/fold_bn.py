"""BatchNorm folding for inference serving.

At inference BatchNorm is a per-channel affine transform with frozen
running statistics; applied after a convolution it folds exactly into the
conv's kernel and bias:

    BN(conv(x)) = conv(x) * g + c
      with g = gamma / sqrt(var + eps),  c = beta - mean * g
    => kernel' = kernel * g,  bias' = bias * g + c

Folding removes every BN op (and its HBM round trips / extra fusion
boundaries) from the predict forward — a production-serving optimization
the reference never had (its inference runs the full train-graph BN in
eval mode, reference pipeline.py:205-219).  The folded tree drives the
same UNet module with ``use_bn=False``; equality with the unfolded eval
forward is exact up to float re-association (tests/test_fold_bn.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def _fold_unit(unit_params: dict, unit_stats: dict, eps: float) -> dict:
    """One conv->BN unit: fold the bn affine + running stats into the
    conv kernel/bias and drop the bn params."""
    conv = unit_params["conv"]
    bn = unit_params["bn"]
    stats = unit_stats["bn"]
    g = bn["scale"] / jnp.sqrt(stats["var"] + eps)
    c = bn["bias"] - stats["mean"] * g
    return {"conv": {"kernel": conv["kernel"] * g,  # (kh,kw,cin,cout)*cout
                     "bias": conv["bias"] * g + c}}


def fold_batchnorm(params: dict, batch_stats: dict, eps: float = 1e-5
                   ) -> dict:
    """{'params', 'batch_stats'} of a BN UNet -> params of the equivalent
    ``use_bn=False`` UNet (same scope names minus the 'bn' leaves)."""
    from collections.abc import Mapping

    def walk(p, s):
        # Mapping, not dict: a FrozenDict params tree would otherwise be
        # treated as a leaf and the fold silently no-ops — the BN-free
        # model then runs without ever applying the BN statistics
        # (review finding r3)
        if isinstance(p, Mapping):
            if "conv" in p and "bn" in p:
                return _fold_unit(p, s, eps)
            return {k: walk(v, s.get(k, {}) if isinstance(s, Mapping)
                            else {})
                    for k, v in p.items()}
        return p
    return walk(params, batch_stats)


def fold_variables(variables: dict, eps: float = 1e-5) -> dict:
    """Convenience: {'params', 'batch_stats'} -> {'params'} folded."""
    return {"params": fold_batchnorm(variables["params"],
                                     variables.get("batch_stats", {}),
                                     eps)}
