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
    if not variables.get("batch_stats"):
        # same guard as fold_for_serving: without it a stats-less tree
        # crashed with a bare KeyError('bn') deep inside _fold_unit
        raise ValueError(
            "the checkpoint carries no batch_stats (BatchNorm running "
            "statistics) — folding is impossible")
    return {"params": fold_batchnorm(variables["params"],
                                     variables["batch_stats"], eps)}


def fold_for_serving(model, variables: dict, config) -> tuple:
    """The serving BN policy, shared by the live runner and the AOT
    export so the two can never diverge: returns ``(model, variables)``
    ready for ``model.apply(variables, x, train=False)``.

    * BN model + ``fold_bn`` (default true): statistics folded into the
      conv kernels, BN dropped from the graph (``use_bn=False``).
    * BN model + ``fold_bn: false``: unfolded eval-mode forward; the
      checkpoint must carry ``batch_stats`` either way — a stats-less
      tree gets a clear error here instead of a flax scope crash (or a
      KeyError inside the fold) at trace time.
    * BN-free model: params only.
    """
    import dataclasses

    if not getattr(model, "use_bn", True):
        return model, {"params": variables["params"]}
    if not variables.get("batch_stats"):
        raise ValueError(
            "the checkpoint carries no batch_stats (BatchNorm running "
            "statistics) for this BN model — serve from a training "
            "checkpoint, or build the model with use_bn=False")
    if config.get("fold_bn", True):
        params = fold_batchnorm(variables["params"],
                                variables["batch_stats"])
        return dataclasses.replace(model, use_bn=False), {"params": params}
    return model, {"params": variables["params"],
                   "batch_stats": variables["batch_stats"]}
