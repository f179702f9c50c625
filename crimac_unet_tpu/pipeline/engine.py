"""Training / evaluation engine: fused jitted steps over a data mesh.

The reference's SegPipe (pipeline_train_predict/pipeline.py:39-376) runs
per-patch transforms in DataLoader workers, forwards on one device, and
evaluates with sklearn over flattened host arrays.  Here one jitted program
per phase does everything after the raw crop batch lands on device:

  train_step: augmentation -> label train chain -> data train chain ->
              forward -> weighted CE (ignore-masked) -> SGD update
              (gradients all-reduce implicitly across the mesh via sharding)
  eval_step:  label test chain -> data test chain -> forward ->
              loss + streaming PR histogram update

Hyper-parameter semantics match the reference: SGD momentum 0.95, lr 0.005
halved every ``lr_step`` optimizer steps (staircase ExponentialLR,
pipeline.py:156-157/:187-189), CE class weights [10, 300, 250]
(pipeline.py:132-141) with torch's weighted-mean normalization and
ignore_index=-100 behaviour.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from ..constants import LABEL_IGNORE_VAL
from ..models.unet import UNet
from ..ops import augment, data_ops, label_ops, metrics


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(config: dict):
    """The training LR schedule (reference ExponentialLR stepped every
    lr_step batches, pipeline.py:156-157,187-189).  Exposed so logging
    reads the SAME schedule the optimizer runs (no hand-derived copy to
    fall out of sync)."""
    return optax.exponential_decay(
        init_value=float(config["lr"]),
        transition_steps=int(config["lr_step"]),
        decay_rate=float(config["lr_reduction"]),
        staircase=True)


def make_optimizer(config: dict) -> optax.GradientTransformation:
    return optax.sgd(learning_rate=make_lr_schedule(config),
                     momentum=float(config["momentum"]))


def init_train_state(model: UNet, config: dict, rng,
                     variables=None) -> TrainState:
    """Fresh TrainState at step 0. ``variables`` seeds params/batch_stats
    from imported weights (e.g. a reference ``.pt`` via
    ``load_model_params``) instead of random init — the optimizer state
    (SGD momentum traces) starts at zeros either way."""
    from ..data.meta_channels import get_in_channels
    if variables is None:
        wh, ww = config["patch_size"]
        in_ch = len(config["frequencies"])
        n_meta = get_in_channels(config.get("meta_channels"))
        meta = None
        if model.late_meta_inject:
            meta = jnp.zeros((1, wh, ww, n_meta), jnp.float32)
        else:
            # early injection concatenates before the encoder
            in_ch += n_meta
        x = jnp.zeros((1, wh, ww, in_ch), jnp.float32)
        variables = model.init(rng, x, meta=meta, train=False)
    tx = make_optimizer(config)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))


def weighted_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                     class_weights) -> jnp.ndarray:
    """torch CrossEntropyLoss(weight=w) with ignore_index=-100 semantics:
    weighted mean of per-pixel NLL over non-ignored pixels
    (reference pipeline.py:132-141; labels must already be in
    {0..2, LABEL_IGNORE_VAL})."""
    w = jnp.asarray(class_weights, jnp.float32)
    valid = labels != LABEL_IGNORE_VAL
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # per-pixel selects via a one-hot contraction, NOT take_along_axis /
    # advanced indexing: XLA lowers those per-pixel gathers as kCustom
    # fusions running at ~1.6 GB/s — profiler-measured 11.9 ms/step
    # (29 % of the whole b8 train step) for the two gathers this
    # replaces, vs <0.5 ms for the compare/select form.  Bit-equal:
    # one-hot products are exact 0/1 multiplies in f32
    # (docs/SESSIONS.md round 5, train campaign).
    oh = jax.nn.one_hot(safe, logp.shape[-1], dtype=jnp.float32)
    nll = -jnp.sum(logp * oh, axis=-1)
    pix_w = jnp.sum(w * oh, axis=-1) * valid.astype(jnp.float32)
    return jnp.sum(nll * pix_w) / jnp.maximum(jnp.sum(pix_w), 1e-12)


def focal_loss(logits, labels, class_weights, gamma=2.0):
    """Weighted focal loss (the reference YAML documents 'Focal' as an
    option its code never implemented, config_baseline.yaml:22;
    provided here as a working extension)."""
    w = jnp.asarray(class_weights, jnp.float32)
    valid = labels != LABEL_IGNORE_VAL
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction instead of take_along_axis — see
    # weighted_ce_loss for the measured kCustom-gather pathology
    oh = jax.nn.one_hot(safe, logp.shape[-1], dtype=jnp.float32)
    logp_t = jnp.sum(logp * oh, axis=-1)
    focal = (1.0 - jnp.exp(logp_t)) ** gamma * (-logp_t)
    pix_w = jnp.sum(w * oh, axis=-1) * valid.astype(jnp.float32)
    return jnp.sum(focal * pix_w) / jnp.maximum(jnp.sum(pix_w), 1e-12)


def dice_loss(logits, labels, class_weights=None, eps=1e-6):
    """Soft multiclass Dice over non-ignored pixels (working extension of
    the reference's documented-but-unimplemented 'Dice' option)."""
    valid = (labels != LABEL_IGNORE_VAL).astype(jnp.float32)
    safe = jnp.where(valid > 0, labels, 0).astype(jnp.int32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(safe, probs.shape[-1]) * valid[..., None]
    probs = probs * valid[..., None]
    inter = jnp.sum(probs * onehot, axis=(0, 1, 2))
    union = jnp.sum(probs + onehot, axis=(0, 1, 2))
    dice = (2 * inter + eps) / (union + eps)
    return 1.0 - jnp.mean(dice)


def make_loss_fn(config: dict):
    """Loss factory keyed on ``loss_type`` (reference pipeline.py:132-141
    accepts only 'CE' and raises otherwise; Focal/Dice/Combined are
    implemented extensions of its documented options)."""
    loss_type = config.get("loss_type", "CE")
    weights = tuple(config.get("class_weights", (10.0, 300.0, 250.0)))
    if loss_type == "CE":
        return lambda logits, labels: weighted_ce_loss(logits, labels,
                                                       weights)
    if loss_type == "Focal":
        return lambda logits, labels: focal_loss(logits, labels, weights)
    if loss_type == "Dice":
        return lambda logits, labels: dice_loss(logits, labels)
    if loss_type == "Combined":
        return lambda logits, labels: (
            focal_loss(logits, labels, weights)
            + weighted_ce_loss(logits, labels, weights))
    raise ValueError("`loss_type` not recognized")


def _train_labels(data, labels, threshold_freq_idx):
    """Train label chain [refine, convert] (reference transforms.py:69-75)."""
    labels = label_ops.refine_label_boundary(
        data, labels, threshold_freq_idx=threshold_freq_idx)
    return label_ops.convert_label_indexing(labels)


def _test_labels(data, labels, seabed_row, overlap, threshold_freq_idx):
    """Test label chain [convert_unused, refine, mask_seabed, mask_overlap]
    (reference transforms.py:78-92)."""
    labels = label_ops.convert_label_indexing(labels,
                                              mark_unused_species=True)
    labels = label_ops.refine_label_boundary(
        data, labels, threshold_freq_idx=threshold_freq_idx)
    labels = label_ops.mask_label_seabed(labels, seabed_row)
    return label_ops.mask_label_overlap(labels, overlap)


def make_train_step(model: UNet, config: dict):
    from ..data.meta_channels import get_in_channels
    tx = make_optimizer(config)
    loss_fn_impl = make_loss_fn(config)
    use_meta = get_in_channels(config.get("meta_channels")) > 0
    late = bool(config.get("late_meta_inject", False))

    def _update(state, data, labels, meta):
        x = data.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        meta_nhwc = None
        if use_meta:
            meta_nhwc = meta.transpose(0, 2, 3, 1)
            if not late:
                x = jnp.concatenate([x, meta_nhwc], axis=-1)
                meta_nhwc = None

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, meta=meta_nhwc, train=True, mutable=["batch_stats"])
            loss = loss_fn_impl(logits, labels)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), loss

    # donate the state: params/opt-state buffers are updated in place on
    # device instead of allocating a second copy every step (callers all
    # rebind `state` from the return)
    if use_meta:
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, data, labels, meta, rng):
            data, meta, labels = augment.augment_train_meta(
                rng, data, meta, labels)
            labels = _train_labels(data, labels, -1)
            data, labels = data_ops.data_transform_train(data, labels,
                                                         scaled=True)
            return _update(state, data, labels, meta)
    else:
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, data, labels, rng):
            """data (B,C,H,W) raw sv float32; labels (B,H,W) raw int32."""
            data, labels = augment.augment_train(rng, data, labels)
            labels = _train_labels(data, labels, -1)
            data, labels = data_ops.data_transform_train(data, labels)
            return _update(state, data, labels, None)

    return train_step


def make_train_step_pooled(model: UNet, config: dict):
    """Train step over an HBM-resident sample pool (data/device_pool.py):
    crops are gathered ON DEVICE from (echogram, start) coordinates, so the
    per-step h2d is a few dozen bytes instead of ~8 MB of host crops, and
    the gather fuses into the same augmentation/label/forward program.

    Signature: (state, pool_data, pool_labels, ech_idx, starts, rng), or
    with metadata channels
    (state, pool_data, pool_labels, meta_vectors, ech_idx, starts, rng,
    flags) — the meta channel MAPS are computed on device from the pool's
    per-echogram vectors (device_pool._gather_meta_crops), so metadata
    runs get the same on-device gather speedup as the baseline.
    Pool arrays are explicit arguments (not closed over) so the compiled
    program references the resident HBM buffers instead of embedding them.
    """
    from ..data.device_pool import _gather_crops, _gather_meta_crops
    from ..data.meta_channels import get_in_channels
    window = tuple(config["patch_size"])
    base = make_train_step(model, config)  # inlined when traced below

    if get_in_channels(config.get("meta_channels")) > 0:
        @partial(jax.jit, donate_argnums=(0,),
                 static_argnames=("flags",))
        def train_step(state: TrainState, pool_data, pool_labels,
                       meta_vectors, ech_idx, starts, rng, flags):
            data, labels = _gather_crops(pool_data, pool_labels, ech_idx,
                                         starts, window)
            meta = _gather_meta_crops(*meta_vectors, ech_idx, starts,
                                      window, flags)
            return base(state, data, labels, meta, rng)

        return train_step

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, pool_data, pool_labels, ech_idx,
                   starts, rng):
        data, labels = _gather_crops(pool_data, pool_labels, ech_idx,
                                     starts, window)
        return base(state, data, labels, rng)

    return train_step


def make_eval_step_pooled(model: UNet, config: dict):
    """Validation step over an HBM-resident sample pool: crops gather ON
    DEVICE from (echogram, start) coordinates like the pooled train step
    (make_train_step_pooled), so each validation batch ships a few dozen
    coordinate bytes + a (B, ww) int32 seabed-row strip instead of ~8 MB
    of host crops.  The seabed rows stay host-computed
    (data/dataset.seabed_patch_row — 1 KB/crop, and bit-identical to the
    host path including its short-echogram recentering asymmetry).

    Signature: (params, batch_stats, hist, pool_data, pool_labels,
    ech_idx, starts, seabed_row, overlap=0, with_loss=True); metadata
    runs take (…, pool_labels, meta_vectors, ech_idx, …, flags) with the
    meta maps computed on device like make_train_step_pooled."""
    from ..data.device_pool import _gather_crops, _gather_meta_crops
    from ..data.meta_channels import get_in_channels
    window = tuple(config["patch_size"])
    base = make_eval_step(model, config)  # inlined when traced below

    if get_in_channels(config.get("meta_channels")) > 0:
        @partial(jax.jit,
                 static_argnames=("overlap", "with_loss", "flags"))
        def eval_step(params, batch_stats, hist, pool_data, pool_labels,
                      meta_vectors, ech_idx, starts, seabed_row, flags,
                      overlap=0, with_loss=True):
            data, labels = _gather_crops(pool_data, pool_labels, ech_idx,
                                         starts, window)
            meta = _gather_meta_crops(*meta_vectors, ech_idx, starts,
                                      window, flags)
            return base(params, batch_stats, hist, data, labels,
                        seabed_row, meta, overlap=overlap,
                        with_loss=with_loss)

        return eval_step

    @partial(jax.jit, static_argnames=("overlap", "with_loss"))
    def eval_step(params, batch_stats, hist, pool_data, pool_labels,
                  ech_idx, starts, seabed_row, overlap=0, with_loss=True):
        data, labels = _gather_crops(pool_data, pool_labels, ech_idx,
                                     starts, window)
        return base(params, batch_stats, hist, data, labels, seabed_row,
                    overlap=overlap, with_loss=with_loss)

    return eval_step


def make_eval_step(model: UNet, config: dict):
    from ..data.meta_channels import get_in_channels
    loss_fn_impl = make_loss_fn(config)
    use_meta = get_in_channels(config.get("meta_channels")) > 0
    late = bool(config.get("late_meta_inject", False))

    def _core(params, batch_stats, hist, data, labels, seabed_row, meta,
              overlap, with_loss):
        labels_t = _test_labels(data, labels, seabed_row, overlap, -1)
        data_t, labels_t = data_ops.data_transform_test(data, labels_t,
                                                        scaled=use_meta)
        x = data_t.transpose(0, 2, 3, 1)
        meta_nhwc = None
        if use_meta:
            meta_nhwc = meta.transpose(0, 2, 3, 1)
            if not late:
                x = jnp.concatenate([x, meta_nhwc], axis=-1)
                meta_nhwc = None
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, meta=meta_nhwc, train=False)
        probs = jax.nn.softmax(logits, axis=-1)

        loss = jnp.zeros(())
        if with_loss:
            collapsed = label_ops.set_label_ignore_val(labels_t)
            loss = loss_fn_impl(logits, collapsed)

        hist = metrics.update_pr_histogram(hist, probs[..., 1], labels_t)
        return hist, loss

    if use_meta:
        @partial(jax.jit, static_argnames=("overlap", "with_loss"))
        def eval_step(params, batch_stats, hist, data, labels, seabed_row,
                      meta, overlap=0, with_loss=True):
            return _core(params, batch_stats, hist, data, labels,
                         seabed_row, meta, overlap, with_loss)
    else:
        @partial(jax.jit, static_argnames=("overlap", "with_loss"))
        def eval_step(params, batch_stats, hist, data, labels, seabed_row,
                      overlap=0, with_loss=True):
            """Validation step on raw crops: label test chain, data test
            chain, forward, loss on ignore-collapsed labels, PR histogram
            update."""
            return _core(params, batch_stats, hist, data, labels,
                         seabed_row, None, overlap, with_loss)

    return eval_step


# ------------------------------------------------------------- checkpoints
def save_checkpoint(path, state_or_vars, extras=None) -> None:
    """Serialize {'params', 'batch_stats'} (and optimizer state if given) to
    a msgpack file — the framework's ``best``/``last`` checkpoint format
    (reference saves torch state_dicts, pipeline.py:199-203/:336-341).
    ``extras`` writes scalar metadata (e.g. the best validation F1) to an
    atomic ``<path>.json`` sidecar — kept out of the msgpack so flax's
    template-based restore still sees exactly the TrainState structure.

    The write is atomic (temp file + os.replace): a crash mid-write — the
    exact scenario periodic checkpointing exists for — must never destroy
    the previous good checkpoint."""
    import json
    if isinstance(state_or_vars, TrainState):
        payload = {"params": state_or_vars.params,
                   "batch_stats": state_or_vars.batch_stats,
                   "opt_state": state_or_vars.opt_state,
                   "step": state_or_vars.step}
    else:
        payload = state_or_vars
    path = str(path)
    d = os.path.dirname(path)
    if d:  # bare cwd-relative filenames: makedirs("") raises
        os.makedirs(d, exist_ok=True)
    # sidecar FIRST: a crash between the two replaces must pair the OLD
    # checkpoint with the NEW (>= actual) best_f1 high-water mark, which
    # is conservative — the reverse order paired a new checkpoint with a
    # stale LOW best_f1, letting a post-resume validation overwrite
    # best.msgpack with a worse-than-best model
    if extras is not None:
        with open(path + ".json.tmp", "w") as f:
            json.dump(extras, f)
        os.replace(path + ".json.tmp", path + ".json")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(payload)))
    os.replace(tmp, path)


def load_checkpoint_extras(path) -> dict:
    """Scalar metadata sidecar written by :func:`save_checkpoint`
    (empty dict when absent)."""
    import json
    sidecar = str(path) + ".json"
    if os.path.isfile(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {}


def load_checkpoint(path, template=None) -> dict:
    """Load a checkpoint: native msgpack or a reference torch ``.pt``
    state_dict (weight transfer via models.torch_import)."""
    path = str(path)
    if path.endswith(".pt"):
        from ..models.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)
