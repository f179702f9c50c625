"""SegPipe: the training/validation orchestration object.

The counterpart of the reference ``SegPipe``/``SegPipeUNet``
(pipeline_train_predict/pipeline.py:39-410): holds the model + config, runs
the training loop with periodic validation, checkpoints ``best`` on max
validation F1 and ``last`` at the end, and logs to TensorBoard with the
same tag names (train/loss, test/F1_score|precision|recall|loss,
learning_rate_0).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import build_unet
from ..ops import metrics as M
from ..parallel.mesh import batch_sharding, get_mesh, replicate_tree
from ..parallel.prefetch import device_prefetch
from . import engine


class SegPipeUNet:
    """Train/validate the flagship U-Net (reference pipeline.py:379-410)."""

    def __init__(self, config: dict, checkpoint_dir=None,
                 experiment_name="model"):
        self.config = dict(config)
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.model_name = experiment_name
        self.frequencies = sorted(config["frequencies"])
        # bf16 conv compute by default (f32 master params, f32 loss):
        # measured 1.19-1.24x step/end-to-end win with best-F1 parity on
        # the full reference recipe (BASELINE.md round 3).  Set
        # train_dtype: float32 for exact-parity runs.
        train_cfg = dict(config)
        train_cfg["compute_dtype"] = config.get("train_dtype", "bfloat16")
        self.model = build_unet(train_cfg)
        self.state = None
        self.best_F1_val = -np.inf
        self.mesh = get_mesh(int(config.get("mesh_devices", 0)))
        n_dev = len(self.mesh.devices.ravel())
        if n_dev > 1 and int(config["batch_size"]) % n_dev != 0:
            print(f"batch_size {config['batch_size']} not divisible by "
                  f"{n_dev} devices; training single-device")
            self.mesh = get_mesh(1)
        self._train_step = engine.make_train_step(self.model, config)
        self._eval_step = engine.make_eval_step(self.model, config)
        self._lr_schedule = engine.make_lr_schedule(config)
        self.pool = None
        self._train_step_pooled = None
        self.pool_val = None
        self._eval_step_pooled = None

    def _check_pool_meta(self, pool):
        """A meta-channel config needs a pool built WITH the SAME
        meta_channels (per-echogram meta vectors resident in HBM) —
        catching presence mismatches here beats an opaque jit signature
        error at step time, and catching flag-SET mismatches prevents
        silently training on the wrong meta features when the channel
        counts happen to coincide (review finding r3)."""
        from ..data.device_pool import META_ORDER
        cfg = self.config.get("meta_channels") or {}
        cfg_flags = tuple(k for k in META_ORDER if cfg.get(k))
        pool_flags = tuple(getattr(pool, "meta_flags", ()) or ())
        if cfg_flags and not pool_flags:
            raise ValueError(
                "config enables meta_channels but the sample pool was "
                "built without them; pass meta_channels to the pool "
                "constructor (train.maybe_build_pool does this)")
        if pool_flags and not cfg_flags:
            raise ValueError(
                "the sample pool carries meta_channels but the config "
                "does not enable them; rebuild the pool without "
                "meta_channels (or enable them in the config)")
        if cfg_flags != pool_flags:
            raise ValueError(
                f"meta_channels mismatch: config enables {cfg_flags} but "
                f"the sample pool was built with {pool_flags}; rebuild "
                "the pool with the config's meta_channels")

    def _attach(self, pool, step_factory, attr):
        """Shared pool-attachment: meta guard, pooled step build, and
        multi-device replication (one copy of the logic for the train and
        validation roles — they drifted as two near-identical blocks)."""
        self._check_pool_meta(pool)
        setattr(self, attr, step_factory(self.model, self.config))
        if len(self.mesh.devices.ravel()) > 1:
            pool.data = replicate_tree(self.mesh, pool.data)
            pool.labels = replicate_tree(self.mesh, pool.labels)
            if pool.meta_vectors is not None:
                pool.meta_vectors = replicate_tree(self.mesh,
                                                   pool.meta_vectors)
        return pool

    def attach_pool_val(self, pool):
        """Use an HBM-resident sample pool for VALIDATION batches: the
        periodic validate_model_training passes gather their crops on
        device instead of shipping ~8 MB per test batch (the validation
        loop is test_iter x batch crops every log_step — it dominated the
        full-recipe wall on slow hosts)."""
        self.pool_val = self._attach(pool, engine.make_eval_step_pooled,
                                     "_eval_step_pooled")
        return self

    def attach_pool(self, pool):
        """Use an HBM-resident sample pool for training: batches become
        (echogram, start) coordinates, crops gather on device inside the
        train step (data/device_pool.py; the reference ships every crop
        through DataLoader workers instead, train.py:73-79)."""
        self.pool = self._attach(pool, engine.make_train_step_pooled,
                                 "_train_step_pooled")
        return self

    # ----------------------------------------------------------- lifecycle
    def init_model(self, seed=None, variables=None):
        rng = jax.random.PRNGKey(int(self.config.get("random_seed", 10))
                                 if seed is None else seed)
        self.state = engine.init_train_state(self.model, self.config, rng,
                                             variables=variables)
        if len(self.mesh.devices.ravel()) > 1:
            self.state = replicate_tree(self.mesh, self.state)
        return self.state

    def load_model_params(self, checkpoint_path=None):
        """Load best/last/.pt weights for inference
        (reference pipeline.py:109-130)."""
        if checkpoint_path is None:
            checkpoint_path = self.checkpoint_dir / "best.msgpack"
        payload = engine.load_checkpoint(checkpoint_path)
        self.variables = {"params": payload["params"],
                          "batch_stats": payload["batch_stats"]}
        return self.variables

    def resume_from(self, checkpoint_path):
        """Resume TRAINING from a checkpoint incl. optimizer state and step
        counter — a capability the reference lacks (it only saves bare
        state_dicts, SURVEY.md §5 checkpoint/resume)."""
        if str(checkpoint_path).endswith(".pt"):
            raise ValueError(
                "Reference .pt checkpoints carry no optimizer state or "
                "step counter and cannot seed a TRAINING resume; import "
                "the weights with load_model_params/--checkpoint_path "
                "instead (training then starts from step 0)")
        self.init_model()
        template = {"params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                    "opt_state": self.state.opt_state,
                    "step": self.state.step}
        payload = engine.load_checkpoint(checkpoint_path, template=template)
        self.state = engine.TrainState(
            step=payload["step"], params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"])
        # restore the best-F1 high-water mark (sidecar) so the first
        # post-resume validation cannot clobber best.msgpack with a worse
        # model than the pre-crash best
        extras = engine.load_checkpoint_extras(checkpoint_path)
        if "best_f1" in extras and np.isfinite(extras["best_f1"]):
            self.best_F1_val = float(extras["best_f1"])
        if len(self.mesh.devices.ravel()) > 1:
            self.state = replicate_tree(self.mesh, self.state)
        return self.state

    # ------------------------------------------------------------ training
    def train_model(self, train_batches, make_test_batches, logger=None,
                    progress=True):
        """Iterate the training batches, validating every ``log_step``
        (reference pipeline.py:144-203).

        ``train_batches``: iterable of host batch dicts;
        ``make_test_batches``: zero-arg callable yielding a fresh iterable
        of validation batches (the reference re-draws random validation
        samples every validation epoch).
        """
        resuming = self.state is not None and int(self.state.step) > 0
        if self.state is None:
            # weights imported via load_model_params (e.g. a reference
            # .pt) seed training from step 0 — the reference trains from
            # its loaded module the same way; silently random-initializing
            # discarded the import (review finding)
            self.init_model(variables=getattr(self, "variables", None))
        if not resuming and self.checkpoint_dir is not None and \
                any((self.checkpoint_dir / n).exists()
                    for n in ("last.msgpack", "best.msgpack")):
            # overwrite protection must survive python -O; best.msgpack
            # alone exists after a crash before the first periodic save
            raise FileExistsError(
                f"model already exists at {self.checkpoint_dir}")
        start = int(self.state.step)  # 0 unless resumed (resume_from)

        log_step = int(self.config["log_step"])
        lr_step = int(self.config["lr_step"])
        # periodic resumable checkpointing (crash recovery mid-training;
        # the reference has nothing comparable — SURVEY.md §5)
        ckpt_every = int(self.config.get("checkpoint_every", 0) or 0)
        key = jax.random.PRNGKey(int(self.config.get("random_seed", 10))
                                 + start)

        sharding = (batch_sharding(self.mesh)
                    if len(self.mesh.devices.ravel()) > 1 else None)
        it = device_prefetch(train_batches, sharding,
                             depth=int(self.config.get("prefetch_depth", 2)))
        if progress:
            from tqdm import tqdm
            # on resume the bar covers the REMAINING iterations but shows
            # absolute progress (initial=start), so a completed resumed
            # run reads 15000/15000, not 5000/15000
            it = tqdm(it, total=int(self.config["iterations"]),
                      initial=start, desc="Training model")

        # Per-iteration losses are logged like the reference
        # (pipeline.py:181) but fetched from device in batches: forcing a
        # device sync every step serializes dispatch (and wedges the
        # tunneled test TPU under sustained load)
        loss_flush = max(1, min(log_step, lr_step, 50))
        pending_losses: list = []

        def flush_losses(upto):
            if logger is not None and pending_losses:
                # ONE stacked d2h transfer per flush: reading each scalar
                # with float(l) costs a full device round-trip (~30 ms
                # through the tunnel), which turned the batched flush back
                # into a per-step sync — measured 28.5 ms/scalar vs
                # 1.5 ms/step amortized for the stacked read
                vals = np.asarray(jnp.stack(pending_losses))
                for j, l in enumerate(vals):
                    logger.add_scalar(
                        "train/loss", float(l),
                        global_step=upto - len(vals) + j + 1)
            pending_losses.clear()

        i = start - 1
        for batch in it:
            i += 1  # global step index (continues across resumes)
            key, sub = jax.random.split(key)
            if "ech_idx" in batch:  # pooled: on-device crop gather
                if self._train_step_pooled is None:
                    raise ValueError(
                        "pooled batch (has 'ech_idx') but attach_pool() "
                        "was never called on this SegPipeUNet")
                if self.pool.meta_vectors is not None:
                    self.state, loss = self._train_step_pooled(
                        self.state, self.pool.data, self.pool.labels,
                        self.pool.meta_vectors, batch["ech_idx"],
                        batch["starts"], sub, flags=self.pool.meta_flags)
                else:
                    self.state, loss = self._train_step_pooled(
                        self.state, self.pool.data, self.pool.labels,
                        batch["ech_idx"], batch["starts"], sub)
            elif "meta" in batch:
                self.state, loss = self._train_step(
                    self.state, batch["data"], batch["labels"],
                    batch["meta"], sub)
            else:
                self.state, loss = self._train_step(
                    self.state, batch["data"], batch["labels"], sub)
            pending_losses.append(loss)
            if len(pending_losses) >= loss_flush:
                flush_losses(i + 1)
            if (i + 1) % log_step == 0:
                self.validate_model_training(make_test_batches(), logger,
                                             i)
            if logger is not None and (i + 1) % lr_step == 0:
                # read the SAME optax schedule the optimizer runs
                lr = float(self._lr_schedule(i + 1))
                logger.add_scalar("learning_rate_0", lr, global_step=i + 1)
            if ckpt_every and self.checkpoint_dir is not None and \
                    (i + 1) % ckpt_every == 0:
                engine.save_checkpoint(
                    self.checkpoint_dir / "last.msgpack", self.state,
                    extras={"best_f1": float(self.best_F1_val)})
        flush_losses(i + 1)

        if self.config.get("save_model_params", True) and \
                self.checkpoint_dir is not None:
            engine.save_checkpoint(self.checkpoint_dir / "last.msgpack",
                                   self.state,
                                   extras={"best_f1":
                                           float(self.best_F1_val)})
        self.variables = {"params": self.state.params,
                          "batch_stats": self.state.batch_stats}
        return self.state

    def validate_model_training(self, test_batches, logger, iteration_no):
        """Validation pass: streaming PR histogram + mean loss; checkpoint
        best-F1 (reference pipeline.py:305-341)."""
        hist = M.new_histogram()
        # int64 host accumulation: a single validation pass can exceed
        # 2^31 pixels (test_iter x large multi-chip batches), which would
        # wrap the int32 device carry (same fix as evaluate_reader)
        hist64 = np.zeros((2, M.N_F16_BINS), np.int64)
        acc_px = 0
        losses = []
        # same sharded device-prefetch as the training loop: without it a
        # multi-device mesh ran validation single-placement with
        # synchronous per-batch transfers (review finding)
        sharding = (batch_sharding(self.mesh)
                    if len(self.mesh.devices.ravel()) > 1 else None)
        for batch in device_prefetch(test_batches, sharding, depth=2):
            if "ech_idx" in batch:  # pooled: on-device crop gather
                if self._eval_step_pooled is None:
                    raise ValueError(
                        "pooled validation batch (has 'ech_idx') but "
                        "attach_pool_val() was never called on this "
                        "SegPipeUNet")
                if self.pool_val.meta_vectors is not None:
                    hist, loss = self._eval_step_pooled(
                        self.state.params, self.state.batch_stats, hist,
                        self.pool_val.data, self.pool_val.labels,
                        self.pool_val.meta_vectors, batch["ech_idx"],
                        batch["starts"], batch["seabed_row"],
                        flags=self.pool_val.meta_flags,
                        overlap=0, with_loss=True)
                else:
                    hist, loss = self._eval_step_pooled(
                        self.state.params, self.state.batch_stats, hist,
                        self.pool_val.data, self.pool_val.labels,
                        batch["ech_idx"], batch["starts"],
                        batch["seabed_row"], overlap=0, with_loss=True)
            else:
                args = [self.state.params, self.state.batch_stats, hist,
                        batch["data"], batch["labels"],
                        batch["seabed_row"]]
                if "meta" in batch:
                    args.append(batch["meta"])
                hist, loss = self._eval_step(*args, overlap=0,
                                             with_loss=True)
            losses.append(loss)
            acc_px += int(np.prod(batch["labels"].shape)) \
                if "labels" in batch else \
                len(batch["ech_idx"]) * int(np.prod(self.config["patch_size"]))
            if acc_px > 2 ** 30:
                hist64 += np.asarray(hist).astype(np.int64)
                hist = M.new_histogram()
                acc_px = 0
        hist64 += np.asarray(hist).astype(np.int64)
        curve = M.pr_curve_from_histogram(hist64)
        f1, idx = M.max_f1(curve)
        # one stacked d2h transfer: per-scalar float(l) reads cost a device
        # round-trip each (~30 ms tunneled), ~30 s of pure transfer per
        # 1000-batch validation pass — and this runs even without a logger
        mean_loss = float(np.mean(
            np.asarray(jnp.stack(losses)).astype(np.float64))) \
            if losses else 0.0

        step = iteration_no + 1
        if logger is not None:
            logger.add_scalar("test/F1_score", f1, global_step=step)
            logger.add_scalar("test/precision",
                              float(curve["precision"][idx]),
                              global_step=step)
            logger.add_scalar("test/recall", float(curve["recall"][idx]),
                              global_step=step)
            logger.add_scalar("test/loss", mean_loss, global_step=step)

        if f1 > self.best_F1_val and self.checkpoint_dir is not None:
            self.best_F1_val = f1
            engine.save_checkpoint(self.checkpoint_dir / "best.msgpack",
                                   self.state,
                                   extras={"best_f1": float(f1)})
        return f1, mean_loss


def save_metrics_dict(curve: dict, save_path) -> None:
    """CSV export with the reference column layout
    (pipeline.py:358-364 / evaluate.py:19-24)."""
    import pandas as pd
    out = dict(curve)
    out["thresholds"] = np.array(list(out["thresholds"]) + [np.nan])
    pd.DataFrame(out).to_csv(save_path)


def save_pr_plot(curve: dict, save_path) -> None:
    """PR scatter PNG (reference evaluate.py:27-36)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(1, figsize=(8, 8))
    ax.tick_params(labelsize=6)
    ax.set_xlabel("Recall", fontsize=8)
    ax.set_ylabel("Precision", fontsize=8)
    ax.set_xticks([0, 0.2, 0.4, 0.6, 0.8, 1.0])
    ax.scatter(curve["recall"], curve["precision"], s=2)
    ax.set_xlim(-0.06, 1.06)
    ax.set_ylim(-0.06, 1.06)
    plt.savefig(save_path)
    plt.close(fig)
