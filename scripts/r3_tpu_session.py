"""Round-3 TPU measurement session (run on the real chip, one process).

Stages (each writes JSON to --out so partial runs keep their results):
  ab_f32 / ab_bf16  full reference recipe (15000 it x batch 4, six
                    validations, best-F1 checkpointing) with
                    train_dtype float32 / bfloat16 on the same fixture
                    and seed — the convergence half of VERDICT r2 #2
  slab_bound        patch vs slab predict with the trained f32
                    checkpoint on the bench-scale fixture: end-metric
                    F1 delta + prob deltas (VERDICT r2 #5)
  decomp            fused-predict chunk decomposition: forward-only at
                    the padded batch, gather-only, mask-only, full
                    program; quantifies how much of the 43%->60% MFU
                    gap is pad patches vs real overhead (VERDICT r2 #4)

Usage:
  python scripts/r3_tpu_session.py --stages ab_f32,ab_bf16,slab_bound,decomp \
      --work /tmp/r3tpu --out /tmp/r3tpu/results.json
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FREQS = [18, 38, 120, 200]


def log(msg):
    print(f"[r3tpu {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save(out_path, key, value):
    res = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            res = json.load(f)
    res[key] = value
    tmp = str(out_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f, indent=1)
    os.replace(tmp, out_path)
    log(f"saved {key}: {json.dumps(value)[:200]}")


def ensure_train_fixture(work):
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    memm = Path(work) / "memm"
    if not (memm / "marker.ok").is_file():
        make_survey_dir(memm, year=2017, n_echograms=3, H=700, W=1400,
                        seed=41, n_schools=6)
        make_survey_dir(memm, year=2016, n_echograms=2, H=700, W=1200,
                        seed=42, n_schools=6)
        (memm / "marker.ok").write_text("ok")
    return str(memm)


def recipe_config(memm, dtype):
    return {
        "frequencies": FREQS, "data_mode": "memm",
        "path_to_echograms": memm,
        "patch_size": [256, 256], "loss_type": "CE", "batch_size": 4,
        "lr": 0.005, "lr_reduction": 0.5, "momentum": 0.95,
        "iterations": 15000, "test_iter": 1000, "log_step": 2500,
        "lr_step": 1000, "num_workers": 2,
        "partition_train": "selected surveys", "train_surveys": [2017],
        "validation_surveys": [2016],
        "partition_predict": "all surveys", "evaluation_surveys": [],
        "save_prediction_surveys": [], "eval_mode": "all",
        "patch_overlap": 20, "random_seed": 10,
        "depth": 5, "start_filts": 64,
        "train_dtype": dtype,
    }


def stage_ab(work, out, dtype):
    from crimac_unet_tpu.pipeline.train import run_training
    memm = ensure_train_fixture(work)
    ckpt = Path(work) / f"ckpt_{dtype}"
    t0 = time.time()
    segpipe = run_training(recipe_config(memm, dtype), str(ckpt),
                           progress=False)
    wall = time.time() - t0
    save(out, f"ab_{dtype}", {
        "best_F1": float(segpipe.best_F1_val),
        "wall_min": round(wall / 60, 2),
        "steps": int(segpipe.state.step),
        "ckpt": str(ckpt / "best.msgpack")})


def ensure_bench_fixture(work):
    sys.path.insert(0, str(REPO))
    import bench
    return bench.ensure_fixture()


def stage_slab_bound(work, out):
    """Patch vs slab predict with trained weights; end-metric F1 via the
    PR curve over the written probability maps against the store labels
    (identical write masks -> identical pixel sets)."""
    import numpy as np

    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.engine import load_checkpoint
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    with open(out) as f:
        ck = json.load(f)["ab_float32"]["ckpt"]
    sv_path = ensure_bench_fixture(work)
    reader = DataReaderZarr(sv_path)
    cfg = {"patch_size": [256, 256], "patch_overlap": 20,
           "frequencies": FREQS, "fwd_batch": 32, "depth": 5,
           "start_filts": 64, "compute_dtype": "bfloat16"}
    model = build_unet(cfg)
    payload = load_checkpoint(ck)
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}
    outp = {}
    for mode in ("patch", "slab"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            runner = GriddedRunner(model, variables,
                                   dict(cfg, infer_mode=mode))
        chunks = {}
        for s, e, pred, _ in predict_reader(runner, reader, 1000):
            chunks[s] = np.asarray(pred, np.float32)
        outp[mode] = np.concatenate(
            [chunks[s] for s in sorted(chunks)], axis=2)
    a, b = outp["patch"], outp["slab"]
    if a.shape != b.shape:
        raise RuntimeError(f"mode output shapes differ: {a.shape} vs {b.shape}")
    mask_equal = bool(((a == 0) == (b == 0)).all())
    written = a != 0
    diff = np.abs(a - b)[written]

    # end metric: sandeel-F1 over written pixels vs store labels
    lab = reader.get_label_slice(0, a.shape[2], 0, a.shape[1])  # ping,rng
    lab = np.nan_to_num(lab.T, nan=0)
    f1s = {}
    from sklearn.metrics import precision_recall_curve
    wmask = written[0]
    y = (lab[:wmask.shape[0], :wmask.shape[1]][wmask] == 27)
    for mode, arr in outp.items():
        p = arr[0][wmask]
        prec, rec, _ = precision_recall_curve(y, p)
        denom = prec + rec
        f1 = np.divide(2 * prec * rec, denom, out=np.zeros_like(denom),
                       where=denom != 0)
        f1s[mode] = float(f1.max())
    save(out, "slab_bound", {
        "masks_equal": mask_equal,
        "mean_abs_dprob": float(diff.mean()),
        "p99_abs_dprob": float(np.percentile(diff, 99)),
        "max_abs_dprob": float(diff.max()),
        "f1_patch": round(f1s["patch"], 5),
        "f1_slab": round(f1s["slab"], 5),
        "abs_dF1": round(abs(f1s["patch"] - f1s["slab"]), 5)})


def stage_decomp(work, out):
    """Fused-predict chunk decomposition at the bench geometry."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)
    from crimac_unet_tpu.utils import flops as F

    sv_path = ensure_bench_fixture(work)
    reader = DataReaderZarr(sv_path)
    cfg = {"patch_size": [256, 256], "patch_overlap": 20,
           "frequencies": FREQS, "fwd_batch": 32, "depth": 5,
           "start_filts": 64, "compute_dtype": "bfloat16"}
    model = build_unet(cfg)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 256, 256, 4)), train=False)
    )(jax.random.PRNGKey(0))
    runner = GriddedRunner(model, variables, cfg)

    staged = {}
    real = runner._predict_patches

    def capture(variables, *args, **kw):
        staged.setdefault("args", args)
        staged.setdefault("kw", kw)
        return real(variables, *args, **kw)

    runner._predict_patches = capture
    for s, e, pred, _ in predict_reader(runner, reader, 1000):
        break
    runner._predict_patches = real
    args, kw = staged["args"], staged["kw"]
    data_slab, y0s = args[0], args[1]
    N = int(y0s.shape[0])
    B, Np, nb = runner._sub_batch_shape(N)

    from crimac_unet_tpu.utils.timing import burst_time

    def burst(fn, *a, reps=2):
        return burst_time(fn, *a, reps=reps, burst=8)

    # full fused program
    t_full = burst(lambda: real(runner.variables, *args, **kw))

    # forward alone, same padded (nb, B) batching over pre-gathered
    # patches (the pure-MXU ceiling at this batch shape)
    wh, ww = runner.window
    xs = jnp.zeros((nb, B, wh, ww, len(FREQS)), jnp.bfloat16)

    # the runner folds BN into the convs; use its (folded) model so the
    # forward matches the program the fused chunk actually runs
    fmodel = runner.model

    @jax.jit
    def fwd_only(variables, xs):
        return jax.lax.map(
            lambda x: fmodel.apply(variables, x, train=False), xs)

    t_fwd = burst(lambda: fwd_only(runner.variables, xs))

    fwd_flops = F.unet_forward_flops(wh, ww, in_channels=4,
                                   depth=5, start_filts=64)
    res = {
        "n_useful_patches": N, "padded_to": int(nb * B),
        "full_chunk_ms": round(t_full * 1e3, 2),
        "fwd_only_padded_ms": round(t_fwd * 1e3, 2),
        "overhead_ms": round((t_full - t_fwd) * 1e3, 2),
        "mfu_useful_full": round(
            F.mfu(N * fwd_flops, t_full) or 0, 4),
        "mfu_padded_fwd": round(
            F.mfu(nb * B * fwd_flops, t_fwd) or 0, 4),
        "mfu_useful_fwd": round(
            F.mfu(N * fwd_flops, t_fwd) or 0, 4),
    }
    save(out, "decomp", res)


def stage_train_decomp(work, out):
    """Train-step decomposition (the 'conv-backward-bound' evidence,
    VERDICT r2 weak #1): forward+loss only vs value_and_grad vs the full
    fused step, at batch 4 and 8, bf16 compute."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline import engine
    from crimac_unet_tpu.utils import flops as F

    res = {}
    for batch in (4, 8):
        config = {"patch_size": [256, 256], "frequencies": FREQS,
                  "lr": 0.005, "lr_step": 1000, "lr_reduction": 0.5,
                  "momentum": 0.95, "depth": 5, "start_filts": 64,
                  "compute_dtype": "bfloat16", "batch_size": batch}
        model = build_unet(config)
        state = engine.init_train_state(model, config,
                                        jax.random.PRNGKey(0))
        tx = engine.make_optimizer(config)
        rng = np.random.RandomState(0)
        x = jax.device_put(rng.randn(batch, 256, 256, 4)
                           .astype(np.float32))
        y = jax.device_put(rng.choice([0, 1, 2], size=(batch, 256, 256))
                           .astype(np.int32))

        def loss_fn(p, stats):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            return engine.weighted_ce_loss(logits, y,
                                           (10.0, 300.0, 250.0)), \
                mut["batch_stats"]

        fwd = jax.jit(lambda p, s: loss_fn(p, s)[0])
        grad = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

        @jax.jit
        def full(p, s, opt):
            (loss, ns), g = jax.value_and_grad(loss_fn,
                                               has_aux=True)(p, s)
            u, no = tx.update(g, opt, p)
            return optax.apply_updates(p, u), ns, no, loss

        opt = tx.init(state.params)

        from crimac_unet_tpu.utils.timing import burst_time

        def burst(fn, reps=2):
            return burst_time(fn, reps=reps, burst=8)

        t_f = burst(lambda: fwd(state.params, state.batch_stats))
        t_g = burst(lambda: grad(state.params, state.batch_stats))
        t_s = burst(lambda: full(state.params, state.batch_stats, opt))
        fwd_flops = batch * F.unet_forward_flops(256, 256, in_channels=4,
                                                 depth=5, start_filts=64)
        # isolate BN-train-mode cost: same batch, eval-mode BN (running
        # stats, no batch-stat computation), no mutable collection
        fwd_eval = jax.jit(lambda p, s: engine.weighted_ce_loss(
            model.apply({"params": p, "batch_stats": s}, x, train=False),
            y, (10.0, 300.0, 250.0)))
        t_fe = burst(lambda: fwd_eval(state.params, state.batch_stats))

        res[f"b{batch}"] = {
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd_evalbn_ms": round(t_fe * 1e3, 2),
            "grad_ms": round(t_g * 1e3, 2),
            "full_step_ms": round(t_s * 1e3, 2),
            "bwd_over_fwd": round((t_g - t_f) / t_f, 2),
            "fwd_mfu": round(F.mfu(fwd_flops, t_f) or 0, 4),
            "fwd_evalbn_mfu": round(F.mfu(fwd_flops, t_fe) or 0, 4),
            "grad_mfu_3x": round(F.mfu(3 * fwd_flops, t_g) or 0, 4),
        }
    save(out, "train_decomp", res)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="ab_f32,ab_bf16,slab_bound,decomp")
    ap.add_argument("--work", default="/tmp/r3tpu")
    ap.add_argument("--out", default="/tmp/r3tpu/results.json")
    a = ap.parse_args()
    os.makedirs(a.work, exist_ok=True)
    jaxcache = str(REPO / ".bench_cache" / "xla")
    try:
        import jax
        os.makedirs(jaxcache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", jaxcache)
    except Exception:
        pass
    for st in a.stages.split(","):
        log(f"=== stage {st}")
        t0 = time.time()
        if st == "ab_f32":
            stage_ab(a.work, a.out, "float32")
        elif st == "ab_bf16":
            stage_ab(a.work, a.out, "bfloat16")
        elif st == "slab_bound":
            stage_slab_bound(a.work, a.out)
        elif st == "decomp":
            stage_decomp(a.work, a.out)
        elif st == "train_decomp":
            stage_train_decomp(a.work, a.out)
        else:
            raise SystemExit(f"unknown stage {st}")
        log(f"=== {st} done in {(time.time()-t0)/60:.1f} min")


if __name__ == "__main__":
    main()
