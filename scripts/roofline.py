"""Per-layer roofline of the flagship U-Net forward on the real chip.

The fused predict chunk measures ~44 % MFU and the forward alone ~60 %
(BASELINE.md).  This script answers WHERE the remaining 40 % of the
forward goes: every layer of the inference-geometry forward (batch 32,
256x256x4, depth-5/64, BN folded, bf16) is timed standalone and compared
against its v5e roofline bound

    t_bound = max(FLOPs / peak_MXU,  bytes_moved / peak_HBM_BW)

so each layer lands in one of three buckets: at its bound (nothing left),
bandwidth-bound by nature (maxpool/concat/transpose-conv relayout), or
genuinely underperforming (optimization target).  The whole jitted
forward is timed alongside the sum of layers, so XLA's cross-layer
fusion/overlap shows up as sum-vs-whole slack.

Reference context: the torch model (reference models/unet.py:169-343)
never saw this analysis — the reference publishes no perf numbers at all
(SURVEY.md §6).

  python scripts/roofline.py [--batch 32] [--train-batch 4]
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

# v5e per-chip peaks: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM (public spec).
PEAK_HBM_BW = 819e9


def sync(o):
    # block_until_ready under-blocks through the axon tunnel; a tiny d2h
    # reduction is an ordered fence
    return float(np.asarray(jnp.sum(o.astype(jnp.float32)[..., :1, :1])))


def burst(fn, *a, reps=3, n=16):
    from crimac_unet_tpu.utils.timing import burst_time
    return burst_time(fn, *a, reps=reps, burst=n, sync=sync)


def gate(s, a):
    """Multiply ``a`` by a scalar that is numerically exactly 1 but
    data-dependent on the loop carry ``s`` — XLA cannot hoist any
    computation consuming ``gate(s, a)`` out of the loop."""
    return a * (1.0 + s * 1e-12).astype(a.dtype)


def chain_time(fn, *args, iters=32, reps=3, reduce_out=False):
    """Per-application device time of ``fn(s, *args)``, measured as an
    on-device ``fori_loop`` of ``iters`` applications.

    Through the axon tunnel every dispatch costs ~1-2 ms even
    back-to-back, which swamps sub-millisecond layers when timed with
    host-side bursts (the first version of this script measured a 1.7 ms
    floor under every op).  Chaining on device amortizes that floor to
    ~floor/iters.  ``fn`` receives the carried f32 scalar ``s`` (the
    previous output's first element) and MUST gate its computation on it
    — e.g. scale the conv weights by ``gate(s, w)`` — so iterations
    serialize and nothing hoists.  Only the scalar is carried: a big
    tensor in the carry costs real copy bandwidth per iteration (a first
    version carried the input and measured +2.7 ms/iter at 268 MB).
    """
    # NB: the loop body must consume the jit lambda's *traced* args, not
    # close over the caller's device arrays — closed-over arrays embed as
    # HLO constants and blow the remote-compile request size (HTTP 413).
    # Consumption: y[0] suffices for conv/pool outputs (XLA does not
    # slice computation through conv/reduce_window), but pure data ops
    # (elementwise, concat) get DCE-pruned to one element — those must
    # pass reduce_out=True to consume the full output (at the cost of an
    # extra read pass, usually fused away into the producer).
    if reduce_out:
        consume = lambda y: jnp.sum(y.astype(jnp.float32))
    else:
        consume = lambda y: y.reshape(-1)[0].astype(jnp.float32)
    looped = jax.jit(lambda *a: jax.lax.fori_loop(
        0, iters,
        lambda i, acc: consume(fn(acc, *a)),
        jnp.float32(0.0)))
    from crimac_unet_tpu.utils.timing import burst_time
    t_loop = burst_time(looped, *args, reps=reps, burst=1,
                        sync=lambda o: float(np.asarray(o)))
    return max(t_loop - _round_trip(), 0.0) / iters


def _round_trip():
    """Dispatch + 1-scalar d2h round trip of a trivial jitted call — the
    fixed cost every chained-loop timing pays once per call (~20-30 ms
    through the axon tunnel).  Measured once, subtracted in chain_time."""
    if not hasattr(_round_trip, "t"):
        from crimac_unet_tpu.utils.timing import burst_time
        f = jax.jit(lambda x: (x * 2).reshape(-1)[0].astype(jnp.float32))
        _round_trip.t = burst_time(f, jnp.zeros((8, 128), jnp.bfloat16),
                                   reps=5, burst=1,
                                   sync=lambda o: float(np.asarray(o)))
        print(f"per-call round trip (subtracted from chained timings): "
              f"{_round_trip.t*1e3:.2f} ms")
    return _round_trip.t


def conv_bias_relu(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def convT_bias(x, w, b):
    y = jax.lax.conv_transpose(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def concat(a, b):
    return jnp.concatenate([a, b], axis=-1)


def layer_specs(B, H, W, depth=5, sf=64, cin0=4, n_classes=3):
    """(name, kind, B, H, W, Cin, Cout) for every op of the folded-BN
    inference forward, in execution order."""
    specs = []
    h, w, cin = H, W, cin0
    for i in range(depth):
        cout = sf * 2 ** i
        specs.append((f"down{i}.conv1", "conv3", B, h, w, cin, cout))
        specs.append((f"down{i}.conv2", "conv3", B, h, w, cout, cout))
        cin = cout
        if i < depth - 1:
            specs.append((f"down{i}.pool", "pool", B, h, w, cout, cout))
            h, w = h // 2, w // 2
    for j in range(depth - 1):
        cout = cin // 2
        specs.append((f"up{j}.convT", "convT", B, h, w, cin, cout))
        h, w = 2 * h, 2 * w
        specs.append((f"up{j}.concat", "concat", B, h, w, cout, 2 * cout))
        specs.append((f"up{j}.conv1", "conv3", B, h, w, 2 * cout, cout))
        specs.append((f"up{j}.conv2", "conv3", B, h, w, cout, cout))
        cin = cout
    specs.append(("head.conv1x1", "conv1", B, h, w, cin, n_classes))
    return specs


def op_cost(kind, B, H, W, Ci, Co, bytes_el=2):
    """(FLOPs, min HBM bytes) of one op.  Bytes = inputs + outputs +
    weights, bf16; the true minimum traffic if VMEM captures all reuse."""
    px_in, px_out = B * H * W, B * H * W
    if kind == "conv3":
        flops = 2 * px_out * 9 * Ci * Co
        by = (px_in * Ci + px_out * Co + 9 * Ci * Co) * bytes_el
    elif kind == "conv1":
        flops = 2 * px_out * Ci * Co
        by = (px_in * Ci + px_out * Co + Ci * Co) * bytes_el
    elif kind == "convT":  # 2x2 stride 2: each input px -> 4 outputs
        flops = 2 * px_in * 4 * Ci * Co
        by = (px_in * Ci + 4 * px_out * Co + 4 * Ci * Co) * bytes_el
    elif kind == "pool":
        flops = 0
        by = (px_in * Ci + px_in // 4 * Ci) * bytes_el
    elif kind == "concat":  # H,W here are post-upsample; Ci=half, Co=full
        flops = 0
        by = 2 * px_in * Co * bytes_el
    else:
        raise ValueError(kind)
    return flops, by


def run_layers(B, H, W, peak_flops, tag):
    from crimac_unet_tpu.utils.flops import unet_forward_flops
    rng = np.random.RandomState(0)
    rows = []
    # Streaming probe: a gated multiply fused into a full-tensor sum —
    # one HBM read pass over the largest activation shape.  Reports the
    # achievable read bandwidth through the harness.
    xprobe = jnp.asarray(rng.randn(B, H, W, 64) * .1, jnp.bfloat16)
    t_probe = chain_time(lambda s, xx: gate(s, xx), xprobe,
                         iters=128, reduce_out=True)
    by_probe = xprobe.size * 2
    print(f"\n[{tag}] streaming-read probe ({B}x{H}x{W}x64 bf16): "
          f"{t_probe*1e3:.2f} ms for {by_probe/1e6:.0f} MB -> "
          f"{by_probe/max(t_probe,1e-9)/1e9:.0f} GB/s "
          f"(peak {PEAK_HBM_BW/1e9:.0f})")
    print(f"\n== {tag}: per-layer roofline, batch {B}, {H}x{W}, bf16 ==")
    print(f"{'layer':<14} {'GFLOP':>8} {'MB':>7} {'bound':>8} {'meas':>8} "
          f"{'eff':>5} {'MFU':>5}  limit")
    t_sum = t_bound_sum = 0.0
    for name, kind, b, h, w, ci, co in layer_specs(B, H, W):
        flops, byts = op_cost(kind, b, h, w, ci, co)
        t_flop, t_bw = flops / peak_flops, byts / PEAK_HBM_BW
        t_bound = max(t_flop, t_bw)
        # enough iterations that the loop body dwarfs the ~24 ms
        # per-call round trip even for near-bound fast ops
        iters = int(min(512, max(48, 0.12 / max(t_bound, 2e-5))))
        x = jnp.asarray(rng.randn(b, h, w, ci) * .1, jnp.bfloat16)
        if kind in ("conv3", "conv1"):
            k = 3 if kind == "conv3" else 1
            wgt = jnp.asarray(rng.randn(k, k, ci, co) * .05, jnp.bfloat16)
            bias = jnp.asarray(rng.randn(co) * .05, jnp.bfloat16)
            t = chain_time(lambda s, x, w, b:
                           conv_bias_relu(x, gate(s, w), b), x, wgt, bias,
                           iters=iters)
        elif kind == "convT":
            wgt = jnp.asarray(rng.randn(2, 2, ci, co) * .05, jnp.bfloat16)
            bias = jnp.asarray(rng.randn(co) * .05, jnp.bfloat16)
            t = chain_time(lambda s, x, w, b:
                           convT_bias(x, gate(s, w), b), x, wgt, bias,
                           iters=iters)
        elif kind == "pool":
            # no small arg to gate: the scale fuses into the pool's read
            t = chain_time(lambda s, x: maxpool(gate(s, x)), x,
                           iters=iters)
        else:  # concat: two half-channel inputs at this resolution.
            # reduce_out: y[0]-consumption DCE-prunes a pure concat; the
            # full-sum consumption usually fuses, so this row measures
            # read-both-inputs (+accumulate) — a lower bound on the
            # in-network cost where the concat must materialize.
            a = jnp.asarray(rng.randn(b, h, w, ci) * .1, jnp.bfloat16)
            t = chain_time(lambda s, x, a: concat(gate(s, x), a),
                           jnp.asarray(x[..., :ci]), a,
                           iters=iters, reduce_out=True)
        lim = "MXU" if t_flop >= t_bw else "HBM"
        t = max(t, 1e-9)
        eff = t_bound / t
        mfu = flops / t / peak_flops
        t_sum += t
        t_bound_sum += t_bound
        rows.append(dict(layer=name, kind=kind, gflop=flops / 1e9,
                         mb=byts / 1e6, t_bound_ms=t_bound * 1e3,
                         t_ms=t * 1e3, eff=eff, mfu=mfu, limit=lim))
        print(f"{name:<14} {flops/1e9:8.1f} {byts/1e6:7.1f} "
              f"{t_bound*1e3:7.2f}m {t*1e3:7.2f}m {eff:5.0%} {mfu:5.0%}  "
              f"{lim}")
    tot_flops = unet_forward_flops(H, W) * B
    print(f"{'SUM':<14} {tot_flops/1e9:8.1f} {'':>7} {t_bound_sum*1e3:7.2f}m"
          f" {t_sum*1e3:7.2f}m {t_bound_sum/t_sum:5.0%} "
          f"{tot_flops/t_sum/peak_flops:5.0%}")
    return rows, t_sum, t_bound_sum, tot_flops


def build_weights(B, H, W):
    """Random bf16 weights for every op of layer_specs, keyed by name."""
    rng = np.random.RandomState(7)
    ws = {}
    for name, kind, b, h, w, ci, co in layer_specs(B, H, W):
        if kind in ("conv3", "conv1", "convT"):
            k = {"conv3": 3, "conv1": 1, "convT": 2}[kind]
            ws[name] = (jnp.asarray(rng.randn(k, k, ci, co) * .05,
                                    jnp.bfloat16),
                        jnp.asarray(rng.randn(co) * .05, jnp.bfloat16))
    return ws


def forward_prefix(s, x, ws, specs, n_ops):
    """Apply the first n_ops ops of the spec'd U-Net forward (with real
    skip connections); gate(s, .) on the first conv weight serializes
    chain iterations."""
    skips = []
    y = x
    for idx, (name, kind, *_rest) in enumerate(specs[:n_ops]):
        if kind in ("conv3", "conv1"):
            w, b = ws[name]
            if idx == 0:
                w = gate(s, w)
            y = conv_bias_relu(y, w, b) if kind == "conv3" else \
                jax.lax.conv_general_dilated(
                    y, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        elif kind == "pool":
            skips.append(y)  # conv2 output of this level (not bottleneck)
            y = maxpool(y)
        elif kind == "convT":
            w, b = ws[name]
            y = convT_bias(y, w, b)
        elif kind == "concat":
            y = concat(skips.pop(), y)
    return y


def run_prefixes(B, H, W, peak_flops):
    """In-context per-block times: time growing prefixes of the forward
    (one cut after each down/up block) and diff — unlike the standalone
    per-layer timings this keeps XLA's cross-layer fusion, so the deltas
    show where the WHOLE forward's time actually goes."""
    specs = layer_specs(B, H, W)
    ws = build_weights(B, H, W)
    cuts, last_block = [], None
    for idx, (name, *_r) in enumerate(specs):
        blk = name.split(".")[0]
        if last_block is not None and blk != last_block:
            cuts.append((last_block, idx))
        last_block = blk
    cuts.append((last_block, len(specs)))

    x = jnp.asarray(np.random.RandomState(3).randn(B, H, W, 4) * .1,
                    jnp.bfloat16)
    print(f"\n== in-context per-block times (prefix diffs), batch {B} ==")
    print(f"{'block':<10} {'GFLOP':>8} {'bound':>8} {'meas':>8} {'eff':>5} "
          f"{'MFU':>5}")
    t_prev = 0.0
    rows = []
    for blk, n_ops in cuts:
        t = chain_time(
            lambda s, x, ws, _specs=specs, _n=n_ops:
                forward_prefix(s, x, ws, _specs, _n),
            x, ws, iters=16)
        lo = 0 if not rows else rows[-1][1]
        fl = by = 0
        t_bound = 0.0
        for name, kind, b, h, w, ci, co in specs[lo:n_ops]:
            f_, by_ = op_cost(kind, b, h, w, ci, co)
            fl += f_
            t_bound += max(f_ / peak_flops, by_ / PEAK_HBM_BW)
        dt = t - t_prev
        print(f"{blk:<10} {fl/1e9:8.1f} {t_bound*1e3:7.2f}m {dt*1e3:7.2f}m "
              f"{t_bound/max(dt,1e-9):5.0%} "
              f"{fl/max(dt,1e-9)/peak_flops:5.0%}")
        rows.append((blk, n_ops, dt, t_bound, fl))
        t_prev = t
    print(f"{'TOTAL':<10} {sum(r[4] for r in rows)/1e9:8.1f} "
          f"{sum(r[3] for r in rows)*1e3:7.2f}m {t_prev*1e3:7.2f}m")
    return rows


def run_whole_forward(B, H, W, peak_flops):
    """The real folded-BN bf16 model end-to-end (what predict runs)."""
    import dataclasses
    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.models.fold_bn import fold_variables
    model = UNet(dtype=jnp.bfloat16)
    vs = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, H, W, 4), jnp.bfloat16), train=False)
    folded_params = fold_variables(
        {"params": vs["params"], "batch_stats": vs["batch_stats"]})
    folded = dataclasses.replace(model, use_bn=False)
    x = jnp.asarray(np.random.RandomState(1).randn(B, H, W, 4) * .1,
                    jnp.bfloat16)
    t = chain_time(lambda s, xx, p: folded.apply(p, gate(s, xx),
                                                 train=False),
                   x, folded_params, iters=8)
    from crimac_unet_tpu.utils.flops import unet_forward_flops
    fl = unet_forward_flops(H, W) * B
    print(f"\nwhole forward (folded BN): {t*1e3:.2f} ms  "
          f"{fl/t/1e12:.1f} TFLOP/s  MFU {fl/t/peak_flops:.1%}")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--train-batch", type=int, default=0,
                    help="also roofline at this (small) train batch")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--no-prefix", action="store_true",
                    help="skip the in-context prefix-diff pass")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".bench_cache" / "xla"))
    from crimac_unet_tpu.utils.flops import device_peak_flops
    peak = device_peak_flops() or 197e12
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; peak {peak/1e12:.0f} TFLOP/s bf16, "
          f"HBM {PEAK_HBM_BW/1e9:.0f} GB/s")
    tiny = jnp.zeros((8, 128), jnp.bfloat16)
    floor = burst(jax.jit(lambda x: x + 1), tiny)
    print(f"per-dispatch floor (tunnel): {floor*1e3:.2f} ms -> layers are "
          f"timed as on-device fori_loop chains (floor/iters amortized)")

    rows, t_sum, t_bound, fl = run_layers(args.batch, args.size, args.size,
                                          peak, "inference")
    t_whole = run_whole_forward(args.batch, args.size, args.size, peak)
    print(f"sum-of-layers {t_sum*1e3:.2f} ms vs whole {t_whole*1e3:.2f} ms "
          f"(fusion/overlap {t_sum/t_whole:.2f}x); roofline-bound floor "
          f"{t_bound*1e3:.2f} ms -> max achievable MFU at this geometry "
          f"{fl/t_bound/peak:.1%}")
    if not args.no_prefix:
        run_prefixes(args.batch, args.size, args.size, peak)
    if args.train_batch:
        run_layers(args.train_batch, args.size, args.size, peak,
                   f"train-batch fwd")


if __name__ == "__main__":
    main()
