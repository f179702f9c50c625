"""Real-chip eval throughput across transfer_dtype settings.

Measures evaluate_reader (eval_mode='all') on the bench fixture at
float32 / bfloat16 / uint8 h2d slabs, asserting the label-chain
invariants (scored-pixel count, positive split) are identical across
dtypes.  Results recorded in BASELINE.md."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

import bench  # noqa: E402  (fixture + config constants)

cache_dir = Path(bench.__file__).resolve().parent / ".bench_cache" / "xla"
cache_dir.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
from crimac_unet_tpu.models.unet import build_unet
from crimac_unet_tpu.ops import metrics as M
from crimac_unet_tpu.pipeline.inference import GriddedRunner, evaluate_reader

sv_path = bench.ensure_fixture()
reader = DataReaderZarr(str(sv_path))
config = {"patch_size": [bench.PATCH, bench.PATCH],
          "patch_overlap": bench.OVERLAP, "frequencies": bench.FREQS,
          "fwd_batch": 32, "compute_dtype": "bfloat16", "depth": 5,
          "start_filts": 64}
model = build_unet(config)
import jax.numpy as jnp
x = jnp.zeros((1, bench.PATCH, bench.PATCH, len(bench.FREQS)), jnp.float32)
variables = jax.jit(lambda k: model.init(k, x, train=False))(
    jax.random.PRNGKey(0))

results = {}
hists = {}
for td in ("float32", "bfloat16", "uint8"):
    runner = GriddedRunner(model, variables, dict(config, transfer_dtype=td))
    t0 = time.time()
    hists[td] = np.asarray(evaluate_reader(runner, reader,
                                           M.new_histogram()))  # compile
    print(f"# {td}: compile+first pass {time.time()-t0:.1f}s", flush=True)
    best = None
    for i in range(2):
        t0 = time.time()
        h = np.asarray(evaluate_reader(runner, reader, M.new_histogram()))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"# {td} pass {i}: {bench.N_PINGS/dt:.1f} pings/s", flush=True)
    results[td] = round(bench.N_PINGS / best, 1)

h32 = hists["float32"]
for td in ("bfloat16", "uint8"):
    assert hists[td].sum() == h32.sum(), (td, hists[td].sum(), h32.sum())
    assert hists[td][0].sum() == h32[0].sum(), td
    f1s = [M.max_f1(M.pr_curve_from_histogram(h))[0]
           for h in (h32, hists[td])]
    print(f"# {td}: label-chain invariants exact; "
          f"F1 {f1s[1]:.5f} vs f32 {f1s[0]:.5f} (|d|={abs(f1s[1]-f1s[0]):.2e})",
          flush=True)
print({"eval_pings_per_sec": results})
