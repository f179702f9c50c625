"""Pallas 2x2/stride-2 maxpool for the level-0 (C=64) U-Net activations.

XLA's standalone ``reduce_window`` lowering of the level-0 pool runs at
~16 % of its HBM roofline on v5e (2.5 ms at the 32x256x256x64 bf16
serving geometry vs a 0.41 ms bound — r3/r4 rooflines); in-context the
relu+pool fusion is better but still leaves ~1 ms on the table.  The
deeper pools (C>=128) run at their bound, so only the C=64 level gets a
kernel.  Reference op: maxpool at crimac_unet/models/unet.py:86.

Kernel design (r5 campaign; full experiment log in docs/SESSIONS.md
round 5 — nine formulations timed on the chip):

* **Work in XLA's conv output layout.**  TPU convs produce NHWC arrays
  with layout ``{3,0,2,1}`` — memory order ``[h][w][b][c]`` (batch
  second-minor!).  The kernel therefore consumes the array through
  ``transpose(1,2,0,3) + reshape`` views that XLA折 turns into pure
  bitcasts (verified in optimized HLO: no copy between the conv and
  the custom call), where every 128-lane tile packs ``(b, c)`` pairs —
  B*C = 2048 fully-packed lanes at the serving geometry, vs 64
  half-filled lanes in the naive NHWC view (a 2x VMEM/DMA tax measured
  on copies: 310 GB/s vs 648 GB/s).
* view ``(H/2, 2*W*B*C)``: each row is one H-pair ``[h even | h odd]``;
  the pair-halves enter as TWO block-aligned input refs of the same
  array (lane-block index offset) — H-pair max is a plain elementwise
  max.  (A leading-dim reshape-split pair max measured 193 GB/s; a
  stride-2 sublane slice does not compile; ``pltpu.roll`` crashes this
  rig's remote Mosaic compiler.)
* within each block, W-pairs are adjacent ``2*B*C``-lane groups:
  the W-pair max is a static aligned-slice max per group, concatenated
  — no lane shifts, no junk lanes, COMPACT output.
* the pooled result leaves in the same ``[h][w][b][c]`` memory order,
  which is exactly the ``{3,0,2,1}`` layout the next conv wants — the
  output transpose is again a bitcast.

Traffic is the minimum possible (read x, write x/4); measured standalone
~1.9 ms at batch 32 vs 2.5 ms for standalone reduce_window (and the
best 2-D variant 0.64 ms with in-kernel-gated timing).

**Measured verdict (r5, full fused forward on the chip): the kernel
LOSES in context and ships default-OFF.**  Serving forward 24.1 ms
(XLA pool) vs 26.0 ms (this kernel) vs 31.4 ms (fused relu+skip+pool
variant).  Mechanism, from the optimized-HLO copy census: the custom
call pins its operand/result layouts, and XLA's layout assignment
reflows AROUND it — the full model gains ~193 MB of layout copies
(67 MB kernel input, 67 MB output transpose, plus cascading relayouts
of the down1-down3 conv outputs that a pool kernel never touches),
where the isolated chain managed pure bitcasts.  In-context XLA also
multi-output-fuses [relu -> skip] + [pool] into one pass over the conv
output, so the standalone 2.5 ms reduce_window number overstates the
in-context pool cost (~1 ms).  The knob remains for A/B
(``pallas_pool: true``) and the kernels remain hardware-validated
bit-equal; 'auto' resolves to False.

NaN contract: bit-equal to ``reduce_window(max)`` including NaN
propagation (elementwise ``jnp.maximum`` throughout — no compactor
matmul since the r5 rewrite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(e_ref, o_ref, out_ref, *, bc, ngr):
    hm = jnp.maximum(e_ref[:], o_ref[:])          # H-pair max (th, ngr*2bc)
    parts = [jnp.maximum(hm[:, k * 2 * bc: k * 2 * bc + bc],
                         hm[:, k * 2 * bc + bc: (k + 1) * 2 * bc])
             for k in range(ngr)]                 # W-pair max per group
    out_ref[:] = parts[0] if ngr == 1 else jnp.concatenate(parts, axis=1)


def _plan(b, h, w, c):
    """(th, ngr, nj) block plan or None when unsupported."""
    bc = b * c
    if bc % 128 != 0 or h % 2 or w % 2 or h < 2:
        return None
    wbc = w * bc
    # lane block = ngr W-pair groups; keep blocks <= ~1 MB
    ngr = 1
    while (ngr * 4 * bc <= 16384 and wbc % (ngr * 2 * 2 * bc) == 0
           and ngr < w // 2):
        ngr *= 2
    lb = ngr * 2 * bc
    if wbc % lb:
        return None
    rows = h // 2
    th = 0
    for cand in (32, 16, 8):
        if rows % cand == 0:
            th = cand
            break
    if not th:
        return None
    return th, ngr, wbc // lb


def supported(shape, dtype) -> bool:
    """True for geometries the kernel handles: 4-D NHWC bf16 with
    B*C a 128-multiple (full lane tiles), even H/W.  The level-0
    activations at every production batch (4/8/16/32 x 256 x 256 x 64,
    and eval sub-batches that are multiples of 2) qualify; deeper
    levels (C>=128 at bound already) simply never ask."""
    if len(shape) != 4 or jnp.dtype(dtype) != jnp.bfloat16:
        return False
    return _plan(*shape) is not None


def maxpool2x2(x, *, interpret: bool = False):
    """2x2/stride-2 VALID maxpool, bit-equal to ``reduce_window(max)``
    for supported geometries (tests/test_pallas_pool.py; NaN semantics
    identical — pure elementwise maxes)."""
    b, h, w, c = x.shape
    plan = _plan(b, h, w, c)
    if plan is None:
        raise ValueError(f"unsupported pool geometry {x.shape} "
                         f"{x.dtype} — gate on supported() first")
    th, ngr, nj = plan
    bc = b * c
    wbc = w * bc
    lb = ngr * 2 * bc
    v = jnp.transpose(x, (1, 2, 0, 3)).reshape(h // 2, 2 * wbc)
    z = pl.pallas_call(
        functools.partial(_kernel, bc=bc, ngr=ngr),
        out_shape=jax.ShapeDtypeStruct((h // 2, wbc // 2), x.dtype),
        grid=(h // 2 // th, nj),
        in_specs=[
            pl.BlockSpec((th, lb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, lb), lambda i, j, nj=nj: (i, j + nj),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, lb // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(v, v)
    return jnp.transpose(z.reshape(h // 2, w // 2, b, c), (2, 0, 1, 3))


def maxpool2x2_reference(x):
    """The XLA lowering the kernel replaces (also the fallback)."""
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def resolve_flag(value, dtype) -> bool:
    """Resolve the ``pallas_pool`` config knob: True/False pass through
    (explicit True is the A/B switch); 'auto' resolves to **False** —
    the r5 full-forward A/B measured the kernel slower in context
    (24.1 -> 26.0 ms serving forward; layout-pin copy cascade, see
    module docstring), so XLA's lowering stays the production path."""
    if value in (True, False):
        return bool(value)
    return False


# ---------------------------------------------------------------- fused
# relu + skip + pool in one pass (the XLA graph this replaces is the
# multi-output fusion [relu -> skip tensor] + [pool], which reads the
# raw conv output once and writes skip+pooled — the kernel matches that
# minimal traffic but runs the pool math at full lane rate).

def _fused_kernel(x_ref, skip_ref, pool_ref, *, bc, ngr):
    p = pl.program_id(2)                      # H-parity (arbitrary dim)
    a = jax.nn.relu(x_ref[:])                 # (th, ngr*2bc)
    skip_ref[:] = a
    parts = [jnp.maximum(a[:, k * 2 * bc: k * 2 * bc + bc],
                         a[:, k * 2 * bc + bc: (k + 1) * 2 * bc])
             for k in range(ngr)]
    wm = parts[0] if ngr == 1 else jnp.concatenate(parts, axis=1)

    @pl.when(p == 0)
    def _():
        pool_ref[:] = wm

    @pl.when(p == 1)
    def _():
        pool_ref[:] = jnp.maximum(pool_ref[:], wm)


def relu_pool_skip(x, *, interpret: bool = False):
    """``x`` = RAW level-0 conv output (pre-ReLU).  Returns
    ``(pooled, skip)`` where ``skip = relu(x)`` and
    ``pooled = maxpool2x2(skip)`` — one read of ``x``, one write each.
    The pool output block is revisited across the H-parity grid dim
    (sequential 'arbitrary' innermost dimension)."""
    b, h, w, c = x.shape
    plan = _plan(b, h, w, c)
    if plan is None:
        raise ValueError(f"unsupported pool geometry {x.shape} "
                         f"{x.dtype} — gate on supported() first")
    th, ngr, nj = plan
    bc = b * c
    wbc = w * bc
    lb = ngr * 2 * bc
    v = jnp.transpose(x, (1, 2, 0, 3)).reshape(h // 2, 2 * wbc)
    skip, pool = pl.pallas_call(
        functools.partial(_fused_kernel, bc=bc, ngr=ngr),
        out_shape=(jax.ShapeDtypeStruct((h // 2, 2 * wbc), x.dtype),
                   jax.ShapeDtypeStruct((h // 2, wbc // 2), x.dtype)),
        grid=(h // 2 // th, nj, 2),
        in_specs=[
            pl.BlockSpec((th, lb), lambda i, j, p, nj=nj: (i, j + p * nj),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((th, lb), lambda i, j, p, nj=nj: (i, j + p * nj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, lb // 2), lambda i, j, p: (i, j),
                         memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(v)
    skip4 = jnp.transpose(
        skip.reshape(h // 2, 2, w, b, c).reshape(h, w, b, c), (2, 0, 1, 3))
    pool4 = jnp.transpose(pool.reshape(h // 2, w // 2, b, c), (2, 0, 1, 3))
    return pool4, skip4
