"""Pallas TPU kernel: fused position-sensitive mask assembly (+ sigmoid).

Fuses, for every detection box, the whole chain the reference expressed as
``tf.map_fn(assemble_kmask_from_box) -> sum(scoremap * cellmask) ->
sigmoid`` (yolo3_net_pos.py:884-928) into one kernel, with two layouts
picked automatically by score-map size:

  * VMEM-resident (S <= ~half the 576 input): grid = (D,) one program per
    padded detection slot; the [k*k, S, S] score maps stay resident across
    the whole grid (3.0 MB at S=288), boxes are scalar-prefetched into
    SMEM, and each program computes its [S, S] logit map with separable
    row/col-bin accumulations on the VPU — no HBM re-reads of the score
    maps per box, which is what makes the jnp gather formulation
    bandwidth-bound.
  * spatially tiled (stride-1 decoder, S=576): grid walks row tiles; the
    k^2 score-map row-slices and all D boxes' output rows stream through
    VMEM per tile, removing the k^2*S^2 residency ceiling (measured
    123 ms jnp gather -> 108 us at S=576, D=30).

Numerics are identical to ops.mask_assembly (ties-to-even rounding of the
interior grid lines, half-open [g_i, g_{i+1}) bins, zero outside the box);
tests compare all layouts bit-for-bit in interpreter mode, and the
training path gets gradients through ``assemble_masks_trainable``'s
custom-VJP backward kernel (same two layouts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_LIMIT = 15 * 1024 * 1024     # leave 1 MB of the 16 MB to the compiler


def _resident_temps(size: int) -> int:
    """Per-program temporaries of the resident layout: the [S,S] acc and
    inner buffers plus indicator vectors and slack."""
    return 2 * size * size * 4 + (1 << 20)


def fits_vmem(size: int, k: int) -> bool:
    """Whether the fully-VMEM-resident kernel layout fits this size.

    The score maps stay resident (k^2 * S^2 f32) plus one double-buffered
    [S,S] output block and the accumulator temporaries; the chip's
    scoped-vmem limit is 16 MB.  At k=3, S=576 (stride-1 decoder on a 576
    input) the footprint is ~20 MB — ``assemble_masks_pallas`` then
    switches to the spatially-tiled layout below instead of falling back
    to the jnp gather (which measured 27.8 ms vs 51 us at S=288).
    """
    sm_bytes = k * k * size * size * 4
    block = size * size * 4                    # bpp >= 1, double-buffered
    return sm_bytes + 2 * block + _resident_temps(size) <= _VMEM_LIMIT


def _boxes_per_program(d: int, size: int, k: int) -> int:
    """Largest divisor of ``d`` whose output block fits the VMEM budget.

    Fewer grid steps amortize the ~30 us per-step overhead (5 -> 3 steps
    measured 66 -> 51 us at S=288, D=30).  The block budget is derived
    from the same total bound ``fits_vmem`` enforces — score maps +
    2 double-buffered output blocks + temporaries <= limit — so a size
    that passes ``fits_vmem`` can never overshoot here (the round-2
    advisor found the old fixed 4 MB cap could at S~480).
    """
    sm_bytes = k * k * size * size * 4
    budget_bytes = (_VMEM_LIMIT - sm_bytes - _resident_temps(size)) // 2
    budget = max(1, budget_bytes // (size * size * 4))
    for cand in range(min(d, budget), 0, -1):
        if d % cand == 0:
            return cand
    return 1


def _tile_rows(size: int, n_planes: int) -> int:
    """Row-tile height for the spatially-tiled layout.

    ``n_planes`` = number of [T, S] f32 planes held in double-buffered
    blocks per grid step (k^2 score-map slices + D output rows for the
    forward; R grad rows + k^2 accumulator slices for the backward).
    Picks the largest multiple-of-8 divisor of ``size`` whose working set
    2 * n_planes * T * S * 4 + temporaries fits the VMEM budget.
    """
    temps = 4 * size * 4 * 8 + (1 << 19)       # indicator rows + slack
    for t in range(size - size % 8, 7, -8):
        if size % t:
            continue
        if 2 * n_planes * t * size * 4 + 2 * t * size * 4 + temps <= _VMEM_LIMIT:
            return t
    return 8


def _assembly_kernel(boxes_ref, sm_ref, out_ref, *, k: int, size: int,
                     apply_sigmoid: bool, boxes_per_program: int):
    g = pl.program_id(0)
    # several boxes per program: per-grid-step overhead (~30 us on this
    # backend) would otherwise dominate the whole kernel at grid=(30,)
    for slot in range(boxes_per_program):
        d = g * boxes_per_program + slot
        _assemble_one(boxes_ref, sm_ref, out_ref, d, slot, k=k, size=size,
                      apply_sigmoid=apply_sigmoid)


def _assemble_one(boxes_ref, sm_ref, out_ref, d, slot, *, k: int, size: int,
                  apply_sigmoid: bool):
    # Separable formulation: the (ky, kx) cell mask is the outer product of
    # a row-bin indicator [S,1] and a col-bin indicator [1,S], so
    #   acc = sum_ky row[ky] * (sum_kx sm[ky*k+kx] * col[kx])
    # costs k*(k+2) fused multiply-adds per pixel instead of ~5*k^2
    # predicated selects.  tpu.iota only produces integers; cast once.
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(jnp.float32)
    gy, gx, row_ind, col_ind = _bin_indicators(boxes_ref, d, rows, cols, k)

    acc = jnp.zeros((size, size), jnp.float32)
    for ky in range(k):
        inner = jnp.zeros((size, size), jnp.float32)
        for kx in range(k):
            inner += sm_ref[ky * k + kx, :, :].astype(jnp.float32) * col_ind[kx]
        acc += row_ind[ky] * inner
    if apply_sigmoid:
        inside = (rows >= gy[0]) & (rows < gy[k]) & (cols >= gx[0]) & (cols < gx[k])
        acc = jnp.where(inside, jax.nn.sigmoid(acc), 0.0)
    out_ref[slot, :, :] = acc


def _bin_indicators(boxes_ref, d, rows, cols, k):
    """Grid lines + row/col bin indicators for box ``d`` (SMEM scalars).

    ``rows``/``cols`` carry *global* pixel coordinates so the same helper
    serves the resident layout (offset 0) and the tiled layout (offset
    j*T): the bin membership math never sees the tiling.
    """
    y1 = boxes_ref[d, 0]
    x1 = boxes_ref[d, 1]
    y2 = boxes_ref[d, 2]
    x2 = boxes_ref[d, 3]
    sub_h = (y2 - y1) / k
    sub_w = (x2 - x1) / k
    # interior grid lines, ties-to-even like jnp.round / tf.round
    gy = [y1] + [jnp.round(y1 + i * sub_h) for i in range(1, k)] + [y2]
    gx = [x1] + [jnp.round(x1 + i * sub_w) for i in range(1, k)] + [x2]
    row_ind = [((rows >= gy[i]) & (rows < gy[i + 1])).astype(jnp.float32)
               for i in range(k)]                     # k x [T,1]
    col_ind = [((cols >= gx[i]) & (cols < gx[i + 1])).astype(jnp.float32)
               for i in range(k)]                     # k x [1,S]
    return gy, gx, row_ind, col_ind


def _assembly_tiled_kernel(boxes_ref, sm_ref, out_ref, *, k: int, size: int,
                           tile: int, n_boxes: int, apply_sigmoid: bool):
    """Spatially-tiled layout: grid walks row-tiles; all boxes per program.

    Per grid step the k^2 score-map row-slices [k^2, T, S] and the per-box
    output rows [D, T, S] stream through VMEM while boxes stay resident in
    SMEM — removing the resident layout's k^2*S^2 VMEM ceiling, so the
    stride-1 S=576 decoder (yolo3_net_pos.py:415-461 feeding :884-928)
    runs the kernel instead of the 500x-slower jnp gather.  A per-box
    ``pl.when`` skips the bin math for tiles the box's row span misses
    (padding rows, being zero-extent, never intersect and cost only the
    zero-fill).
    """
    j = pl.program_id(0)
    row0 = (j * tile).astype(jnp.float32)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
            .astype(jnp.float32) + row0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(jnp.float32)
    for d in range(n_boxes):
        gy, gx, row_ind, col_ind = _bin_indicators(boxes_ref, d, rows, cols, k)
        intersects = (gy[k] > row0) & (gy[0] < row0 + tile)

        @pl.when(jnp.logical_not(intersects))
        def _():
            out_ref[d, :, :] = jnp.zeros((tile, size), jnp.float32)

        @pl.when(intersects)
        def _():
            acc = jnp.zeros((tile, size), jnp.float32)
            for ky in range(k):
                inner = jnp.zeros((tile, size), jnp.float32)
                for kx in range(k):
                    inner += (sm_ref[ky * k + kx, :, :].astype(jnp.float32)
                              * col_ind[kx])
                acc += row_ind[ky] * inner
            if apply_sigmoid:
                inside = ((rows >= gy[0]) & (rows < gy[k])
                          & (cols >= gx[0]) & (cols < gx[k]))
                acc = jnp.where(inside, jax.nn.sigmoid(acc), 0.0)
            out_ref[d, :, :] = acc


def _extract_fits(size: int, k: int, itemsize: int) -> bool:
    """Whether the one-shot channel-extraction kernel fits VMEM:
    sm2d [S, S*k^2] + one selection one-hot [S*k^2, S] + the full [k^2,S,S]
    f32 output must be resident together."""
    kk = k * k
    return (2 * kk * size * size * itemsize      # sm2d + sel temp
            + kk * size * size * 4               # output planes (f32)
            + (1 << 20)) <= _VMEM_LIMIT


def _extract_kernel(sm2d_ref, out_ref, *, k: int, size: int):
    """[S, S*k^2] (channels-minor, a FREE reshape of the head's [S,S,k^2]
    output) -> [k^2, S, S] channel planes, one one-hot matmul per channel.

    Negative result, kept opt-in (``use_extract``): built on the
    hypothesis that the XLA channels-first transpose was the assembly
    stage's hidden cost and the [S, S*k^2] reshape would be free.  Both
    halves are wrong on TPU — minor-dim (8,128) tiling makes the reshape
    a physical re-tiling, and the operand-layout probe showed the stage
    cost is invariant across transpose/padded-transpose/extract variants
    (the real cost is the score-map decoder subgraph itself,
    scripts/probe_operand_layout.py).  One-hot selection is exact: every
    output element is a single input value (no reductions > 1 term).
    """
    kk = k * k
    rows = jax.lax.broadcasted_iota(jnp.int32, (size * kk, size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (size * kk, size), 1)
    sm2d = sm2d_ref[:]
    for ch in range(kk):
        sel = (rows == cols * kk + ch).astype(sm2d.dtype)
        out_ref[ch, :, :] = jnp.dot(sm2d, sel,
                                    preferred_element_type=jnp.float32)


def _extract_planes(sm2d: jnp.ndarray, k: int, interpret: bool) -> jnp.ndarray:
    size = sm2d.shape[0]
    return pl.pallas_call(
        functools.partial(_extract_kernel, k=k, size=size),
        out_shape=jax.ShapeDtypeStruct((k * k, size, size), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sm2d)


def _call_assembly(sm_cf: jnp.ndarray, boxes_px: jnp.ndarray, k: int,
                   apply_sigmoid: bool, interpret: bool,
                   force_tiled: bool = False) -> jnp.ndarray:
    """Dispatch resident vs spatially-tiled layout on channels-first maps."""
    size = sm_cf.shape[1]
    d = boxes_px.shape[0]
    if fits_vmem(size, k) and not force_tiled:
        bpp = _boxes_per_program(d, size, k)
        kernel = functools.partial(_assembly_kernel, k=k, size=size,
                                   apply_sigmoid=apply_sigmoid,
                                   boxes_per_program=bpp)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,              # boxes go to SMEM
            grid=(d // bpp,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # full scoremap
            out_specs=pl.BlockSpec((bpp, size, size),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
    else:
        tile = _tile_rows(size, d + k * k)
        kernel = functools.partial(_assembly_tiled_kernel, k=k, size=size,
                                   tile=tile, n_boxes=d,
                                   apply_sigmoid=apply_sigmoid)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(size // tile,),
            in_specs=[pl.BlockSpec((k * k, tile, size),
                                   lambda j, *_: (0, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((d, tile, size),
                                   lambda j, *_: (0, j, 0),
                                   memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d, size, size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(boxes_px, sm_cf)


@functools.partial(jax.jit, static_argnames=("k", "apply_sigmoid", "interpret",
                                             "force_tiled", "operand_barrier",
                                             "use_extract"))
def assemble_masks_pallas(scoremap: jnp.ndarray, boxes_norm: jnp.ndarray,
                          k: int = 3, apply_sigmoid: bool = True,
                          interpret: bool = False,
                          force_tiled: bool = False,
                          operand_barrier: bool = False,
                          use_extract: bool = False) -> jnp.ndarray:
    """One image: scoremap [S,S,k*k], boxes_norm [D,4] yxyx -> [D,S,S].

    Padding rows (all-zero boxes) produce all-zero masks like the jnp path
    after validity masking: the box has zero extent, so ``inside`` is empty.
    Layout (VMEM-resident vs spatially tiled) is picked automatically from
    the score-map size; ``force_tiled`` pins the tiled path for testing.

    The scoremap dtype passes through to the kernel operand (the kernel
    accumulates in f32 either way); production callers pass the head's
    bf16 output directly — same values, half the operand bytes.
    ``operand_barrier`` optionally pins an ``optimization_barrier``
    between the channels-first transpose and the kernel; measured
    perf-neutral on both the bf16 and int8 serving graphs
    (scripts/probe_int8_materialize.py) and kept for experiments.

    ``use_extract`` routes the channels-first operand through the MXU
    one-hot extraction kernel instead of the XLA transpose.  Kept opt-in:
    its premise (the [S, S*k^2] reshape is free) is wrong on TPU — the
    9-wide minor dim is lane-padded, so the reshape is itself a physical
    re-tiling, and the kernel measured *slower* than the transpose on
    both serving graphs (f32 stage C 3.03 vs 2.93 ms, int8 3.7 vs 3.67;
    scripts/probe_operand_layout.py).  Exact either way (bit-parity
    tested), just not a win.
    """
    size = scoremap.shape[0]
    if scoremap.dtype not in (jnp.bfloat16, jnp.float32):
        scoremap = scoremap.astype(jnp.float32)
    if (use_extract and _extract_fits(size, k, scoremap.dtype.itemsize)
            and not force_tiled):
        sm2d = scoremap.reshape(size, size * k * k)
        sm_cf = _extract_planes(sm2d, k, interpret)
    else:
        sm_cf = jnp.transpose(scoremap, (2, 0, 1)).astype(jnp.float32)
        if operand_barrier:
            sm_cf = jax.lax.optimization_barrier(sm_cf)
    boxes_px = jnp.round(boxes_norm.astype(jnp.float32) * size)
    return _call_assembly(sm_cf, boxes_px, k, apply_sigmoid, interpret,
                          force_tiled)


def assemble_masks_batch_pallas(scoremaps: jnp.ndarray, boxes_norm: jnp.ndarray,
                                k: int = 3, apply_sigmoid: bool = True,
                                interpret: bool = False,
                                force_tiled: bool = False,
                                operand_barrier: bool = True) -> jnp.ndarray:
    """Batched: [B,S,S,k*k] + [B,D,4] -> [B,D,S,S]."""
    fn = lambda sm, bx: assemble_masks_pallas(sm, bx, k, apply_sigmoid,
                                              interpret, force_tiled,
                                              operand_barrier)
    return jax.vmap(fn)(scoremaps, boxes_norm)


# ---------------------------------------------------------------------------
# differentiable (custom-VJP) variant for the training path
# ---------------------------------------------------------------------------

def _assembly_px(scoremap_cf: jnp.ndarray, boxes_px: jnp.ndarray, k: int,
                 interpret: bool) -> jnp.ndarray:
    """Forward on channels-first score maps and already-rounded px boxes."""
    return _call_assembly(scoremap_cf, boxes_px, k, apply_sigmoid=False,
                          interpret=interpret)


def _assembly_bwd_kernel(boxes_ref, g_ref, out_ref, *, k: int, size: int):
    """d(loss)/d(scoremap): out[ky*k+kx] = sum_d g[d] * row_d[ky] x col_d[kx].

    grid=(D,) with a constant output block: Pallas keeps the accumulator
    resident across grid steps (revolving buffer); step 0 initializes.
    """
    d = pl.program_id(0)
    y1 = boxes_ref[d, 0]
    x1 = boxes_ref[d, 1]
    y2 = boxes_ref[d, 2]
    x2 = boxes_ref[d, 3]
    sub_h = (y2 - y1) / k
    sub_w = (x2 - x1) / k
    gy = [y1] + [jnp.round(y1 + i * sub_h) for i in range(1, k)] + [y2]
    gx = [x1] + [jnp.round(x1 + i * sub_w) for i in range(1, k)] + [x2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(jnp.float32)
    row_ind = [((rows >= gy[i]) & (rows < gy[i + 1])).astype(jnp.float32)
               for i in range(k)]
    col_ind = [((cols >= gx[i]) & (cols < gx[i + 1])).astype(jnp.float32)
               for i in range(k)]

    @pl.when(d == 0)
    def _():
        out_ref[:, :, :] = jnp.zeros((k * k, size, size), jnp.float32)

    g = g_ref[0, :, :]
    for ky in range(k):
        masked = g * row_ind[ky]
        for kx in range(k):
            out_ref[ky * k + kx, :, :] += masked * col_ind[kx]


def _assembly_bwd_tiled_kernel(boxes_ref, g_ref, out_ref, *, k: int,
                               size: int, tile: int, n_boxes: int):
    """Tiled backward: grid walks row-tiles; each tile's k^2 accumulator
    row-slices are disjoint from every other tile's, so there is no
    cross-grid-step accumulation — each program zero-fills its own slice
    and sums all R boxes into it.  Removes the k^2*S^2 resident-accumulator
    VMEM ceiling the same way the forward tiled layout does."""
    j = pl.program_id(0)
    row0 = (j * tile).astype(jnp.float32)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
            .astype(jnp.float32) + row0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(jnp.float32)
    out_ref[:, :, :] = jnp.zeros((k * k, tile, size), jnp.float32)
    for d in range(n_boxes):
        gy, gx, row_ind, col_ind = _bin_indicators(boxes_ref, d, rows, cols, k)
        intersects = (gy[k] > row0) & (gy[0] < row0 + tile)

        @pl.when(intersects)
        def _():
            g = g_ref[d, :, :]
            for ky in range(k):
                masked = g * row_ind[ky]
                for kx in range(k):
                    out_ref[ky * k + kx, :, :] += masked * col_ind[kx]


def _assembly_bwd(scoremap_cf_shape, boxes_px: jnp.ndarray, g: jnp.ndarray,
                  k: int, interpret: bool) -> jnp.ndarray:
    size = scoremap_cf_shape[1]
    d = g.shape[0]
    # resident layout needs the full k^2*S^2 accumulator + one double-
    # buffered [S,S] grad block in VMEM; otherwise tile over rows
    if (k * k * size * size * 4 + 2 * size * size * 4
            + _resident_temps(size) <= _VMEM_LIMIT):
        kernel = functools.partial(_assembly_bwd_kernel, k=k, size=size)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(d,),
            in_specs=[pl.BlockSpec((1, size, size), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # full accumulator
        )
    else:
        tile = _tile_rows(size, d + k * k)
        kernel = functools.partial(_assembly_bwd_tiled_kernel, k=k, size=size,
                                   tile=tile, n_boxes=d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(size // tile,),
            in_specs=[pl.BlockSpec((d, tile, size), lambda j, *_: (0, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((k * k, tile, size),
                                   lambda j, *_: (0, j, 0),
                                   memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k * k, size, size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(boxes_px, g.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def assemble_masks_trainable(scoremap: jnp.ndarray, boxes_px: jnp.ndarray,
                             k: int = 3, interpret: bool = False):
    """Differentiable fused assembly: scoremap [S,S,k*k] (+grad), boxes_px
    [R,4] rounded yxyx pixels (zero gradient — rounding kills it in the jnp
    path too) -> logits [R,S,S]."""
    sm_cf = jnp.transpose(scoremap, (2, 0, 1)).astype(jnp.float32)
    return _assembly_px(sm_cf, boxes_px.astype(jnp.float32), k, interpret)


def _amt_fwd(scoremap, boxes_px, k, interpret):
    out = assemble_masks_trainable(scoremap, boxes_px, k, interpret)
    return out, (scoremap.shape, boxes_px.astype(jnp.float32))


def _amt_bwd(k, interpret, res, g):
    scoremap_shape, boxes_px = res
    cf_shape = (scoremap_shape[2], scoremap_shape[0], scoremap_shape[1])
    g_cf = _assembly_bwd(cf_shape, boxes_px, g, k, interpret)
    g_sm = jnp.transpose(g_cf, (1, 2, 0))           # back to [S,S,k*k]
    return g_sm.astype(jnp.float32), jnp.zeros_like(boxes_px)


assemble_masks_trainable.defvjp(_amt_fwd, _amt_bwd)
