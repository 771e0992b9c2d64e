"""Fused windowed ROIAlign as a Pallas TPU kernel.

The XLA packed-pyramid path (ops/roi_align_packed.py) materializes every
roi's (Wd, Wd, C) window in HBM (a gather), then contracts — ~5x the
necessary HBM traffic.  This kernel fuses the two: each grid step DMAs one
roi's window HBM->VMEM and immediately contracts it with the roi's
interpolation banks on the MXU, writing only the (P, P, C) pooled tile.
Traffic drops to (windows read once) + (pooled tiles written once).

The interpolation banks Wy/Wx and window origins are computed outside
(vectorized, cheap); boxes are stop-gradiented upstream (proposals carry no
box gradient in the reference either), so the custom VJP only passes
gradients to the feature pyramid.

Both directions are bandwidth-shaped Pallas kernels with cross-program
double-buffered DMA (the TPU grid runs sequentially on one core, so scratch
persists across steps and program i prefetches roi i+1's window):
 - forward: window DMA -> two separable MXU contractions -> pooled tile;
 - backward: read-modify-write accumulation of dWin = Wy^T g Wx into the
   dPacked buffer in HBM.  XLA's scatter-add serializes overlapping block
   updates (~4x over BW); sequential grid programs make RMW race-free, and
   a host-precomputed conflict flag serializes only genuinely overlapping
   consecutive windows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["roi_align_windows_pallas"]


def _make_kernel(window: int, ph: int, c: int):
    wx_cols = window + 8  # column origins are 8-aligned; window is 8 wider

    def kernel(starts_ref, packed_ref, wy_ref, wx_ref, out_ref, win_scratch, sems):
        # Cross-program double buffering: the grid runs sequentially on one
        # core and scratch persists across steps, so program i issues the DMA
        # for roi i+1 before contracting roi i — window reads overlap the
        # matmuls instead of serializing (the original start();wait() per roi
        # left the MXU idle for the full DMA latency, ~4096x).
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma_for(slot, idx):
            b = starts_ref[0, idx]
            r0 = starts_ref[1, idx]
            c0 = pl.multiple_of(starts_ref[2, idx], 8)
            return pltpu.make_async_copy(
                packed_ref.at[b, pl.ds(r0, window), pl.ds(c0, wx_cols), :],
                win_scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(i == 0)
        def _():
            dma_for(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma_for((i + 1) % 2, i + 1).start()

        dma_for(i % 2, i).wait()
        win = win_scratch[i % 2].astype(jnp.float32).reshape(window, wx_cols * c)
        wy = wy_ref[0]  # (ph, window)
        t = jax.lax.dot_general(
            wy, win, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(ph, wx_cols, c)
        wx = wx_ref[0]  # (ph, wx_cols)
        for p in range(ph):
            out_ref[0, p] = jax.lax.dot_general(
                wx, t[p], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

    return kernel


@partial(jax.jit, static_argnames=("window", "ph", "interpret"))
def _forward(packed, starts, wy, wx, window: int, ph: int, interpret: bool = False):
    n = starts.shape[0]
    c = packed.shape[-1]
    # the full origin table rides in SMEM via scalar prefetch so any program
    # can address the NEXT roi's window for the double buffer; transposed to
    # (3, N) because SMEM pads the minor dimension to the 128-lane width
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed stays in HBM
            pl.BlockSpec((1, ph, window), lambda i, starts: (i, 0, 0)),
            pl.BlockSpec((1, ph, window + 8), lambda i, starts: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ph, ph, c), lambda i, starts: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, window + 8, c), packed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(window, ph, c),
        out_shape=jax.ShapeDtypeStruct((n, ph, ph, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.T, packed, wy, wx)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def roi_align_windows_pallas(packed, starts, wy, wx, window: int, ph: int, interpret: bool = False):
    """pooled (N, PH, PH, C) from packed (B, R, W, C) windows.

    starts: (N, 3) int32 (batch, row0, col0); wy/wx: (N, PH, window) f32.
    """
    return _forward(packed, starts, wy, wx, window, ph, interpret)


def _fwd(packed, starts, wy, wx, window, ph, interpret):
    out = _forward(packed, starts, wy, wx, window, ph, interpret)
    # packed itself rides in the residuals (shape/dtype source; it is kept
    # alive by the backbone's own conv residuals anyway)
    return out, (packed, starts, wy, wx)


def _make_bwd_kernel(window: int, ph: int, c: int):
    wx_cols = window + 8

    def kernel(starts_ref, g_ref, wy_ref, wxt_ref, acc_in_ref, acc_ref, win_scratch, s_scratch, rsems, wsems):
        # acc_in_ref is the zero-initialized operand aliased onto acc_ref
        # (input_output_aliases) — all access goes through acc_ref
        del acc_in_ref
        """Sequential read-modify-write accumulation of dWin into dPacked.

        XLA's scatter-add with overlapping block updates serializes per
        update (~4x slower than HBM bandwidth allows).  TPU grid programs
        run sequentially on one core, so read-add-write into HBM is
        race-free; double-buffered DMA keeps it bandwidth-bound.  The only
        hazard is roi i reading a window that roi i-1's in-flight write
        touches — the host precomputes a conflict flag (starts row 3) and
        the kernel serializes exactly those cases.
        """
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def window_ref(idx):
            b = starts_ref[0, idx]
            r0 = starts_ref[1, idx]
            c0 = pl.multiple_of(starts_ref[2, idx], 8)
            return acc_ref.at[b, pl.ds(r0, window), pl.ds(c0, wx_cols), :]

        def read_dma(slot, idx):
            return pltpu.make_async_copy(window_ref(idx), win_scratch.at[slot], rsems.at[slot])

        def write_dma(slot, idx):
            return pltpu.make_async_copy(win_scratch.at[slot], window_ref(idx), wsems.at[slot])

        slot = i % 2

        @pl.when(i == 0)
        def _():
            read_dma(0, 0).start()

        # Retire write(i-1) if still outstanding, then start read(i+1) EARLY
        # (before this roi's compute) on the no-conflict path so the read
        # overlaps compute(i)+write(i) — with the read issued after compute,
        # every roi paid read-latency + compute serially and the pass ran at
        # ~25% of HBM bandwidth.
        @pl.when(i + 1 < n)
        def _():
            @pl.when((i >= 1) & (starts_ref[3, i] == 0))
            def _():
                write_dma(1 - slot, i - 1).wait()

            @pl.when(starts_ref[3, i + 1] == 0)
            def _():
                read_dma((i + 1) % 2, i + 1).start()

        read_dma(slot, i).wait()

        # dwin = Wy^T g Wx added into the read window (f32 compute, stored in
        # the accumulator dtype — dPacked is cast to the feature dtype at the
        # end regardless, so a bf16 accumulator halves the RMW traffic).
        # Both contractions run on the MXU, mirroring the fwd kernel: the
        # VPU outer-product form (sum_q a[:,q,:]*wx[q]) was ~7x327k
        # multiply-adds per roi and made the whole pass VPU-compute-bound.
        g3 = g_ref[0]  # (ph, ph, c)
        wxt = wxt_ref[0]  # (wx_cols, ph)
        for p in range(ph):
            s_scratch[p] = jax.lax.dot_general(
                wxt, g3[p], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # (wx_cols, c) = sum_q wx[q,v] g[p,q,c]
        s2 = s_scratch[...].reshape(ph, wx_cols * c)
        dwin = jax.lax.dot_general(
            wy_ref[0], s2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(window, wx_cols, c)  # sum_p wy[p,w] s[p,v,c]
        win_scratch[slot] = win_scratch[slot] + dwin.astype(win_scratch.dtype)

        write_dma(slot, i).start()

        # Conflict path: read(i+1) overlaps write(i)'s window, so it could
        # not be issued early — serialize write(i) then read.  (write(i-1)
        # was already retired above.)  Each write sem is waited exactly once:
        # write(i) at roi i itself iff conflict[i+1], else at roi i+1.
        @pl.when((i + 1 < n) & (starts_ref[3, i + 1] != 0))
        def _():
            write_dma(slot, i).wait()
            read_dma((i + 1) % 2, i + 1).start()

        @pl.when(i + 1 >= n)
        def _():
            @pl.when((i >= 1) & (starts_ref[3, i] == 0))
            def _():
                write_dma(1 - slot, i - 1).wait()

            write_dma(slot, i).wait()

    return kernel


def _conflict_flags(starts, window, dist=1):
    """flag[i] = roi i's window intersects roi i-dist's (same batch,
    overlapping rows and columns in the packed frame)."""
    b, r0, c0 = starts[:, 0], starts[:, 1], starts[:, 2]
    prev = jnp.roll(starts, dist, axis=0)
    same_b = b == prev[:, 0]
    rows = jnp.abs(r0 - prev[:, 1]) < window
    cols = jnp.abs((c0 // 8) * 8 - (prev[:, 2] // 8) * 8) < window + 8
    flags = (same_b & rows & cols).astype(jnp.int32)
    return flags.at[:dist].set(0)


@partial(jax.jit, static_argnames=("packed_shape_dtype", "window", "ph", "interpret"))
def _backward(g, starts, wy, wx, packed_shape_dtype, window: int, ph: int, interpret: bool = False):
    n = starts.shape[0]
    c = packed_shape_dtype.shape[-1]
    acc_dtype = packed_shape_dtype.dtype
    acc0 = jnp.zeros(packed_shape_dtype.shape, acc_dtype)
    table = jnp.concatenate([starts, _conflict_flags(starts, window)[:, None]], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ph, ph, c), lambda i, t: (i, 0, 0, 0)),
            pl.BlockSpec((1, ph, window), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, window + 8, ph), lambda i, t: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # accumulator stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, window, window + 8, c), acc_dtype),
            pltpu.VMEM((ph, window + 8, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc = pl.pallas_call(
        _make_bwd_kernel(window, ph, c),
        out_shape=jax.ShapeDtypeStruct(packed_shape_dtype.shape, acc_dtype),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # accumulate in place (idx incl. prefetch arg)
        interpret=interpret,
    )(table.T, g, wy, jnp.swapaxes(wx, 1, 2), acc0)
    return acc


def _bwd(window, ph, interpret, res, g):
    packed, starts, wy, wx = res
    dpacked = _backward(
        g, starts, wy, wx,
        jax.ShapeDtypeStruct(packed.shape, packed.dtype),
        window, ph, interpret,
    )
    return dpacked, None, None, None


roi_align_windows_pallas.defvjp(_fwd, _bwd)



# ---------------------------------------------------------------------------
# Bucketed two-pass ROIAlign: small window for typical rois, large window for
# the extreme-aspect tail.
#
# At bench shapes the single 48x56-cell window moves 1.37 MB per roi — 5.6 GB
# per step forward, 11 GB backward — while Eq.1-assigned rois span 14..28
# cells: most of the HBM traffic is padding.  Rois are bucketed by their
# actual clipped span and each pass processes its bucket COMPACTED TO A
# PREFIX of the grid, so the cross-program double buffer still works and
# inactive tail programs cost only the grid-step floor.  No data is gathered
# for the compaction: the permutation rides in the scalar-prefetched table
# and the interpolation-bank / gradient / output blocks resolve through
# table-driven BlockSpec index maps.
#
# Both passes compute identical values for the rois they own (window rows
# beyond a roi's span carry zero interpolation weight), so pass 2 simply
# fills the large rois' slots in pass 1's output buffer (aliased in place);
# tail programs park their pipeline flush on a dump slot (row DST, index N).
#
# Table layout (int32, transposed to (8, N) for SMEM):
#   0:b  1:row0  2:col0  3:src block idx (tail->0)  4:n_active (broadcast)
#   5:conflict-with-previous  6:dst block idx (tail->N dump slot)
#   7:conflict-with-previous-but-one (bwd 3-slot pipeline hazard)
# ---------------------------------------------------------------------------

_SRC, _NACT, _CONF, _DST, _CONF2 = 3, 4, 5, 6, 7


def _make_prefix_kernel(window: int, ph: int, c: int, k: int):
    """K rois per grid program: the per-roi work (one ~0.7 MB window DMA +
    two skinny MXU contractions) is small enough that the fixed grid-step
    cost dominates at 4096 programs/pass; unrolling K rois into one program
    divides that overhead by K while keeping the exact per-roi
    double-buffered DMA schedule (parity follows the GLOBAL roi index, so
    the pipeline crosses group boundaries seamlessly).

    Output is written COMPACTED (processing order) through the normal
    pipeline BlockSpec — the caller un-permutes and merges the two passes
    (a couple of full-bandwidth row gathers, far cheaper than the grid
    steps saved)."""
    wx_cols = window + 8

    def kernel(table_ref, packed_ref, wy_ref, wx_ref, out_ref, win_scratch, rsems):
        i = pl.program_id(0)
        n_act = table_ref[_NACT, 0]

        def read_dma(slot, idx):
            b = table_ref[0, idx]
            r0 = table_ref[1, idx]
            c0 = pl.multiple_of(table_ref[2, idx], 8)
            return pltpu.make_async_copy(
                packed_ref.at[b, pl.ds(r0, window), pl.ds(c0, wx_cols), :],
                win_scratch.at[slot],
                rsems.at[slot],
            )

        for j in range(k):
            idx = i * k + j

            @pl.when(idx < n_act)
            def _(idx=idx, j=j):
                slot = idx % 2

                @pl.when(idx == 0)
                def _():
                    read_dma(0, 0).start()

                @pl.when(idx + 1 < n_act)
                def _():
                    read_dma((idx + 1) % 2, idx + 1).start()

                read_dma(slot, idx).wait()
                win = win_scratch[slot].astype(jnp.float32).reshape(window, wx_cols * c)
                wy = wy_ref[0, j]  # (ph, window)
                t = jax.lax.dot_general(
                    wy, win, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                ).reshape(ph, wx_cols, c)
                wx = wx_ref[0, j]  # (ph, wx_cols)
                for p in range(ph):
                    out_ref[0, j, p] = jax.lax.dot_general(
                        wx, t[p], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                    ).astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("window", "ph", "k", "interpret"))
def _forward_prefix(packed, table, wy, wx, window: int, ph: int, k: int = 8, interpret: bool = False):
    """One bucketed pass.  Returns (N, PH, PH, C) in PROCESSING order (this
    pass's rois compacted to the prefix; tail entries undefined).  Output
    rides in the feature dtype: downstream heads run in bf16 anyway, and a
    bf16 output halves the un-permute/merge traffic."""
    n = table.shape[0]
    assert n % k == 0, (n, k)
    c = packed.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed stays in HBM
            pl.BlockSpec((1, k, ph, window), lambda i, t: (i, 0, 0, 0)),
            pl.BlockSpec((1, k, ph, window + 8), lambda i, t: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, ph, ph, c), lambda i, t: (i, 0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, window + 8, c), packed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # wy/wx arrive in ORIGINAL roi order; permute into processing order via
    # the table's src column (a few-MB gather) and block K per program
    src = table[:, _SRC]
    wy_b = wy[src].reshape(n // k, k, ph, window)
    wx_b = wx[src].reshape(n // k, k, ph, window + 8)
    out = pl.pallas_call(
        _make_prefix_kernel(window, ph, c, k),
        out_shape=jax.ShapeDtypeStruct((n // k, k, ph, ph, c), packed.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(table.T, packed, wy_b, wx_b)
    return out.reshape(n, ph, ph, c)


def _make_prefix_bwd_kernel(window: int, ph: int, c: int, k: int):
    """K rois per grid program (see _make_prefix_kernel), RMW accumulation
    with a 3-slot pipeline.

    With 2 slots, read(i+2) reuses write(i)'s slot, forcing program i+1 to
    retire write(i) before its read-start — write completion lands on the
    critical path and the pass runs at ~25% of HBM bandwidth.  With 3 slots
    a write gets two programs of slack and fully overlaps.

    Hazard bookkeeping (all indices follow the GLOBAL roi index, so K-
    unrolling changes only the grid-step count, not the DMA order).
    write(j) is waited at EXACTLY one site:
      A (program j):   iff conf1[j+1]      — read(j+1) overlaps window j;
                       the read is then issued after the wait.
      B (program j+1): iff !conf1[j+1] & conf2[j+2] — read(j+2) overlaps
                       window j; waited just before that read is issued.
      C (program j+2): iff !conf1[j+1] & !conf2[j+2] — slot reuse only;
                       waited before read(j+3) recycles the slot.
    (Tail programs collapse the pending sites.)  Before any read(i+1) is
    issued, write(i-2) is always retired (site C or earlier) and
    write(i-1) either retired or — when conf2[i+1]==0 — provably disjoint."""
    wx_cols = window + 8

    def kernel(table_ref, g_ref, wy_ref, wxt_ref, acc_in_ref, acc_ref, win_scratch, s_scratch, rsems, wsems):
        del acc_in_ref  # aliased onto acc_ref
        i = pl.program_id(0)
        n_act = table_ref[_NACT, 0]

        def window_ref(idx):
            b = table_ref[0, idx]
            r0 = table_ref[1, idx]
            c0 = pl.multiple_of(table_ref[2, idx], 8)
            return acc_ref.at[b, pl.ds(r0, window), pl.ds(c0, wx_cols), :]

        def read_dma(slot, idx):
            return pltpu.make_async_copy(window_ref(idx), win_scratch.at[slot], rsems.at[slot])

        def write_dma(slot, idx):
            return pltpu.make_async_copy(win_scratch.at[slot], window_ref(idx), wsems.at[slot])

        for j in range(k):
            idx = i * k + j

            @pl.when(idx < n_act)
            def _(idx=idx, j=j):
                slot = idx % 3
                n_total = pl.num_programs(0) * k
                # clamped SMEM reads: the values only feed conditions that
                # are and-ed with the range guards, so the clamp is inert
                c1_next = table_ref[_CONF, jnp.minimum(idx + 1, n_total - 1)]
                c1_prev = table_ref[_CONF, jnp.maximum(idx - 1, 0)]

                @pl.when(idx == 0)
                def _():
                    read_dma(0, 0).start()

                @pl.when(idx + 1 < n_act)
                def _():
                    # site C: retire write(idx-2) before its slot is recycled
                    @pl.when(
                        (idx >= 2) & (c1_prev == 0) & (table_ref[_CONF2, idx] == 0)
                    )
                    def _():
                        write_dma((idx - 2) % 3, idx - 2).wait()

                    # site B: read(idx+1) overlaps window(idx-1)
                    @pl.when(
                        (idx >= 1)
                        & (table_ref[_CONF, idx] == 0)
                        & (table_ref[_CONF2, jnp.minimum(idx + 1, n_total - 1)] != 0)
                    )
                    def _():
                        write_dma((idx - 1) % 3, idx - 1).wait()

                    # early read: overlaps this roi's compute + write
                    @pl.when(c1_next == 0)
                    def _():
                        read_dma((idx + 1) % 3, idx + 1).start()

                read_dma(slot, idx).wait()

                # both contractions on the MXU (see _make_bwd_kernel note)
                g3 = g_ref[0, j].astype(jnp.float32)  # (ph, ph, c)
                wxt = wxt_ref[0, j]  # (wx_cols, ph)
                for p in range(ph):
                    s_scratch[p] = jax.lax.dot_general(
                        wxt, g3[p], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                    )
                s2 = s_scratch[...].reshape(ph, wx_cols * c)
                dwin = jax.lax.dot_general(
                    wy_ref[0, j], s2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                ).reshape(window, wx_cols, c)
                win_scratch[slot] = win_scratch[slot] + dwin.astype(win_scratch.dtype)

                write_dma(slot, idx).start()

                # site A: read(idx+1) overlaps write(idx)'s window — serialize
                @pl.when((idx + 1 < n_act) & (c1_next != 0))
                def _():
                    write_dma(slot, idx).wait()
                    read_dma((idx + 1) % 3, idx + 1).start()

                # tail: retire every write still outstanding
                @pl.when(idx + 1 >= n_act)
                def _():
                    @pl.when(
                        (idx >= 2) & (c1_prev == 0) & (table_ref[_CONF2, idx] == 0)
                    )
                    def _():
                        write_dma((idx - 2) % 3, idx - 2).wait()

                    @pl.when((idx >= 1) & (table_ref[_CONF, idx] == 0))
                    def _():
                        write_dma((idx - 1) % 3, idx - 1).wait()

                    write_dma(slot, idx).wait()

    return kernel


@partial(jax.jit, static_argnames=("window", "ph", "k", "interpret"))
def _backward_prefix(g, table, wy, wx, acc, window: int, ph: int, k: int = 8, interpret: bool = False):
    """One bucketed RMW pass accumulating dWin into ``acc`` (aliased)."""
    n = table.shape[0]
    assert n % k == 0, (n, k)
    c = acc.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // k,),
        in_specs=[
            pl.BlockSpec((1, k, ph, ph, c), lambda i, t: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, k, ph, window), lambda i, t: (i, 0, 0, 0)),
            pl.BlockSpec((1, k, window + 8, ph), lambda i, t: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),  # accumulator stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, window, window + 8, c), acc.dtype),
            pltpu.VMEM((ph, window + 8, c), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    # g/wy/wx arrive in ORIGINAL roi order; permute into processing order and
    # block K per program (the g permute is a ~200 MB row gather, ~0.5 ms —
    # the grid-step savings dwarf it); wx rides transposed for the MXU form
    src = table[:, _SRC]
    g_b = g[src].reshape(n // k, k, ph, ph, c)
    wy_b = wy[src].reshape(n // k, k, ph, window)
    wx_b = jnp.swapaxes(wx[src], 1, 2).reshape(n // k, k, window + 8, ph)
    return pl.pallas_call(
        _make_prefix_bwd_kernel(window, ph, c, k),
        out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},
        interpret=interpret,
    )(table.T, g_b, wy_b, wx_b, acc)


def _bucket_tables(starts, order, n_act, n, window):
    """Build the (N, 7) table for one compacted pass.

    starts: (N, 3) in ORIGINAL roi order; order: (N,) processing order with
    this pass's rois first; n_act: scalar count of active rois.
    """
    perm_starts = starts[order]  # (N, 3) tiny gather
    idx = jnp.arange(n, dtype=jnp.int32)
    active = idx < n_act
    src = jnp.where(active, order, 0).astype(jnp.int32)
    dst = jnp.where(active, order, n).astype(jnp.int32)
    conflict = _conflict_flags(perm_starts, window)
    conflict2 = _conflict_flags(perm_starts, window, dist=2)
    nact_col = jnp.full((n,), n_act, jnp.int32)
    return jnp.concatenate(
        [perm_starts, src[:, None], nact_col[:, None], conflict[:, None], dst[:, None],
         conflict2[:, None]],
        axis=1,
    )


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def roi_align_windows_bucketed(
    packed, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l, small_mask_key,
    window_s: int, window_l: int, ph: int, interpret: bool = False,
):
    """Bucketed pooled (N, PH, PH, C) — see module comment above.

    starts_s/wy_s/wx_s: per-roi meta for the small window; starts_l/...: for
    the large window (both in original roi order).  small_mask_key is unused
    here; bucketing happens inside from the (N,) bool mask passed as
    ``small_mask_key``.
    """
    out, _ = _bucketed_fwd(
        packed, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l, small_mask_key,
        window_s, window_l, ph, interpret,
    )
    return out


def _bucketed_passes(small_mask):
    n = small_mask.shape[0]
    rank = jnp.where(small_mask, 0, 1).astype(jnp.int32)
    order_s = jnp.argsort(rank, stable=True).astype(jnp.int32)   # smalls first
    order_l = jnp.argsort(1 - rank, stable=True).astype(jnp.int32)  # larges first
    n_small = jnp.sum(small_mask).astype(jnp.int32)
    return order_s, order_l, n_small, n - n_small


def _k_per_program(n: int) -> int:
    """Largest unroll factor in {8, 4, 2, 1} dividing the roi count."""
    for k in (8, 4, 2):
        if n % k == 0:
            return k
    return 1


def _bucketed_fwd(packed, starts_s, wy_s, wx_s, starts_l, wy_l, wx_l, small_mask,
                  window_s, window_l, ph, interpret):
    n = starts_s.shape[0]
    k = _k_per_program(n)
    order_s, order_l, n_small, n_large = _bucketed_passes(small_mask)
    table_s = _bucket_tables(starts_s, order_s, n_small, n, window_s)
    table_l = _bucket_tables(starts_l, order_l, n_large, n, window_l)
    out_s = _forward_prefix(packed, table_s, wy_s, wx_s, window_s, ph, k=k, interpret=interpret)
    out_l = _forward_prefix(packed, table_l, wy_l, wx_l, window_l, ph, k=k, interpret=interpret)
    # un-permute each pass from processing order back to roi order and merge
    # (inactive tail entries carry garbage but are never selected)
    arange = jnp.arange(n, dtype=jnp.int32)
    inv_s = jnp.zeros((n,), jnp.int32).at[order_s].set(arange)
    inv_l = jnp.zeros((n,), jnp.int32).at[order_l].set(arange)
    out = jnp.where(small_mask[:, None, None, None], out_s[inv_s], out_l[inv_l])
    res = (packed, table_s, wy_s, wx_s, table_l, wy_l, wx_l)
    return out, res


def _bucketed_bwd(window_s, window_l, ph, interpret, res, g):
    packed, table_s, wy_s, wx_s, table_l, wy_l, wx_l = res
    # g stays in the cotangent dtype (bf16 in production) — the kernel
    # casts per-block; halves the permute-gather + block-pipeline traffic
    k = _k_per_program(table_s.shape[0])
    acc = jnp.zeros(packed.shape, packed.dtype)
    # each pass reads only its own rois' gradient blocks (src indirection),
    # so g needs no masking; the two RMW passes chain on one aliased frame
    acc = _backward_prefix(g, table_s, wy_s, wx_s, acc, window_s, ph, k=k, interpret=interpret)
    acc = _backward_prefix(g, table_l, wy_l, wx_l, acc, window_l, ph, k=k, interpret=interpret)
    return acc, None, None, None, None, None, None, None


roi_align_windows_bucketed.defvjp(_bucketed_fwd, _bucketed_bwd)
