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
gradients to the feature pyramid — via the XLA scatter formulation.
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

    def kernel(starts_ref, packed_ref, wy_ref, wx_ref, out_ref, win_scratch, sem):
        b = starts_ref[0, 0, 0]
        r0 = starts_ref[0, 0, 1]
        c0 = starts_ref[0, 0, 2]
        c0 = pl.multiple_of(c0, 8)
        dma = pltpu.make_async_copy(
            packed_ref.at[b, pl.ds(r0, window), pl.ds(c0, wx_cols), :],
            win_scratch,
            sem,
        )
        dma.start()
        dma.wait()
        win = win_scratch[:].astype(jnp.float32).reshape(window, wx_cols * c)
        wy = wy_ref[0]  # (ph, window)
        t = jax.lax.dot_general(
            wy, win, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(ph, wx_cols, c)
        wx = wx_ref[0]  # (ph, window)
        for p in range(ph):
            out_ref[0, p] = jax.lax.dot_general(
                wx, t[p], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

    return kernel


@partial(jax.jit, static_argnames=("window", "ph", "interpret"))
def _forward(packed, starts, wy, wx, window: int, ph: int, interpret: bool = False):
    n = starts.shape[0]
    c = packed.shape[-1]
    # per-program (1, 3) SMEM block for the window origin: keeps SMEM usage
    # at a few bytes per step instead of the whole (N, 3) table
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 3), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed stays in HBM
            pl.BlockSpec((1, ph, window), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ph, window + 8), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ph, ph, c), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((window, window + 8, c), packed.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _make_kernel(window, ph, c),
        out_shape=jax.ShapeDtypeStruct((n, ph, ph, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.reshape(n, 1, 3), packed, wy, wx)


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


def _bwd(window, ph, interpret, res, g):
    packed, starts, wy, wx = res
    n = starts.shape[0]
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )

    # dWin[n] = Wy[n]^T @ g[n] @ Wx[n] -> scatter-add windows into dPacked;
    # chunked scan keeps the dWin intermediate bounded
    chunk = min(256, n)
    pad = (-n) % chunk
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0), (0, 0)))

    def body(acc, args):
        st, wy_c, wx_c, g_c = args
        t = jnp.einsum("npw,npqc->nwqc", wy_c, g_c, preferred_element_type=jnp.float32)
        dwin = jnp.einsum("nwqc,nqv->nwvc", t, wx_c, preferred_element_type=jnp.float32)
        acc = jax.lax.scatter_add(
            acc, st, dwin, dnums, mode=jax.lax.GatherScatterMode.CLIP
        )
        return acc, None

    acc0 = jnp.zeros(packed.shape, jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        acc0,
        (
            starts.reshape(-1, chunk, 3),
            wy.reshape(-1, chunk, *wy.shape[1:]),
            wx.reshape(-1, chunk, *wx.shape[1:]),
            g.reshape(-1, chunk, *g.shape[1:]),
        ),
    )
    return acc.astype(packed.dtype), None, None, None


roi_align_windows_pallas.defvjp(_fwd, _bwd)
