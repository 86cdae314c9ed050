"""Pallas TPU kernel: fused DIA SpMV.

XLA executes the DIA matvec `sum_k data[k] * shift(x, d_k)` as K separate
materialized shifted streams; this kernel fuses them: each grid block loads
its x window ONCE (tile + halo, one DMA from HBM) and accumulates all K
offset products in VMEM, reading `data` tiles through the regular pipeline.

Memory per block: (K, T) data tile + (T + 2 H_pad) x window; traffic per
output element ~ (K + 1) reads + 1 write — the memory-bound optimum.

Requires max |offset| <= H_pad and n divisible by T (pad x/data with zeros).
Falls back to interpreter mode off-TPU (tests).

KNOWN LIMITATION: the current 1D formulation fails Mosaic compilation on
real TPUs (the dev harness' remote compile helper returns an opaque 500;
1D VMEM refs and arbitrary lane-offset slices are the likely culprits — a
2D (sublane, lane) reformulation is the fix, see ops/grid_dia.py for the
XLA-level 2D-stencil alternative). Interpreter-mode correctness is tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_spmv"]

TILE = 64 * 1024


def _kernel(offsets, H, T, x_hbm, data_ref, out_ref, x_win, sem):
    i = pl.program_id(0)
    # one DMA: the x window [i*T - H + H_pad_origin ... ) — x_hbm is
    # pre-padded by H zeros on both sides, so window start = i*T is safe
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * T, T + 2 * H)], x_win, sem
    )
    dma.start()
    dma.wait()
    acc = jnp.zeros((T,), out_ref.dtype)
    for k, d in enumerate(offsets):
        acc = acc + data_ref[k, :] * x_win[pl.ds(H + d, T)]
    out_ref[:] = acc


def dia_spmv(data, offsets, x, interpret: bool | None = None):
    """y = A @ x for DIA storage (data (K, n), sorted static offsets).

    n must be a multiple of TILE (pad with zeros); max |offset| <= TILE.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K, n = data.shape
    assert n % TILE == 0, f"pad n to a multiple of {TILE}"
    H = max(abs(d) for d in offsets)
    # round halo to lane multiple for aligned DMAs
    H = ((H + 127) // 128) * 128
    assert H <= TILE
    x_pad = jnp.concatenate([jnp.zeros(H, x.dtype), x, jnp.zeros(H, x.dtype)])
    grid = n // TILE
    kernel = functools.partial(_kernel, tuple(offsets), H, TILE)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((K, TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE + 2 * H,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, data)
