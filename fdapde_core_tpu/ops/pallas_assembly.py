"""Pallas TPU kernel: fused P1 local stiffness assembly (2D).

The general assembly path (fem/assembler.py) is an XLA einsum chain; for the
P1/2D hot case the local stiffness has a closed form

    A = (b b^T + c c^T) / (4 area),   b = (y2-y3, y3-y1, y1-y2),
                                      c = (x3-x2, x1-x3, x2-x1)

(the reference evaluates the same bilinear form by quadrature,
fem_assembler.h:79-110; for P1 the integrand is constant per cell). This
kernel computes it in one fused pass over a struct-of-arrays layout:
coordinates as (6, C) and output as (9, C), so the *cell* axis sits on the
128-wide TPU lanes — every op is an elementwise VPU op on (rows, TILE)
blocks, with no layout changes or reductions.

On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["p1_stiffness_2d", "p1_stiffness_edges", "p1_stiffness_edges_offdiag"]

TILE = 64 * 1024  # large tiles amortize per-block overhead (1.8x vs 512, measured)


def _kernel(xy_ref, out_ref):
    x1, y1 = xy_ref[0, :], xy_ref[1, :]
    x2, y2 = xy_ref[2, :], xy_ref[3, :]
    x3, y3 = xy_ref[4, :], xy_ref[5, :]
    b1, b2, b3 = y2 - y3, y3 - y1, y1 - y2
    c1, c2, c3 = x3 - x2, x1 - x3, x2 - x1
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    inv = 1.0 / (2.0 * jnp.abs(det))
    out_ref[0, :] = (b1 * b1 + c1 * c1) * inv
    out_ref[1, :] = (b1 * b2 + c1 * c2) * inv
    out_ref[2, :] = (b1 * b3 + c1 * c3) * inv
    out_ref[3, :] = out_ref[1, :]
    out_ref[4, :] = (b2 * b2 + c2 * c2) * inv
    out_ref[5, :] = (b2 * b3 + c2 * c3) * inv
    out_ref[6, :] = out_ref[2, :]
    out_ref[7, :] = out_ref[5, :]
    out_ref[8, :] = (b3 * b3 + c3 * c3) * inv


def p1_stiffness_2d(coords_t: jnp.ndarray, interpret: bool | None = None):
    """Local stiffness of the (positive) Dirichlet form int grad.grad.

    coords_t: (6, C) cell vertex coordinates (x1,y1,x2,y2,x3,y3 rows), C a
    multiple of TILE (pad with any nondegenerate triangle). Returns (9, C):
    rows are the row-major entries of the 3x3 local matrices.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = coords_t.shape[1]
    assert C % TILE == 0, f"pad the cell axis to a multiple of {TILE}"
    return pl.pallas_call(
        _kernel,
        grid=(C // TILE,),
        in_specs=[pl.BlockSpec((6, TILE), lambda i: (0, i))],
        out_specs=pl.BlockSpec((9, TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((9, C), coords_t.dtype),
        interpret=interpret,
    )(coords_t)


# ---------------------------------------------------------------------------
# Edge-vector variant on the padding-free 3D layout (the fast path).
#
# Measured facts driving the design (benchmarks/micro_assembly{3..6}.py,
# TPU v5e, 20M cells, f32):
# - (rows, C) 2D layouts tile-pad sublanes (6->8, 9->16) in HBM; the
#   (rows, C/128, 128) 3D layout has the minor two dims tile exactly: rows
#   become a pure major dim, zero padding.
# - the local stiffness is translation invariant, so the kernel takes the
#   EDGE VECTORS u = p2-p1, v = p3-p1 (4 rows) instead of raw coordinates
#   (6 rows): 33% less input traffic and fewer VPU ops. b/c coefficient
#   vectors (fem closed form, see p1_stiffness_2d above) become
#   b = (uy-vy, vy, -uy), c = (vx-ux, -vx, ux), det = ux*vy - vx*uy.
# - plain XLA loses here: its elementwise fusion recomputes det/inv per
#   OUTPUT ROW and re-reads all input rows per output row (measured 8.3 ms
#   vs 3.9 ms for this kernel).
# ---------------------------------------------------------------------------

EDGE_TILE_S = 1024  # sublane block of the (4, L, 128) layout


def _edges_kernel(s_ref, e_ref, out_ref):
    s = s_ref[0]
    ux, uy, vx, vy = e_ref[0] + s, e_ref[1], e_ref[2], e_ref[3]
    det = ux * vy - vx * uy
    inv = 1.0 / (2.0 * jnp.abs(det))
    b1, b2, b3 = uy - vy, vy, -uy
    c1, c2, c3 = vx - ux, -vx, ux
    out_ref[0] = (b1 * b1 + c1 * c1) * inv
    out_ref[1] = (b1 * b2 + c1 * c2) * inv
    out_ref[2] = (b1 * b3 + c1 * c3) * inv
    out_ref[3] = (b2 * b2 + c2 * c2) * inv
    out_ref[4] = (b2 * b3 + c2 * c3) * inv
    out_ref[5] = (b3 * b3 + c3 * c3) * inv


def p1_stiffness_edges(edges, eps=None, interpret: bool | None = None):
    """Packed symmetric P1 stiffness from edge vectors (3D layout).

    edges: (4, L, 128) rows (ux, uy, vx, vy) = (p2-p1, p3-p1) per cell,
    L a multiple of EDGE_TILE_S. Returns (6, L, 128) packed rows
    [a11, a12, a13, a22, a23, a33] of the (positive) form int grad.grad
    (expand with ops.closed_form.SYM_TO_FULL).

    eps: optional scalar added to row 0 inside the kernel — benchmark
    harnesses pass a loop-varying value to defeat loop-invariant hoisting
    with zero extra memory traffic; production passes None (0.0).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, L, lanes = edges.shape
    assert lanes == 128 and L % EDGE_TILE_S == 0, (
        f"pad the packed cell axis to a multiple of {EDGE_TILE_S}"
    )
    s = jnp.zeros((1,), edges.dtype) if eps is None else jnp.reshape(eps, (1,))
    S = EDGE_TILE_S
    return pl.pallas_call(
        _edges_kernel,
        grid=(L // S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, S, 128), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((6, S, 128), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((6, L, 128), edges.dtype),
        interpret=interpret,
    )(s, edges)


def _edges_offdiag_kernel(s_ref, e_ref, out_ref):
    s = s_ref[0]
    ux, uy, vx, vy = e_ref[0] + s, e_ref[1], e_ref[2], e_ref[3]
    det = ux * vy - vx * uy
    inv = 1.0 / (2.0 * jnp.abs(det))
    b1, b2, b3 = uy - vy, vy, -uy
    c1, c2, c3 = vx - ux, -vx, ux
    out_ref[0] = (b1 * b2 + c1 * c2) * inv
    out_ref[1] = (b1 * b3 + c1 * c3) * inv
    out_ref[2] = (b2 * b3 + c2 * c3) * inv


def p1_stiffness_edges_offdiag(edges, eps=None, interpret: bool | None = None):
    """Off-diagonal-only P1 stiffness: (4, L, 128) edges -> (3, L, 128)
    rows [a12, a13, a23].

    Stiffness rows sum to zero (sum_i b_i = sum_i c_i = 0), so the three
    off-diagonals determine the local matrix exactly: a_pp = -(a_pq + a_pr).
    Output traffic drops 24 -> 12 B/cell (40 -> 28 total — the kernel is
    HBM-stream-bound, so throughput rises proportionally; measured in
    benchmarks/micro_assembly8.py). Consumers reconstruct diagonals: the
    structured path does it at the STENCIL level (grid_assembly.
    p1_grid_stencil_offdiag — the center layer is -(sum of off-diagonal
    layers), one dense pass, exact). Valid for laplacian/diffusion forms
    (constants in the kernel of the gradient); NOT for reaction/mass terms.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, L, lanes = edges.shape
    assert lanes == 128 and L % EDGE_TILE_S == 0, (
        f"pad the packed cell axis to a multiple of {EDGE_TILE_S}"
    )
    s = jnp.zeros((1,), edges.dtype) if eps is None else jnp.reshape(eps, (1,))
    S = EDGE_TILE_S
    return pl.pallas_call(
        _edges_offdiag_kernel,
        grid=(L // S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, S, 128), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((3, S, 128), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, L, 128), edges.dtype),
        interpret=interpret,
    )(s, edges)


# ---------------------------------------------------------------------------
# Coordinate-plane (grid-native) variant — the round-2 fast path.
#
# Round-8/9 measurements (benchmarks/micro_assembly{7,8,9}.py, TPU v5e):
# - the edge kernel sits EXACTLY on the pallas DMA roofline (an identity
#   copy of the same operand set takes the same 2.1-2.6 ms) — compute is
#   fully hidden; input bytes cost ~2.7x output bytes,
# - so the win is shrinking traffic: node COORDINATE planes (2 x (m, m),
#   85 MB) replace per-cell edge vectors (4 planes over cells, 328 MB), and
#   only the three off-diagonal entries are emitted (row-sum-zero identity)
#   in quad-grid layout (6 planes (n, n) for cell types A and B),
# - manual double-buffered DMA with 8-row-aligned overlapping slabs (a
#   65-row slab crashes the Mosaic compiler; R+8 works) and
#   vmem_limit_bytes raised past the ~16 MB default.
# Measured: 11.9 G elements/s (1.73 ms for 20.48M cells) vs 7.9 G for the
# round-1 edge kernel — and the quad-grid output feeds the pad-sum stencil
# conversion (ops/grid_assembly.stencil_from_offdiag_planes) with no
# relayout.
# ---------------------------------------------------------------------------


def _coords_offdiag_planes(x0, y0, xs, ys, lane_roll):
    """Off-diagonal planes for cell types A and B from coordinate slabs.

    x0/y0: coord rows r; xs/ys: coord rows r+1. lane_roll(a) must produce
    a[:, j] <- a[:, j+1] (wrap at the padded tail is harmless: junk lanes
    are sliced away by the consumer).
    """
    rx = lane_roll(x0) - x0  # right edge at row r
    ry = lane_roll(y0) - y0
    dx = xs - x0  # down edge
    dy = ys - y0
    rxn = lane_roll(xs) - xs  # right edge at row r+1
    ryn = lane_roll(ys) - ys

    def offdiag(ux, uy, vx, vy):
        det = ux * vy - vx * uy
        # zero (junk-region) dets must yield 0, not inf: downstream
        # validity MASKING multiplies by 0 and inf*0 = NaN
        inv = jnp.where(det != 0, 1.0 / (2.0 * jnp.abs(det)), 0.0)
        b1, b2, b3 = uy - vy, vy, -uy
        c1, c2, c3 = vx - ux, -vx, ux
        return (
            (b1 * b2 + c1 * c2) * inv,
            (b1 * b3 + c1 * c3) * inv,
            (b2 * b3 + c2 * c3) * inv,
        )

    # type A (a, b, a+1): u = down, v = right
    a = offdiag(dx, dy, rx, ry)
    # type B (b, b+1, a+1): u = right@(r+1), v = right - down
    b = offdiag(rxn, ryn, rx - dx, ry - dy)
    return a + b  # (a12, a13, a23, b12, b13, b23)


def p1_offdiag_planes_from_coords(X, Y, n: int, block_rows: int = 256,
                                  n_buf: int = 3, eps=None,
                                  interpret: bool | None = None):
    """(6, n, n) off-diagonal planes [a12,a13,a23,b12,b13,b23] from node
    coordinate planes.

    X, Y: (>= n + 8, W) coordinate planes, W a multiple of 128 with
    W >= n + 1; row i / lane j hold the coordinates of grid node (i, j)
    (rows beyond n and lanes beyond n may hold arbitrary finite junk).
    n must be a multiple of (128 and block_rows).

    On TPU this runs the manual double-buffered DMA kernel; on other
    backends an equivalent XLA expression (same math, same outputs).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        lane_roll = lambda a: jnp.roll(a, -1, axis=1)
        Xe = X if eps is None else X + eps
        planes = _coords_offdiag_planes(
            Xe[:n], Y[:n], Xe[1 : n + 1], Y[1 : n + 1], lane_roll
        )
        return jnp.stack([p[:, :n] for p in planes])

    R = block_rows
    assert n % R == 0 and n % 128 == 0
    W = X.shape[1]
    assert W % 128 == 0 and W >= n + 1 and X.shape[0] >= n + 8
    n_chunks = n // R
    SLAB = R + 8  # 8-row-aligned overlap (65-row slabs fail Mosaic)
    dtype = X.dtype

    def _kernel(s_ref, x_hbm, y_hbm, out_hbm):
        def body(xin, yin, oscr, in_sem, out_sem):
            def in_dma(slot, k):
                return (
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(k * R, SLAB), :], xin.at[slot],
                        in_sem.at[slot, 0],
                    ),
                    pltpu.make_async_copy(
                        y_hbm.at[pl.ds(k * R, SLAB), :], yin.at[slot],
                        in_sem.at[slot, 1],
                    ),
                )

            def out_dma(slot, k):
                return pltpu.make_async_copy(
                    oscr.at[slot], out_hbm.at[:, pl.ds(k * R, R), :],
                    out_sem.at[slot],
                )

            for w in range(min(n_buf - 1, n_chunks)):
                for d in in_dma(w, w):
                    d.start()

            def loop(k, _):
                cur = k % n_buf

                @pl.when(k + n_buf - 1 < n_chunks)
                def _():
                    for d in in_dma((k + n_buf - 1) % n_buf, k + n_buf - 1):
                        d.start()

                for d in in_dma(cur, k):
                    d.wait()

                @pl.when(k >= n_buf)
                def _():
                    out_dma(cur, k - n_buf).wait()

                x = xin[cur]
                y = yin[cur]
                sh = W - 1
                planes = _coords_offdiag_planes(
                    x[0:R] + s_ref[0], y[0:R], x[1 : R + 1] + s_ref[0],
                    y[1 : R + 1], lambda a: pltpu.roll(a, sh, 1),
                )
                for p in range(6):
                    oscr[cur, p] = planes[p][:, :n]
                out_dma(cur, k).start()
                return _

            jax.lax.fori_loop(0, n_chunks, loop, None)
            for d in range(max(0, n_chunks - n_buf), n_chunks):
                out_dma(d % n_buf, d).wait()

        pl.run_scoped(
            body,
            xin=pltpu.VMEM((n_buf, SLAB, W), dtype),
            yin=pltpu.VMEM((n_buf, SLAB, W), dtype),
            oscr=pltpu.VMEM((n_buf, 6, R, n), dtype),
            in_sem=pltpu.SemaphoreType.DMA((n_buf, 2)),
            out_sem=pltpu.SemaphoreType.DMA((n_buf,)),
        )

    s = jnp.zeros((1,), dtype) if eps is None else jnp.reshape(eps, (1,))
    return pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((6, n, n), dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(s, X, Y)


# ---------------------------------------------------------------------------
# Fully fused coords -> stencil-layers kernel.
#
# The pad-sum conversion (grid_assembly.stencil_from_offdiag_planes) still
# costs ~29 ms at 10M dofs (XLA materializes each jnp.pad). Fusing the
# layer combination INTO the assembly kernel removes the intermediate
# plane arrays entirely: traffic drops to coords-in (85 MB) +
# layers-out (~300 MB) and the whole mesh->operator pipeline runs in one
# kernel pass (~2 ms) + one XLA slice.
#
# DMA alignment rules (measured): start offsets must be 8-row aligned
# (offset-1/7 starts crash the Mosaic compiler), so node row I is stored at
# OUTPUT row I + 7: chunk k writes aligned rows [kR+8, kR+R+8) = node rows
# [kR+1, kR+R+1), and an aligned 16-row prologue block writes node rows
# 0..8 (rows 1..8 idempotently overlap chunk 0's main block — both compute
# identical values, so DMA completion order is irrelevant).
# ---------------------------------------------------------------------------

# layer stack order must match grid_assembly.GRID_OFFSETS2D
_LAYER_ORDER = ((-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0))


def _stencil_rows_from_planes(planes, rshift):
    """7 stencil-layer row blocks for node rows [r0+1, r0+R+1) from 6
    off-diagonal plane blocks over quad rows [r0, r0+R].

    planes: (pa12, pa13, pa23, pb12, pb13, pb23), each (R+1, W), already
    masked to zero on invalid quad rows/lanes. rshift(p) must produce
    p[:, j] <- p[:, j-1] with column 0 receiving a zero (guaranteed when
    lane W-1 is masked). Returns layers in _LAYER_ORDER, each (R, W).
    Derivation: PARITY anchors in grid_assembly._LAYER_SOURCES.
    """
    pa12, pa13, pa23, pb12, pb13, pb23 = planes
    L10 = pa12[1:] + rshift(pb23)[1:]
    Lm10 = pa12[:-1] + rshift(pb23)[:-1]
    L01 = pa13[1:] + pb12[:-1]
    L0m1 = rshift(pa13)[1:] + rshift(pb12)[:-1]
    Lm11 = pa23[:-1] + pb13[:-1]
    L1m1 = rshift(pa23)[1:] + rshift(pb13)[1:]
    L00 = -(L10 + Lm10 + L01 + L0m1 + Lm11 + L1m1)
    by_off = {
        (1, 0): L10, (-1, 0): Lm10, (0, 1): L01, (0, -1): L0m1,
        (-1, 1): Lm11, (1, -1): L1m1, (0, 0): L00,
    }
    return [by_off[o] for o in _LAYER_ORDER]


def p1_stencil_layers_from_coords(X, Y, n: int, block_rows: int = 128,
                                  n_buf: int = 3, eps=None,
                                  interpret: bool | None = None):
    """(7, n + 16, W) PADDED stencil layers of the P1 -laplacian operator
    directly from node coordinate planes (one fused kernel).

    Node row I of layer L sits at output row I + 7; valid lanes are
    [0, n + 1). Use `ops.grid_assembly.stencil_from_coords` for the sliced
    GridDIAMatrix. X/Y as in p1_offdiag_planes_from_coords.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W = X.shape[1]
    dtype = X.dtype
    if interpret:
        # same layer math, XLA ops (tests the formulas; the TPU path adds
        # only DMA plumbing, parity-checked on device)
        lane_roll = lambda a: jnp.roll(a, -1, axis=1)
        Xe = X if eps is None else X + eps
        planes = _coords_offdiag_planes(
            Xe[:n], Y[:n], Xe[1 : n + 1], Y[1 : n + 1], lane_roll
        )
        lanes_ok = (jnp.arange(W) < n).astype(dtype)[None, :]
        z = jnp.zeros((1, W), dtype)
        padded = [jnp.concatenate([z, p * lanes_ok, z]) for p in planes]
        rsh = lambda p: jnp.roll(p, 1, axis=1)
        layers = _stencil_rows_from_planes(padded, rsh)  # node rows [0, n+1)
        out = jnp.zeros((7, n + 16, W), dtype)
        return out.at[:, 7 : 7 + n + 1, :].set(jnp.stack(layers))

    R = block_rows
    assert n % R == 0 and n % 128 == 0 and R % 8 == 0
    assert W % 128 == 0 and W >= n + 1 and X.shape[0] >= n + 8
    n_chunks = n // R
    SLAB = R + 8

    def _kernel(s_ref, x_hbm, y_hbm, out_hbm):
        def body(xin, yin, oscr, pro, in_sem, out_sem, pro_sem):
            def in_dma(slot, k):
                return (
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(k * R, SLAB), :], xin.at[slot],
                        in_sem.at[slot, 0],
                    ),
                    pltpu.make_async_copy(
                        y_hbm.at[pl.ds(k * R, SLAB), :], yin.at[slot],
                        in_sem.at[slot, 1],
                    ),
                )

            def out_dma(slot, k):
                # node rows [kR+1, kR+R+1) live at output rows kR+8 (aligned)
                return pltpu.make_async_copy(
                    oscr.at[slot], out_hbm.at[:, pl.ds(k * R + 8, R), :],
                    out_sem.at[slot],
                )

            for w in range(min(n_buf - 1, n_chunks)):
                for d in in_dma(w, w):
                    d.start()

            def loop(k, _):
                cur = k % n_buf

                @pl.when(k + n_buf - 1 < n_chunks)
                def _():
                    for d in in_dma((k + n_buf - 1) % n_buf, k + n_buf - 1):
                        d.start()

                for d in in_dma(cur, k):
                    d.wait()

                @pl.when(k >= n_buf)
                def _():
                    out_dma(cur, k - n_buf).wait()

                x = xin[cur]
                y = yin[cur]
                sh = W - 1
                planes = _coords_offdiag_planes(
                    x[0 : R + 1] + s_ref[0], y[0 : R + 1],
                    x[1 : R + 2] + s_ref[0], y[1 : R + 2],
                    lambda a: pltpu.roll(a, sh, 1),
                )
                # zero invalid quad rows (kR + r >= n) and lanes (>= n)
                rows_ok = (
                    jax.lax.broadcasted_iota(jnp.int32, (R + 1, W), 0)
                    < n - k * R
                )
                lanes_ok = (
                    jax.lax.broadcasted_iota(jnp.int32, (R + 1, W), 1) < n
                )
                mask = (rows_ok & lanes_ok).astype(x.dtype)
                planes = [p * mask for p in planes]
                rsh = lambda p: pltpu.roll(p, 1, 1)
                layers = _stencil_rows_from_planes(planes, rsh)
                for i in range(7):
                    oscr[cur, i] = layers[i]
                out_dma(cur, k).start()

                # prologue (k == 0): node rows 0..8 at output rows 7..15,
                # inside an ALIGNED 16-row block; rows 1..8 idempotently
                # duplicate the main block, row 0 drops the quad -1 terms.
                @pl.when(k == 0)
                def _():
                    z = jnp.zeros((1, W), x.dtype)
                    padded = [
                        jnp.concatenate([z, p[0:9]]) for p in planes
                    ]  # quad rows [-1(zero), 0..8] -> node rows [0, 9)
                    lay0 = _stencil_rows_from_planes(padded, rsh)
                    for i in range(7):
                        pro[0, i] = jnp.concatenate(
                            [jnp.zeros((7, W), x.dtype), lay0[i]]
                        )
                    pltpu.make_async_copy(
                        pro.at[0], out_hbm.at[:, pl.ds(0, 16), :],
                        pro_sem.at[0],
                    ).start()

                return _

            jax.lax.fori_loop(0, n_chunks, loop, None)
            for d in range(max(0, n_chunks - n_buf), n_chunks):
                out_dma(d % n_buf, d).wait()
            pltpu.make_async_copy(
                pro.at[0], out_hbm.at[:, pl.ds(0, 16), :], pro_sem.at[0]
            ).wait()

        pl.run_scoped(
            body,
            xin=pltpu.VMEM((n_buf, SLAB, W), dtype),
            yin=pltpu.VMEM((n_buf, SLAB, W), dtype),
            oscr=pltpu.VMEM((n_buf, 7, R, W), dtype),
            pro=pltpu.VMEM((1, 7, 16, W), dtype),
            in_sem=pltpu.SemaphoreType.DMA((n_buf, 2)),
            out_sem=pltpu.SemaphoreType.DMA((n_buf,)),
            pro_sem=pltpu.SemaphoreType.DMA((1,)),
        )

    s = jnp.zeros((1,), dtype) if eps is None else jnp.reshape(eps, (1,))
    return pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((7, n + 16, W), dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(s, X, Y)
