"""Pallas TPU kernel for bounded-offset deformable convolution.

Fuses the shift-decomposition of `ops/dcn.deform_conv2d_local` into one
VMEM-resident kernel: as plain XLA that formulation loses to the gather
because every (tap, cell) partial product round-trips through HBM
(measured 221 ms vs 31 ms for the full 960² DBNet forward); here the
padded input feature map stays resident in VMEM (all DBNet DCN stages
fit: <=9 MB), the hat-weighted accumulations run on the VPU over row
tiles, and the final (K·Cin)→Cout contraction feeds the MXU — zero
intermediate HBM traffic.

Loop order matters for Mosaic's scoped-VMEM stack: slices of the input
are indexed by the *combined* shift ``s = tap + cell`` so each of the
(kh+2R+1)·(kw+2R+1) ≈ 100 window slices is cut once and shared by all
taps, instead of (2R+2)²·K ≈ 576 per-tap slices (which blew the 16 MB
scoped-vmem stack). K accumulators stay live; everything else is
transient.

Grid: (batch, row_tiles); the input block's index map ignores the row
dimension so Pallas keeps it resident across sequential row tiles.
Offsets are clamped to ``radius`` exactly like deform_conv2d_local
(identical math; exact vs torchvision for |offset| <= radius).

Sparsity guards (round 5): a tap only has bilinear support on the <=4
shift cells bracketing its offset, so ~85% of the (cell, tap) lattice is
skippable at trained offsets (tools/dcn_bound_table.py). Every kernel
now derives its guards from per-tap SCALAR ranges of the clipped
offsets (min/max, reduced once per tile): each (sy, sx, tap) test is a
scalar interval comparison, and hat-weight maps are built only inside
fired guards. The round-4 scheme built the full (tile, Wo) hat map and
max-reduced it per (cell, tap) BEFORE the guard — ~900 vector->scalar
reduce syncs per tile spent mostly on deciding to skip. Interval tests
are conservative (a tile's pixels can straddle a cell's open support
without entering it); a false firing accumulates an identically-zero
hat product, so the math is unchanged.

Only stride 1 is expressible as static window slices on one array
(Mosaic rejects strided vector slices); ``deform_conv2d_pallas``
requires stride=1. The three stride-2 DCN layers run
``deform_conv2d_s2_pallas``: a parity-view variant of the same kernel
(four (row%2, col%2) views of the padded input make every stride-2
access a stride-free slice — see the stride-2 section below) with the
backward reusing the stride-1 kernels on the 2x-upsampled grid.

The backward is three more Pallas kernels (round 2; the round-1 VJP
routed through the XLA shift-decomposition, whose transposed program was
~8x the forward — 3.5 s of a 4 s det train step at 960²):

  * `_dcn_bwd_param_kernel` walks OUTPUT row tiles and produces
    d(offset) and d(mask): it contracts the incoming gradient with the
    kernel once per tile (g @ Wᵀ on the MXU), so the per-(tap,cell) work
    is one VPU multiply-reduce guarded by the same sparsity tests as the
    forward.
  * `_dcn_sampled_kernel` re-emits the forward's hat-weighted sampled
    tensor so dW is one XLA matmul sampledᵀ @ g — an in-kernel f32
    (K·Cin, Cout) accumulator block is 9.4 MB at Cin=512 and cannot share
    scoped VMEM with the weight and the gs scratch.
  * `_dcn_bwd_input_kernel` walks INPUT (padded) row tiles and produces
    dX as a pure gather: for each combined shift s the contributing
    output rows are a static slice of a zero-extended gradient block, so
    the transpose needs no scatter anywhere — the same property that
    makes the forward TPU-shaped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The kernels' resident blocks + scratch top the default 16 MB
# scoped-VMEM budget at the 960² c3 stage; v5e VMEM is larger than the
# compiler's conservative default, so raise the per-kernel cap (Mosaic
# carries the limit with the kernel, so no global XLA flag is needed —
# and the client-side parser of this environment rejects TPU-only
# entries in XLA_FLAGS anyway).
_DCN_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=32 * 1024 * 1024)

# Cap for any resident (grid-invariant) operand window in the backward
# kernels; Pallas double-buffers these across the batch grid dim, so the
# live cost is 2x. Rows are chunked to stay under this.
_WINDOW_BYTES = 2 * 1024 * 1024


def _dcn_kernel(x_ref, dy_ref, dx_ref, mask_ref, w_ref, out_ref, acc_ref, *,
                R: int, K: int, kh: int, kw: int,
                tile_h: int, Wo: int, Cin: int, Cout: int):
    # x_ref:   (1, Hp, Wp, Cin) — whole padded image, VMEM-resident
    # dy/dx/mask: (1, tile_h, Wo, K) for this row tile
    # w_ref:   (K*Cin, Cout)
    # out_ref: (1, tile_h, Wo, Cout)
    # acc_ref: (tile_h, Wo, K*Cin) f32 scratch — accumulating IN PLACE via
    #   the ref (rather than a chain of SSA adds) is what keeps Mosaic's
    #   VMEM allocation flat: the unrolled add-chain version allocated a
    #   fresh buffer per accumulation step (242 MB for 576 steps).
    i = pl.program_id(1)
    row_base = i * tile_h

    dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)   # (tile_h, Wo, K)
    dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
    m = mask_ref[0].astype(jnp.float32)

    Sy = kh + 2 * R + 1   # combined row shifts s = ti + u + R
    Sx = kw + 2 * R + 1

    acc_ref[...] = jnp.zeros((tile_h, Wo, K * Cin), jnp.float32)

    # The shift loops are lax loops, NOT python-unrolled: 576 unrolled
    # multiply-accumulates made Mosaic materialize a distinct VMEM buffer
    # per product (239 MB). As fori_loops the body's transients are a few
    # hundred KB, reused every iteration. hat() is zero whenever the
    # (tap, shift) pair is out of the bilinear support, so no masking or
    # static skipping is needed for correctness.
    #
    # Round-5 guard restructure: the per-tap offset RANGES are reduced
    # ONCE per tile, so every (sy, sx, tap) support test below is a pure
    # scalar interval comparison — the round-4 version instead built the
    # full (tile, Wo) hat map and max-reduced it per (cell, tap), ~900
    # VPU reduces (each a vector->scalar sync) per tile of which the
    # trained-offset guards then discarded 83-88%. Hat maps are now only
    # computed inside FIRED guards. Interval tests are conservative
    # (pixels can straddle a cell's open support without entering it);
    # a false firing just accumulates an identically-zero hat product.
    dymin = [jnp.min(dy[..., t]) for t in range(K)]
    dymax = [jnp.max(dy[..., t]) for t in range(K)]
    dxmin = [jnp.min(dx[..., t]) for t in range(K)]
    dxmax = [jnp.max(dx[..., t]) for t in range(K)]
    mpos = [jnp.max(m[..., t]) > 0.0 for t in range(K)]

    def sy_body(sy, _):
        syf = sy.astype(jnp.float32)
        row_ok = []
        for t in range(K):
            cy = syf - R - (t // kw)
            row_ok.append((dymax[t] > cy - 1.0) & (dymin[t] < cy + 1.0)
                          & mpos[t])
        row_hit = functools.reduce(jnp.logical_or, row_ok)

        @pl.when(row_hit)
        def _():
            # rows r of this tile sample padded row (row_base + r) + sy;
            # the row dim is a non-tiled dim so a dynamic start is free.
            # Column shifts are UNROLLED static slices: a dynamic column
            # start would need sublane (x8) alignment, and a second fori
            # level costs more in loop overhead than the slices in VMEM.
            rows = x_ref[0, pl.ds(row_base + sy, tile_h),
                         :, :].astype(jnp.float32)
            # per-tap ROW weights, once per sy; (tile, Wo, 1)-shaped so
            # the broadcast against (tile, Wo, Cin) needs no relayout
            wys = [
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(dy[..., t:t + 1]
                                       - (syf - R - t // kw)))
                for t in range(K)
            ]
            for sx in range(Sx):
                # A tap only has support on the <=4 cells bracketing its
                # offset; scalar interval tests pick those out with no
                # vector work at all.
                cell_ok = [
                    row_ok[t]
                    & (dxmax[t] > sx - R - (t % kw) - 1.0)
                    & (dxmin[t] < sx - R - (t % kw) + 1.0)
                    for t in range(K)
                ]
                any_ok = functools.reduce(jnp.logical_or, cell_ok)

                @pl.when(any_ok)
                def _(sx=sx, cell_ok=cell_ok):
                    xs = rows[:, sx:sx + Wo, :]
                    for t in range(K):
                        @pl.when(cell_ok[t])
                        def _(t=t, sx=sx, xs=xs):
                            wx = jnp.maximum(
                                0.0, 1.0 - jnp.abs(dx[..., t:t + 1]
                                                   - (sx - R - t % kw)))
                            w2 = wys[t] * wx * m[..., t:t + 1]
                            sl = slice(t * Cin, (t + 1) * Cin)
                            acc_ref[:, :, sl] += w2 * xs

        return 0

    jax.lax.fori_loop(0, Sy, sy_body, 0)

    out = jax.lax.dot_general(
        acc_ref[...].reshape(tile_h * Wo, K * Cin),
        w_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(tile_h, Wo, Cout).astype(out_ref.dtype)


def _dcn_pallas_fwd(x, offset, mask, weight, padding, radius, tile_h):
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius

    n_tiles = -(-Ho // tile_h)
    Ho_pad = n_tiles * tile_h

    # Output row i samples padded rows i + s, s in [0, kh-1 + 2R + 1];
    # padded row i corresponds to original row i - padding - R.
    pad_lo = R + padding
    need_rows = Ho_pad + 2 * R + kh
    need_cols = Wo + 2 * R + kw
    # keep the (sublane) column dim 8-aligned for clean VMEM tiling
    need_cols = -(-need_cols // 8) * 8
    xp = jnp.pad(x, ((0, 0),
                     (pad_lo, max(need_rows - pad_lo - H, 0)),
                     (pad_lo, max(need_cols - pad_lo - W, 0)),
                     (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]

    if Ho_pad != Ho:
        offset = jnp.pad(offset, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))

    dy = offset[..., 0::2]
    dx = offset[..., 1::2]

    kernel = functools.partial(
        _dcn_kernel, R=R, K=K, kh=kh, kw=kw,
        tile_h=tile_h, Wo=Wo, Cin=Cin, Cout=Cout,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            # whole image; row-tile index ignored => stays resident
            pl.BlockSpec((1, Hp, Wp, Cin), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Cin, Cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, Wo, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho_pad, Wo, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_h, Wo, K * Cin), jnp.float32)],
        compiler_params=_DCN_COMPILER_PARAMS,
    )(xp, dy, dx, mask, weight.reshape(K * Cin, Cout))
    return out[:, :Ho]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def deform_conv2d_pallas(x, offset, mask, weight, stride=1, padding=1,
                         radius=3, tile_h=8):
    """Bounded-offset DCN, Pallas forward (stride 1 only). See module
    docstring; for stride 2 use the clipped-offset gather path."""
    if stride != 1:
        raise ValueError("deform_conv2d_pallas supports stride=1 only")
    return _dcn_pallas_fwd(x, offset, mask, weight, padding, radius, tile_h)


def _fwd(x, offset, mask, weight, stride, padding, radius, tile_h):
    # Under jax.grad this rule runs INSTEAD of the primal above, so the
    # stride guard must live here too — otherwise stride=2 would silently
    # compute a stride-1 forward while _bwd differentiates the stride-N
    # local formulation.
    if stride != 1:
        raise ValueError("deform_conv2d_pallas supports stride=1 only")
    out = _dcn_pallas_fwd(x, offset, mask, weight, padding, radius, tile_h)
    return out, (x, offset, mask, weight)


def _dcn_bwd_param_kernel(x_ref, g_ref, dy_ref, dx_ref, mask_ref, w_ref,
                          ddy_ref, ddx_ref, dm_ref,
                          gs_ref, sdy_ref, sdx_ref, sdm_ref, *,
                          R: int, K: int, kh: int, kw: int,
                          tile_h: int, Wo: int, Cin: int, Cout: int):
    # x_ref: (1, Hp, Wp, Cin) padded input, VMEM-resident across row tiles
    # g_ref: (1, tile_h, Wo, Cout) upstream gradient for this tile
    # dy/dx/mask: (1, tile_h, Wo, K) raw offsets (clip happens here) + mask
    # outputs: ddy/ddx/dm (1, tile_h, Wo, K). dW is NOT computed here: the
    #   f32 (K*Cin, Cout) accumulator block is 9.4 MB at Cin=512 and blows
    #   scoped VMEM next to the weight + gs — see `_dcn_sampled` + the XLA
    #   contraction in `_dcn_pallas_bwd_impl`.
    # scratch: gs (tile_h, Wo, K*Cin) f32; sdy/sdx/sdm (tile_h, Wo, K) f32
    i = pl.program_id(1)
    row_base = i * tile_h

    dy_raw = dy_ref[0].astype(jnp.float32)
    dx_raw = dx_ref[0].astype(jnp.float32)
    dy = jnp.clip(dy_raw, -R, R)
    dx = jnp.clip(dx_raw, -R, R)
    m = mask_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)                       # (tile_h, Wo, Cout)

    Sy = kh + 2 * R + 1
    Sx = kw + 2 * R + 1

    # gs[p, t*Cin+c] = sum_o g[p, o] * W[t*Cin+c, o]  — one MXU contraction.
    gs_ref[...] = jax.lax.dot_general(
        g.reshape(tile_h * Wo, Cout),
        w_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tile_h, Wo, K * Cin)

    sdy_ref[...] = jnp.zeros((tile_h, Wo, K), jnp.float32)
    sdx_ref[...] = jnp.zeros((tile_h, Wo, K), jnp.float32)
    sdm_ref[...] = jnp.zeros((tile_h, Wo, K), jnp.float32)

    # Round-5: scalar-interval guards (see the forward kernel). The
    # guards here must NOT involve the modulation mask — d(mask) needs
    # the unmodulated product — so there is no mpos term.
    dymin = [jnp.min(dy[..., t]) for t in range(K)]
    dymax = [jnp.max(dy[..., t]) for t in range(K)]
    dxmin = [jnp.min(dx[..., t]) for t in range(K)]
    dxmax = [jnp.max(dx[..., t]) for t in range(K)]

    def sy_body(sy, _):
        # The row guard is on wy support ALONE, which is valid for all
        # three outputs: wy == 0 kills d(mask) and d(dx) directly, and
        # d(dy)'s hat' factor is defined as 0 outside the OPEN support
        # (wyp = where(wy > 0, -sign, 0)), so a no-row-support sy
        # contributes nothing anywhere.
        syf = sy.astype(jnp.float32)
        row_ok = []
        for t in range(K):
            cy = syf - R - (t // kw)
            row_ok.append((dymax[t] > cy - 1.0) & (dymin[t] < cy + 1.0))
        row_hit = functools.reduce(jnp.logical_or, row_ok)

        @pl.when(row_hit)
        def _():
            rows = x_ref[0, pl.ds(row_base + sy, tile_h),
                         :, :].astype(jnp.float32)
            uys, wys = [], []
            for t in range(K):
                uy = dy[..., t] - (syf - R - t // kw)
                uys.append(uy)
                wys.append(jnp.maximum(0.0, 1.0 - jnp.abs(uy)))
            for sx in range(Sx):
                # per-tap support test: a tap only touches the <=4 cells
                # bracketing its offset; scalar interval tests find them
                for t in range(K):
                    tj = t % kw
                    hit = (row_ok[t]
                           & (dxmax[t] > sx - R - tj - 1.0)
                           & (dxmin[t] < sx - R - tj + 1.0))

                    @pl.when(hit)
                    def _(t=t, wy=wys[t], uy=uys[t], sx=sx):
                        ux = dx[..., t] - (sx - R - t % kw)
                        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ux))
                        xs = rows[:, sx:sx + Wo, :]
                        gst = gs_ref[:, :, t * Cin:(t + 1) * Cin]
                        dot = jnp.sum(xs * gst, axis=-1)   # (tile_h, Wo)
                        # hat'(u) = -sign(u) on the open support, 0 outside
                        wyp = jnp.where(wy > 0.0, -jnp.sign(uy), 0.0)
                        wxp = jnp.where(wx > 0.0, -jnp.sign(ux), 0.0)
                        mt = m[..., t]
                        sdm_ref[:, :, t] += wy * wx * dot
                        sdy_ref[:, :, t] += wyp * wx * mt * dot
                        sdx_ref[:, :, t] += wy * wxp * mt * dot
        return 0

    jax.lax.fori_loop(0, Sy, sy_body, 0)

    # clip passes gradient only inside the bound
    ddy_ref[0] = (sdy_ref[...]
                  * (jnp.abs(dy_raw) <= R).astype(jnp.float32)
                  ).astype(ddy_ref.dtype)
    ddx_ref[0] = (sdx_ref[...]
                  * (jnp.abs(dx_raw) <= R).astype(jnp.float32)
                  ).astype(ddx_ref.dtype)
    dm_ref[0] = sdm_ref[...].astype(dm_ref.dtype)


def _dcn_sampled_kernel(x_ref, dy_ref, dx_ref, mask_ref, out_ref, acc_ref, *,
                        R: int, K: int, kh: int, kw: int,
                        tile_h: int, Wo: int, Cin: int):
    # The forward kernel minus the weight contraction: emits the
    # hat-weighted sampled tensor (tile_h, Wo, K*Cin) so dW can be one
    # XLA matmul sampledᵀ @ g outside the kernel (the in-kernel f32 dW
    # block does not fit next to the weight at Cin=512).
    i = pl.program_id(1)
    row_base = i * tile_h

    dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)
    dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
    m = mask_ref[0].astype(jnp.float32)

    Sy = kh + 2 * R + 1
    Sx = kw + 2 * R + 1

    acc_ref[...] = jnp.zeros((tile_h, Wo, K * Cin), jnp.float32)

    # same scalar-interval guard restructure as the forward kernel
    dymin = [jnp.min(dy[..., t]) for t in range(K)]
    dymax = [jnp.max(dy[..., t]) for t in range(K)]
    dxmin = [jnp.min(dx[..., t]) for t in range(K)]
    dxmax = [jnp.max(dx[..., t]) for t in range(K)]
    mpos = [jnp.max(m[..., t]) > 0.0 for t in range(K)]

    def sy_body(sy, _):
        syf = sy.astype(jnp.float32)
        row_ok = []
        for t in range(K):
            cy = syf - R - (t // kw)
            row_ok.append((dymax[t] > cy - 1.0) & (dymin[t] < cy + 1.0)
                          & mpos[t])
        row_hit = functools.reduce(jnp.logical_or, row_ok)

        @pl.when(row_hit)
        def _():
            rows = x_ref[0, pl.ds(row_base + sy, tile_h),
                         :, :].astype(jnp.float32)
            wys = [
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(dy[..., t:t + 1]
                                       - (syf - R - t // kw)))
                for t in range(K)
            ]
            for sx in range(Sx):
                cell_ok = [
                    row_ok[t]
                    & (dxmax[t] > sx - R - (t % kw) - 1.0)
                    & (dxmin[t] < sx - R - (t % kw) + 1.0)
                    for t in range(K)
                ]
                any_ok = functools.reduce(jnp.logical_or, cell_ok)

                @pl.when(any_ok)
                def _(sx=sx, cell_ok=cell_ok):
                    xs = rows[:, sx:sx + Wo, :]
                    for t in range(K):
                        @pl.when(cell_ok[t])
                        def _(t=t, sx=sx, xs=xs):
                            wx = jnp.maximum(
                                0.0, 1.0 - jnp.abs(dx[..., t:t + 1]
                                                   - (sx - R - t % kw)))
                            w2 = wys[t] * wx * m[..., t:t + 1]
                            sl = slice(t * Cin, (t + 1) * Cin)
                            acc_ref[:, :, sl] += w2 * xs
        return 0

    jax.lax.fori_loop(0, Sy, sy_body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _dcn_bwd_input_kernel(g_ref, dy_ref, dx_ref, mask_ref, w_ref,
                          dxp_ref, accx_ref, gs_ref, *,
                          R: int, K: int, kh: int, kw: int, G0: int,
                          tile_h: int, Wo: int, Wp: int, Cin: int, Cout: int):
    # Input-space transpose: padded-input row r receives, for each combined
    # shift s = (sy, sx), the hat-weighted gradient of output row r - sy at
    # columns shifted by sx. g/dy/dx/mask are zero-extended by G0 rows on
    # top so `r - sy` is always a legal static-size slice (rows that fall
    # outside the real output carry g == 0 and thus contribute nothing).
    # g_ref:   (1, Hg, Wo, Cout) zero-extended gradient, VMEM-resident
    # dy/dx/mask: (1, Hg, Wo, K) zero-extended likewise
    # dxp_ref: (1, tile_h, Wp, Cin) gradient wrt the PADDED input rows
    # scratch: accx (tile_h, Wp, Cin) f32; gs (tile_h, Wo, K*Cin) f32
    i = pl.program_id(1)
    row_base = i * tile_h

    Sy = kh + 2 * R + 1
    Sx = kw + 2 * R + 1

    accx_ref[...] = jnp.zeros((tile_h, Wp, Cin), jnp.float32)

    def sy_body(sy, _):
        # padded row r = row_base + r' samples from output row r - sy,
        # which lives at zero-extended row r - sy + G0. The dy/dx/mask
        # slices move with sy, so (unlike the other kernels) the scalar
        # offset ranges for the interval guards are reduced per sy —
        # still K*2 reduces instead of the K*Sx map+reduce pairs the
        # round-4 version burned on the column tests.
        start = row_base - sy + G0
        dy = jnp.clip(dy_ref[0, pl.ds(start, tile_h), :, :]
                      .astype(jnp.float32), -R, R)
        syf = sy.astype(jnp.float32)
        row_ok = []
        for t in range(K):
            cy = syf - R - (t // kw)
            dyt = dy[..., t]
            row_ok.append((jnp.max(dyt) > cy - 1.0)
                          & (jnp.min(dyt) < cy + 1.0))
        row_hit = functools.reduce(jnp.logical_or, row_ok)

        @pl.when(row_hit)
        def _():
            g = g_ref[0, pl.ds(start, tile_h), :, :].astype(jnp.float32)
            dx = jnp.clip(dx_ref[0, pl.ds(start, tile_h), :, :]
                          .astype(jnp.float32), -R, R)
            m = mask_ref[0, pl.ds(start, tile_h), :, :].astype(jnp.float32)

            # the g slice AND the per-sy gs matmul sit behind the
            # row-support guard — no tap with row support at this sy
            # means no contribution to any input row of this tile
            gs_ref[...] = jax.lax.dot_general(
                g.reshape(tile_h * Wo, Cout),
                w_ref[:].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(tile_h, Wo, K * Cin)

            wys = [
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(dy[..., t:t + 1]
                                       - (syf - R - t // kw)))
                for t in range(K)
            ]
            dxmin = [jnp.min(dx[..., t]) for t in range(K)]
            dxmax = [jnp.max(dx[..., t]) for t in range(K)]
            # dX only sees mask-modulated products, so an all-zero mask
            # tap may gate here (unlike the param kernel's d(mask))
            mpos = [jnp.max(m[..., t]) > 0.0 for t in range(K)]

            for sx in range(Sx):
                for t in range(K):
                    tj = t % kw
                    hit = (row_ok[t] & mpos[t]
                           & (dxmax[t] > sx - R - tj - 1.0)
                           & (dxmin[t] < sx - R - tj + 1.0))

                    @pl.when(hit)
                    def _(t=t, sx=sx):
                        wx = jnp.maximum(
                            0.0, 1.0 - jnp.abs(dx[..., t:t + 1]
                                               - (sx - R - t % kw)))
                        w2 = wys[t] * wx * m[..., t:t + 1]
                        accx_ref[:, sx:sx + Wo, :] += (
                            w2 * gs_ref[:, :, t * Cin:(t + 1) * Cin])
        return 0

    jax.lax.fori_loop(0, Sy, sy_body, 0)
    dxp_ref[0] = accx_ref[...].astype(dxp_ref.dtype)


def _dcn_pallas_bwd_impl(x, offset, mask, weight, g, padding, radius, tile_h):
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius
    Sy = kh + 2 * R + 1

    # The param kernel carries two (tile, Wo, K*Cin) f32 scratches plus the
    # f32 dW block (9.4 MB at Cin=512); at the forward's tile of 8 the c5
    # layer's scoped VMEM tops 16 MB. Half the tile keeps every layer
    # comfortably under the limit at negligible grid overhead.
    tile_p = min(tile_h, 4)
    n_tiles = -(-Ho // tile_p)
    Ho_pad = n_tiles * tile_p

    # Same padded-input geometry as the forward.
    pad_lo = R + padding
    need_rows = Ho_pad + 2 * R + kh
    need_cols = Wo + 2 * R + kw
    need_cols = -(-need_cols // 8) * 8
    xp = jnp.pad(x, ((0, 0),
                     (pad_lo, max(need_rows - pad_lo - H, 0)),
                     (pad_lo, max(need_cols - pad_lo - W, 0)),
                     (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]

    if Ho_pad != Ho:
        offset = jnp.pad(offset, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
    dy = offset[..., 0::2]
    dx = offset[..., 1::2]
    w2d = weight.reshape(K * Cin, Cout)

    # Pallas double-buffers every resident window across the batch grid
    # dim, so a window's true VMEM cost is 2x its size. Bound windows to
    # _WINDOW_BYTES by chunking the grid's row range and slicing the
    # resident operand per chunk (read-only overlap of Sy-1 margin rows;
    # outputs concatenate disjointly). The stride-2 backward runs these
    # kernels on the 2x-upsampled grid where a full-residency window hits
    # 16 MB -> 31 MB live — past half the chip's 128 MB once scheduled
    # next to the rest of the step.
    itemsize = jnp.dtype(x.dtype).itemsize
    xp_rows_max = _WINDOW_BYTES // max(Wp * Cin * itemsize, 1)
    chunk_out = max(((xp_rows_max - (Sy - 1)) // tile_p) * tile_p, tile_p)
    chunk_out = min(chunk_out, Ho_pad)

    kernel1 = functools.partial(
        _dcn_bwd_param_kernel, R=R, K=K, kh=kh, kw=kw,
        tile_h=tile_p, Wo=Wo, Cin=Cin, Cout=Cout,
    )
    kernel3 = functools.partial(
        _dcn_sampled_kernel, R=R, K=K, kh=kh, kw=kw,
        tile_h=tile_p, Wo=Wo, Cin=Cin,
    )
    ddy_c, ddx_c, dm_c, dw = [], [], [], None
    for c0 in range(0, Ho_pad, chunk_out):
        c1 = min(c0 + chunk_out, Ho_pad)
        rows = c1 - c0
        nt = rows // tile_p
        xp_c = xp[:, c0:c1 + Sy - 1]
        g_c = g[:, c0:c1]
        dy_c = dy[:, c0:c1]
        dx_c = dx[:, c0:c1]
        m_c = mask[:, c0:c1]
        tile_spec = pl.BlockSpec((1, tile_p, Wo, K),
                                 lambda b, i: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM)
        ddy_i, ddx_i, dm_i = pl.pallas_call(
            kernel1,
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, xp_c.shape[1], Wp, Cin),
                             lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_p, Wo, Cout), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile_spec, tile_spec, tile_spec,
                pl.BlockSpec((K * Cin, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[tile_spec, tile_spec, tile_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, rows, Wo, K), offset.dtype),
                jax.ShapeDtypeStruct((B, rows, Wo, K), offset.dtype),
                jax.ShapeDtypeStruct((B, rows, Wo, K), mask.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_p, Wo, K * Cin), jnp.float32),
                pltpu.VMEM((tile_p, Wo, K), jnp.float32),
                pltpu.VMEM((tile_p, Wo, K), jnp.float32),
                pltpu.VMEM((tile_p, Wo, K), jnp.float32),
            ],
            compiler_params=_DCN_COMPILER_PARAMS,
        )(xp_c, g_c, dy_c, dx_c, m_c, w2d)
        ddy_c.append(ddy_i)
        ddx_c.append(ddx_i)
        dm_c.append(dm_i)

        sampled = pl.pallas_call(
            kernel3,
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, xp_c.shape[1], Wp, Cin),
                             lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                tile_spec, tile_spec, tile_spec,
            ],
            out_specs=pl.BlockSpec((1, tile_p, Wo, K * Cin),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, rows, Wo, K * Cin), x.dtype),
            scratch_shapes=[pltpu.VMEM((tile_p, Wo, K * Cin), jnp.float32)],
            compiler_params=_DCN_COMPILER_PARAMS,
        )(xp_c, dy_c, dx_c, m_c)
        dw_i = jax.lax.dot_general(
            sampled.reshape(B * rows * Wo, K * Cin),
            g_c.reshape(B * rows * Wo, Cout).astype(sampled.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw = dw_i if dw is None else dw + dw_i
    ddy = jnp.concatenate(ddy_c, axis=1) if len(ddy_c) > 1 else ddy_c[0]
    ddx = jnp.concatenate(ddx_c, axis=1) if len(ddx_c) > 1 else ddx_c[0]
    dm = jnp.concatenate(dm_c, axis=1) if len(dm_c) > 1 else dm_c[0]

    # ---- kernel 2: dX over padded-input row tiles ----
    n_in_tiles = -(-Hp // tile_p)
    Hp_pad = n_in_tiles * tile_p
    # zero-extend outputs so row (r - sy + G0) is always sliceable:
    # top needs G0 = Sy; bottom needs Hp_pad - 1 - 0 + ... ≤ Hg - tile.
    G0 = Sy
    Hg = Ho_pad + G0 + max(Hp_pad + tile_p - Ho_pad, 0)
    zx = ((0, 0), (G0, Hg - G0 - Ho_pad), (0, 0), (0, 0))
    gz = jnp.pad(g, zx)
    dyz = jnp.pad(dy, zx)
    dxz = jnp.pad(dx, zx)
    mz = jnp.pad(mask, zx)

    kernel2 = functools.partial(
        _dcn_bwd_input_kernel, R=R, K=K, kh=kh, kw=kw, G0=G0,
        tile_h=tile_p, Wo=Wo, Wp=Wp, Cin=Cin, Cout=Cout,
    )
    gz_itemsize = jnp.dtype(g.dtype).itemsize
    gz_rows_max = _WINDOW_BYTES // max(Wo * Cout * gz_itemsize, 1)
    chunk_in = max(((gz_rows_max - Sy) // tile_p) * tile_p, tile_p)
    chunk_in = min(chunk_in, Hp_pad)
    dxp_c = []
    for r0 in range(0, Hp_pad, chunk_in):
        r1 = min(r0 + chunk_in, Hp_pad)
        rows = r1 - r0
        nt = rows // tile_p
        # chunk-local gz row j == global gz row r0 + j, so the kernel's
        # `row_base + Sy - sy` indexing carries over unchanged
        gz_c = gz[:, r0:r1 + Sy]
        dyz_c = dyz[:, r0:r1 + Sy]
        dxz_c = dxz[:, r0:r1 + Sy]
        mz_c = mz[:, r0:r1 + Sy]
        Hgc = gz_c.shape[1]
        res_spec = lambda ch: pl.BlockSpec((1, Hgc, Wo, ch),
                                           lambda b, i: (b, 0, 0, 0),
                                           memory_space=pltpu.VMEM)
        dxp_i = pl.pallas_call(
            kernel2,
            grid=(B, nt),
            in_specs=[
                res_spec(Cout), res_spec(K), res_spec(K), res_spec(K),
                pl.BlockSpec((K * Cin, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_p, Wp, Cin),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, rows, Wp, Cin), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((tile_p, Wp, Cin), jnp.float32),
                pltpu.VMEM((tile_p, Wo, K * Cin), jnp.float32),
            ],
            compiler_params=_DCN_COMPILER_PARAMS,
        )(gz_c, dyz_c, dxz_c, mz_c, w2d)
        dxp_c.append(dxp_i)
    dxp = jnp.concatenate(dxp_c, axis=1) if len(dxp_c) > 1 else dxp_c[0]

    dx_out = dxp[:, pad_lo:pad_lo + H, pad_lo:pad_lo + W, :]

    ddy = ddy[:, :Ho]
    ddx = ddx[:, :Ho]
    dm = dm[:, :Ho]
    # interleave back into torchvision channel order (2t: Δy, 2t+1: Δx)
    doffset = jnp.stack([ddy, ddx], axis=-1).reshape(B, Ho, Wo, 2 * K)
    return (dx_out, doffset.astype(jnp.float32), dm, dw)


def _bwd(stride, padding, radius, tile_h, res, g):
    x, offset, mask, weight = res
    dx_out, doffset, dm, dw = _dcn_pallas_bwd_impl(
        x, offset, mask, weight, g, padding, radius, tile_h)
    kh, kw, Cin, Cout = weight.shape
    return (dx_out.astype(x.dtype),
            doffset.astype(offset.dtype),
            dm.astype(mask.dtype),
            dw.reshape(kh, kw, Cin, Cout).astype(weight.dtype))


def _bwd_xla(stride, padding, radius, tile_h, res, g):
    """Round-1 fallback: transpose of the XLA shift-decomposition."""
    from ocr_vi_invoice_tpu.ops.dcn import deform_conv2d_local

    x, offset, mask, weight = res
    _, vjp = jax.vjp(
        lambda x_, o_, m_, w_: deform_conv2d_local(
            x_, o_, m_, w_, stride=stride, padding=padding, radius=radius
        ),
        x, offset, mask, weight,
    )
    return vjp(g)


deform_conv2d_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# Stride-2 DCN: parity-view Pallas forward + scatter-free backward
# --------------------------------------------------------------------------- #
#
# The three stride-2 DCN layers (first bottleneck of each ResNet stage)
# cannot reuse the stride-1 kernel directly: output row i samples padded
# row 2i + s, and Mosaic rejects strided vector slices. The parity
# decomposition removes the stride instead of expressing it: pre-cut the
# padded input into its four (row, col) parity views
#
#   x_pq[r, c] = xp[2r + p, 2c + q],   p, q in {0, 1}
#
# and padded position (2i + sy, 2j + sx) becomes view (sy % 2, sx % 2)
# at (i + sy//2, j + sx//2) — a plain dynamic row start plus a STATIC
# column slice, the exact structure the stride-1 kernel uses. The row
# parity is dynamic under a single sy fori_loop, so the kernel runs two
# loops (even sy, odd sy) with the view choice static in each; column
# parity follows the unrolled sx and is always static. Same hat-weight
# math, guards, and accumulator as `_dcn_kernel` (round 3 kept a
# clipped-offset gather forward here; measured vs that gather this
# kernel is ~1.4-2x faster per layer at 960², `tools/profile_dcn.py`).
#
# The backward stays on the even-grid identity
#
#   dcn_s2(x, off, m, w)[i, j] == dcn_s1(x, up2(off), up2(m), w)[2i, 2j]
#
# (the stride-2 base grid at (2i - p, 2j - p) IS the stride-1 grid at
# even positions): zero-interleave the cotangent to the full grid, call
# the stride-1 Pallas backward, slice the even positions of the
# offset/mask grads. ~4x redundant kernel work (odd positions carry zero
# gradient) but no scatter anywhere — ~10x faster than the gather
# transpose.


def _dcn_s2_kernel(x00_ref, x01_ref, x10_ref, x11_ref,
                   dy_ref, dx_ref, mask_ref, w_ref, out_ref, acc_ref, *,
                   R: int, K: int, kh: int, kw: int,
                   tile_h: int, Wo: int, Cin: int, Cout: int):
    # x_pq refs: (1, vr, vc, Cin) parity views of the padded input,
    #   VMEM-resident across row tiles (index map ignores the tile dim).
    # dy/dx/mask: (1, tile_h, Wo, K); w: (K*Cin, Cout); out like stride-1.
    i = pl.program_id(1)
    row_base = i * tile_h

    dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)
    dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
    m = mask_ref[0].astype(jnp.float32)

    Sy = kh + 2 * R + 1
    Sx = kw + 2 * R + 1

    acc_ref[...] = jnp.zeros((tile_h, Wo, K * Cin), jnp.float32)

    # Round-5: same scalar-interval guard scheme as the stride-1 kernel
    # (ranges reduced once per tile, all support tests scalar), plus the
    # two column-parity row slices are now LAZY — each parity's slice +
    # f32 convert only happens when one of its cells actually fires,
    # instead of both being cut unconditionally every sy.
    dymin = [jnp.min(dy[..., t]) for t in range(K)]
    dymax = [jnp.max(dy[..., t]) for t in range(K)]
    dxmin = [jnp.min(dx[..., t]) for t in range(K)]
    dxmax = [jnp.max(dx[..., t]) for t in range(K)]
    mpos = [jnp.max(m[..., t]) > 0.0 for t in range(K)]

    def make_body(p, col_refs):
        # one body per row parity so the (static) view refs differ only
        # by p; a = sy // 2 is the loop variable, sy = 2a + p.
        def body(a, _):
            syf = (2 * a + p).astype(jnp.float32)
            row_ok = []
            for t in range(K):
                cy = syf - R - (t // kw)
                row_ok.append((dymax[t] > cy - 1.0) & (dymin[t] < cy + 1.0)
                              & mpos[t])
            row_hit = functools.reduce(jnp.logical_or, row_ok)

            @pl.when(row_hit)
            def _():
                wys = [
                    jnp.maximum(
                        0.0, 1.0 - jnp.abs(dy[..., t:t + 1]
                                           - (syf - R - t // kw)))
                    for t in range(K)
                ]
                cell_ok = [
                    [row_ok[t]
                     & (dxmax[t] > sx - R - (t % kw) - 1.0)
                     & (dxmin[t] < sx - R - (t % kw) + 1.0)
                     for t in range(K)]
                    for sx in range(Sx)
                ]
                any_ok = [functools.reduce(jnp.logical_or, cell_ok[sx])
                          for sx in range(Sx)]
                for par in (0, 1):
                    sxs = [sx for sx in range(Sx) if sx % 2 == par]
                    par_need = functools.reduce(
                        jnp.logical_or, [any_ok[sx] for sx in sxs])

                    @pl.when(par_need)
                    def _(par=par, sxs=sxs):
                        rows = col_refs[par][0, pl.ds(row_base + a, tile_h),
                                             :, :].astype(jnp.float32)
                        for sx in sxs:
                            @pl.when(any_ok[sx])
                            def _(sx=sx, rows=rows):
                                xs = rows[:, sx // 2:sx // 2 + Wo, :]
                                for t in range(K):
                                    @pl.when(cell_ok[sx][t])
                                    def _(t=t, sx=sx, xs=xs):
                                        wx = jnp.maximum(
                                            0.0,
                                            1.0 - jnp.abs(
                                                dx[..., t:t + 1]
                                                - (sx - R - t % kw)))
                                        w2 = wys[t] * wx * m[..., t:t + 1]
                                        sl = slice(t * Cin, (t + 1) * Cin)
                                        acc_ref[:, :, sl] += w2 * xs
            return 0

        return body

    jax.lax.fori_loop(0, (Sy + 1) // 2, make_body(0, (x00_ref, x01_ref)), 0)
    jax.lax.fori_loop(0, Sy // 2, make_body(1, (x10_ref, x11_ref)), 0)

    out = jax.lax.dot_general(
        acc_ref[...].reshape(tile_h * Wo, K * Cin),
        w_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(tile_h, Wo, Cout).astype(out_ref.dtype)


def _dcn_s2_pallas_fwd(x, offset, mask, weight, padding, radius, tile_h):
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius
    Sy = kh + 2 * R + 1
    Sx = kw + 2 * R + 1

    n_tiles = -(-Ho // tile_h)
    Ho_pad = n_tiles * tile_h

    # Output (i, j) samples padded (2i + sy, 2j + sx); padded row r maps
    # to original row r - pad_lo.
    pad_lo = R + padding
    need_rows = 2 * (Ho_pad - 1) + Sy
    need_cols = 2 * (Wo - 1) + Sx
    xp = jnp.pad(x, ((0, 0),
                     (pad_lo, max(need_rows - pad_lo - H, 0)),
                     (pad_lo, max(need_cols - pad_lo - W, 0)),
                     (0, 0)))

    # Parity views, padded so every kernel slice is in range: rows up to
    # row_base_max + (Sy-1)//2 + tile_h, cols up to (Sx-1)//2 + Wo.
    vr = Ho_pad + (Sy + 1) // 2
    vc = Wo + (Sx + 1) // 2
    vc = -(-vc // 8) * 8   # 8-aligned sublane dim for clean VMEM tiling
    views = []
    for p in (0, 1):
        for q in (0, 1):
            v = xp[:, p::2, q::2, :]
            v = jnp.pad(v, ((0, 0),
                            (0, max(vr - v.shape[1], 0)),
                            (0, max(vc - v.shape[2], 0)),
                            (0, 0)))[:, :vr, :vc]
            views.append(v)

    if Ho_pad != Ho:
        offset = jnp.pad(offset, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
    dy = offset[..., 0::2]
    dx = offset[..., 1::2]

    kernel = functools.partial(
        _dcn_s2_kernel, R=R, K=K, kh=kh, kw=kw,
        tile_h=tile_h, Wo=Wo, Cin=Cin, Cout=Cout,
    )
    view_spec = pl.BlockSpec((1, vr, vc, Cin), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            view_spec, view_spec, view_spec, view_spec,
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((K * Cin, Cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, Wo, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho_pad, Wo, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_h, Wo, K * Cin), jnp.float32)],
        # the four resident views total ~4x a stride-1 layer's resident
        # input and Pallas double-buffers them across the batch grid dim,
        # so the stride-2 kernel gets a higher cap than _DCN_COMPILER_PARAMS
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*views, dy, dx, mask, weight.reshape(K * Cin, Cout))
    return out[:, :Ho]


def _up2(a):
    return jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def deform_conv2d_s2_pallas(x, offset, mask, weight, padding=1, radius=3,
                            tile_h=8):
    """Stride-2 bounded-offset DCN: parity-view Pallas forward + Pallas
    backward (via the even-grid identity). Semantics match
    `deform_conv2d` with clipped offsets — bilinear interpolation of a
    clipped offset IS the hat decomposition the kernel computes."""
    return _dcn_s2_pallas_fwd(x, offset, mask, weight, padding, radius,
                              tile_h)


def _s2_fwd(x, offset, mask, weight, padding, radius, tile_h):
    out = _dcn_s2_pallas_fwd(x, offset, mask, weight, padding, radius,
                             tile_h)
    return out, (x, offset, mask, weight)


def _s2_bwd(padding, radius, tile_h, res, g):
    x, offset, mask, weight = res
    B, Ho, Wo, Cout = g.shape
    kh, kw, Cin, _ = weight.shape
    # cotangent on the full stride-1 grid: zeros at odd rows/cols
    gf = jax.lax.pad(
        g, jnp.zeros((), g.dtype),
        ((0, 0, 0), (0, 1, 1), (0, 1, 1), (0, 0, 0)),
    )  # (B, 2Ho, 2Wo, Cout), g at even positions
    dx, doff2, dm2, dw = _dcn_pallas_bwd_impl(
        x, _up2(offset), _up2(mask), weight, gf, padding, radius, tile_h)
    return (dx.astype(x.dtype),
            doff2[:, ::2, ::2, :].astype(offset.dtype),
            dm2[:, ::2, ::2, :].astype(mask.dtype),
            dw.reshape(kh, kw, Cin, -1).astype(weight.dtype))


deform_conv2d_s2_pallas.defvjp(_s2_fwd, _s2_bwd)
