"""Pallas 3x3 SAME conv for large-spatial NHWC shapes (the SD VAE decode).

Why this kernel exists: XLA's conv lowering runs the VAE decoder's
512x512-spatial convs at 0.18-0.23 of bf16 peak in isolation
(tools/vae_conv_probe.py) — the worst rates anywhere in either model family
— and the scoring decode is 66% of SD device self-time (PARITY note 7e;
the reference executes this decode per candidate in sequential Python,
pipeline_stable_diffusion.py:1413-1414). The tiling roofline says the
geometry is ~0.97-clean (tools/roofline.py --arch sd_vae), so the deficit
is XLA's spatial-chunked lowering, not padding. This kernel is the
"halo-DMA'd im2col" design named in PARITY round-4 candidates 10/11.

Design (one grid step = one [TH, W] row-band of one batch element):

  grid = (B, H // TH)
  inputs per step (Pallas auto-pipelines HBM->VMEM, double-buffered):
    body [1, TH, W, C]   the band
    top  [1, 1,  W, C]   row TH*i - 1 (clamped; zeroed in-kernel at i=0)
    bot  [1, 1,  W, C]   row TH*i + TH (clamped; zeroed at the last band)
    w2   [9C, K]         kernel reshaped (dy, dx, c) -> rows
  scratch:
    xs   [TH+2, W+2, C]  W-padded band with halo rows; the W border
                         columns are zeroed once at the first grid step
                         and never rewritten (SAME zero padding)
    im   [TH*(W+2), 9C]  in-VMEM im2col: tap (dy, dx) occupies lane block
                         [3dy+dx]*C with rows = xs[dy:dy+TH] flattened and
                         rolled by -dx (row-crossing wrap and the dx>0
                         garbage land only in the two discarded W-pad
                         output columns)
  compute: ONE MXU dot [TH*(W+2), 9C] x [9C, K] per band (contraction
  depth 9C >= 1152 — far past the 128 the tap-accumulate form would get),
  then slice off the W padding. Optional fused epilogue: +bias, +residual
  (the VAE resnet's skip add — saves that tensor's separate HBM pass).

HBM traffic per band: body read once + 2 halo rows (re-read; (TH+2)/TH
overhead) + y write once. No manual DMA needed — the halo rows are just
two extra 1-row BlockSpec inputs with clamped index maps.

Differentiable via custom_vjp with the jnp/XLA conv as backward (the same
forward-only-kernel pattern as ops/pallas/groupnorm.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_WPAD = 16  # row padding: keeps every xs row a whole number of sublane
# tiles (16 for bf16, and a multiple of fp32's 8), so the [TH, WP, C] ->
# [TH*WP, C] flatten is layout-free and the dx shifts can be static
# two-piece slice copies instead of rotates (Mosaic has no bf16
# dynamic_rotate). xpad occupies columns 0..W+1 (0 and W+1 are the SAME
# zero padding); columns W+2..WP-1 stay zero and their outputs are
# discarded by the final slice.


def _gn_prologue(rows, sc_ref, sh_ref, out_dtype):
    """Normalize+SiLU loaded input rows in VMEM: silu(x*scale + shift) with
    per-(batch, channel) fp32 scale/shift (GroupNorm folded by the caller:
    scale = rstd*gamma, shift = beta - mean*scale). fp32 math, cast back to
    the activation dtype — bit-identical to the standalone fused GN kernel's
    output feeding the conv."""
    x = rows.astype(jnp.float32) * sc_ref[0] + sh_ref[0]
    return (x * jax.nn.sigmoid(x)).astype(out_dtype)


def _conv3_kernel(body_ref, top_ref, bot_ref, w2_ref, *rest,
                  th: int, tc: int, w: int, c: int, kout: int,
                  has_bias: bool, has_residual: bool, has_gn: bool):
    refs = list(rest)
    gnsc_ref = refs.pop(0) if has_gn else None
    gnsh_ref = refs.pop(0) if has_gn else None
    bias_ref = refs.pop(0) if has_bias else None
    res_ref = refs.pop(0) if has_residual else None
    y_ref, xs, im0, im1 = refs
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    first = (pl.program_id(0) == 0) & (i == 0)
    wp = w + _WPAD

    @pl.when(first)
    def _zero_scratch():
        # zero padding columns + the im slots' shift tails: written once;
        # every per-step write below covers interior slices only, so the
        # zeros persist across the sequential grid.
        xs[:] = jnp.zeros_like(xs)
        im0[:] = jnp.zeros_like(im0)
        im1[:] = jnp.zeros_like(im1)

    body = body_ref[0]
    top = top_ref[0, 0]
    bot = bot_ref[0, 0]
    if has_gn:
        body = _gn_prologue(body, gnsc_ref, gnsh_ref, xs.dtype)
        top = _gn_prologue(top, gnsc_ref, gnsh_ref, xs.dtype)
        bot = _gn_prologue(bot, gnsc_ref, gnsh_ref, xs.dtype)
    xs[1:th + 1, 1:w + 1, :] = body
    top = top.astype(xs.dtype)
    bot = bot.astype(xs.dtype)
    xs[0, 1:w + 1, :] = jnp.where(i > 0, top, jnp.zeros_like(top))
    xs[th + 1, 1:w + 1, :] = jnp.where(i < n_i - 1, bot, jnp.zeros_like(bot))

    mc = tc * wp
    # The band is processed in th//tc chunks alternating between two im
    # slots: chunk j+1's tap assembly (VPU) has no data dependency on chunk
    # j's dot (MXU) — distinct slots avoid the write-after-read hazard —
    # so Mosaic's scheduler is free to overlap them.
    for j in range(th // tc):
        im = im0 if j % 2 == 0 else im1
        r0 = j * tc
        for dy in range(3):
            # leading-dim slice (free) + tile-aligned flatten (wp % 16 == 0)
            base = xs[r0 + dy:r0 + dy + tc, :, :].reshape(mc, c)
            for dx in range(3):
                tap = 3 * dy + dx
                if _PROBE_MODE == "nocopy" and tap:
                    continue
                if dx == 0 or _PROBE_MODE == "aligned":
                    im[:, tap * c:(tap + 1) * c] = base
                else:
                    # y[r] = base[r + dx]; the dx tail rows keep stale
                    # values — they only feed the discarded pad columns
                    # (row r's last _WPAD-2 outputs), as does the
                    # row-crossing wrap.
                    im[0:mc - dx, tap * c:(tap + 1) * c] = base[dx:mc, :]

        out = jnp.dot(im[:], w2_ref[:], preferred_element_type=jnp.float32)
        out = out.reshape(tc, wp, kout)[:, 0:w, :]
        if bias_ref is not None:
            out = out + bias_ref[0].astype(jnp.float32)
        if res_ref is not None:
            out = out + res_ref[0, r0:r0 + tc].astype(jnp.float32)
        y_ref[0, r0:r0 + tc] = out.astype(y_ref.dtype)


_VMEM_BUDGET = int(os.environ.get("DTTS_CONV_VMEM_MB", "12")) * 2**20

# up2 kernel: retile [.., W, 2K] -> [.., 2W, K] in VMEM and store the
# target [B, 2H, 2W, K] layout directly (skips the caller-side XLA
# relayout, a full HBM round trip). A/B flag: DTTS_UP2_DIRECT=0 reverts
# to the packed-layout store + external reshape.
_UP2_DIRECT = os.environ.get("DTTS_UP2_DIRECT", "1") != "0"
# Diagnostics only (WRONG numerics): "aligned" replaces the shifted tap
# copies with aligned ones (isolates the sublane-shift penalty); "nocopy"
# skips 8 of 9 tap writes (isolates copy volume vs MXU time).
_PROBE_MODE = os.environ.get("DTTS_CONV_PROBE_MODE", "")
# Kernel form: "stacked" (default — wider-N dot, dx resolved post-dot on
# fp32) or "im2col" (one [mc, 9C] x [9C, K] dot). Read once at import.
_FORM = os.environ.get("DTTS_CONV_FORM", "stacked")
# A/B probe: do the stacked form's post-dot dx combine in bf16 (static
# two-piece shifts + bf16 adds — half the VMEM traffic of the fp32
# pltpu.roll chain, which the traffic accounting puts at ~60% of the
# kernel wall). Numerics: partials round to bf16 BEFORE the 3-term sum
# (vs one final cast) — a bf16-epsilon-level divergence from the XLA conv.
_COMBINE_BF16 = os.environ.get("DTTS_CONV_COMBINE_BF16", "") not in ("", "0")


def _conv3_stacked_kernel(body_ref, top_ref, bot_ref, w2s_ref, *rest,
                          th: int, tc: int, w: int, c: int, kout: int,
                          has_bias: bool, has_residual: bool, has_gn: bool,
                          has_shortcut: bool = False):
    """Output-stacked tap dot: ONE [mc, 3C] x [3C, 3K] matmul per chunk.

    The im2col form's dot is [mc, 9C] x [9C, K] — K output lanes, ONE MXU
    tile column for the VAE's 128-out-channel shapes, which measures ~0.45
    efficient under Mosaic. Here the lhs stacks only the THREE dy rows
    (aligned copies; dy offsets are multiples of wp), the rhs interleaves
    the dx taps as 3K output columns (3x wider N), and the dx alignment
    moves to a post-dot combine on the fp32 partials:

        Q[m, dx*K + k] = sum_dy xs_flat[m + dy*wp, :] @ W[dy, dx]
        y_flat[m]      = Q[m, 0:K] + Q[m+1, K:2K] + Q[m+2, 2K:3K]

    The +1/+2 row reach at the chunk tail lands only in the discarded
    W-pad output columns (w >= wp-2), so chunks stay independent; the
    fp32 rolls are 32-bit, which Mosaic's dynamic_rotate supports (the
    bf16 input-side shifts it does not)."""
    refs = list(rest)
    gnsc_ref = refs.pop(0) if has_gn else None
    gnsh_ref = refs.pop(0) if has_gn else None
    bias_ref = refs.pop(0) if has_bias else None
    res_ref = refs.pop(0) if has_residual else None
    scin_ref = refs.pop(0) if has_shortcut else None
    scw_ref = refs.pop(0) if has_shortcut else None
    y_ref, xs, lbuf0, lbuf1 = refs
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    first = (pl.program_id(0) == 0) & (i == 0)
    wp = w + _WPAD

    @pl.when(first)
    def _zero_scratch():
        xs[:] = jnp.zeros_like(xs)

    body = body_ref[0]
    top = top_ref[0, 0]
    bot = bot_ref[0, 0]
    if has_gn:
        # GroupNorm+SiLU applied as rows land in VMEM: saves the standalone
        # GN kernel's output write + this kernel's re-read (2 HBM trips of
        # the full tensor per fused GN). The SAME zero padding stays zero —
        # it pads the conv's input space, i.e. AFTER normalization.
        body = _gn_prologue(body, gnsc_ref, gnsh_ref, xs.dtype)
        top = _gn_prologue(top, gnsc_ref, gnsh_ref, xs.dtype)
        bot = _gn_prologue(bot, gnsc_ref, gnsh_ref, xs.dtype)
    xs[1:th + 1, 1:w + 1, :] = body
    top = top.astype(xs.dtype)
    bot = bot.astype(xs.dtype)
    xs[0, 1:w + 1, :] = jnp.where(i > 0, top, jnp.zeros_like(top))
    xs[th + 1, 1:w + 1, :] = jnp.where(i < n_i - 1, bot, jnp.zeros_like(bot))

    mc = tc * wp
    for j in range(th // tc):
        # alternate lbuf slots so chunk j+1's tap assembly (VPU) has no
        # write-after-read hazard on chunk j's dot (MXU) — the same
        # two-slot overlap the im2col form uses
        lbuf = lbuf0 if j % 2 == 0 else lbuf1
        r0 = j * tc
        for dy in range(3):
            lbuf[:, dy * c:(dy + 1) * c] = (
                xs[r0 + dy:r0 + dy + tc, :, :].reshape(mc, c))
        q = jnp.dot(lbuf[:], w2s_ref[:], preferred_element_type=jnp.float32)
        a = q[:, 0:kout]
        b = q[:, kout:2 * kout]
        cc = q[:, 2 * kout:3 * kout]
        # y[m] = a[m] + b[m+1] + cc[m+2]; the wrapped tail rows only feed
        # the discarded pad columns.
        scd = None
        if scin_ref is not None:
            # fused 1x1 conv_shortcut projection: one more MXU dot on rows
            # already pipelined into VMEM — the standalone 1x1 op's HBM
            # write and this kernel's residual re-read never happen
            cres = scw_ref.shape[0]
            scrows = scin_ref[0, r0:r0 + tc].reshape(tc * w, cres)
            scd = jnp.dot(scrows, scw_ref[:],
                          preferred_element_type=jnp.float32
                          ).reshape(tc, w, kout)
        if _COMBINE_BF16 and y_ref.dtype == jnp.bfloat16:
            # bf16 end-to-end epilogue: half the VMEM traffic of the fp32
            # roll chain; static two-piece shifts instead of dynamic_rotate
            a16 = a.astype(jnp.bfloat16)
            b16 = b.astype(jnp.bfloat16)
            c16 = cc.astype(jnp.bfloat16)
            out = (a16
                   + jnp.concatenate([b16[1:], b16[:1]], axis=0)
                   + jnp.concatenate([c16[2:], c16[:2]], axis=0))
            out = out.reshape(tc, wp, kout)[:, 0:w, :]
            if bias_ref is not None:
                out = out + bias_ref[0].astype(jnp.bfloat16)
            if res_ref is not None:
                out = out + res_ref[0, r0:r0 + tc].astype(jnp.bfloat16)
            if scd is not None:
                out = out + scd.astype(jnp.bfloat16)
            y_ref[0, r0:r0 + tc] = out
        else:
            out = (a + pltpu.roll(b, mc - 1, axis=0)
                   + pltpu.roll(cc, mc - 2, axis=0))
            out = out.reshape(tc, wp, kout)[:, 0:w, :]
            if bias_ref is not None:
                out = out + bias_ref[0].astype(jnp.float32)
            if res_ref is not None:
                out = out + res_ref[0, r0:r0 + tc].astype(jnp.float32)
            if scd is not None:
                out = out + scd
            y_ref[0, r0:r0 + tc] = out.astype(y_ref.dtype)


def _pick_tiles(h: int, w: int, c: int, kout: int, itemsize: int,
                budget: int = 0) -> tuple[int, int]:
    """(th, tc): band height and dot-chunk height. tc sets the dot's M
    (tc*(w+16)); th = tc * n_chunks amortizes the halo/assembly overhead and
    gives the scheduler >=2 chunks to overlap."""
    budget = budget or _VMEM_BUDGET
    wp = w + _WPAD

    def est(th, tc):
        mc = tc * wp
        return (2 * mc * 9 * c * itemsize            # two im slots
                + (th + 2) * wp * c * itemsize       # xs
                + mc * kout * 4                      # chunk dot out (fp32)
                + 2 * th * w * c * itemsize          # body double-buffered
                + 2 * th * w * kout * itemsize       # y double-buffered
                + 9 * c * kout * itemsize)           # w2

    for tc in (8, 4, 2, 1):
        if h % tc:
            continue
        for chunks in (4, 2, 1):
            th = tc * chunks
            if h % th == 0 and est(th, tc) <= budget:
                return th, tc
    return 1, 1


def _pick_tiles_stacked(h: int, w: int, c: int, kout: int, itemsize: int,
                        budget: int = 0, cres: int = 0) -> tuple[int, int]:
    budget = budget or _VMEM_BUDGET
    wp = w + _WPAD

    def est(th, tc):
        mc = tc * wp
        return (2 * mc * 3 * c * itemsize            # two lbuf slots
                + mc * 3 * kout * 4                  # q (fp32)
                + (th + 2) * wp * c * itemsize       # xs
                + 2 * th * w * c * itemsize          # body double-buffered
                + 2 * th * w * kout * itemsize       # y double-buffered
                + 3 * c * 3 * kout * itemsize        # w2s
                + 2 * th * w * cres * itemsize       # shortcut in (dbl-buf)
                + cres * kout * itemsize             # shortcut weights
                + (tc * w * kout * 4 if cres else 0))  # shortcut dot (fp32)

    for tc in (16, 8, 4, 2, 1):
        if h % tc:
            continue
        for chunks in (4, 2, 1):
            th = tc * chunks
            if h % th == 0 and est(th, tc) <= budget:
                return th, tc
    return 1, 1


def _conv3_reference(x, kernel, bias=None, residual=None,
                     gn_scale=None, gn_shift=None, sc_x=None, sc_w=None):
    if gn_scale is not None:
        xn = x.astype(jnp.float32) * gn_scale[:, None, None, :] \
            + gn_shift[:, None, None, :]
        x = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    if sc_x is not None:
        out = out + jnp.einsum("bhwc,ck->bhwk", sc_x, sc_w,
                               preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "form"))
def _conv3_fwd_only(x, kernel, bias=None, residual=None,
                    gn_scale=None, gn_shift=None, sc_x=None, sc_w=None, *,
                    interpret: bool = False, form: str | None = None):
    b, h, w, c = x.shape
    kout = kernel.shape[-1]
    form = form or _FORM
    if sc_x is not None and form != "stacked":
        raise ValueError("fused conv_shortcut is stacked-form only")
    cres = sc_x.shape[-1] if sc_x is not None else 0
    if form == "stacked":
        th, tc = _pick_tiles_stacked(h, w, c, kout, x.dtype.itemsize,
                                     cres=cres)
        # [dy, c, dx, k] -> rows dy*C+c, cols dx*K+k
        w2 = kernel.transpose(0, 2, 1, 3).reshape(3 * c, 3 * kout).astype(x.dtype)
    else:
        th, tc = _pick_tiles(h, w, c, kout, x.dtype.itemsize)
        w2 = kernel.reshape(9 * c, kout).astype(x.dtype)

    in_specs = [
        pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c),
                     lambda bi, i: (bi, jnp.maximum(i * th - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c),
                     lambda bi, i: (bi, jnp.minimum(i * th + th, h - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, w2]
    if gn_scale is not None:
        # [B, 1, C] so the (1, C) trailing block is tileable (a bare [B, C]
        # block of (1, C) fails the second-minor-divisible-by-8 rule)
        for v in (gn_scale, gn_shift):
            in_specs.append(pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(v.astype(jnp.float32).reshape(b, 1, c))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, kout), lambda bi, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, kout))
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, th, w, kout),
                                     lambda bi, i: (bi, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    if sc_x is not None:
        in_specs.append(pl.BlockSpec((1, th, w, cres),
                                     lambda bi, i: (bi, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(sc_x.astype(x.dtype))
        in_specs.append(pl.BlockSpec((cres, kout), lambda bi, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(sc_w.astype(x.dtype))

    flops = 2 * b * h * w * (9 * c + cres) * kout
    if form == "stacked":
        kern = functools.partial(
            _conv3_stacked_kernel, th=th, tc=tc, w=w, c=c, kout=kout,
            has_bias=bias is not None, has_residual=residual is not None,
            has_gn=gn_scale is not None, has_shortcut=sc_x is not None,
        )
        scratch = [
            pltpu.VMEM(((th + 2), w + _WPAD, c), x.dtype),     # xs
            pltpu.VMEM((tc * (w + _WPAD), 3 * c), x.dtype),    # lbuf slot 0
            pltpu.VMEM((tc * (w + _WPAD), 3 * c), x.dtype),    # lbuf slot 1
        ]
    else:
        kern = functools.partial(
            _conv3_kernel, th=th, tc=tc, w=w, c=c, kout=kout,
            has_bias=bias is not None, has_residual=residual is not None,
            has_gn=gn_scale is not None,
        )
        scratch = [
            pltpu.VMEM(((th + 2), w + _WPAD, c), x.dtype),     # xs
            pltpu.VMEM((tc * (w + _WPAD), 9 * c), x.dtype),    # im slot 0
            pltpu.VMEM((tc * (w + _WPAD), 9 * c), x.dtype),    # im slot 1
        ]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, kout), x.dtype),
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, kout), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * _VMEM_BUDGET) + 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(b * h * w * (c + cres + kout) * x.dtype.itemsize
                            + (9 * c + cres) * kout * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(*args)


# ---------------------------------------------------------------- custom vjp
# Forward runs the hand-written kernel; backward is the VJP of the jnp/XLA
# reference (numerically the same conv) so training through the kernel works
# on TPU — the same treatment as ops/pallas/groupnorm.py.

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _conv3_diff(x, kernel, bias, residual, gn_scale, gn_shift,
                sc_x, sc_w, interpret, form):
    return _conv3_fwd_only(x, kernel, bias, residual, gn_scale, gn_shift,
                           sc_x, sc_w, interpret=interpret, form=form)


def _conv3_diff_fwd(x, kernel, bias, residual, gn_scale, gn_shift,
                    sc_x, sc_w, interpret, form):
    out = _conv3_diff(x, kernel, bias, residual, gn_scale, gn_shift,
                      sc_x, sc_w, interpret, form)
    return out, (x, kernel, bias, residual, gn_scale, gn_shift, sc_x, sc_w)


def _conv3_diff_bwd(interpret, form, res, g):
    x, kernel, bias, residual, gn_scale, gn_shift, sc_x, sc_w = res
    opt = [bias, residual, gn_scale, gn_shift, sc_x, sc_w]
    diff_args = [x, kernel] + [a for a in opt if a is not None]

    def ref(*a):
        xx, kk = a[0], a[1]
        rest = list(a[2:])
        bb = rest.pop(0) if bias is not None else None
        rr = rest.pop(0) if residual is not None else None
        sc = rest.pop(0) if gn_scale is not None else None
        sh = rest.pop(0) if gn_shift is not None else None
        sx = rest.pop(0) if sc_x is not None else None
        sw = rest.pop(0) if sc_w is not None else None
        return _conv3_reference(xx, kk, bb, rr, sc, sh, sx, sw)

    _, vjp = jax.vjp(ref, *diff_args)
    grads = list(vjp(g))
    gx, gk = grads.pop(0), grads.pop(0)
    out = [gx, gk]
    for a in opt:
        out.append(grads.pop(0) if a is not None else None)
    return tuple(out)


_conv3_diff.defvjp(_conv3_diff_fwd, _conv3_diff_bwd)


def conv3x3_same(x, kernel, bias=None, residual=None, *,
                 gn_scale=None, gn_shift=None, shortcut=None,
                 interpret: bool = False, form: str | None = None):
    """3x3 stride-1 SAME conv, NHWC x [B,H,W,C] * HWIO kernel [3,3,C,K],
    optional fused +bias [K] and +residual [B,H,W,K] epilogue, and optional
    GroupNorm+SiLU PROLOGUE: with gn_scale/gn_shift [B, C] fp32 (caller
    folds the group statistics: scale = rstd*gamma, shift = beta -
    mean*scale) the kernel computes conv(silu(x*scale + shift)) without the
    normalized tensor ever visiting HBM — the GN apply that is otherwise a
    full write + re-read per resnet norm (the SD VAE decoder's GN kernels
    are 12.6%% of SD e2e device time). fp32 accumulation regardless of
    input dtype. form: "stacked" (default) or "im2col" — see the kernel
    docstrings; DTTS_CONV_FORM sets the default.

    shortcut=(sc_x [B,H,W,Cres], sc_w [Cres,K]) fuses a 1x1 projection of
    a SECOND input into the epilogue (the resnet conv_shortcut): out +=
    sc_x @ sc_w, computed as one extra MXU dot per chunk on rows already
    pipelined into VMEM — the standalone 1x1 op's HBM write and this
    kernel's residual re-read both disappear. Stacked form only; fold the
    shortcut's own bias into `bias`."""
    if (gn_scale is None) != (gn_shift is None):
        raise ValueError("gn_scale and gn_shift must be given together")
    sc_x, sc_w = shortcut if shortcut is not None else (None, None)
    if shortcut is not None and residual is not None:
        raise ValueError("shortcut and residual are mutually exclusive "
                         "(the shortcut IS the resnet skip)")
    return _conv3_diff(x, kernel, bias, residual, gn_scale, gn_shift,
                       sc_x, sc_w, interpret, form)


_NO_PALLAS_CONV = bool(os.environ.get("DTTS_NO_PALLAS_CONV"))


_MIN_SPATIAL = int(os.environ.get("DTTS_CONV_MIN_SPATIAL", "96"))


def pallas_conv3_shape_eligible(h: int, w: int, c: int, kout: int) -> bool:
    """Shape-only half of the eligibility check (module code uses it to
    pick the fused-GN route before building the kernel array)."""
    if _NO_PALLAS_CONV:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if c % 128 or kout % 128:
        return False
    return h % 2 == 0 and h >= _MIN_SPATIAL and w % 16 == 0 and w >= _MIN_SPATIAL


_NO_SC_IN_CONV = bool(os.environ.get("DTTS_NO_SC_IN_CONV"))


def pallas_shortcut_eligible(cres: int) -> bool:
    """Whether a 1x1 conv_shortcut of Cres input channels can fuse into an
    (already shape-eligible) stacked conv: lane-aligned Cres, stacked form
    in effect, kill-switch DTTS_NO_SC_IN_CONV."""
    return (not _NO_SC_IN_CONV and _FORM == "stacked" and cres % 128 == 0)


def pallas_conv3_eligible(x, kernel) -> bool:
    """TPU only; lane-aligned channels; W sublane-tile aligned (the
    kernel's [TH, W+16, C] -> [TH*(W+16), C] flatten needs whole 16-row
    tiles); H tileable; spatial >= DTTS_CONV_MIN_SPATIAL (default 96: the
    kernel wins where XLA's spatial-chunked lowering collapses — 512/256/
    128-px VAE shapes — while small-feature-map UNet levels stay on XLA,
    which is already near its roof there). Read-once env kill-switch
    DTTS_NO_PALLAS_CONV (same trace-time rule as the GN/attn kernels)."""
    if kernel.shape[:2] != (3, 3):
        return False
    b, h, w, c = x.shape
    return pallas_conv3_shape_eligible(h, w, c, kernel.shape[-1])


# --------------------------------------------------------- upsample2x + conv
# Fused nearest-2x-upsample + 3x3 SAME conv via the 2x2-phase decomposition
# (ops/resample.py derives the math; diffusers upsampling.py Upsample2D is
# the op being replaced, driven per candidate by the reference's scoring
# decode, pipeline_stable_diffusion.py:1413-1414). XLA executes the phased
# form as 4 grouped convs + an explicit interleave — on the VAE decoder's
# upsamplers the interleave alone (concatenate/broadcast/reshape) is ~8% of
# SD e2e device self-time and the convs run at ~0.15 of peak. This kernel:
#
#   * lhs assembly identical to the stacked kernel: lbuf [mc, 3C] stacks the
#     three SOURCE-row taps (X[s-1], X[s], X[s+1]) from the haloed xs scratch
#   * TWO dots at the phased-FLOP minimum (16 MACs per 2x2 output block —
#     2.25x fewer than a full conv at target resolution):
#       qa = lbuf[:, 0:2C] @ wa   # output row-phase a=0: X[s-1], X[s]
#       qb = lbuf[:, C:3C] @ wb   # output row-phase a=1: X[s],   X[s+1]
#     where wa/wb [2C, 4K] hold the fp32-folded row taps (W0 | W1+W2 and
#     W0+W1 | W2) times the four column-tap folds (W_x0 | W_x1+W_x2 |
#     W_x0+W_x1 | W_x2). Contraction depth 2C, dot N = 4K — wider than even
#     the stacked form's 3C x 3K.
#   * column phases resolved post-dot with 32-bit rolls on the fp32 partials
#     (wrap lands in the discarded W-pad columns, as in the stacked form)
#   * the column interleave NEVER happens: the combined [mc, 2K] chunk rows
#     carry target columns as u = b*K + k, and the kernel writes an output
#     allocated [B, H, 2, W, 2K] whose row-major linearization IS
#     [B, 2H, 2W, K] — the caller's final jnp.reshape is a pure relayout
#     (one on-chip pass) instead of XLA's concat+broadcast interleave.


def _conv3_up2_kernel(body_ref, top_ref, bot_ref, wa_ref, wb_ref, *rest,
                      th: int, tc: int, w: int, c: int, kout: int,
                      has_bias: bool, precision, direct: bool = False):
    refs = list(rest)
    bias_ref = refs.pop(0) if has_bias else None
    y_ref, xs, lbuf0, lbuf1 = refs
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    first = (pl.program_id(0) == 0) & (i == 0)
    wp = w + _WPAD

    @pl.when(first)
    def _zero_scratch():
        xs[:] = jnp.zeros_like(xs)

    body = body_ref[0]
    top = top_ref[0, 0].astype(xs.dtype)
    bot = bot_ref[0, 0].astype(xs.dtype)
    xs[1:th + 1, 1:w + 1, :] = body
    xs[0, 1:w + 1, :] = jnp.where(i > 0, top, jnp.zeros_like(top))
    xs[th + 1, 1:w + 1, :] = jnp.where(i < n_i - 1, bot, jnp.zeros_like(bot))

    mc = tc * wp
    k = kout
    for j in range(th // tc):
        lbuf = lbuf0 if j % 2 == 0 else lbuf1
        r0 = j * tc
        for dy in range(3):
            lbuf[:, dy * c:(dy + 1) * c] = (
                xs[r0 + dy:r0 + dy + tc, :, :].reshape(mc, c))
        qa = jnp.dot(lbuf[:, 0:2 * c], wa_ref[:],
                     preferred_element_type=jnp.float32, precision=precision)
        qb = jnp.dot(lbuf[:, c:3 * c], wb_ref[:],
                     preferred_element_type=jnp.float32, precision=precision)

        def combine(q):
            # target col 2t   = xs[t]   @ Wx0       + xs[t+1] @ (Wx1+Wx2)
            # target col 2t+1 = xs[t+1] @ (Wx0+Wx1) + xs[t+2] @ Wx2
            # (xs col t+1 holds data col t; col 0 is the SAME zero pad)
            b0 = q[:, 0:k] + pltpu.roll(q[:, k:2 * k], mc - 1, axis=0)
            b1 = (pltpu.roll(q[:, 2 * k:3 * k], mc - 1, axis=0)
                  + pltpu.roll(q[:, 3 * k:4 * k], mc - 2, axis=0))
            return jnp.concatenate([b0, b1], axis=1)  # [mc, 2K], u = b*K+k

        ya, yb = combine(qa), combine(qb)
        if bias_ref is not None:
            bb = bias_ref[0].astype(jnp.float32)
            ya = ya + bb
            yb = yb + bb
        ya = ya.reshape(tc, wp, 2 * k)[:, 0:w, :]
        yb = yb.reshape(tc, wp, 2 * k)[:, 0:w, :]
        if not direct:
            y_ref[0, r0:r0 + tc, 0] = ya.astype(y_ref.dtype)
            y_ref[0, r0:r0 + tc, 1] = yb.astype(y_ref.dtype)
        else:
            # Direct [B, 2H, 2W, K] store: the caller-side reshape of the
            # packed [.., W, 2K] layout to [.., 2W, K] is a lane->sublane
            # retile XLA executes as a full HBM round trip (1.65 ms at the
            # up_blocks_2 shape); here the same retile runs on the VMEM
            # tile (cast to the output dtype first — half the bytes) and
            # the row phases interleave via static strided stores.
            ya_t = ya.astype(y_ref.dtype).reshape(tc, 2 * w, k)
            yb_t = yb.astype(y_ref.dtype).reshape(tc, 2 * w, k)
            for s in range(tc):
                y_ref[0, 2 * (r0 + s)] = ya_t[s]
                y_ref[0, 2 * (r0 + s) + 1] = yb_t[s]


def _pick_tiles_up2(h: int, w: int, c: int, kout: int, itemsize: int,
                    budget: int = 0) -> tuple[int, int]:
    budget = budget or _VMEM_BUDGET
    wp = w + _WPAD

    def est(th, tc):
        mc = tc * wp
        return (2 * mc * 3 * c * itemsize            # two lbuf slots
                + 2 * mc * 4 * kout * 4              # qa + qb (fp32)
                + (th + 2) * wp * c * itemsize       # xs
                + 2 * th * w * c * itemsize          # body double-buffered
                + 4 * th * w * 4 * kout * itemsize   # y double-buffered (4x)
                + 2 * 2 * c * 4 * kout * itemsize)   # wa + wb

    for tc in (8, 4, 2, 1):
        if h % tc:
            continue
        for chunks in (4, 2, 1):
            th = tc * chunks
            if h % th == 0 and est(th, tc) <= budget:
                return th, tc
    return 1, 1


def _up2_reference(x, kernel, bias=None):
    from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3

    return nn_upsample2x_conv3x3(x, kernel, bias)


@functools.partial(jax.jit, static_argnames=("interpret", "direct"))
def _conv3_up2_fwd_only(x, kernel, bias=None, *, interpret: bool = False,
                        direct: bool = _UP2_DIRECT):
    b, h, w, c = x.shape
    kout = kernel.shape[-1]
    th, tc = _pick_tiles_up2(h, w, c, kout, x.dtype.itemsize)

    # fp32 tap folds (the only reassociation vs the unfused formulation —
    # the same folds ops/resample.py::phase_kernels does), cast to x.dtype.
    wf = kernel.astype(jnp.float32)                      # [ky, kx, C, K]
    rows_a = jnp.stack([wf[0], wf[1] + wf[2]], axis=0)   # [2, kx, C, K]
    rows_b = jnp.stack([wf[0] + wf[1], wf[2]], axis=0)

    def colfold(r):  # [2, kx, C, K] -> [2C, 4K]
        cb = jnp.stack([r[:, 0], r[:, 1] + r[:, 2],
                        r[:, 0] + r[:, 1], r[:, 2]], axis=2)  # [2, C, 4, K]
        return cb.reshape(2 * c, 4 * kout).astype(x.dtype)

    wa, wb = colfold(rows_a), colfold(rows_b)

    in_specs = [
        pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c),
                     lambda bi, i: (bi, jnp.maximum(i * th - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c),
                     lambda bi, i: (bi, jnp.minimum(i * th + th, h - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wa.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(wb.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, wa, wb]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 2 * kout), lambda bi, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.concatenate([bias, bias]).reshape(1, 2 * kout))

    kern = functools.partial(
        _conv3_up2_kernel, th=th, tc=tc, w=w, c=c, kout=kout,
        has_bias=bias is not None, direct=direct,
        # DEFAULT precision: fp32 operands get the MXU's bf16-product
        # rounding, the same contract as XLA's own default conv lowering
        # (measured ~2e-3 relative vs the jnp reference at 2C=512 depth;
        # HIGHEST measures WORSE here — a systematic 4e-3 drift on
        # hardware — so it is deliberately not used).
        precision=jax.lax.Precision.DEFAULT,
    )
    scratch = [
        pltpu.VMEM(((th + 2), w + _WPAD, c), x.dtype),     # xs
        pltpu.VMEM((tc * (w + _WPAD), 3 * c), x.dtype),    # lbuf slot 0
        pltpu.VMEM((tc * (w + _WPAD), 3 * c), x.dtype),    # lbuf slot 1
    ]
    if direct:
        # The kernel retiles [.., W, 2K] -> [.., 2W, K] in VMEM and stores
        # the target layout; no caller-side relayout at all.
        out_shape = jax.ShapeDtypeStruct((b, 2 * h, 2 * w, kout), x.dtype)
        out_spec = pl.BlockSpec((1, 2 * th, 2 * w, kout),
                                lambda bi, i: (bi, i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # [B, H, 2, W, 2K]: row-major-identical to [B, 2H, 2W, K] — the
        # final reshape is a pure relayout, never an interleave (but still
        # an HBM round trip; see `direct`).
        out_shape = jax.ShapeDtypeStruct((b, h, 2, w, 2 * kout), x.dtype)
        out_spec = pl.BlockSpec((1, th, 2, w, 2 * kout),
                                lambda bi, i: (bi, i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * _VMEM_BUDGET) + 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=32 * b * h * w * c * kout,
            bytes_accessed=(b * h * w * (c + 4 * kout) * x.dtype.itemsize
                            + 2 * 2 * c * 4 * kout * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(*args)
    if direct:
        return out
    return out.reshape(b, 2 * h, 2 * w, kout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3_up2_diff(x, kernel, bias, interpret):
    return _conv3_up2_fwd_only(x, kernel, bias, interpret=interpret)


def _conv3_up2_diff_fwd(x, kernel, bias, interpret):
    return _conv3_up2_diff(x, kernel, bias, interpret), (x, kernel, bias)


def _conv3_up2_diff_bwd(interpret, res, g):
    x, kernel, bias = res
    diff_args = [x, kernel] + ([bias] if bias is not None else [])

    def ref(*a):
        return _up2_reference(a[0], a[1], a[2] if bias is not None else None)

    _, vjp = jax.vjp(ref, *diff_args)
    grads = list(vjp(g))
    gx, gk = grads.pop(0), grads.pop(0)
    return gx, gk, (grads.pop(0) if bias is not None else None)


_conv3_up2_diff.defvjp(_conv3_up2_diff_fwd, _conv3_up2_diff_bwd)


def conv3x3_up2(x, kernel, bias=None, *, interpret: bool = False):
    """nearest-2x upsample + 3x3 stride-1 SAME conv, fused. x [B,H,W,C]
    NHWC, kernel [3,3,C,K] HWIO, optional bias [K]; returns [B,2H,2W,K] ==
    conv3x3_pad1(nearest_up2(x)) (ops/resample.py::nn_upsample2x_conv3x3's
    contract, with the same fp32 tap folds). fp32 accumulation; backward is
    the jnp reference's VJP (custom_vjp)."""
    return _conv3_up2_diff(x, kernel, bias, interpret)


_NO_PALLAS_UPCONV = bool(os.environ.get("DTTS_NO_PALLAS_UPCONV"))
_UP2_MIN_SPATIAL = int(os.environ.get("DTTS_UPCONV_MIN_SPATIAL", "64"))


def pallas_up2_eligible(x, kernel) -> bool:
    """TPU only; lane-aligned channels; W sublane-tile aligned; SOURCE
    spatial >= DTTS_UPCONV_MIN_SPATIAL (default 64). Hardware A/B at the
    SD VAE upsampler shapes, B=4 bf16: with the packed-layout store the
    64sq-source upsampler lost (4.89 ms pallas vs 4.50 XLA, gate was 96);
    the direct-store retile (PARITY 8p) flips it — 64sq x512: 2.58 vs
    3.07 XLA (1.19x), 128sq x512: 6.10 vs 13.8 (2.3x), 256sq x256: 5.82
    vs 20.9 (3.6x). The SD UNet's tiny-latent upsamplers (<=32sq source)
    stay on XLA — measured with direct-store at lookahead batch 8:
    32sq x640: 2.41 pallas vs 2.13 XLA, 16sq x1280: 4.22 vs 2.61 (the
    row-band grid degenerates at th<=8 while XLA's phased form batches
    freely), so 64 is the measured crossover, not a guess.
    Kill-switches: DTTS_NO_PALLAS_UPCONV (this kernel only) and
    DTTS_NO_PALLAS_CONV (every conv kernel in this module)."""
    if _NO_PALLAS_UPCONV or _NO_PALLAS_CONV:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if kernel.shape[:2] != (3, 3):
        return False
    b, h, w, c = x.shape
    kout = kernel.shape[-1]
    if c % 128 or kout % 128:
        return False
    return (h % 2 == 0 and w % 16 == 0
            and h >= _UP2_MIN_SPATIAL and w >= _UP2_MIN_SPATIAL)


__all__ = ["conv3x3_same", "conv3x3_up2", "pallas_conv3_eligible",
           "pallas_conv3_shape_eligible", "pallas_up2_eligible"]
