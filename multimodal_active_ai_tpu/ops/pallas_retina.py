"""Pallas TPU kernel for the retina's windowed bilinear resampling.

The matmul retina (``ops/retina.py``) expresses each pyramid level as a
per-image dense "hat-weight" contraction over a window of the mip:
``out[p, c] = Σ_{u,v} hat(rel_y[p]-u) · hat(rel_x[p]-v) · patch[u, v, c]``.
Under XLA this needs (a) a per-image window extraction — which XLA lowers to
a *serialized while loop* of dynamic-update-slices over the batch, ~18 ms a
view-batch on its own — and (b) materialization of the weight matrices and
the fp32 intermediate between the two contractions in HBM.

This kernel fuses the whole pyramid into one VMEM-resident program per
image:

* each level's row window streams from HBM with the DMAs double-buffered
  across grid steps (image i+1's transfers issued before image i's math),
* hat weights are built on the VPU from integer iotas (never touch HBM),
* the contractions run on the MXU in bf16 with fp32 accumulation, with the
  channel de-interleave folded into a second MXU contraction against an
  iota-built 0/1 selector,
* the glimpse-pixel axis lives on LANES end to end: rel/scale inputs arrive
  P-minor exactly as the coordinate plan produces them (no relayout
  copies), and the channel-major ``(3L, P)`` output's NHWC transpose fuses
  into the downstream photometric ops — this orientation alone was worth
  +6.6% end-to-end step throughput.

Falls back to the XLA einsum formulation off-TPU (tests run both and
compare, including interpret-mode runs of this kernel). Replaces (in role)
the DALI ``ops.Crop``+``ops.Resize`` pyramid stages of the reference
(``NVIDIA_DALI_Pipelines.py:467-477``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _hat_sample_kernel(start_ref, rel_ref, mip_ref, out_ref,
                       *, win: int, m: int, chunk: int):
    """One image: row-slice the mip block, build hats, contract."""
    b = pl.program_id(0)
    sy = pl.multiple_of(start_ref[b, 0], 8)  # caller aligns starts to 16
    sx = start_ref[b, 1]
    rows = mip_ref[0, pl.ds(sy, win), :]     # (win, M*3) bf16, dyn sublanes
    rel = rel_ref[0]                         # (P, 2) f32, window-relative
    p_dim = rel.shape[0]

    # tpu.iota only produces integers; cast after (float iota fails to lower)
    idx = jax.lax.broadcasted_iota(jnp.int32, (p_dim, win), 1).astype(jnp.float32)
    ry = jnp.clip(rel[:, 0:1], 0.0, win - 1.0)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - idx))       # (P, win)
    wy16 = wy.astype(jnp.bfloat16)

    # absolute x, clamped to the window (parity with the XLA fallback's
    # window-local clamp; hat support at the clamped edge is zero outside)
    sxf = sx.astype(jnp.float32)
    rxa = jnp.clip(rel[:, 1:2] + sxf, sxf, sxf + win - 1.0)

    width = m * 3
    accs = [jnp.zeros((p_dim, 1), jnp.float32) for _ in range(3)]
    for k0 in range(0, width, chunk):
        k1 = min(k0 + chunk, width)
        patch = rows[:, k0:k1]                            # (win, ck) static
        tmp = jax.lax.dot_general(                        # MXU, f32 accum
            wy16, patch,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (P, ck)
        col = jax.lax.broadcasted_iota(jnp.int32, (p_dim, k1 - k0), 1) + k0
        v = (col // 3).astype(jnp.float32)
        c = col % 3
        wx3 = jnp.maximum(0.0, 1.0 - jnp.abs(rxa - v))    # (P, ck)
        prod = tmp * wx3
        accs = [a + jnp.sum(jnp.where(c == ch, prod, 0.0), axis=1,
                            keepdims=True)
                for ch, a in enumerate(accs)]             # 3 x (P, 1)
    out_ref[0] = jnp.concatenate(accs, axis=1)            # (P, 3)


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def hat_sample(mip: jnp.ndarray, rel: jnp.ndarray, start: jnp.ndarray,
               win: int, interpret: bool = False) -> jnp.ndarray:
    """Windowed hat-filter resampling of a batched mip.

    Args:
      mip: ``(B, M, M*3)`` bf16 channel-flattened mip level (the layout
        :func:`retina.build_pyramid` stores — a ``(M, 3) -> (M*3,)``
        reshape is a physical re-tiling copy on TPU, paid once at pyramid
        build instead of per view).
      rel: ``(B, P, 2)`` f32 sample coords relative to each image's window
        origin (edge-clamped to the window inside the kernel, matching
        the XLA fallback's hat construction).
      start: ``(B, 2)`` int32 window origins (pre-clamped to ``[0, M-win]``
        and **8-aligned in y** — the kernel's dynamic sublane slice requires
        it; ``retina._matmul_level_plan`` aligns to 16).
      win: static window side.

    Returns ``(B, P, 3)`` float32 sampled pixels.
    """
    b, p_dim, _ = rel.shape
    m = mip.shape[1]
    p_pad = _round_up(p_dim, 8)
    if p_pad != p_dim:
        rel = jnp.pad(rel, ((0, 0), (0, p_pad - p_dim), (0, 0)))
    mip_flat = mip.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p_pad, 2), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, m * 3), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_pad, 3), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_hat_sample_kernel, win=win, m=m, chunk=768),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, 3), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start, rel, mip_flat)
    return out[:, :p_dim]


def _column_window_plan(win: int, msize: int, padded_lanes: int):
    """Static column-window geometry for one level.

    A column window DMAs ``wpx`` pixels starting at a 128-px-aligned origin
    (Mosaic: dynamic lane offsets and widths must be 128-aligned; ×3 channel
    interleave makes the lane origin a multiple of 384). The origin floor
    absorbs up to 127 px, so the window must span ``win + 127`` px — sized
    from the actual footprint, not a hard-coded constant. The origin clamp
    bound must itself be a 128 multiple (``pl.multiple_of`` states a fact to
    the compiler; a false one is a misaligned DMA), so windowing is used
    only when the largest aligned origin still covers the mip tail.

    Returns ``(use_window, wpx, max_sxa)``.
    """
    wpx = _round_up(win + 127, 128)
    cap = padded_lanes // 3  # pixels whose 3 lanes all fit the padded width
    max_sxa = ((cap - wpx) // 128) * 128
    use_window = (wpx < msize) and (max_sxa >= 0) and (max_sxa + wpx >= msize)
    return use_window, wpx, max_sxa


def _glimpse_kernel_pipelined(*refs, wins: tuple, msizes: tuple,
                              max_sxas: tuple, chunk: int, src_b: int):
    """All pyramid levels of one image in one program, with the window DMAs
    double-buffered across grid steps: image ``i+1``'s DMAs are issued
    before image ``i``'s contraction so the DMA issue+completion latency
    (4 small strided transfers per image — measured ~1.3 ms/view of
    ``copy-done`` waits when issued-then-waited within one program) hides
    behind the MXU work of the previous grid step. Scratch rows are
    ping-pong slots indexed by grid parity; 2×levels DMA semaphores.
    refs = (start, rel, scale, mip_0..mip_{L-1}, out, rows_0..rows_{L-1},
    sems); mips stay in HBM (streaming whole mips as VMEM grid blocks both
    overflows VMEM and wastes ~6× HBM bandwidth)."""
    levels = len(wins)
    start_ref, rely_ref, relx_ref, scale_ref = refs[0], refs[1], refs[2], refs[3]
    mip_refs = refs[4:4 + levels]
    out_ref = refs[4 + levels]
    row_bufs = refs[5 + levels:5 + 2 * levels]
    sems = refs[5 + 2 * levels]
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    p_dim = rely_ref.shape[2]

    # start_ref is (2L, G): transposed so SMEM prefetch rows stay few and
    # wide (SMEM pads each trailing-dim slice to 2 KiB; a (G, L, 2) layout
    # at G=V·B programs overflows the 1 MiB scalar-prefetch budget)
    def sxa_of(img, li):
        if row_bufs[li].shape[2] < mip_refs[li].shape[2]:
            sx = start_ref[2 * li + 1, img]
            return jnp.minimum((sx // 128) * 128, max_sxas[li])
        return jnp.int32(0)

    def dma_of(img, li, slot):
        # img is the grid/program index (view-major when several views of
        # the same sources run in one grid); the mip row is the source image
        src_img = img % src_b if src_b != nb else img
        sy = pl.multiple_of(start_ref[2 * li, img], 8)
        if row_bufs[li].shape[2] < mip_refs[li].shape[2]:
            wpx = row_bufs[li].shape[2] // 3
            lane0 = pl.multiple_of(sxa_of(img, li) * 3, 384)
            src = mip_refs[li].at[src_img, pl.ds(sy, wins[li]),
                                  pl.ds(lane0, wpx * 3)]
        else:
            src = mip_refs[li].at[src_img, pl.ds(sy, wins[li]), :]
        return pltpu.make_async_copy(src, row_bufs[li].at[slot],
                                     sems.at[slot, li])

    slot = b % 2

    @pl.when(b == 0)
    def _issue_first():
        for li in range(levels):
            dma_of(0, li, 0).start()

    @pl.when(b + 1 < nb)
    def _prefetch_next():
        for li in range(levels):
            dma_of(b + 1, li, (b + 1) % 2).start()

    # Transposed orientation: the glimpse-pixel axis P lives on LANES
    # throughout — matching the layout the coordinate-plan math naturally
    # produces for rel_y/rel_x/scale (P-minor), so no (P, 2)-minor ->
    # sublane-major relayout copies are needed on the inputs, and the
    # per-point scale multiply broadcasts along lanes for free.
    cols = []
    for li in range(levels):
        win, m = wins[li], msizes[li]
        sx = start_ref[2 * li + 1, b]
        dma_of(b, li, slot).wait()
        rows = row_bufs[li][slot]                    # (win, W) bf16
        ry = rely_ref[0, li].reshape(1, p_dim)       # (1, P) f32
        rx = relx_ref[0, li].reshape(1, p_dim)
        sc = scale_ref[0, li].reshape(1, p_dim)

        idx = jax.lax.broadcasted_iota(jnp.int32, (win, p_dim), 0).astype(jnp.float32)
        ryc = jnp.clip(ry, 0.0, win - 1.0)
        wy16 = jnp.maximum(0.0, 1.0 - jnp.abs(ryc - idx)).astype(jnp.bfloat16)
        sxf = sx.astype(jnp.float32)
        rxa = jnp.clip(rx + sxf, sxf, sxf + win - 1.0)
        rxw = rxa - sxa_of(b, li).astype(jnp.float32)  # (1, P)

        width = row_bufs[li].shape[2]
        acc = jnp.zeros((3, p_dim), jnp.float32)
        for k0 in range(0, width, chunk):
            k1 = min(k0 + chunk, width)
            ck = k1 - k0
            patch = rows[:, k0:k1]                   # (win, ck)
            tmp = jax.lax.dot_general(               # (ck, P) f32, MXU
                patch, wy16,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0) + k0
            # integer div/mod are slow on the VPU: pixel index via the exact
            # float reciprocal trick (floor((i+.5)/3) == i//3 for i < 2^22)
            vf = jnp.floor((kcol.astype(jnp.float32) + 0.5) * (1.0 / 3.0))
            wx3 = jnp.maximum(0.0, 1.0 - jnp.abs(rxw - vf))  # (ck, P)
            prod = (tmp * wx3).astype(jnp.bfloat16)
            # channel de-interleave as an MXU contraction against a 0/1
            # selector (replaces 3 masked-sum VPU passes over (ck, P));
            # bf16 prod is harmless — at most 2 hat taps are nonzero per
            # pixel and the glimpse feeds a bf16 encoder anyway
            kc = kcol - 3 * vf.astype(jnp.int32)     # (ck, 1)
            sel = (kc == jax.lax.broadcasted_iota(jnp.int32, (ck, 3), 1)
                   ).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(         # (3, P)
                sel, prod,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        cols.append(acc * sc)
    out_ref[0] = jnp.concatenate(cols, axis=0)       # (3L, P)


@functools.partial(jax.jit, static_argnames=("wins", "msizes", "interpret"))
def glimpse_sample(mips: tuple, rel_y: jnp.ndarray, rel_x: jnp.ndarray,
                   start: jnp.ndarray, scale: jnp.ndarray, wins: tuple,
                   msizes: tuple, interpret: bool = False) -> jnp.ndarray:
    """Fused multi-level glimpse sampling: one kernel for the whole pyramid.

    Args:
      mips: per-level channel-flattened mips, each ``(B, M_l, ≥M_l*3)`` bf16
        (width zero-padded to a 128 multiple, as ``retina.build_pyramid``
        stores them — Mosaic DMA requires 128-aligned lane widths).
      rel_y, rel_x: ``(B, L, P)`` window-relative sample coords, split per
        axis (P-minor — the layout the coordinate plan produces; the kernel
        keeps P on lanes so no relayout copies are needed).
      start: ``(B, L, 2)`` int32 window origins (y 8-aligned).
      scale: ``(B, L, P)`` per-point multipliers (grid-mask keep × in-bounds).
      wins: static per-level window sides.
      msizes: static per-level logical mip sides ``M_l``.

    Returns ``(B, 3L, P)`` float32 — channel-major glimpse stack; callers
    transpose to the NHWC (B, g, g, 3L) the encoders consume (one fused
    transpose per view, in exchange for relayout-free inputs).
    """
    b, levels, p_dim = rel_y.shape
    src_b = mips[0].shape[0]  # source-image batch; b may be V*src_b
    if b % src_b != 0:
        raise ValueError(f"plan batch {b} not a multiple of mip batch {src_b}")

    # static per-level DMA plan: column-window large mips when the aligned
    # window provably covers every footprint, else stream the full width
    plans = [_column_window_plan(w, ms, mip.shape[2])
             for w, ms, mip in zip(wins, msizes, mips)]
    scratch_widths = [wpx * 3 if use else mip.shape[2]
                      for (use, wpx, _), mip in zip(plans, mips)]
    max_sxas = tuple(sxa if use else 0 for use, _, sxa in plans)
    for (use, wpx, sxa), w, ms in zip(plans, wins, msizes):
        if use and (wpx < w + 127 or sxa + wpx < ms):  # fail loudly, never
            raise AssertionError(                      # sample wrong pixels
                f"column window wpx={wpx} cannot cover win={w} in mip {ms}")

    coord_spec = pl.BlockSpec((1, levels, p_dim), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[coord_spec, coord_spec, coord_spec] + [
            pl.BlockSpec(memory_space=pl.ANY)        # mips stay in HBM
            for _ in msizes
        ],
        out_specs=pl.BlockSpec((1, 3 * levels, p_dim),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # column-window the big mips: beyond the footprint span the
            # extra lanes are pure wasted VPU passes (wx3 is zero outside).
            # 2 slots: ping-pong buffers for the cross-image DMA pipeline.
            pltpu.VMEM((2, w, sw), jnp.bfloat16)
            for w, sw in zip(wins, scratch_widths)
        ] + [pltpu.SemaphoreType.DMA((2, levels))],
    )
    # (B, L, 2) -> (2L, B): SMEM pads each trailing-dim slice to 2 KiB, so
    # the prefetch operand must keep the program axis trailing or V·B
    # programs blow the 1 MiB scalar budget
    start_t = start.reshape(b, 2 * levels).T
    return pl.pallas_call(
        functools.partial(_glimpse_kernel_pipelined, wins=wins, msizes=msizes,
                          max_sxas=max_sxas, chunk=512, src_b=src_b),
        out_shape=jax.ShapeDtypeStruct((b, 3 * levels, p_dim), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start_t, rel_y, rel_x, scale, *[m.astype(jnp.bfloat16) for m in mips])


def glimpse_sample_xla(mips: tuple, rel_y: jnp.ndarray, rel_x: jnp.ndarray,
                       start: jnp.ndarray, scale: jnp.ndarray, wins: tuple,
                       msizes: tuple | None = None) -> jnp.ndarray:
    """XLA fallback for :func:`glimpse_sample` (per-level einsum sampling).
    A plan batch of ``V × mip-batch`` (stacked views) tiles the mips.
    Returns the kernel's channel-major ``(B, 3L, P)`` layout."""
    outs = []
    rel = jnp.stack([rel_y, rel_x], axis=-1)  # (B, L, P, 2)
    views = rel.shape[0] // mips[0].shape[0]
    for li, (m, win) in enumerate(zip(mips, wins)):
        if msizes is not None:
            m = m[:, :, :msizes[li] * 3]  # drop lane padding
        if views > 1:
            m = jnp.tile(m, (views, 1, 1))  # view-major: index v*B+i -> i
        v = hat_sample_xla(m, rel[:, li], start[:, li], win)
        outs.append(v * scale[:, li][..., None])
    return jnp.swapaxes(jnp.concatenate(outs, axis=-1), 1, 2)


def hat_sample_xla(mip: jnp.ndarray, rel: jnp.ndarray, start: jnp.ndarray,
                   win: int) -> jnp.ndarray:
    """XLA reference/fallback: identical math via dynamic_slice + einsums.

    Takes the same channel-flattened ``(B, M, M*3)`` mip as the kernel."""
    msize = mip.shape[1]
    mip = mip.reshape(mip.shape[0], msize, msize, 3)

    def one(m, r, s):
        patch = jax.lax.dynamic_slice(m, (s[0], s[1], 0), (win, win, 3))
        idx = jnp.arange(win, dtype=jnp.float32)
        ry = jnp.clip(r[:, 0:1], 0.0, win - 1.0)
        rx = jnp.clip(r[:, 1:2], 0.0, win - 1.0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - idx))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - idx))
        tmp = jnp.einsum("pu,uvc->pvc", wy.astype(jnp.bfloat16),
                         patch.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return jnp.einsum("pvc,pv->pc", tmp, wx,
                          preferred_element_type=jnp.float32)

    return jax.vmap(one)(mip, rel, start)
