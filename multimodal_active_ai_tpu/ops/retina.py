"""The foveated retina: fused, device-side augmentation + glimpse pyramid.

This module is the TPU-native replacement for the reference's DALI pipelines
(``SimCLR/NVIDIA DALI/NVIDIA_DALI_Pipelines.py``):

* ``UnlabeledFoveatedRetinalProcessor`` (:func:`unlabeled_glimpses`): the
  SimCLR augmentation view — random-resized-crop → rotate → grid-mask →
  gaussian noise → flip → color-twist → 4-level foveal crop pyramid, each
  level resized to 30×30 (graph at ``NVIDIA_DALI_Pipelines.py:444-479``).
* ``LabeledFoveatedRetinalProcessor`` (:func:`labeled_glimpses`): the probe /
  DETR / RLS view — resize → rotate → pyramid, no photometrics
  (``NVIDIA_DALI_Pipelines.py:523-543``).
* ``FoveatedRetinalProcessor`` (:func:`foveated_pyramid`): the visualization
  variant returning every crop and resize (``:356-388``), for notebooks/demos.

Architecture (TPU-first, NOT a port): the reference steers its GPU graph by
mutating module globals between synchronous pipeline runs
(``NVIDIA_DALI_Pipelines.py:11-19``, ``Contrastive_Learning.py:601-635``) —
a host-mediated design race that DALI tolerates only because async exec is
disabled. Here augmentation parameters are a pytree (:class:`AugParams`)
sampled from a traced PRNG key (:func:`sample_unlabeled_params`), and the
whole pipeline is a pure jittable function, so the saccade loop can live
inside ``lax.scan`` on device.

Three execution modes:

* ``matmul`` (default, production): geometric stages compose into sampling
  coordinates; a shared per-batch mip pyramid (:func:`build_pyramid`)
  provides the antialiasing prefilter, and each view samples static-size
  windows of it via dense hat-weight contractions — on TPU as one fused
  Pallas kernel for the whole pyramid
  (:func:`multimodal_active_ai_tpu.ops.pallas_retina.glimpse_sample`),
  elsewhere as XLA einsums. Gaussian noise is added post-average
  (mean-exact; per-glimpse-pixel variance is higher than the reference's
  noise-then-downscale — documented divergence shared with ``fused``).
* ``fused`` (gather-based): the same composed-coordinate idea with explicit
  per-pixel supersampled averaging in place of the mip prefilter.
* ``canvas`` (exact, slow): materializes the full 640×640 canvas per view and
  applies each stage like DALI does, including antialiased pyramid resizes.
  Used for golden tests and quality validation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimodal_active_ai_tpu.ops import image_ops


@dataclass(frozen=True)
class RetinaConfig:
    """Static retina geometry + augmentation ranges.

    Defaults mirror the reference graph: 640 working canvas
    (``NVIDIA_DALI_Pipelines.py:416-430``), crop pyramid 400/240/100/30
    (``:426-430``; the 640 full-view scale is computed but dropped, ``:479``),
    30×30 glimpses, RandomResizedCrop area [0.1, 1.0] (``:416``) with DALI's
    default aspect-ratio range [3/4, 4/3], and the driver-side augmentation
    probabilities/ranges of ``Contrastive_Learning.py:150-171,601-635``.
    """

    canvas_size: int = 640
    glimpse_size: int = 30
    crop_sizes: tuple[int, ...] = (400, 240, 100, 30)
    rrc_area: tuple[float, float] = (0.1, 1.0)
    rrc_ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    color_aug_prob: float = 0.5
    grid_mask_prob: float = 0.0
    gaussian_noise_prob: float = 0.5
    brightness: float = 1.0
    contrast: float = 1.0
    hue: float = 90.0
    saturation: float = 0.5
    fixation_angle_range: float = 160.0  # angle ~ (U-0.5)*160, Contrastive_Learning.py:603
    supersample: int = 4
    mode: str = "matmul"  # 'matmul' (MXU, default) | 'fused' (gather) | 'canvas' (exact)
    use_pallas: bool = True  # matmul mode: fused Pallas sampler on TPU

    @property
    def num_channels(self) -> int:
        return 3 * len(self.crop_sizes)


class AugParams(NamedTuple):
    """Per-image augmentation parameters (each field shaped ``(B,)`` or ``(B, 2)``).

    The pure-function analogue of the reference's global-variable command
    channel (``FixationCommand``/``NoiseCommand``/``GridMaskCommand``/
    ``ColorCommand``, ``NVIDIA_DALI_Pipelines.py:108-304``).
    """

    fix_yx: jnp.ndarray        # fixation position in [0,1)², (B, 2) as (y, x)
    angle: jnp.ndarray         # rotation angle, degrees
    rrc_origin_yx: jnp.ndarray  # random-resized-crop window origin, pixels (B, 2)
    rrc_size_hw: jnp.ndarray   # window size, pixels (B, 2)
    flip: jnp.ndarray          # bool, horizontal flip
    noise_mean: jnp.ndarray
    noise_std: jnp.ndarray
    gm_ratio: jnp.ndarray      # grid-mask covered ratio (0 = off)
    gm_tile: jnp.ndarray       # grid-mask period, pixels
    brightness: jnp.ndarray
    contrast: jnp.ndarray
    hue: jnp.ndarray           # degrees
    saturation: jnp.ndarray


def neutral_params(batch_size: int, canvas_size: int) -> AugParams:
    """Identity-augmentation params (labeled pipelines start from these)."""
    z = jnp.zeros((batch_size,), jnp.float32)
    o = jnp.ones((batch_size,), jnp.float32)
    return AugParams(
        fix_yx=jnp.full((batch_size, 2), 0.5, jnp.float32),
        angle=z,
        rrc_origin_yx=jnp.zeros((batch_size, 2), jnp.float32),
        rrc_size_hw=jnp.full((batch_size, 2), float(canvas_size), jnp.float32),
        flip=jnp.zeros((batch_size,), bool),
        noise_mean=z, noise_std=z,
        gm_ratio=z, gm_tile=o,
        brightness=o, contrast=o, hue=z, saturation=o,
    )


def _sample_rrc_window(key: jax.Array, batch_size: int, src_size: int,
                       cfg: RetinaConfig):
    """Sample RandomResizedCrop windows (area+ratio rejection-free variant).

    DALI samples (area, aspect) then clamps to fit; we sample log-uniform
    aspect in the configured range and clamp window dims to the source, which
    matches the accepted-sample distribution closely without data-dependent
    control flow (jit-friendliness over bug-for-bug DALI replication).
    """
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (batch_size,),
                              minval=cfg.rrc_area[0], maxval=cfg.rrc_area[1])
    log_ratio = jax.random.uniform(
        k_ratio, (batch_size,),
        minval=jnp.log(cfg.rrc_ratio[0]), maxval=jnp.log(cfg.rrc_ratio[1]))
    ratio = jnp.exp(log_ratio)
    target_area = area * src_size * src_size
    w = jnp.sqrt(target_area * ratio)
    h = jnp.sqrt(target_area / ratio)
    w = jnp.clip(w, 1.0, src_size)
    h = jnp.clip(h, 1.0, src_size)
    oy = jax.random.uniform(k_y, (batch_size,)) * (src_size - h)
    ox = jax.random.uniform(k_x, (batch_size,)) * (src_size - w)
    return jnp.stack([oy, ox], -1), jnp.stack([h, w], -1)


def sample_unlabeled_params(key: jax.Array, batch_size: int, src_size: int,
                            cfg: RetinaConfig) -> AugParams:
    """Sample SimCLR-view augmentation parameters.

    Distributions replicate the reference host loop exactly
    (``Contrastive_Learning.py:601-635``): fixation ~ U[0,1)², angle ~
    (U-0.5)·160; grid-mask / noise / color are gated by a single per-batch
    Bernoulli each (the reference draws ``random.uniform`` once per batch),
    with ranges ratio~U[0.2,0.5] tile~U[100,500], mean~U-0.5 std~U·100,
    brightness/contrast ~ (1-v/2)+v·U, hue ~ U·hue, sat ~ (1-s)+s·U.
    """
    keys = jax.random.split(key, 12)
    fix = jax.random.uniform(keys[0], (batch_size, 2))
    angle = (jax.random.uniform(keys[1], (batch_size,)) - 0.5) * cfg.fixation_angle_range
    rrc_origin, rrc_size = _sample_rrc_window(keys[2], batch_size, src_size, cfg)
    flip = jax.random.bernoulli(keys[3], 0.5, (batch_size,))

    gm_on = jax.random.bernoulli(keys[4], cfg.grid_mask_prob, ())
    gm_ratio = jnp.where(gm_on, jax.random.uniform(keys[5], (batch_size,), minval=0.2, maxval=0.5), 0.0)
    gm_tile = jnp.where(
        gm_on,
        jnp.floor(jax.random.uniform(keys[6], (batch_size,), minval=100.0, maxval=500.0)),
        1.0)

    noise_on = jax.random.bernoulli(keys[7], cfg.gaussian_noise_prob, ())
    noise_mean = jnp.where(noise_on, jax.random.uniform(keys[8], (batch_size,)) - 0.5, 0.0)
    noise_std = jnp.where(noise_on, jax.random.uniform(keys[9], (batch_size,)) * 100.0, 0.0)

    color_on = jax.random.bernoulli(keys[10], cfg.color_aug_prob, ())
    ck = jax.random.split(keys[11], 4)
    u = lambda k: jax.random.uniform(k, (batch_size,))
    brightness = jnp.where(color_on, (1 - cfg.brightness / 2) + cfg.brightness * u(ck[0]), 1.0)
    contrast = jnp.where(color_on, (1 - cfg.contrast / 2) + cfg.contrast * u(ck[1]), 1.0)
    hue = jnp.where(color_on, u(ck[2]) * cfg.hue, 0.0)
    saturation = jnp.where(color_on, (1 - cfg.saturation) + cfg.saturation * u(ck[3]), 1.0)

    return AugParams(fix_yx=fix, angle=angle, rrc_origin_yx=rrc_origin,
                     rrc_size_hw=rrc_size, flip=flip, noise_mean=noise_mean,
                     noise_std=noise_std, gm_ratio=gm_ratio, gm_tile=gm_tile,
                     brightness=brightness, contrast=contrast, hue=hue,
                     saturation=saturation)


def sample_labeled_params(key: jax.Array, batch_size: int, src_size: int,
                          fix_yx: jnp.ndarray | None = None) -> AugParams:
    """Parameters for the labeled (probe/DETR/RLS) retina: random or
    policy-provided fixation, zero rotation, no photometrics
    (``Representation_Evaluation.py:624-629``, ``DETR_Image_Classification.py:564-575``)."""
    if fix_yx is None:
        fix_yx = jax.random.uniform(key, (batch_size, 2))
    p = neutral_params(batch_size, src_size)
    return p._replace(fix_yx=fix_yx)


# ---------------------------------------------------------------------------
# Fused path


def _glimpse_sample_grid(cfg: RetinaConfig, crop_size: int):
    """Constant supersampled output grid for one pyramid level.

    Returns offsets (g, g, ss, ss, 2) of sample coordinates relative to the
    crop-window origin, where ``g = cfg.glimpse_size``. The ss×ss box of
    samples per output pixel approximates DALI's triangle downscale filter.
    """
    g = cfg.glimpse_size
    step = crop_size / g
    ss = max(1, min(cfg.supersample, round(step)))
    base = (jnp.arange(g, dtype=jnp.float32) + 0.5) * step - 0.5
    sub = ((jnp.arange(ss, dtype=jnp.float32) + 0.5) / ss - 0.5) * step
    yy = base[:, None, None, None] + sub[None, None, :, None]
    xx = base[None, :, None, None] + sub[None, None, None, :]
    yy = jnp.broadcast_to(yy, (g, g, ss, ss))
    xx = jnp.broadcast_to(xx, (g, g, ss, ss))
    return jnp.stack([yy, xx], axis=-1)


def _fused_single(img: jnp.ndarray, p: AugParams, noise_key: jax.Array,
                  cfg: RetinaConfig, photometric: bool) -> jnp.ndarray:
    """Fused retina for ONE image (vmapped over the batch).

    ``img``: (S, S, 3) float32, raw 0..255. Returns (g, g, 3*len(crop_sizes)).
    """
    src = img.shape[0]
    c = float(cfg.canvas_size)
    center = jnp.array([(c - 1) / 2, (c - 1) / 2], jnp.float32)
    glimpses = []
    for li, crop_size in enumerate(cfg.crop_sizes):
        grid = _glimpse_sample_grid(cfg, crop_size)  # (g,g,ss,ss,2)
        origin = p.fix_yx * (c - crop_size)  # DALI Crop: start = pos * (in - crop)
        coords = grid + origin[None, None, None, None, :]
        # flip acts on the canvas before the pyramid (x -> C-1-x)
        x = jnp.where(p.flip, (c - 1.0) - coords[..., 1], coords[..., 1])
        coords = jnp.stack([coords[..., 0], x], axis=-1)
        # grid-mask keep factor, evaluated in pre-flip canvas coordinates
        keep = image_ops.grid_mask_keep(coords, p.angle, p.fix_yx, p.gm_ratio, p.gm_tile)
        # inverse rotation into the RRC output canvas
        a = image_ops.rotate_coords(coords, p.angle, center)
        oob = jnp.logical_or(
            jnp.any(a < -0.5, axis=-1),
            jnp.any(a > c - 0.5, axis=-1))
        # RRC: canvas -> source window
        s = p.rrc_origin_yx + (a + 0.5) * (p.rrc_size_hw / c) - 0.5
        v = image_ops.bilinear_sample(img, s, fill_value=0.0, fill_mask=oob)
        v = v * keep[..., None]
        v = jnp.mean(v, axis=(2, 3))  # average the supersample box -> (g,g,3)
        if photometric:
            nk = jax.random.fold_in(noise_key, li)
            v = image_ops.add_gaussian_noise(v, nk, p.noise_mean, p.noise_std)
        glimpses.append(v)
    out = jnp.concatenate(glimpses, axis=-1)  # (g, g, 3*L), scale-major like
    # the reference stack/permute/reshape (SimCLR/SimCLR.py:24)
    if photometric:
        out3 = out.reshape(*out.shape[:-1], len(cfg.crop_sizes), 3)
        out3 = image_ops.apply_color_twist(out3, p.brightness, p.contrast, p.hue, p.saturation)
        out = out3.reshape(out.shape)
    return out


# ---------------------------------------------------------------------------
# Matmul path (MXU): bilinear sampling as dense hat-weight contractions
#
# XLA's dynamic gather is the TPU bottleneck for the fused path (it
# serializes on the VPU); this path reformulates every pyramid level as two
# batched matmuls with per-image interpolation ("hat") weight matrices —
# pure MXU work. Antialiasing comes from a static mip pyramid of the source
# (2x average pooling per level, the prefilter equivalent of the fused
# path's supersampled box), and the finest 30-crop samples native resolution
# inside a per-image dynamic-slice window. This is the production default.


def _mip_levels(cfg: RetinaConfig):
    """Static scale→mip assignment: mip spacing ≈ half the glimpse lattice
    spacing at the median RandomResizedCrop zoom, clamped to the available
    pyramid. Returns {crop_size: downscale_factor} (1 = native slice path)."""
    out = {}
    for crop in cfg.crop_sizes:
        spacing = crop / cfg.glimpse_size  # canvas px per glimpse px (median rrc ~0.66 folds in)
        factor = 1
        while factor * 2 <= spacing * 0.66:
            factor *= 2
        out[crop] = factor
    return out


def build_pyramid(images: jnp.ndarray, cfg: RetinaConfig) -> dict:
    """Batched 2x-average mip chain: (B, S, S, 3) -> {factor: (B, M, M*3) bf16}.

    The pyramid depends only on the source batch — NOT on the per-view
    augmentation parameters (the RRC/rotate/flip warp is folded into the
    sampling coordinates) — so the training step builds it ONCE per batch
    and reuses it across all ``1 + num_fixations`` retina passes. This is
    the prefilter equivalent of DALI's triangle-filter downscale.

    Mips are stored channel-flattened ``(B, M, ≥M*3)``: that is the layout
    the samplers contract against, and on TPU a ``(M, 3) -> (M*3,)``
    reshape is a physical re-tiling copy — storing flat once avoids paying
    it again in every view. The width is zero-padded up to a multiple of
    128 lanes (Mosaic DMA requirement); padded columns sit beyond the last
    pixel so no in-range hat weight ever touches them.
    """

    def flat(x, h, w):
        x = x.reshape(x.shape[0], h, w * 3)
        pad = -(w * 3) % 128
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        return x

    factors = set(_mip_levels(cfg).values())
    m = images.astype(jnp.bfloat16)
    b, h, w, c = m.shape
    mips = {1: flat(m, h, w)}
    f = 1
    while f < max(factors):
        m = m.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
        h //= 2
        w //= 2
        f *= 2
        mips[f] = flat(m, h, w)
    return mips


def _window_size(crop_size: int, factor: int, mip_size: int) -> int:
    """Static bounding-box side (in mip px) of one glimpse's source footprint.

    The pre-rotation crop window spans ``crop`` px; rotation bounds the box
    by ``crop·√2``, the RandomResizedCrop warp only shrinks it (scale ≤ 1),
    and bilinear + hat support adds a small margin. Rounded up to a multiple
    of 16 with 16 px of slack: window origins are floor-aligned to 16 so the
    Pallas kernel's dynamic sublane slice is provably tile-aligned."""
    span = int(crop_size * 1.4143) + 6
    win = -(-(span // factor + 4 + 16) // 16) * 16
    return min(win, mip_size)


def _matmul_level_plan(p: AugParams, cfg: RetinaConfig, crop_size: int,
                       factor: int, mip_size: int, win: int):
    """Per-image sampling plan for one level (vmapped over the batch):
    window-relative mip coords, window origin, grid-mask keep and
    out-of-bounds masks."""
    c = float(cfg.canvas_size)
    g = cfg.glimpse_size
    center = jnp.array([(c - 1) / 2, (c - 1) / 2], jnp.float32)
    # glimpse pixel centers -> source coords (same chain as the fused path,
    # ss=1: the mip prefilter replaces supersampling)
    base = (jnp.arange(g, dtype=jnp.float32) + 0.5) * (crop_size / g) - 0.5
    origin = p.fix_yx * (c - crop_size)
    yy = jnp.broadcast_to(base[:, None] + origin[0], (g, g))
    xx = jnp.broadcast_to(base[None, :] + origin[1], (g, g))
    x_f = jnp.where(p.flip, (c - 1.0) - xx, xx)
    coords = jnp.stack([yy, x_f], axis=-1)
    keep = image_ops.grid_mask_keep(coords, p.angle, p.fix_yx, p.gm_ratio,
                                    p.gm_tile)
    a = image_ops.rotate_coords(coords, p.angle, center)
    oob = jnp.logical_or(jnp.any(a < -0.5, -1), jnp.any(a > c - 0.5, -1))
    s = p.rrc_origin_yx + (a + 0.5) * (p.rrc_size_hw / c) - 0.5  # (g,g,2)
    sm = (s + 0.5) / factor - 0.5 if factor > 1 else s  # mip coords
    if win < mip_size:
        start = jnp.floor(jnp.min(sm.reshape(-1, 2), axis=0)) - 1.0
        start = jnp.clip(start, 0.0, mip_size - win).astype(jnp.int32)
        # floor-align to 16 (mip sizes and win are multiples of 16, so the
        # upper clip stays aligned); the 16 px window slack covers the shift
        start = (start // 16) * 16
    else:
        start = jnp.zeros((2,), jnp.int32)
    rel = sm.reshape(-1, 2) - start.astype(jnp.float32)[None, :]
    # y/x returned separately (P-minor): the fused sampler keeps the pixel
    # axis on lanes, so these feed it with no relayout copy
    return rel[:, 0], rel[:, 1], start, keep, oob


def _matmul_batch(mips: dict, p: AugParams, noise_keys: jnp.ndarray,
                  cfg: RetinaConfig, photometric: bool) -> jnp.ndarray:
    """Batched matmul retina over a precomputed mip pyramid.

    Every pyramid level samples a static-size window bounding the glimpse's
    source footprint out of its mip via a dense hat-weight contraction — the
    matmuls never touch pixels the glimpse cannot see. On TPU the slice +
    weight-build + contraction runs as one fused Pallas kernel
    (:func:`multimodal_active_ai_tpu.ops.pallas_retina.hat_sample`);
    elsewhere the XLA einsum formulation is used.
    """
    from multimodal_active_ai_tpu.ops import pallas_retina

    g = cfg.glimpse_size
    levels = len(cfg.crop_sizes)
    factors = _mip_levels(cfg)
    # plan batch = params batch; it may be a V× multiple of the mip batch
    # (V stacked views of the same sources, see apply_retina_views)
    batch = p.fix_yx.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    sampler = (pallas_retina.glimpse_sample if (cfg.use_pallas and on_tpu)
               else pallas_retina.glimpse_sample_xla)

    level_mips, wins, msizes = [], [], []
    rel_ys, rel_xs, starts, scales = [], [], [], []
    for crop_size in cfg.crop_sizes:
        factor = factors[crop_size]
        m = mips[factor]
        mip_size = m.shape[1]
        msizes.append(mip_size)
        win = _window_size(crop_size, factor, mip_size)
        rel_y, rel_x, start, keep, oob = jax.vmap(
            functools.partial(_matmul_level_plan, cfg=cfg,
                              crop_size=crop_size, factor=factor,
                              mip_size=mip_size, win=win))(p)
        level_mips.append(m)
        wins.append(win)
        rel_ys.append(rel_y)
        rel_xs.append(rel_x)
        starts.append(start)
        # fold grid-mask keep and rotation out-of-bounds into one multiplier
        scales.append((keep * (1.0 - oob.astype(jnp.float32))
                       ).reshape(batch, -1))

    v = sampler(tuple(level_mips), jnp.stack(rel_ys, 1), jnp.stack(rel_xs, 1),
                jnp.stack(starts, 1), jnp.stack(scales, 1), tuple(wins),
                tuple(msizes))                       # (B, 3L, P) channel-major
    out = jnp.swapaxes(v, 1, 2).reshape(batch, g, g, 3 * levels)

    if photometric:
        # one iid normal draw over all levels is distributionally identical
        # to per-level draws (the reference adds noise pre-pyramid; per-level
        # iid is the documented divergence either way)
        out = jax.vmap(image_ops.add_gaussian_noise)(
            out, noise_keys, p.noise_mean, p.noise_std)
        # ColorTwist as ONE lane matmul: block-diagonal (3L x 3L) matrix
        # applies the per-image 3x3 twist within each level without any
        # (..., L, 3) reshape (a physical re-tiling copy on TPU)
        m3, b3 = jax.vmap(image_ops.color_twist_matrix)(
            p.brightness, p.contrast, p.hue, p.saturation)
        eye = jnp.eye(levels, dtype=m3.dtype)
        m_big = jax.vmap(functools.partial(jnp.kron, eye))(m3)  # (B, 3L, 3L)
        b_big = jnp.tile(b3, (1, levels))                       # (B, 3L)
        out = (jnp.einsum("bhwc,bdc->bhwd", out, m_big)
               + b_big[:, None, None, :])
    return out


# ---------------------------------------------------------------------------
# Canvas (exact) path


def _canvas_single(img: jnp.ndarray, p: AugParams, noise_key: jax.Array,
                   cfg: RetinaConfig, photometric: bool) -> jnp.ndarray:
    """DALI-faithful canvas pipeline for ONE image (golden/testing mode)."""
    c = cfg.canvas_size
    center = jnp.array([(c - 1) / 2, (c - 1) / 2], jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(c, dtype=jnp.float32),
                          jnp.arange(c, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([gy, gx], -1)  # (c, c, 2) canvas-R coords

    # rotate (inverse warp; rotate_coords IS the inverse map of a CCW
    # rotation — negating here double-inverted and spun the canvas CW for
    # positive angles, caught by the round-5 PIL golden fixture) then RRC
    # back into the source
    a = image_ops.rotate_coords(grid, p.angle, center)
    oob = jnp.logical_or(jnp.any(a < -0.5, -1), jnp.any(a > c - 0.5, -1))
    s = p.rrc_origin_yx + (a + 0.5) * (p.rrc_size_hw / c) - 0.5
    canvas = image_ops.bilinear_sample(img, s, fill_value=0.0, fill_mask=oob)

    if photometric:
        keep = image_ops.grid_mask_keep(grid, p.angle, p.fix_yx, p.gm_ratio, p.gm_tile)
        canvas = canvas * keep[..., None]
        canvas = image_ops.add_gaussian_noise(canvas, noise_key, p.noise_mean, p.noise_std)
    canvas = image_ops.hflip(canvas, p.flip)
    if photometric:
        canvas = image_ops.apply_color_twist(canvas, p.brightness, p.contrast, p.hue,
                                             p.saturation)

    glimpses = []
    for crop_size in cfg.crop_sizes:
        origin = p.fix_yx * (c - crop_size)
        g = image_ops.crop_resize_with_filter(
            canvas, origin, (crop_size, crop_size),
            (cfg.glimpse_size, cfg.glimpse_size))
        glimpses.append(g)
    return jnp.concatenate(glimpses, axis=-1)


# ---------------------------------------------------------------------------
# Public pipelines


def apply_retina(images: jnp.ndarray | None, params: AugParams, key: jax.Array,
                 cfg: RetinaConfig, photometric: bool,
                 pyramid: dict | None = None) -> jnp.ndarray:
    """Traceable core: run the configured pipeline over a batch. Call inside
    your own ``jit``/``shard_map``; the public wrappers below jit it for
    standalone use.

    For the default ``matmul`` mode, pass ``pyramid=build_pyramid(images,
    cfg)`` when running several views of the same batch (the saccade loop):
    the mip chain is view-independent and this skips rebuilding it per view.
    """
    b = (pyramid[1] if pyramid is not None else images).shape[0]
    noise_keys = jax.random.split(key, b)
    if cfg.mode == "matmul":
        if pyramid is None:
            pyramid = build_pyramid(images, cfg)
        return _matmul_batch(pyramid, params, noise_keys, cfg, photometric)
    images = images.astype(jnp.float32)
    single = {"fused": _fused_single, "canvas": _canvas_single}[cfg.mode]
    fn = functools.partial(single, cfg=cfg, photometric=photometric)
    return jax.vmap(fn)(images, params, noise_keys)


def apply_retina_views(pyramid: dict, params_views: AugParams,
                       view_keys: jax.Array, cfg: RetinaConfig,
                       photometric: bool) -> jnp.ndarray:
    """All V views of one source batch in ONE sampler invocation.

    The saccade loop needs ``1 + num_fixations`` augmentation views of the
    same batch; running them as separate ops costs ~0.2 ms of fixed launch
    overhead per op on TPU and restarts the sampler's DMA pipeline per
    view. Here the per-view :class:`AugParams` are stacked view-major
    (leading dim ``V·B``) and the fused kernel runs one ``V·B``-program
    grid against the B-image mip pyramid.

    Args:
      pyramid: ``build_pyramid`` output for the B source images.
      params_views: AugParams with leading dim ``V*B`` — view-major stack,
        i.e. ``tree.map(reshape)`` of a ``(V, B)`` param tree.
      view_keys: ``(V, 2)`` per-view noise keys (``fix_keys[:, 1]``); split
        per view exactly as :func:`apply_retina` does, so outputs match
        V separate calls (up to XLA reduction-order rounding).

    Returns ``(V*B, g, g, 3L)`` float32 glimpses (view-major).
    """
    if cfg.mode != "matmul":
        raise ValueError("apply_retina_views requires the matmul retina")
    b = pyramid[1].shape[0]
    noise_keys = jax.vmap(lambda k: jax.random.split(k, b))(view_keys)
    noise_keys = noise_keys.reshape(-1, *noise_keys.shape[2:])
    return _matmul_batch(pyramid, params_views, noise_keys, cfg, photometric)


_run_retina = jax.jit(apply_retina, static_argnames=("cfg", "photometric"))


def unlabeled_glimpses(images: jnp.ndarray, params: AugParams, key: jax.Array,
                       cfg: RetinaConfig) -> jnp.ndarray:
    """SimCLR augmentation view → ``(B, g, g, 3·L)`` float32 glimpse stack.

    Equivalent of running ``UnlabeledFoveatedRetinalProcessor``
    (``NVIDIA_DALI_Pipelines.py:444-479``) + the channel stacking done inside
    ``SimCLR_Module.forward`` (``SimCLR/SimCLR.py:24``), so encoders consume
    the output directly.
    """
    return _run_retina(images, params, key, cfg, True)


def labeled_glimpses(images: jnp.ndarray, params: AugParams,
                     cfg: RetinaConfig) -> jnp.ndarray:
    """Labeled view (no photometrics): ``LabeledFoveatedRetinalProcessor``
    (``NVIDIA_DALI_Pipelines.py:523-543``) + channel stacking."""
    key = jax.random.PRNGKey(0)  # unused on the non-photometric path
    return _run_retina(images, params, key, cfg, False)


def foveated_pyramid(image: jnp.ndarray, fix_yx: jnp.ndarray, angle: jnp.ndarray,
                     cfg: RetinaConfig | None = None):
    """Visualization pipeline: returns (crops, resizes) for one image.

    Mirrors ``FoveatedRetinalProcessor`` (``NVIDIA_DALI_Pipelines.py:356-388``)
    which returns all five crops (640/400/240/100/30) and their 30×30
    resizes; used by notebooks for pyramid plots.
    """
    cfg = cfg or RetinaConfig()
    c = cfg.canvas_size
    img = image.astype(jnp.float32)
    if img.shape[0] != c:
        img = image_ops.resize_with_filter(img, (c, c))
    center = jnp.array([(c - 1) / 2, (c - 1) / 2], jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(c, dtype=jnp.float32),
                          jnp.arange(c, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([gy, gx], -1)
    a = image_ops.rotate_coords(grid, angle, center)
    oob = jnp.logical_or(jnp.any(a < -0.5, -1), jnp.any(a > c - 0.5, -1))
    canvas = image_ops.bilinear_sample(img, a, fill_value=0.0, fill_mask=oob)
    crops, resizes = [], []
    for crop_size in (c,) + tuple(cfg.crop_sizes):
        origin = fix_yx * (c - crop_size)
        oy = jnp.round(origin[0]).astype(jnp.int32)
        ox = jnp.round(origin[1]).astype(jnp.int32)
        crop = jax.lax.dynamic_slice(canvas, (oy, ox, 0), (crop_size, crop_size, 3))
        crops.append(crop)
        resizes.append(image_ops.resize_with_filter(crop, (cfg.glimpse_size,
                                                           cfg.glimpse_size)))
    return crops, resizes
