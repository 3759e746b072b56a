"""Guidance energies and weight schedules for guided denoising.

Re-designs the reference's losses (reference: diffhandles/losses.py) and
weight schedules (reference: diffhandles/guided_stable_diffuser.py:335-373,
622-665) as pure fixed-shape JAX functions:

* Correspondences arrive as fixed-size weighted arrays (`max_corr` slots of
  (orig_x, orig_y, trans_x, trans_y, weight)); the reference's variable-length
  python lists (guided_stable_diffuser.py:504-527) are deduplicated on the
  host into multiplicity weights — identical loss value, static shapes.
* Background masks are dense [64, 64] grids; the reference's nonzero index
  lists (guided_stable_diffuser.py:541-543) become masked means.
* Weight schedules are precomputed [num_steps, num_optsteps, 3] arrays so the
  scanned denoising step just gathers a row.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.ops.resize import resize_hw

EPS = 1e-10  # reference: losses.py:75


class ProcessedCorrespondences(NamedTuple):
    """Fixed-shape guidance indexing data (all on the 64x64 latent grid).

    corr_*: [max_corr] int32 / float32 — deduplicated (orig, trans) cell
      pairs with multiplicity weights (0 weight = empty slot).
    bg_mask_orig / bg_mask_trans: [64, 64] float32 in {0, 1} — cells NOT
      covered by orig / trans foreground (after optional erosion).
    bg_mask_both: logical AND of the two (used by 'local_avg' bg loss).
    """

    corr_ox: jnp.ndarray
    corr_oy: jnp.ndarray
    corr_tx: jnp.ndarray
    corr_ty: jnp.ndarray
    corr_w: jnp.ndarray
    bg_mask_orig: jnp.ndarray
    bg_mask_trans: jnp.ndarray
    bg_mask_both: jnp.ndarray


def process_correspondences(correspondences: np.ndarray, img_res: int,
                            bg_erosion: int = 0, max_corr: int = 16384,
                            latent_res: int = 64) -> ProcessedCorrespondences:
    """Host-side prep of correspondences into fixed-shape device arrays.

    Mirrors reference guided_stable_diffuser.py:490-584: clip transformed
    coords to the image, integer-divide to the latent grid, build bg masks,
    optionally erode them. Duplicated (orig-cell, trans-cell) pairs are
    merged into weights (the reference's per-entry mean weighs duplicates
    identically).
    """
    correspondences = np.asarray(correspondences).reshape(-1, 4)
    ox, oy, tx, ty = (correspondences[:, 0], correspondences[:, 1],
                      correspondences[:, 2], correspondences[:, 3])
    visible = (tx >= 0) & (tx < img_res) & (ty >= 0) & (ty < img_res)
    ox, oy, tx, ty = ox[visible], oy[visible], tx[visible], ty[visible]
    scale = img_res // latent_res
    ox, oy, tx, ty = ox // scale, oy // scale, tx // scale, ty // scale

    # Deduplicate pairs -> multiplicity weights.
    key = ((oy * latent_res + ox) * latent_res + ty) * latent_res + tx
    uniq, counts = np.unique(key, return_counts=True)
    if len(uniq) > max_corr:
        # Keep the highest-multiplicity pairs (their loss weight dominates);
        # dropped tail pairs carry the least weight. Rare: needs > max_corr
        # distinct (orig-cell, trans-cell) pairs on a 64^2 grid.
        import warnings
        order = np.argsort(-counts)[:max_corr]
        warnings.warn(
            f"truncating {len(uniq)} correspondence pairs to {max_corr} "
            f"(dropped weight "
            f"{counts.sum() - counts[order].sum()}/{counts.sum()})")
        uniq, counts = uniq[order], counts[order]
    utx = uniq % latent_res
    uty = (uniq // latent_res) % latent_res
    uox = (uniq // (latent_res * latent_res)) % latent_res
    uoy = uniq // (latent_res ** 3)

    def pad(a, fill=0, dtype=np.int32):
        out = np.full((max_corr,), fill, dtype=dtype)
        out[:len(a)] = a
        return out

    corr_ox = pad(uox)
    corr_oy = pad(uoy)
    corr_tx = pad(utx)
    corr_ty = pad(uty)
    corr_w = pad(counts.astype(np.float32), 0.0, np.float32)

    bg_orig = np.ones((latent_res, latent_res), bool)
    bg_trans = np.ones((latent_res, latent_res), bool)
    if len(ox):
        bg_orig[oy, ox] = False
        bg_trans[ty, tx] = False
    if bg_erosion > 0:
        import scipy.ndimage
        bg_orig = scipy.ndimage.binary_erosion(bg_orig,
                                               iterations=bg_erosion)
        bg_trans = scipy.ndimage.binary_erosion(bg_trans,
                                                iterations=bg_erosion)

    return ProcessedCorrespondences(
        corr_ox=jnp.asarray(corr_ox), corr_oy=jnp.asarray(corr_oy),
        corr_tx=jnp.asarray(corr_tx), corr_ty=jnp.asarray(corr_ty),
        corr_w=jnp.asarray(corr_w),
        bg_mask_orig=jnp.asarray(bg_orig, jnp.float32),
        bg_mask_trans=jnp.asarray(bg_trans, jnp.float32),
        bg_mask_both=jnp.asarray(bg_orig & bg_trans, jnp.float32),
    )


def _erode_cross(mask):
    """One binary-erosion step with the 3x3 cross structuring element and a
    zero border — scipy.ndimage.binary_erosion's defaults (structure =
    generate_binary_structure(2, 1), border_value=0), which the host path
    uses. mask: [H, W] float32 in {0, 1}."""
    p = jnp.pad(mask, 1)
    return (mask * p[:-2, 1:-1] * p[2:, 1:-1]
            * p[1:-1, :-2] * p[1:-1, 2:])


def process_correspondences_device(u, v, visible, cleaned, fg,
                                   img_res: int, bg_erosion: int = 0,
                                   max_corr: int = 16384,
                                   latent_res: int = 64
                                   ) -> ProcessedCorrespondences:
    """Device-side correspondence processing, fused with the splat's own
    visibility filter: transform_depth_pc's host packing
    (reference: depth_transform.py:299-336) + process_correspondences
    (reference: guided_stable_diffuser.py:490-584) in one jittable
    fixed-shape function.

    The host path pulls the splat's per-point u/v/visible fields and the
    cleaned mask (~3 MB) through the ~35 MB/s device tunnel, packs [N, 4]
    correspondences with np.nonzero, then re-bins and dedups on the host —
    ~0.2-0.3 s of transfer + packing per 512^2 edit. Here nothing leaves
    the device: the keep filter becomes a key sentinel, np.unique becomes
    jnp.unique with a static size, and the bg masks are scatter-mins.

    Args:
      u, v, visible: [img_res^2] int32/bool — the splat's winning pixel
        (clipped in-range) and visibility for the foreground-slot points,
        raster order over original pixels.
      cleaned: [img_res, img_res] bool — cleaned target mask.
      fg: [img_res, img_res] or flat — foreground mask (>0.5 = fg).

    Known divergence from the host path (which warns there): with more
    than max_corr DISTINCT (orig-cell, trans-cell) pairs, the host keeps
    the highest-multiplicity pairs while this keeps the lowest cell keys.
    Reaching it needs >max_corr distinct pairs on a latent_res^2 grid —
    at the default max_corr=16384 = 4 * 4096 orig cells, practically
    unreachable (each orig cell warps to ~1 target cell).
    """
    L = latent_res
    # the packed (orig-cell, trans-cell) key and its sentinel are int32:
    # L**4 must stay below 2**31 (L <= 215) or keys alias silently — the
    # host path packs in int64 and has no such bound. Fail loudly instead:
    # a latent grid that big needs the key computed in int64.
    if L ** 4 >= 2 ** 31:
        raise ValueError(
            f"latent_res={L}: packed correspondence keys need "
            f"L**4 < 2**31 (L <= 215); use the host path or widen the "
            f"key dtype to int64")
    n = img_res * img_res
    idx = jnp.arange(n, dtype=jnp.int32)
    oy, ox = idx // img_res, idx % img_res
    fg_flat = jnp.reshape(jnp.asarray(fg), (-1,)).astype(jnp.float32) > 0.5
    u = jnp.asarray(u, jnp.int32)
    v = jnp.asarray(v, jnp.int32)
    keep = (fg_flat & jnp.asarray(visible)
            & jnp.reshape(jnp.asarray(cleaned), (-1,))[v * img_res + u])
    scale = img_res // latent_res
    oxl, oyl = ox // scale, oy // scale
    txl, tyl = u // scale, v // scale
    key = ((oyl * L + oxl) * L + tyl) * L + txl
    sentinel = jnp.int32(L ** 4)
    key = jnp.where(keep, key, sentinel)
    uniq, counts = jnp.unique(key, return_counts=True, size=max_corr + 1,
                              fill_value=sentinel)
    live = uniq != sentinel
    w = jnp.where(live, counts, 0).astype(jnp.float32)[:max_corr]
    uniq = jnp.where(live, uniq, 0)[:max_corr]
    utx = (uniq % L).astype(jnp.int32)
    uty = ((uniq // L) % L).astype(jnp.int32)
    uox = ((uniq // (L * L)) % L).astype(jnp.int32)
    uoy = (uniq // (L ** 3)).astype(jnp.int32)

    km = jnp.where(keep, 0.0, 1.0)
    bg_orig = jnp.ones((L, L), jnp.float32).at[oyl, oxl].min(km)
    bg_trans = jnp.ones((L, L), jnp.float32).at[tyl, txl].min(km)
    for _ in range(bg_erosion):
        bg_orig = _erode_cross(bg_orig)
        bg_trans = _erode_cross(bg_trans)
    return ProcessedCorrespondences(
        corr_ox=uox, corr_oy=uoy, corr_tx=utx, corr_ty=uty, corr_w=w,
        bg_mask_orig=bg_orig, bg_mask_trans=bg_trans,
        bg_mask_both=bg_orig * bg_trans)


def _avg_pool_same(x, patch_size: int):
    """AvgPool2d(patch, stride=1, padding=patch//2, count_include_pad=True)
    on [H, W, C] — matches torch (reference: losses.py:64)."""
    if patch_size == 1:
        return x
    pad = patch_size // 2
    window = (patch_size, patch_size, 1)
    import jax.lax as lax
    summed = lax.reduce_window(
        x, 0.0, lax.add, window, (1, 1, 1),
        [(pad, patch_size - 1 - pad), (pad, patch_size - 1 - pad), (0, 0)])
    return summed / float(patch_size * patch_size)


def _to_hwc_64(activation, size):
    """Bilinear-resize an [H, W, C] activation map to `size` (reference:
    losses.py:8-9,23-24 resizes both maps to the finest activation size)."""
    return resize_hw(activation.astype(jnp.float32), size, "bilinear",
                     h_axis=0, w_axis=1)


def foreground_orig_precompute(activations_orig,
                               pc: ProcessedCorrespondences,
                               patch_size: int, activations_size):
    """Latent-independent half of foreground_loss: the w1-pooled ORIG
    features gathered at the orig cells ([max_corr, C]) plus the constant
    w2 scatter grid and its pooling denominator. Computing this once per
    denoising step (instead of inside every guidance opt iteration's
    fwd+bwd through jax.grad) removes the orig resize, two pools and two
    scatters from the hot energy evaluation with identical values."""
    f_orig = _to_hwc_64(activations_orig, activations_size)
    h, w = activations_size
    valid = pc.corr_w > 0
    w1 = jnp.zeros((h, w), jnp.float32).at[pc.corr_oy, pc.corr_ox].max(
        valid.astype(jnp.float32))
    w2 = jnp.zeros((h, w), jnp.float32).at[pc.corr_ty, pc.corr_tx].max(
        valid.astype(jnp.float32))
    f1 = _avg_pool_same(w1[..., None] * f_orig, patch_size) / (
        _avg_pool_same(w1[..., None], patch_size) + EPS)
    w2_den = _avg_pool_same(w2[..., None], patch_size)
    return (f1[pc.corr_oy, pc.corr_ox], w2, w2_den)


def foreground_loss_apply(pre, activations, pc: ProcessedCorrespondences,
                          patch_size: int, activations_size):
    """Current-side half of foreground_loss (see foreground_orig_precompute)."""
    f1_gathered, w2, w2_den = pre
    f_cur = _to_hwc_64(activations, activations_size)
    f2 = _avg_pool_same(w2[..., None] * f_cur, patch_size) / (w2_den + EPS)
    d = jnp.abs(f1_gathered - f2[pc.corr_ty, pc.corr_tx])
    weights = pc.corr_w
    total = jnp.sum(weights)
    # mean over correspondence entries, then channels (losses.py:80-82).
    per_channel = jnp.sum(d * weights[:, None], axis=0) / (total + EPS)
    return jnp.mean(per_channel)


def foreground_loss(activations, activations_orig,
                    pc: ProcessedCorrespondences, patch_size: int,
                    activations_size):
    """Weighted local-average L1 between orig features at orig cells and
    current features at transformed cells (reference: losses.py:4-17,51-84).

    activations/activations_orig: [H, W, C] (NHWC single image).
    """
    pre = foreground_orig_precompute(activations_orig, pc, patch_size,
                                     activations_size)
    return foreground_loss_apply(pre, activations, pc, patch_size,
                                 activations_size)


def background_orig_precompute(activations_orig,
                               pc: ProcessedCorrespondences,
                               patch_size: int, activations_size,
                               loss_type: str = "global_avg"):
    """Latent-independent half of background_loss (see
    foreground_orig_precompute)."""
    f_orig = _to_hwc_64(activations_orig, activations_size)
    if loss_type == "global_avg":
        m1 = pc.bg_mask_orig[..., None]
        mean1 = jnp.sum(f_orig * m1, axis=(0, 1)) / (jnp.sum(m1) + EPS)
        return (mean1,)
    if loss_type == "local_avg":
        m = pc.bg_mask_both[..., None]
        m_den = _avg_pool_same(m, patch_size)
        f1 = _avg_pool_same(m * f_orig, patch_size) / (m_den + EPS)
        return (f1, m_den)
    raise ValueError(f"Unknown background loss type: {loss_type}")


def background_loss_apply(pre, activations, pc: ProcessedCorrespondences,
                          patch_size: int, activations_size,
                          loss_type: str = "global_avg"):
    """Current-side half of background_loss."""
    f_cur = _to_hwc_64(activations, activations_size)
    if loss_type == "global_avg":
        (mean1,) = pre
        m2 = pc.bg_mask_trans[..., None]
        mean2 = jnp.sum(f_cur * m2, axis=(0, 1)) / (jnp.sum(m2) + EPS)
        return jnp.mean(jnp.abs(mean1 - mean2))
    if loss_type == "local_avg":
        f1, m_den = pre
        m = pc.bg_mask_both[..., None]
        f2 = _avg_pool_same(m * f_cur, patch_size) / (m_den + EPS)
        d = jnp.abs(f1 - f2) * m
        n = jnp.sum(m)
        per_channel = jnp.sum(d, axis=(0, 1)) / (n + EPS)
        return jnp.mean(per_channel)
    raise ValueError(f"Unknown background loss type: {loss_type}")


def background_loss(activations, activations_orig,
                    pc: ProcessedCorrespondences, patch_size: int,
                    activations_size, loss_type: str = "global_avg"):
    """Background preservation loss (reference: losses.py:19-49)."""
    pre = background_orig_precompute(activations_orig, pc, patch_size,
                                     activations_size, loss_type)
    return background_loss_apply(pre, activations, pc, patch_size,
                                 activations_size, loss_type)


def build_guidance_weight_schedule(
        fg_weight: float, bg_weight: float, guidance_max_step: int,
        num_steps: int, num_optsteps: int,
        schedule_type: str = "constant"):
    """Precompute fg/bg guidance weights as [num_steps, num_optsteps, 3].

    Reproduces the reference's falloff x cyclic-layer x per-iteration
    composition (guided_stable_diffuser.py:335-373 and
    StepGuidanceWeightSchedule:622-665). Weights are zero for
    t >= guidance_max_step.
    """
    fg_weight = fg_weight * 30.0
    bg_weight = bg_weight * 30.0
    gms = guidance_max_step
    if schedule_type == "constant":
        fg_fall = np.full(gms, fg_weight)
        bg_fall = np.full(gms, bg_weight)
    elif schedule_type == "linear":
        fg_fall = np.linspace(fg_weight, 0.0, gms)
        bg_fall = np.linspace(bg_weight, 0.0, gms)
    elif schedule_type == "quadratic":
        fg_fall = np.linspace(np.sqrt(fg_weight), 0.0, gms) ** 2
        bg_fall = np.linspace(np.sqrt(bg_weight), 0.0, gms) ** 2
    else:
        raise ValueError(f"Unknown guidance schedule type: {schedule_type}")

    # Per-denoising-step cyclic layer weights (period 3 over the 3 captured
    # decoder layers; guided_stable_diffuser.py:350-359).
    cyc_fg = np.array([[0.0, 0.0, 7.5], [0.0, 5.0, 0.0], [0.0, 5.0, 7.5]])
    cyc_bg = np.array([[0.0, 0.0, 1.5], [0.0, 1.5, 0.0], [0.0, 1.5, 1.5]])

    # Per-optimization-iteration weights (guided_stable_diffuser.py:365-370).
    opt_fg = np.array([[2.5] * 3, [1.25] * 3, [1.25] * 3])
    opt_bg = np.array([[1.25] * 3, [2.5] * 3, [1.25] * 3])
    if num_optsteps > 3:
        extra = num_optsteps - 3
        opt_fg = np.concatenate([opt_fg, np.tile([[2.5] * 3], (extra, 1))])
        opt_bg = np.concatenate([opt_bg, np.tile([[2.5] * 3], (extra, 1))])
    opt_fg = opt_fg[:num_optsteps]
    opt_bg = opt_bg[:num_optsteps]

    fg = np.zeros((num_steps, num_optsteps, 3), np.float32)
    bg = np.zeros((num_steps, num_optsteps, 3), np.float32)
    for t in range(min(gms, num_steps)):
        dfg = cyc_fg[t % 3] * fg_fall[t]
        dbg = cyc_bg[t % 3] * bg_fall[t]
        for it in range(num_optsteps):
            fg[t, it] = dfg * opt_fg[it]
            bg[t, it] = dbg * opt_bg[it]
    return jnp.asarray(fg), jnp.asarray(bg)
