"""On-device image/label preprocessing and augmentation (pure jnp, jittable).

The reference does all of this on the host with OpenCV/PIL inside DataLoader
workers (/root/reference/src/data/custom_transforms.py:9-272,
vos_dataset.py:233-279): warpAffine scale-rotate, PIL color jitter,
horizontal flip, pad+random-crop, mean-subtract / 255-normalize. Its
"deterministic" mode caches the random draw per file name so the train and
meta loaders of one meta-task apply identical augmentation
(custom_transforms.py:58-87).

TPU-native redesign (SURVEY.md §7 design translation):
  * every transform is a pure function of an explicit ``jax.random`` key —
    determinism-per-task falls out of folding the task id into the key, no
    caching machinery;
  * geometry is one inverse-affine gather (``map_coordinates``): scale,
    rotation and flip compose into a single 2x3 matrix, applied bilinearly
    to images and nearest-neighbor to label/valid maps — one fused XLA
    gather instead of several cv2 passes;
  * everything is static-shape and vmap/scan-friendly so augmentation runs
    inside the same jitted program as the fine-tune step (augmented support
    batches are generated on device, not shipped from host).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# DAVIS BGR channel means (reference: src/data/davis.py:20) reordered to RGB.
DAVIS_MEAN_RGB = (122.679, 116.669, 104.007)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Per-task augmentation ranges.

    Defaults mirror the reference's meta-task transform stack
    (meta_tasksets.py:109-136): scale in [0.75, 1.25], rotation in
    [-30°, 30°], color jitter 0.1/0.1/0.1, 50% horizontal flip.
    """

    scale_min: float = 0.75
    scale_max: float = 1.25
    rot_deg: float = 30.0
    brightness: float = 0.1
    contrast: float = 0.1
    saturation: float = 0.1
    flip_prob: float = 0.5
    # random translation as a fraction of the frame size, folded into the
    # one affine warp (the VOC RandomScaleCrop crop-offset equivalent,
    # pascal_voc.py:202-236); 0 = off (the VOS paths translate via the
    # host-side random crop instead)
    trans_frac: float = 0.0
    # PIL-style RandomGaussianBlur (pascal_voc.py:190-199): with probability
    # blur_prob, blur with sigma ~ U[0, blur_sigma_max)
    blur_prob: float = 0.0
    blur_sigma_max: float = 1.0
    # gather/arith dtype for the warp: TPU gathers are element-bound, so
    # bf16 halves the traffic; augmentation tolerates the precision easily
    compute_dtype: str = "bfloat16"


# The reference's VOC parent-training augmentation stack
# (pascal_voc.py:86-96): flip 0.5, short-edge scale in [0.5, 2.0] + random
# crop (→ trans_frac), gaussian blur p=0.5 radius U[0,1). Color jitter is
# absent from that stack. Pair with ``normalize(mode="unit")``
# (pascal_voc.py:115-135 divides by 255 only — the mean/std lines are
# commented out upstream).
VOC_PARENT_AUGMENT = AugmentConfig(
    scale_min=0.5, scale_max=2.0, rot_deg=0.0,
    brightness=0.0, contrast=0.0, saturation=0.0,
    flip_prob=0.5, trans_frac=0.25, blur_prob=0.5, blur_sigma_max=1.0,
)


def normalize(img: Array, mode: str = "davis") -> Array:
    """uint8/float RGB HWC → normalized float32.

    ``davis``: subtract the DAVIS channel means (vos_dataset.py:276-279
    ``normalize=False`` branch); ``unit``: /255 (``normalize=True`` branch).
    """
    img = img.astype(jnp.float32)
    if mode == "davis":
        return img - jnp.asarray(DAVIS_MEAN_RGB, jnp.float32)
    if mode == "unit":
        return img / 255.0
    if mode == "none":
        return img
    raise ValueError(f"unknown normalize mode {mode!r}")


def _affine_grid(h: int, w: int, matrix: Array) -> Tuple[Array, Array]:
    """Source sampling coordinates for an inverse affine map about the image
    center. ``matrix`` is 2x3 [[a,b,tx],[c,d,ty]] in pixel units."""
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2] + (w - 1) / 2.0
    src_y = matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2] + (h - 1) / 2.0
    return src_y, src_x


def _sample_bilinear(img: Array, src_y: Array, src_x: Array, cval: float) -> Array:
    """Bilinear gather of HWC image at float coords, constant padding."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]
        return jnp.where(valid[..., None], vals, jnp.asarray(cval, img.dtype))

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    # blend in the image dtype (bf16 path keeps the whole warp half-width)
    wy = wy[..., None].astype(img.dtype)
    wx = wx[..., None].astype(img.dtype)
    one = jnp.asarray(1, img.dtype)
    return (
        v00 * (one - wy) * (one - wx)
        + v01 * (one - wy) * wx
        + v10 * wy * (one - wx)
        + v11 * wy * wx
    )


def _sample_nearest(x: Array, src_y: Array, src_x: Array, cval: float) -> Array:
    """Nearest-neighbor gather of an HW map at float coords."""
    h, w = x.shape[0], x.shape[1]
    yi = jnp.round(src_y).astype(jnp.int32)
    xi = jnp.round(src_x).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    return jnp.where(valid, x[yc, xc], jnp.asarray(cval, x.dtype))


def affine_warp(
    img: Array,
    label: Array,
    matrix: Array,
    img_cval: float = 0.0,
    label_cval: float = 0.0,
) -> Tuple[Array, Array]:
    """Apply one inverse-affine warp: bilinear for the image, nearest for the
    label. Replaces cv2.warpAffine (custom_transforms.py:44-51)."""
    h, w = img.shape[0], img.shape[1]
    src_y, src_x = _affine_grid(h, w, matrix)
    out_img = _sample_bilinear(img, src_y, src_x, img_cval)
    out_label = _sample_nearest(label, src_y, src_x, label_cval)
    return out_img, out_label


def affine_warp_packed(
    img: Array,
    label: Array,
    matrix: Array,
    compute_dtype: Any = jnp.bfloat16,
) -> Tuple[Array, Array, Array]:
    """Affine warp via ONE row gather of a corner-stacked buffer.

    TPU gathers are slice-count-bound, not byte-bound: the generic warp's 4
    bilinear corner gathers of tiny [3]-channel slices plus a label gather
    ran at ~24 ms/warp at 480p. Instead the frame is laid out as a
    ``[H·W, 16]`` buffer — (r, g, b, label) × the four (dy, dx) corner
    shifts — so all four bilinear corners AND the label arrive in one
    row-gather (32-byte rows), with the blend on the VPU. 4.5× faster
    (scripts/bench_warp.py); exact bilinear.

    Label values must be ≤ 255 (exact in bfloat16). Returns
    ``(img [H,W,3] compute_dtype, label [H,W] int32 with 255 outside,
    inside [H,W] bool — any bilinear support)``. Border semantics match
    ``affine_warp(img_cval=0, label_cval=255)``.
    """
    h, w = img.shape[0], img.shape[1]
    dt = jnp.dtype(compute_dtype)
    n = h * w

    # corner stack: 4 channels × corner shifts {0, 1, W, W+1}, padded on both
    # sides so raw (possibly negative) linear indices stay in range — the
    # clipping happens on the LINEAR index, keeping every VALID corner's
    # value exact even when (y0, x0) sits just outside the frame
    b = w + 1
    m = n + w + 1
    flat = jnp.concatenate(
        [img.astype(dt).reshape(-1, 3), label.astype(dt).reshape(-1, 1)],
        axis=-1,
    )  # [H·W, 4]
    zpad = jnp.zeros((b, 4), dt)
    ext = jnp.concatenate([zpad, flat, zpad], axis=0)  # [n + 2b, 4]
    stack = jnp.concatenate(
        [ext[0:m], ext[1:m + 1], ext[w:m + w], ext[w + 1:m + w + 1]], axis=-1
    )  # [m, 16]; row i ↔ raw linear index i − b

    src_y, src_x = _affine_grid(h, w, matrix)
    y0f = jnp.floor(src_y)
    x0f = jnp.floor(src_x)
    wy = (src_y - y0f).astype(dt)
    wx = (src_x - x0f).astype(dt)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    idx = jnp.clip(y0 * w + x0, -b, n - 1) + b
    v = jnp.take(stack, idx, axis=0)  # [H,W,16] — one gather, all corners

    one = jnp.asarray(1, dt)
    ny = wy >= 0.5  # nearest corner for the label
    nx = wx >= 0.5

    rgb = jnp.zeros((h, w, 3), dt)
    lab = jnp.full((h, w), 255, jnp.int32)
    inside = jnp.zeros((h, w), bool)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            wgt = (wy if dy else one - wy) * (wx if dx else one - wx)
            wgt = jnp.where(ok, wgt, jnp.asarray(0, dt))
            corner = v[..., 4 * k:4 * k + 3]
            rgb = rgb + corner * wgt[..., None]
            is_nearest = (ny == bool(dy)) & (nx == bool(dx))
            lab = jnp.where(
                is_nearest & ok, v[..., 4 * k + 3].astype(jnp.int32), lab
            )
            inside = inside | ok
            k += 1
    return rgb, lab, inside


def scale_rotate_flip_matrix(
    key: Array, cfg: AugmentConfig, flip: Optional[Array] = None
) -> Array:
    """Sample a combined inverse scale+rotate+flip matrix (pixel units,
    centered). The forward transform scales by s and rotates by θ; the
    sampling (inverse) matrix is R(-θ)/s, with an x-axis sign flip folded in.
    ``flip`` optionally overrides the flip decision (bool scalar) — used by
    the per-task deterministic mode where one flip is shared across frames.
    """
    k_s, k_r, k_f = jax.random.split(key, 3)
    s = jax.random.uniform(k_s, (), minval=cfg.scale_min, maxval=cfg.scale_max)
    theta = jax.random.uniform(
        k_r, (), minval=-cfg.rot_deg, maxval=cfg.rot_deg
    ) * (jnp.pi / 180.0)
    if flip is None:
        flip = jax.random.bernoulli(k_f, cfg.flip_prob)
    fx = jnp.where(flip, -1.0, 1.0)
    cos = jnp.cos(theta) / s
    sin = jnp.sin(theta) / s
    # inverse: [x_src; y_src] = R(-θ)/s · F · [x_dst; y_dst]
    return jnp.array(
        [[cos, sin, 0.0], [-sin, cos, 0.0]], jnp.float32
    ) * jnp.array([[fx, 1.0, 1.0], [fx, 1.0, 1.0]], jnp.float32)


def color_jitter(
    key: Array, img: Array, cfg: AugmentConfig, mean: Optional[Array] = None
) -> Array:
    """Brightness/contrast/saturation jitter on a [0,255] RGB image.

    Same factor semantics as torchvision ColorJitter (reference uses it via
    custom_transforms.py:122-153): each factor uniform in [1-x, 1+x].
    ``mean`` optionally supplies the contrast anchor (e.g. the pre-warp
    image statistics when jitter runs after the warp).
    """
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    k_b, k_c, k_s = jax.random.split(key, 3)
    b = jax.random.uniform(k_b, (), dt, minval=1 - cfg.brightness, maxval=1 + cfg.brightness)
    c = jax.random.uniform(k_c, (), dt, minval=1 - cfg.contrast, maxval=1 + cfg.contrast)
    s = jax.random.uniform(k_s, (), dt, minval=1 - cfg.saturation, maxval=1 + cfg.saturation)
    if mean is None:
        mean = jnp.mean(img.astype(dt))
    mean = mean.astype(dt) * b  # brightness scales the contrast anchor too
    img = img.astype(dt) * b
    img = (img - mean) * c + mean
    gray = (
        jnp.asarray(0.299, dt) * img[..., 0]
        + jnp.asarray(0.587, dt) * img[..., 1]
        + jnp.asarray(0.114, dt) * img[..., 2]
    )[..., None]
    img = (img - gray) * s + gray
    return jnp.clip(img, 0.0, 255.0)


def gaussian_blur(
    key: Array, img: Array, prob: float, sigma_max: float, taps: int = 7
) -> Array:
    """RandomGaussianBlur on device (pascal_voc.py:190-199): with
    probability ``prob``, separable Gaussian blur with sigma ~ U[0,
    sigma_max) (PIL's ``GaussianBlur(radius)`` treats the radius as the
    standard deviation). Static ``taps``-wide kernel (7 taps = ±3σ at
    σ=1), edge-replicate padding like PIL; the traced sigma only changes
    tap weights, so one compiled program covers the whole sigma range."""
    k_p, k_s = jax.random.split(key)
    do = jax.random.bernoulli(k_p, prob)
    sigma = jax.random.uniform(k_s, (), minval=0.0, maxval=sigma_max)
    sigma = jnp.maximum(sigma, 1e-3)  # σ→0 degenerates to the identity tap
    r = taps // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * jnp.square(x / sigma))
    kern = kern / jnp.sum(kern)

    c = img.shape[-1]
    src = img.astype(jnp.float32)[None]  # NHWC
    pad = jnp.pad(src, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    kv = jnp.broadcast_to(kern.reshape(taps, 1, 1, 1), (taps, 1, 1, c))
    kh = jnp.broadcast_to(kern.reshape(1, taps, 1, 1), (1, taps, 1, c))
    dn = jax.lax.conv_dimension_numbers(pad.shape, kv.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        pad, kv, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    out = jax.lax.conv_general_dilated(
        out, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return jnp.where(do, out[0], src[0]).astype(img.dtype)


def augment_frame(
    key: Array,
    img: Array,
    label: Array,
    cfg: Optional[AugmentConfig] = None,
    color_key: Optional[Array] = None,
    flip: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Full per-frame augmentation: color jitter → one fused
    scale/rotate/flip warp. ``img`` is [H,W,3] in [0,255] (pre-normalize),
    ``label`` is [H,W]. Warped-in border pixels get label 255 (ignore), the
    convention the losses' ``valid`` masks consume — the reference instead
    retries warps that lose labels (custom_transforms.py:52-57); masking is
    the static-shape equivalent.

    ``color_key``/``flip`` optionally share the color-jitter draw and flip
    decision across frames (the per-task deterministic transform mode)."""
    cfg = cfg or AugmentConfig()
    k_color, k_geom, k_trans, k_blur = jax.random.split(key, 4)
    if color_key is not None:
        k_color = color_key
    dtype = jnp.dtype(cfg.compute_dtype)
    matrix = scale_rotate_flip_matrix(k_geom, cfg, flip=flip)
    if cfg.trans_frac > 0:
        h, w = img.shape[0], img.shape[1]
        t = jax.random.uniform(
            k_trans, (2,), minval=-cfg.trans_frac, maxval=cfg.trans_frac
        ) * jnp.asarray([w, h], jnp.float32)
        matrix = matrix.at[:, 2].set(t)
    # warp FIRST via the packed single-gather kernel, then jitter: the
    # jitter is pointwise-linear so it commutes with the bilinear blend
    # (contrast anchored on the pre-warp mean, matching jitter-then-warp
    # up to clipping at saturated pixels); border pixels stay at cval 0.
    # NOTE: parity with jitter-then-warp holds for FULL-support pixels only
    # — on the 1-px partial-support bilinear fringe the additive offset is
    # applied at full weight instead of scaled by the blend-weight sum, and
    # clipping happens after blending; acceptable for augmentation.
    wimg, wlabel, inside = affine_warp_packed(img, label, matrix, dtype)
    mean = jnp.mean(img.astype(dtype))
    jimg = color_jitter(k_color, wimg, cfg, mean=mean)
    jimg = jnp.where(inside[..., None], jimg, jnp.asarray(0, jimg.dtype))
    if cfg.blur_prob > 0:
        jimg = gaussian_blur(k_blur, jimg, cfg.blur_prob, cfg.blur_sigma_max)
    return jimg.astype(jnp.float32), wlabel


def augment_support_batch(
    key: Array,
    img: Array,
    label: Array,
    batch_size: int,
    cfg: Optional[AugmentConfig] = None,
) -> Tuple[Array, Array]:
    """EpochSampler semantics on device: replicate one support frame
    ``batch_size`` times with INDEPENDENT augmentations (reference:
    helper_func.py:521-545 + per-worker random transforms). Returns
    ([B,H,W,3], [B,H,W])."""
    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda k: augment_frame(k, img, label, cfg))(keys)


def augment_task_frames(
    key: Array,
    support_img: Array,
    support_label: Array,
    query_imgs: Array,
    query_labels: Array,
    cfg: Optional[AugmentConfig] = None,
) -> Tuple[Array, Array, Array, Array]:
    """Per-task deterministic augmentation, matching the reference's
    ``random_frame_transform_per_task`` meta-training mode
    (meta_tasksets.py:109-136): the train and meta loaders share the SAME
    transform instances, whose deterministic mode draws ONE flip decision
    (custom_transforms.py:188-196) and ONE color-jitter parameter set
    (custom_transforms.py:134-141) per task, while the scale/rotate draw is
    cached per file_name (custom_transforms.py:58-87) — i.e. one geometric
    warp per FRAME, identical across inner epochs and batch replicas.

    Args: support [H,W,3]/[H,W], queries [Q,H,W,3]/[Q,H,W] (all [0,255]
    pre-normalize). Returns the augmented (support_img, support_label,
    query_imgs, query_labels) with the support augmented once — the caller
    reuses it for every inner epoch, the static-shape equivalent of the
    reference's per-file transform cache."""
    k_flip, k_color, k_geom = jax.random.split(key, 3)
    flip = jax.random.bernoulli(k_flip, (cfg or AugmentConfig()).flip_prob)
    s_img, s_label = augment_frame(
        jax.random.fold_in(k_geom, 0), support_img, support_label, cfg,
        color_key=k_color, flip=flip,
    )
    q = jnp.arange(1, query_imgs.shape[0] + 1)
    q_img, q_label = jax.vmap(
        lambda i, im, lb: augment_frame(
            jax.random.fold_in(k_geom, i), im, lb, cfg,
            color_key=k_color, flip=flip,
        )
    )(q, query_imgs, query_labels)
    return s_img, s_label, q_img, q_label


def pad_to(img: Array, label: Array, size: Tuple[int, int]) -> Tuple[Array, Array, Array]:
    """Pad bottom/right to a static (H, W); returns (img, label, valid).

    Replaces the reference's pad+crop host logic (vos_dataset.py:246-274)
    with a static-shape pad + ignore mask."""
    h, w = img.shape[0], img.shape[1]
    th, tw = size
    if h > th or w > tw:
        raise ValueError(f"frame {h}x{w} larger than canvas {th}x{tw}")
    img_p = jnp.pad(img, ((0, th - h), (0, tw - w), (0, 0)))
    label_p = jnp.pad(label, ((0, th - h), (0, tw - w)), constant_values=255)
    valid = jnp.pad(
        jnp.ones((h, w), jnp.bool_), ((0, th - h), (0, tw - w))
    )
    return img_p, label_p, valid


def bucket_hw(h: int, w: int, multiple: int) -> Tuple[int, int]:
    """Round (h, w) up to the next multiple — the eval-resolution bucket.

    Heterogeneous-resolution datasets (YT-VOS validates at native size,
    youtube.py:58-109) would otherwise compile one program per exact
    (H, W); bucketing bounds the compile count to the number of distinct
    buckets while the J/F scoring still runs on the ORIGINAL geometry
    (the evaluators crop the probability maps back before scoring)."""
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)


def pad_frames_to_multiple(frames: Array, multiple: int) -> Array:
    """Zero-pad a [T,H,W,3] frame stack bottom/right to the bucket size."""
    h, w = frames.shape[1], frames.shape[2]
    hb, wb = bucket_hw(h, w, multiple)
    if (hb, wb) == (h, w):
        return frames
    return jnp.pad(frames, ((0, 0), (0, hb - h), (0, wb - w), (0, 0)))


def pad_label_to(label: Array, hw: Tuple[int, int]) -> Array:
    """255-pad an [H,W] label map bottom/right to a target size (255 =
    ignore, so padded pixels never contribute loss or pseudo-GT)."""
    h, w = label.shape[0], label.shape[1]
    th, tw = hw
    if (th, tw) == (h, w):
        return label
    return jnp.pad(label, ((0, th - h), (0, tw - w)), constant_values=255)


def random_crop(
    key: Array, img: Array, label: Array, size: Tuple[int, int]
) -> Tuple[Array, Array]:
    """Random crop to a static size (train-time crop_size,
    vos_dataset.py:246-274). Uses dynamic_slice so it stays jittable."""
    h, w = img.shape[0], img.shape[1]
    th, tw = size
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, max(h - th, 0) + 1)
    x0 = jax.random.randint(kx, (), 0, max(w - tw, 0) + 1)
    img_c = jax.lax.dynamic_slice(img, (y0, x0, 0), (th, tw, img.shape[2]))
    label_c = jax.lax.dynamic_slice(label, (y0, x0), (th, tw))
    return img_c, label_c
