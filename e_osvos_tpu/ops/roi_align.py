"""ROI-align (single- and multi-level/FPN) as fused XLA gathers.

The reference relies on torchvision's C++/CUDA ``roi_align`` via
``MultiScaleRoIAlign`` (/root/reference/src/networks/mask_rcnn.py:17-18,
434-442). TPU-native design: each output cell averages ``sampling_ratio²``
bilinear samples; every sample is 4 gathers + weights, batched over
(rois × out_h × out_w × samples) in one vectorized expression that XLA fuses
into a single gather-heavy kernel. All shapes static; padded/invalid rois
produce zeros.

FPN level assignment follows the standard heuristic
k = floor(k0 + log2(sqrt(area)/224)) clamped to the pyramid range; rather
than dynamic routing, features are pooled from EVERY level and the result
selected per-roi (compute-all-then-select — 4× pooling FLOPs, which is noise
next to the heads, in exchange for a single static program).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear_gather(feat: Array, y: Array, x: Array) -> Array:
    """feat [H,W,C]; y/x arbitrary-shaped float coords → [..., C].

    Out-of-range samples contribute zero (roi_align border semantics)."""
    h, w, _ = feat.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def g(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = feat[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(ok[..., None], v, 0.0)

    return (
        g(y0i, x0i) * (1 - wy) * (1 - wx)
        + g(y0i, x0i + 1) * (1 - wy) * wx
        + g(y0i + 1, x0i) * wy * (1 - wx)
        + g(y0i + 1, x0i + 1) * wy * wx
    )


def roi_align(
    feat: Array,
    boxes: Array,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """feat [H,W,C], boxes [N,4] xyxy in image coords → [N,oh,ow,C].

    Matches torchvision roi_align semantics (continuous coordinates,
    ``aligned=True`` half-pixel offset, average over sampling grid)."""
    oh, ow = output_size
    s = sampling_ratio
    offset = 0.5 if aligned else 0.0
    b = boxes * spatial_scale
    x1, y1, x2, y2 = b[:, 0] - offset, b[:, 1] - offset, b[:, 2] - offset, b[:, 3] - offset
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    cell_w = bw / ow
    cell_h = bh / oh

    # sample coordinates: [N, oh, ow, s, s]
    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # within-cell fractions
    ix = iy
    gy = jnp.arange(oh, dtype=jnp.float32)
    gx = jnp.arange(ow, dtype=jnp.float32)
    y = (
        y1[:, None, None]
        + (gy[None, :, None] + iy[None, None, :]) * cell_h[:, None, None]
    )  # [N, oh, s]
    x = (
        x1[:, None, None]
        + (gx[None, :, None] + ix[None, None, :]) * cell_w[:, None, None]
    )  # [N, ow, s]
    yy = y[:, :, None, :, None]  # [N,oh,1,s,1]
    xx = x[:, None, :, None, :]  # [N,1,ow,1,s]
    yy = jnp.broadcast_to(yy, y.shape[:1] + (oh, ow, s, s))
    xx = jnp.broadcast_to(xx, x.shape[:1] + (oh, ow, s, s))

    vals = _bilinear_gather(feat, yy, xx)  # [N,oh,ow,s,s,C]
    return jnp.mean(vals, axis=(3, 4))


def stack_roi_align_1ch(
    maps: Array,
    boxes: Array,
    map_idx: Array,
    output_size: Tuple[int, int],
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """Single-channel ROI-align from a stack of maps, one row-gather total.

    ``maps`` [O,H,W]; ``boxes`` [P,4] (image coords, spatial scale 1);
    ``map_idx`` [P] selects each roi's map → [P,oh,ow]. Used for GT-mask
    crops (torchvision project_masks_on_boxes semantics): gathers directly
    from the map stack — no [P,H,W] materialization, and the four bilinear
    corners arrive as the 4 lanes of one gathered row instead of 4 scalar
    gathers (TPU gathers are slice-count-bound).
    """
    o, h, w = maps.shape
    n1 = h * w
    oh, ow = output_size
    s = sampling_ratio
    p = boxes.shape[0]

    bpad = w + 1
    m = o * n1 + w + 1
    flat = maps.reshape(-1, 1).astype(jnp.float32)
    zp = jnp.zeros((bpad, 1), jnp.float32)
    ext = jnp.concatenate([zp, flat, zp], axis=0)
    stack4 = jnp.concatenate(
        [ext[0:m], ext[1:m + 1], ext[w:m + w], ext[w + 1:m + w + 1]], axis=-1
    )  # [m, 4]; row i ↔ raw linear index i − bpad

    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] - offset
    y1 = boxes[:, 1] - offset
    bw = jnp.maximum(boxes[:, 2] - offset - x1, 1e-6)
    bh = jnp.maximum(boxes[:, 3] - offset - y1, 1e-6)
    cell_w = bw / ow
    cell_h = bh / oh

    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    gy = jnp.arange(oh, dtype=jnp.float32)
    gx = jnp.arange(ow, dtype=jnp.float32)
    y = y1[:, None, None] + (gy[None, :, None] + iy[None, None, :]) * cell_h[:, None, None]
    x = x1[:, None, None] + (gx[None, :, None] + iy[None, None, :]) * cell_w[:, None, None]
    yy = jnp.broadcast_to(y[:, :, None, :, None], (p, oh, ow, s, s))
    xx = jnp.broadcast_to(x[:, None, :, None, :], (p, oh, ow, s, s))

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0
    wx = xx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    base = (map_idx.astype(jnp.int32) * n1)[:, None, None, None, None]
    raw = base + y0i * w + x0i
    idx = jnp.clip(raw, -bpad, o * n1 - 1) + bpad
    v = jnp.take(stack4, idx, axis=0)  # [P,oh,ow,s,s,4]

    acc = jnp.zeros((p, oh, ow, s, s), jnp.float32)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0i + dy
            xi = x0i + dx
            ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            wgt = (wy if dy else 1.0 - wy) * (wx if dx else 1.0 - wx)
            acc = acc + v[..., k] * jnp.where(ok, wgt, 0.0)
            k += 1
    return jnp.mean(acc, axis=(3, 4))


def stack_roi_align_u8(
    maps: Array,
    boxes: Array,
    map_idx: Array,
    output_size: Tuple[int, int],
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """Byte-packed variant of :func:`stack_roi_align_1ch` for integer-valued
    maps in [0, 255] (GT masks / 255-ignore): the four bilinear corner
    shifts are packed into ONE uint32 per pixel with pure elementwise shifts
    (the [m, 4]-lane stack of the generic version costs a strided
    single-lane interleave on TPU), so each sample is one scalar u32 gather.
    NOT differentiable w.r.t. ``maps`` — GT targets don't need it.
    """
    o, h, w = maps.shape
    n1 = h * w
    L = o * n1
    oh, ow = output_size
    s = sampling_ratio
    p = boxes.shape[0]

    bpad = w + 1
    m = L + w + 1
    mu = jnp.clip(maps.reshape(-1), 0, 255).astype(jnp.uint32)
    zp = jnp.zeros((bpad,), jnp.uint32)
    ext = jnp.concatenate([zp, mu, zp])
    packed = (
        ext[0:m]
        | (ext[1:m + 1] << 8)
        | (ext[w:m + w] << 16)
        | (ext[w + 1:m + w + 1] << 24)
    )  # [m]; row i ↔ raw linear index i − bpad; bytes = corners

    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] - offset
    y1 = boxes[:, 1] - offset
    bw = jnp.maximum(boxes[:, 2] - offset - x1, 1e-6)
    bh = jnp.maximum(boxes[:, 3] - offset - y1, 1e-6)
    cell_w = bw / ow
    cell_h = bh / oh

    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    gy = jnp.arange(oh, dtype=jnp.float32)
    gx = jnp.arange(ow, dtype=jnp.float32)
    y = y1[:, None, None] + (gy[None, :, None] + iy[None, None, :]) * cell_h[:, None, None]
    x = x1[:, None, None] + (gx[None, :, None] + iy[None, None, :]) * cell_w[:, None, None]
    yy = jnp.broadcast_to(y[:, :, None, :, None], (p, oh, ow, s, s))
    xx = jnp.broadcast_to(x[:, None, :, None, :], (p, oh, ow, s, s))

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0
    wx = xx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    base = (map_idx.astype(jnp.int32) * n1)[:, None, None, None, None]
    raw = base + y0i * w + x0i
    idx = jnp.clip(raw, -bpad, L - 1) + bpad
    v = jnp.take(packed, idx)  # [P,oh,ow,s,s] u32 — all four corners

    acc = jnp.zeros((p, oh, ow, s, s), jnp.float32)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0i + dy
            xi = x0i + dx
            ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            wgt = (wy if dy else 1.0 - wy) * (wx if dx else 1.0 - wx)
            val = ((v >> (8 * k)) & 0xFF).astype(jnp.float32)
            acc = acc + val * jnp.where(ok, wgt, 0.0)
            k += 1
    return jnp.mean(acc, axis=(3, 4))


def fpn_level_assignment(
    boxes: Array,
    num_levels: int,
    canonical_level: int = 2,
    canonical_size: float = 224.0,
) -> Array:
    """Per-roi pyramid level index in [0, num_levels) (FPN eq. 1 with k0=4
    mapping to index 2 of [P2,P3,P4,P5])."""
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    k = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(w * h) / canonical_size + 1e-8)
    )
    return jnp.clip(k, 0, num_levels - 1).astype(jnp.int32)


def _multiscale_roi_align_dense(
    feats: Sequence[Array],
    boxes: Array,
    output_size: Tuple[int, int],
    spatial_scales: Sequence[float],
    sampling_ratio: int = 2,
) -> Array:
    """Reference formulation: pool from EVERY level, one-hot select per-roi
    (4× the gather work; kept as the oracle for tests)."""
    num_levels = len(feats)
    levels = fpn_level_assignment(boxes, num_levels)
    pooled = jnp.stack(
        [
            roi_align(f, boxes, output_size, spatial_scale=sc,
                      sampling_ratio=sampling_ratio)
            for f, sc in zip(feats, spatial_scales)
        ],
        axis=0,
    )  # [L,N,oh,ow,C]
    onehot = jax.nn.one_hot(levels, num_levels, dtype=pooled.dtype)  # [N,L]
    return jnp.einsum("lnhwc,nl->nhwc", pooled, onehot)


def multiscale_roi_align_packed(
    feats: Sequence[Array],
    boxes: Array,
    output_size: Tuple[int, int],
    spatial_scales: Sequence[float],
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """Corner-packed FPN ROI-align: ONE row-gather per bilinear sample.

    Same contract as :func:`multiscale_roi_align`, but the pyramid is
    re-laid-out so all four bilinear corners of a sample live in the lanes
    of one row (``[Σ(H_l·W_l+W_l+1), 4C]``, built from shifted views of each
    level — the stack_roi_align_1ch trick generalized to C channels and
    multiple levels). TPU gathers are slice-count-bound (PERF.md playbook),
    so this quarters the gather count of the 4-corner form; the 4× buffer
    build is pure streaming bandwidth and far cheaper. The backward pass
    scatters into the packed buffer with the same 4× fewer slices.
    """
    import numpy as np

    num_levels = len(feats)
    oh, ow = output_size
    s = sampling_ratio
    c = feats[0].shape[-1]
    n = boxes.shape[0]
    hs = np.asarray([f.shape[0] for f in feats])
    ws = np.asarray([f.shape[1] for f in feats])
    fdt = feats[0].dtype

    # per-level 4-corner stacks: row i ↔ raw linear index i − (w_l+1);
    # lanes [0:C]=(0,0) [C:2C]=(0,1) [2C:3C]=(1,0) [3C:4C]=(1,1)
    stacks = []
    row_offsets = []
    acc_rows = 0
    for f, w_l in zip(feats, ws):
        h_l = f.shape[0]
        m_l = h_l * w_l
        bpad = int(w_l) + 1
        mrows = m_l + bpad
        flat = f.reshape(m_l, c)
        zp = jnp.zeros((bpad, c), fdt)
        ext = jnp.concatenate([zp, flat, zp], axis=0)
        stacks.append(
            jnp.concatenate(
                [ext[0:mrows], ext[1:mrows + 1], ext[w_l:mrows + w_l],
                 ext[w_l + 1:mrows + w_l + 1]],
                axis=-1,
            )
        )
        row_offsets.append(acc_rows)
        acc_rows += mrows
    big = jnp.concatenate(stacks, axis=0)  # [acc_rows, 4C]

    levels = fpn_level_assignment(boxes, num_levels)  # [N]
    h_l = jnp.asarray(hs, jnp.int32)[levels]
    w_l = jnp.asarray(ws, jnp.int32)[levels]
    bpad_l = w_l + 1
    m_l = h_l * w_l
    roff = jnp.asarray(row_offsets, jnp.int32)[levels]
    scale = jnp.asarray(spatial_scales, jnp.float32)[levels]

    offset = 0.5 if aligned else 0.0
    b = boxes * scale[:, None]
    x1 = b[:, 0] - offset
    y1 = b[:, 1] - offset
    bw = jnp.maximum(b[:, 2] - offset - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - offset - y1, 1e-6)
    cell_w = bw / ow
    cell_h = bh / oh

    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    gy = jnp.arange(oh, dtype=jnp.float32)
    gx = jnp.arange(ow, dtype=jnp.float32)
    y = y1[:, None, None] + (gy[None, :, None] + iy[None, None, :]) * cell_h[:, None, None]
    x = x1[:, None, None] + (gx[None, :, None] + iy[None, None, :]) * cell_w[:, None, None]
    yy = jnp.broadcast_to(y[:, :, None, :, None], (n, oh, ow, s, s))
    xx = jnp.broadcast_to(x[:, None, :, None, :], (n, oh, ow, s, s))

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = (yy - y0).astype(fdt)
    wx = (xx - x0).astype(fdt)
    one = jnp.asarray(1, fdt)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    hb = h_l[:, None, None, None, None]
    wb = w_l[:, None, None, None, None]
    bb = bpad_l[:, None, None, None, None]
    mb = m_l[:, None, None, None, None]
    rb = roff[:, None, None, None, None]

    raw = y0i * wb + x0i
    rows = rb + jnp.clip(raw, -bb, mb - 1) + bb
    v = jnp.take(big, rows, axis=0)  # [N,oh,ow,s,s,4C] — all four corners

    acc = jnp.zeros((n, oh, ow, s, s, c), fdt)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0i + dy
            xi = x0i + dx
            ok = (yi >= 0) & (yi < hb) & (xi >= 0) & (xi < wb)
            wgt = (wy if dy else one - wy) * (wx if dx else one - wx)
            wgt = jnp.where(ok, wgt, jnp.asarray(0, fdt))
            acc = acc + v[..., k * c:(k + 1) * c] * wgt[..., None]
            k += 1
    return jnp.mean(acc, axis=(3, 4))


def multiscale_roi_align(
    feats: Sequence[Array],
    boxes: Array,
    output_size: Tuple[int, int],
    spatial_scales: Sequence[float],
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """FPN ROI-align: feats = [P2..P5] ([H_l,W_l,C] each), boxes [N,4] in
    image coords → [N,oh,ow,C].

    Single-gather formulation: the pyramid is flattened to one
    ``[ΣH_l·W_l, C]`` buffer; each roi's samples index into its assigned
    level via a per-roi offset, so the gather volume is 1× (the dense
    compute-all-levels form costs 4× and was 62% of the per-frame time at
    480p — scripts/bench_detection.py). See
    :func:`multiscale_roi_align_packed` for the corner-packed variant used
    on the training path."""
    import numpy as np

    num_levels = len(feats)
    oh, ow = output_size
    s = sampling_ratio
    c = feats[0].shape[-1]
    n = boxes.shape[0]
    hs = np.asarray([f.shape[0] for f in feats])
    ws = np.asarray([f.shape[1] for f in feats])
    offsets = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    m_tot = flat.shape[0]

    levels = fpn_level_assignment(boxes, num_levels)  # [N]
    h_l = jnp.asarray(hs, jnp.int32)[levels]  # [N]
    w_l = jnp.asarray(ws, jnp.int32)[levels]
    off = jnp.asarray(offsets, jnp.int32)[levels]
    scale = jnp.asarray(spatial_scales, jnp.float32)[levels]  # [N]

    offset = 0.5 if aligned else 0.0
    b = boxes * scale[:, None]
    x1 = b[:, 0] - offset
    y1 = b[:, 1] - offset
    bw = jnp.maximum(b[:, 2] - offset - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - offset - y1, 1e-6)
    cell_w = bw / ow
    cell_h = bh / oh

    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    gy = jnp.arange(oh, dtype=jnp.float32)
    gx = jnp.arange(ow, dtype=jnp.float32)
    y = y1[:, None, None] + (gy[None, :, None] + iy[None, None, :]) * cell_h[:, None, None]  # [N,oh,s]
    x = x1[:, None, None] + (gx[None, :, None] + iy[None, None, :]) * cell_w[:, None, None]  # [N,ow,s]
    yy = jnp.broadcast_to(y[:, :, None, :, None], (n, oh, ow, s, s))
    xx = jnp.broadcast_to(x[:, None, :, None, :], (n, oh, ow, s, s))

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    # blend in the FEATURE dtype: f32 weights would promote the big
    # [N,oh,ow,s,s,C] intermediates to f32, doubling HBM traffic of the
    # pooling (features are bf16 on TPU)
    fdt = flat.dtype
    wy = (yy - y0)[..., None].astype(fdt)
    wx = (xx - x0)[..., None].astype(fdt)
    one = jnp.asarray(1, fdt)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    hb = h_l[:, None, None, None, None]
    wb = w_l[:, None, None, None, None]
    ob = off[:, None, None, None, None]

    def g(yi, xi):
        ok = (yi >= 0) & (yi < hb) & (xi >= 0) & (xi < wb)
        idx = ob + jnp.clip(yi, 0, hb - 1) * wb + jnp.clip(xi, 0, wb - 1)
        v = jnp.take(flat, jnp.clip(idx, 0, m_tot - 1), axis=0)
        return jnp.where(ok[..., None], v, jnp.asarray(0, fdt))

    vals = (
        g(y0i, x0i) * (one - wy) * (one - wx)
        + g(y0i, x0i + 1) * (one - wy) * wx
        + g(y0i + 1, x0i) * wy * (one - wx)
        + g(y0i + 1, x0i + 1) * wy * wx
    )  # [N,oh,ow,s,s,C]
    return jnp.mean(vals, axis=(3, 4))
