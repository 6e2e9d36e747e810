"""Microbench: affine-warp formulations at 480p, batch 3 (the fine-tune
augmentation hot spot).

Variants:
  generic    4 corner gathers of (1,1,3) slices + nearest label gather
  packed22   ONE (2,2)-block u32 gather (known-bad: scalarizes)
  packed_sc  4 scalar u32 gathers with flat linear indices
  packed_r4  row gathers of 4-lane rows from [H*W, 4] bf16
  rows256    row gathers from [H*W, 3] f32 (roi-align-style pattern probe)

Run: nohup python scripts/bench_warp.py > /tmp/bench_warp.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from e_osvos_tpu.data import transforms

H, W, B = 480, 864, 3
ITERS = 5
REPS = 3


def coords(key):
    matrix = transforms.scale_rotate_flip_matrix(
        key, transforms.AugmentConfig()
    )
    return transforms._affine_grid(H, W, matrix)


def v_generic(key, img, label):
    matrix = transforms.scale_rotate_flip_matrix(key, transforms.AugmentConfig())
    oi, ol = transforms.affine_warp(
        img.astype(jnp.bfloat16), label, matrix, 0.0, 255.0
    )
    return jnp.sum(oi.astype(jnp.float32)) + jnp.sum(ol)


def v_packed22(key, img, label):
    matrix = transforms.scale_rotate_flip_matrix(key, transforms.AugmentConfig())
    oi, ol, _ = transforms.affine_warp_packed(img, label, matrix)
    return jnp.sum(oi.astype(jnp.float32)) + jnp.sum(ol)


def _corner_setup(key, img, label):
    src_y, src_x = coords(key)
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = (src_y - jnp.floor(src_y)).astype(jnp.bfloat16)
    wx = (src_x - jnp.floor(src_x)).astype(jnp.bfloat16)
    return y0, x0, wy, wx


def v_packed_scalar(key, img, label):
    iu = img.astype(jnp.uint32)
    lu = label.astype(jnp.uint32)
    packed = (iu[..., 0] | (iu[..., 1] << 8) | (iu[..., 2] << 16)
              | (lu << 24)).reshape(-1)
    y0, x0, wy, wx = _corner_setup(key, img, label)
    acc = jnp.zeros((H, W, 3), jnp.bfloat16)
    one = jnp.asarray(1, jnp.bfloat16)
    for dy in (0, 1):
        for dx in (0, 1):
            yi, xi = y0 + dy, x0 + dx
            ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            v = jnp.take(packed, idx)
            wgt = (wy if dy else one - wy) * (wx if dx else one - wx)
            wgt = jnp.where(ok, wgt, 0)
            corner = jnp.stack(
                [(v & 0xFF).astype(jnp.bfloat16),
                 ((v >> 8) & 0xFF).astype(jnp.bfloat16),
                 ((v >> 16) & 0xFF).astype(jnp.bfloat16)], -1)
            acc = acc + corner * wgt[..., None]
    return jnp.sum(acc.astype(jnp.float32))


def v_packed_rows4(key, img, label):
    flat = jnp.concatenate(
        [img.astype(jnp.bfloat16).reshape(-1, 3),
         label.astype(jnp.bfloat16).reshape(-1, 1)], axis=-1
    )  # [H*W, 4]
    y0, x0, wy, wx = _corner_setup(key, img, label)
    acc = jnp.zeros((H, W, 4), jnp.bfloat16)
    one = jnp.asarray(1, jnp.bfloat16)
    for dy in (0, 1):
        for dx in (0, 1):
            yi, xi = y0 + dy, x0 + dx
            ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            v = jnp.take(flat, idx, axis=0)  # [H,W,4]
            wgt = (wy if dy else one - wy) * (wx if dx else one - wx)
            acc = acc + v * jnp.where(ok, wgt, 0)[..., None]
    return jnp.sum(acc.astype(jnp.float32))


def _build_corner_stack(img, label):
    """[H*W, 16] bf16: 4 channels (rgb+label) x 4 corner-shifted copies."""
    flat = jnp.concatenate(
        [img.astype(jnp.bfloat16).reshape(-1, 3),
         label.astype(jnp.bfloat16).reshape(-1, 1)], axis=-1
    )  # [H*W, 4]
    pad = jnp.zeros((W + 1, 4), jnp.bfloat16)
    ext = jnp.concatenate([flat, pad], axis=0)
    n = H * W
    return jnp.concatenate(
        [ext[0:n], ext[1:n + 1], ext[W:n + W], ext[W + 1:n + W + 1]], axis=-1
    )  # [H*W, 16]


def v_packed_r16(key, img, label):
    stack = _build_corner_stack(img, label)
    y0, x0, wy, wx = _corner_setup(key, img, label)
    idx = jnp.clip(y0, 0, H - 1) * W + jnp.clip(x0, 0, W - 1)
    v = jnp.take(stack, idx, axis=0)  # [H,W,16] — ONE gather, all corners
    one = jnp.asarray(1, jnp.bfloat16)
    acc = jnp.zeros((H, W, 4), jnp.bfloat16)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            yi, xi = y0 + dy, x0 + dx
            ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            wgt = (wy if dy else one - wy) * (wx if dx else one - wx)
            acc = acc + v[..., 4 * k:4 * k + 4] * jnp.where(ok, wgt, 0)[..., None]
            k += 1
    return jnp.sum(acc.astype(jnp.float32))


def v_packed_r16_hoisted(key, img, label):
    # the stack depends only on the frame: build once, sample B times
    stack = _build_corner_stack(img, label)
    one = jnp.asarray(1, jnp.bfloat16)

    def one_warp(kk):
        y0, x0, wy, wx = _corner_setup(kk, img, label)
        idx = jnp.clip(y0, 0, H - 1) * W + jnp.clip(x0, 0, W - 1)
        v = jnp.take(stack, idx, axis=0)
        acc = jnp.zeros((H, W, 4), jnp.bfloat16)
        k = 0
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
                wgt = (wy if dy else one - wy) * (wx if dx else one - wx)
                acc = acc + v[..., 4 * k:4 * k + 4] * jnp.where(ok, wgt, 0)[..., None]
                k += 1
        return jnp.sum(acc.astype(jnp.float32))

    ks = jax.random.split(key, 3)
    return sum(one_warp(kk) for kk in ks)


def v_rows_f32(key, img, label):
    flat = img.reshape(-1, 3)  # f32 rows
    y0, x0, wy, wx = _corner_setup(key, img, label)
    idx = jnp.clip(y0, 0, H - 1) * W + jnp.clip(x0, 0, W - 1)
    v = jnp.take(flat, idx, axis=0)
    return jnp.sum(v * wy[..., None].astype(jnp.float32))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(0, 256, (H, W, 3)), jnp.float32)
    label = jnp.asarray(rs.randint(0, 2, (H, W)), jnp.int32)

    variants = [
        ("packed_r16", v_packed_r16, B),
        ("r16_hoist3", v_packed_r16_hoisted, 1),  # one stack, 3 samples
        ("rows_f32x1", v_rows_f32, B),
    ]
    for name, fn, calls in variants:
        def run(key, fn=fn, calls=calls):
            def step(k, _):
                k, *ks = jax.random.split(k, calls + 1)
                s = sum(fn(kk, img, label) for kk in ks)
                return k, s

            _, outs = jax.lax.scan(step, key, None, length=ITERS)
            return jnp.sum(outs)

        f = jax.jit(run)
        np.asarray(f(jax.random.PRNGKey(0)))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(jax.random.PRNGKey(0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:11s} {best * 1e3 / ITERS:8.1f} ms/step(x{B})",
              flush=True)


if __name__ == "__main__":
    main()
