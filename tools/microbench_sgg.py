#!/usr/bin/env python
"""Micro-bench of SGG-stage sub-ops on the real chip (perf triage tool)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(name, fn, *args, steps=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / steps
    print(f"{name:28s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.ops.roi_pool import roi_pool
    from i2vsgg_tpu.ops.boxes import dual_mask, union_boxes

    rng = np.random.RandomState(0)
    B, H, W, C = 8, 20, 30, 1024
    R, MD = 256, 16
    P = MD * (MD - 1)
    fmap = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    rois = np.zeros((B, R, 5), np.float32)
    rois[..., 1] = rng.uniform(0, 200, (B, R))
    rois[..., 2] = rng.uniform(0, 150, (B, R))
    rois[..., 3] = rois[..., 1] + rng.uniform(30, 250, (B, R))
    rois[..., 4] = rois[..., 2] + rng.uniform(30, 200, (B, R))
    rois = jnp.asarray(rois)

    pool_b = jax.jit(jax.vmap(
        lambda f, r: roi_pool(f[None], r, 7, 7, 1.0 / 16.0)))
    timeit("roi_pool 8x256", pool_b, fmap, rois)

    x = jnp.asarray(rng.randn(B * R, 7 * 7 * C).astype(np.float32)).astype(
        jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(7 * 7 * C, 4096).astype(np.float32)).astype(
        jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(4096, 4096).astype(np.float32)).astype(
        jnp.bfloat16)

    @jax.jit
    def fc(x, w1, w2):
        return jax.nn.relu(jax.nn.relu(x @ w1) @ w2)
    timeit("fc6+fc7 2048x50176x4096", fc, x, w1, w2)

    boxes = jnp.asarray(rng.uniform(0, 300, (B, MD, 4)).astype(np.float32))
    ix1 = jnp.asarray(np.repeat(np.arange(MD), MD - 1).astype(np.int32))
    ix2 = jnp.asarray((np.arange(P) % MD).astype(np.int32))

    @jax.jit
    def masks(boxes):
        def one(bx):
            sub = bx[ix1]
            obj = bx[ix2]
            m_s = dual_mask(320.0, 480.0, sub)
            m_o = dual_mask(320.0, 480.0, obj)
            return jnp.stack([m_s, m_o], -1)
        return jax.vmap(one)(boxes)
    timeit("dual_mask 8x240", masks, boxes)

    @jax.jit
    def unions(boxes):
        def one(bx):
            return union_boxes(bx[ix1], bx[ix2], 320.0, 480.0, margin=10.0)
        return jax.vmap(one)(boxes)
    timeit("union_boxes 8x240", unions, boxes)

    # conv tower over dual masks
    import flax.linen as nn

    class Tower(nn.Module):
        @nn.compact
        def __call__(self, z):
            z = nn.relu(nn.Conv(96, (5, 5), strides=(2, 2), padding="SAME")(z))
            z = nn.relu(nn.Conv(128, (5, 5), strides=(2, 2), padding="SAME")(z))
            z = nn.relu(nn.Conv(64, (8, 8), padding="VALID")(z))
            return z

    tower = Tower()
    z = jnp.asarray(rng.randn(B * P, 32, 32, 2).astype(np.float32))
    tp = tower.init(jax.random.PRNGKey(0), z)

    @jax.jit
    def run_tower(tp, z):
        return tower.apply(tp, z)
    timeit("spatial conv tower 1920", run_tower, tp, z)


if __name__ == "__main__":
    main()
