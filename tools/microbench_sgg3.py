#!/usr/bin/env python
"""Micro-bench: staged ablation INSIDE the vrd head to find the slow op."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(name, fn, *args, steps=20):
    import jax
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:24s} compile {c:6.1f}s  run {(time.time() - t0) / steps * 1e3:8.3f} ms")


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from i2vsgg_tpu.ops.roi_pool import roi_pool
    from i2vsgg_tpu.ops.boxes import dual_mask, union_boxes
    from i2vsgg_tpu.serve import make_pair_indices

    rng = np.random.RandomState(0)
    B, H, W, C = 8, 20, 30, 1024
    MD, NREL = 16, 26
    ix1_np, ix2_np = make_pair_indices(MD)
    P = len(ix1_np)
    ix1 = jnp.asarray(ix1_np)
    ix2 = jnp.asarray(ix2_np)

    base = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    boxes = jnp.asarray(rng.uniform(10, 290, (B, MD, 4)).astype(np.float32))
    prd = jnp.asarray(rng.randn(NREL, 300).astype(np.float32))

    k = jax.random.PRNGKey
    w6 = jax.random.normal(k(0), (49 * C, 4096), jnp.bfloat16) * 0.01
    w7 = jax.random.normal(k(1), (4096, 4096), jnp.bfloat16) * 0.01
    wso = jax.random.normal(k(2), (600, 256), jnp.bfloat16) * 0.01
    w8 = jax.random.normal(k(3), (4096, 256), jnp.bfloat16) * 0.01
    wv = jax.random.normal(k(4), (4096, 300), jnp.bfloat16) * 0.01
    wfus = jax.random.normal(k(5), (512, 256), jnp.bfloat16) * 0.01
    wrel = jax.random.normal(k(6), (256, 300), jnp.bfloat16) * 0.01

    def stage_core(bf, bx, with_unions, with_fc, with_emb,
               w6, w7, wso, w8, wv, wfus, wrel):
        sub = bx[ix1]
        obj = bx[ix2]
        if with_unions:
            u = union_boxes(sub, obj, 320.0, 480.0, margin=10.0)
        else:
            u = jnp.tile(bx[:1], (P, 1))
        col0 = jnp.zeros((MD + P, 1), bx.dtype)
        all_rois = jnp.concatenate(
            [jnp.concatenate([bx, u], 0)], 0)
        all_rois = jnp.concatenate([col0, all_rois], 1)
        pooled = roi_pool(bf[None], all_rois, 7, 7, 1.0 / 16.0)
        x = pooled.reshape(pooled.shape[0], -1)
        if not with_fc:
            return jnp.sum(x)
        x = jax.nn.relu(x @ w6)
        x = jax.nn.relu(x @ w7)
        if not with_emb:
            return jnp.sum(x)
        obj_emb = x[:MD] @ wv
        x_u = jax.nn.relu(x[MD:] @ w8)
        so = jax.nn.relu(jnp.concatenate([obj_emb[ix1], obj_emb[ix2]], 1)
                         .astype(jnp.bfloat16) @ wso)
        fus = jax.nn.relu(jnp.concatenate([x_u, so], 1) @ wfus)
        vis = (fus @ wrel).astype(jnp.float32)
        vis = vis / jnp.maximum(jnp.linalg.norm(vis, axis=1, keepdims=True),
                                1e-12)
        pn = prd / jnp.maximum(jnp.linalg.norm(prd, axis=1, keepdims=True),
                               1e-12)
        return jax.nn.softmax(vis @ pn.T, -1)

    weights = (w6, w7, wso, w8, wv, wfus, wrel)

    for name, wu, wf, we in (("pool only", False, False, False),
                             ("pool+unions", True, False, False),
                             ("pool+unions+fc", True, True, False),
                             ("all (no masks)", True, True, True)):
        def f(base, boxes, *ws, wu=wu, wf=wf, we=we):
            return jax.vmap(
                lambda bf, bx: stage_core(bf, bx, wu, wf, we, *ws))(
                    base, boxes)
        timeit(name, jax.jit(f), base, boxes, *weights)

    @jax.jit
    def masks_tower(boxes):
        def one(bx):
            sub = bx[ix1]
            obj = bx[ix2]
            m = jnp.stack([dual_mask(320.0, 480.0, sub),
                           dual_mask(320.0, 480.0, obj)], -1)
            return m
        return jax.vmap(one)(boxes)
    timeit("masks alone", masks_tower, boxes)


if __name__ == "__main__":
    main()
