#!/usr/bin/env python
"""Micro-bench: the composed SGG head exactly as serve.py runs it, plus
ablations, to locate the pathological sub-op."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(name, fn, *args, steps=20):
    import jax
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} compile {time.time() - t0:6.1f}s", end="")
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"  run {(time.time() - t0) / steps * 1e3:8.3f} ms")


def main():
    import jax
    import jax.numpy as jnp
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    from i2vsgg_tpu.serve import make_pair_indices

    rng = np.random.RandomState(0)
    B, H, W, C = 8, 20, 30, 1024
    MD, NREL = 16, 26
    ix1_np, ix2_np = make_pair_indices(MD)
    P = len(ix1_np)

    base = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    boxes = jnp.asarray(rng.uniform(0, 300, (B, MD, 4)).astype(np.float32))
    info = jnp.tile(jnp.asarray([[320.0, 480.0, 1.0]], jnp.float32), (B, 1))
    valid = jnp.ones((B, MD), bool)
    prd = jnp.asarray(rng.randn(NREL, 300).astype(np.float32))
    ix1 = jnp.asarray(ix1_np)
    ix2 = jnp.asarray(ix2_np)

    sgg = SGGModel(trunk=ResNetTrunk(depth=101, dtype=jnp.bfloat16),
                   vrd=VRDHead(dtype=jnp.bfloat16), n_rel=NREL)
    params = sgg.init(
        {"params": jax.random.PRNGKey(1)}, base[:1], info[0],
        jnp.zeros((MD, 4)), ix1, ix2, jnp.zeros((P,), bool), prd,
        method=SGGModel.head_on_features)["params"]
    params = jax.device_put(params)

    @jax.jit
    def full(params, base, info, boxes, valid):
        def one(bf, ii, bx, v):
            pv = v[ix1] & v[ix2]
            res = sgg.apply({"params": params}, bf[None], ii, bx, ix1, ix2,
                            pv, prd, deterministic=True,
                            method=SGGModel.head_on_features)
            return jax.nn.softmax(res["scores"], -1)
        return jax.vmap(one)(base, info, boxes, valid)
    timeit("sgg head full (as serve)", full, params, base, info, boxes, valid)

    # ablation: skip the spatial tower
    vrd2 = VRDHead(dtype=jnp.bfloat16, spatial_type=0)
    sgg2 = SGGModel(trunk=sgg.trunk, vrd=vrd2, n_rel=NREL)
    params2 = sgg2.init(
        {"params": jax.random.PRNGKey(1)}, base[:1], info[0],
        jnp.zeros((MD, 4)), ix1, ix2, jnp.zeros((P,), bool), prd,
        method=SGGModel.head_on_features)["params"]

    @jax.jit
    def no_tower(params2, base, info, boxes, valid):
        def one(bf, ii, bx, v):
            pv = v[ix1] & v[ix2]
            res = sgg2.apply({"params": params2}, bf[None], ii, bx, ix1, ix2,
                             pv, prd, deterministic=True,
                             method=SGGModel.head_on_features)
            return jax.nn.softmax(res["scores"], -1)
        return jax.vmap(one)(base, info, boxes, valid)
    timeit("sgg head no spatial tower", no_tower, params2, base, info,
           boxes, valid)


if __name__ == "__main__":
    main()
