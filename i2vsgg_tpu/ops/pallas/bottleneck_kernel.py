"""Pallas TPU kernel: a chain of ResNet identity bottleneck blocks with the
feature map VMEM-resident across the whole chain.

Why: at serving shapes (8x600x960 -> layer3 fmap 38x60x1024) the trunk's
residual stages are HBM-bandwidth-bound, not FLOP-bound — XLA cannot fuse
conv->conv, so every block round-trips its input (4.7 MB/image), two mid
activations and the residual read through HBM (~150 MB/block at batch 8
vs. ~40 GFLOP of compute per block). This kernel keeps one image's fmap in
VMEM for the entire identity-block chain:

* grid = (batch, n_blocks), innermost over blocks; the fmap lives in a
  VMEM scratch buffer that persists across grid steps — DMA'd in from HBM
  once per image (block 0) and back out once (last block);
* per-block folded weights (FrozenBN scale multiplied into the conv
  kernels, bias kept separate) stream through VMEM via BlockSpec indexing;
* layout (HP, WQ, C): rows on the UNTILED major dim (every row-band slice
  is free), width lane-padded on the sublane dim, channels on lanes. Real
  pixels sit at rows 1..H, cols 1..W with a zero halo that implements the
  3x3 conv's zero padding;
* the three convs are MXU matmuls: 1x1-down on (rows*WQ, C) bands, the
  3x3 as 9 shifted (rows*WW, M) @ (M, M) accumulating dots (static
  sublane shifts dx in {0,1,2}), 1x1-up + residual add + relu written
  back in place (in-place is safe: the 3x3 reads `a`, never the updated
  fmap, and the residual only reads a band's own rows).

Replaces [lib/model/faster_rcnn/resnet_instance_styleD_bilinear.py:148-246
Bottleneck.forward] for serving; forward-only (training uses the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def chain_geometry(h: int, w: int):
    """(HP, WW, WQ): padded rows, conv window width, buffer width."""
    ww = _round_up(w + 1, 16)     # out cols window 0..WW-1 covers 1..W
    wq = ww + 16                  # taps read cols dx..dx+WW-1, dx<=2
    hp = h + 2
    return hp, ww, wq


def chain_vmem_bytes(h: int, w: int, c: int, m: int) -> int:
    """Rough VMEM footprint (fmap + mid + double-buffered weights +
    band temporaries) for the fit check."""
    hp, ww, wq = chain_geometry(h, w)
    fmap = hp * wq * c * 2
    mid = hp * wq * m * 2
    weights = 2 * 2 * (c * m + 9 * m * m + m * c)
    temps = 4 * (8 * wq * m + 8 * ww * m + 4 * ww * c)
    return fmap + mid + weights + temps


def _bands(lo: int, hi: int, size: int):
    """Static bands [r, r+n) covering [lo, hi), last one partial."""
    out = []
    r = lo
    while r < hi:
        out.append((r, min(size, hi - r)))
        r += size
    return out


def _kernel(x_hbm, w1_ref, b1_ref, w3_ref, b3_ref, w2_ref, b2_ref,
            out_hbm, fmap, a, sem_in, sem_out, *,
            h, w, hp, ww, wq, c, m):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _load():
        cp = pltpu.make_async_copy(x_hbm.at[i], fmap, sem_in)
        cp.start()
        cp.wait()

    f32 = jnp.float32

    # pass 1: a = relu(fmap @ W1 + b1), masked to the real region (the
    # zero halo must stay zero — relu(b1) would otherwise leak into it)
    for r0, nr in _bands(0, hp, 8):
        xb = fmap[r0:r0 + nr].reshape(nr * wq, c)
        acc = jax.lax.dot_general(xb, w1_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        ab = jnp.maximum(acc + b1_ref[0], 0.0)
        rid = jax.lax.broadcasted_iota(jnp.int32, (nr * wq, 1), 0)
        row = r0 + rid // wq
        col = rid % wq
        mask = ((row >= 1) & (row <= h) & (col >= 2) & (col <= w + 1))
        ab = jnp.where(mask, ab, 0.0)
        a[r0:r0 + nr] = ab.astype(a.dtype).reshape(nr, wq, m)

    # pass 2 per band: 3x3 (9 shifted dots) -> relu -> 1x1-up + residual
    # -> relu -> in-place writeback (window cols 0..WW-1 = layout cols)
    for r0, nr in _bands(1, h + 1, 8):
        acc = jnp.zeros((nr * ww, m), f32)
        for dy in range(3):
            arow = a[r0 + dy - 1:r0 + dy - 1 + nr]          # (nr, WQ, M)
            for dx in range(3):
                sh = arow[:, dx:dx + ww, :].reshape(nr * ww, m)
                acc = acc + jax.lax.dot_general(
                    sh, w3_ref[0, dy * 3 + dx],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
        bb = jnp.maximum(acc + b3_ref[0], 0.0).astype(fmap.dtype)
        # col validity of window positions (0 is the left halo)
        cid = jax.lax.broadcasted_iota(jnp.int32, (nr * ww, 1), 0) % ww
        cmask = (cid >= 1) & (cid <= w)
        for q0, qr in _bands(0, nr, 4):                     # 4-row chunks
            y = jax.lax.dot_general(bb[q0 * ww:(q0 + qr) * ww], w2_ref[0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32) + b2_ref[0]
            res = fmap[r0 + q0:r0 + q0 + qr, 1:1 + ww, :]
            z = jnp.maximum(res.reshape(qr * ww, c).astype(f32) + y, 0.0)
            z = jnp.where(cmask[q0 * ww:(q0 + qr) * ww], z, 0.0)
            fmap[r0 + q0:r0 + q0 + qr, 1:1 + ww, :] = \
                z.astype(fmap.dtype).reshape(qr, ww, c)

    @pl.when(j == nb - 1)
    def _store():
        cp = pltpu.make_async_copy(fmap, out_hbm.at[i], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def bottleneck_chain_pallas(x, w1, b1, w3, b3, w2, b2, *,
                            interpret: bool = False):
    """Run ``n`` identity bottleneck blocks over ``x`` in one kernel.

    Args:
      x:  (B, H, W, C) feature map (any float dtype; computed in bf16).
      w1: (n, C, M)    folded 1x1-down kernels (BN scale multiplied in).
      b1: (n, M)       folded BN bias after conv1.
      w3: (n, 9, M, M) folded 3x3 kernels, tap index dy*3+dx.
      b3: (n, M)
      w2: (n, M, C)    folded 1x1-up kernels.
      b2: (n, C)
    Returns: (B, H, W, C) bf16.
    """
    b, h, w, c = x.shape
    n, _, m = w1.shape
    assert c % 128 == 0 and m % 128 == 0, (c, m)
    assert w3.shape == (n, 9, m, m) and w2.shape == (n, m, c)
    hp, ww, wq = chain_geometry(h, w)

    # real pixels at rows 1..H, cols 2..W+1 (window pos p <-> layout col
    # p+1, so tap slices start at dx >= 0)
    xp = jnp.zeros((b, hp, wq, c), jnp.bfloat16)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.bfloat16),
                                      (0, 1, 2, 0))
    bf = jnp.bfloat16
    args = (xp, w1.astype(bf), b1.astype(jnp.float32)[:, None, :],
            w3.astype(bf), b3.astype(jnp.float32)[:, None, :],
            w2.astype(bf), b2.astype(jnp.float32)[:, None, :])

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, hp=hp, ww=ww, wq=wq, c=c, m=m),
        out_shape=jax.ShapeDtypeStruct((b, hp, wq, c), jnp.bfloat16),
        grid=(b, n),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, m, m), lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((hp, wq, c), jnp.bfloat16),
            pltpu.VMEM((hp, wq, m), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6),
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * h * ww * (c * m + 9 * m * m + m * c),
            bytes_accessed=b * (2 * hp * wq * c * 2
                                + n * 2 * (c * m + 9 * m * m + m * c)),
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return jax.lax.slice(out, (0, 1, 2, 0), (b, 1 + h, 2 + w, c))


def fold_block_params(w1, bn1, w3, bn2, w2, bn3):
    """Fold FrozenBN affines into conv kernels.

    Args:
      w1: (1, 1, C, M) conv1 (1x1-down); w3: (3, 3, M, M) conv2 (3x3);
      w2: (1, 1, M, C) conv3 (1x1-up) kernels.
      bn1/bn2/bn3: (mul, add) per-channel affine pairs from the
      FrozenBatchNorm following each conv.
    Returns (w1', b1, w3', b3, w2', b2) with shapes matching
    ``bottleneck_chain_pallas`` (no leading n dim).
    """
    m1, a1 = bn1
    m2, a2 = bn2
    m3, a3 = bn3
    w1f = w1.reshape(w1.shape[2], w1.shape[3]) * m1[None, :]
    w3f = (w3 * m2[None, None, None, :]).reshape(9, w3.shape[2], w3.shape[3])
    w2f = w2.reshape(w2.shape[2], w2.shape[3]) * m3[None, :]
    return w1f, a1, w3f, a2, w2f, a3
