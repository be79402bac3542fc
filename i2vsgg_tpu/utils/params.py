"""Parameter-tree utilities (dtype policy for serving weights)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Module-path fragments whose params must STAY fp32 when weights are stored
# in bf16 for serving:
#  * FrozenBatchNorm ("bn1"/"bn2"/"bn3"/"downsample_bn"): scale*rsqrt(var+eps)
#    is computed in the param dtype — bf16 var loses the eps and rounds the
#    folded affine; the cost of keeping 4 tiny vectors fp32 is nil.
#  * bbox_pred: box-regression deltas feed coordinate decode; bf16 rounding
#    of regression weights shifts boxes by whole pixels at 600-scale.
_FP32_KEEP = ("bn", "bbox_pred")


def _keep_fp32(path) -> bool:
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            continue
        if name == "bbox_pred" or name.startswith("bn") or name.endswith("_bn"):
            return True
    return False


def quantize_trunk_params(params, scope: str = "layer3,layer4",
                          act_scales=None):
    """Pre-quantize in-scope trunk conv kernels to int8 serving storage.

    The BNConv int8 path (models/backbones.py) derives per-out-channel
    int8 weights from the stored kernel ON EVERY STEP — a read of the full
    bf16 kernel, a per-channel abs-max reduce, and a round/divide, all in
    the jitted serving program. Those weights never change between steps,
    so the derivation is hoisted here: each selected ``kernel`` leaf is
    replaced by its int8 quantized tensor plus a sibling ``kernel_scale``
    (fp32, per out-channel). BNConv detects the int8 dtype and skips the
    per-step weight-quant chain — the integer taps are BIT-IDENTICAL to
    the on-the-fly path (same abs-max/round pipeline, pinned in
    tests/test_int8_trunk.py), so the committed quality gates
    (runs/quant_trunk_ab/*.json) carry over unchanged.

    Selection mirrors the runtime env-scope rule (``I2VSGG_INT8_TRUNK=
    1:<tok>,<tok>``): a 4-D ``kernel`` leaf under a bottleneck ``block*``
    module whose path contains a scope token. 1x1 kernels under layer4
    are skipped — they run on per-roi 4x4 grids where BNConv's small-grid
    matmul path stays bf16.

    Apply AFTER ``bf16_storage_cast`` (the runtime path also quantizes
    from the bf16-rounded weights).

    ``act_scales``: optional STATIC activation scales — either a dict
    mapping a conv's module path ("layer3/block0/conv2") to its
    calibrated per-tensor input scale (abs-max / 127, from
    tools/calibrate_act_scales.py), or a scalar applied to every
    in-scope conv (bench timing only). When given, each quantized conv
    also gets an ``act_scale`` param; BNConv then quantizes its input
    with the static scale (pure elementwise, fusable) instead of the
    dynamic abs-max reduction (an extra unfusable HBM pass per conv —
    measured to eat most of the int8 rate win, PERF.md round 4).
    """
    tokens = [t for t in scope.split(",") if t] if scope else []
    # "@3x3" filter token: restrict to 3x3 kernels (int8 1x1 convs
    # measured SLOWER than bf16 on-chip — tools/int8_conv_micro.py)
    k3_only = "@3x3" in tokens
    ptoks = [t for t in tokens if not t.startswith("@")]

    def maybe_quantize(names, x):
        """names = module path of the conv; returns the replacement dict
        for the {'kernel': x} entry."""
        in_scope = (any(n.startswith("block") for n in names)
                    and ((not ptoks) or any(t in n for t in ptoks
                                            for n in names))
                    and not (x.shape[0] == 1 and "layer4" in names)
                    and not (k3_only and x.shape[0] != 3))
        if not in_scope:
            return {"kernel": x}
        wf = x.astype(jnp.float32)
        f = x.shape[-1]
        w_s = jnp.maximum(jnp.max(jnp.abs(wf.reshape(-1, f)), axis=0),
                          1e-8) / 127.0
        w_q = jnp.round(wf / w_s).astype(jnp.int8)
        out = {"kernel": w_q, "kernel_scale": w_s}
        if act_scales is not None:
            path = "/".join(names)
            a = (act_scales if not isinstance(act_scales, dict)
                 else act_scales.get(path))
            if a is None:
                raise KeyError(f"act_scales missing calibration for "
                               f"in-scope conv {path!r}")
            out["act_scale"] = jnp.asarray(a, jnp.float32)
        return out

    def walk(names, tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(names + (k,), v)
            elif k == "kernel" and getattr(v, "ndim", 0) == 4:
                out.update(maybe_quantize(names, v))
            else:
                out[k] = v
        return out

    return walk((), params)


def quantize_dense_params(params, names=("fc6", "fc7")):
    """Pre-quantize DenseInt8 tower kernels to int8 serving storage.

    The DenseInt8 layer (models/sgg.py) derives per-out-channel int8
    weights from the stored kernel ON EVERY STEP — for the SGG head's
    fc6 that is an f32 upcast + abs-max + round over a 50176x4096
    matrix, measured ~3 ms/step of HBM traffic at the levered serving
    config (tools/sgg_dissect.py: the fc stage was 3.80 ms of which the
    int8 dot itself is ~0.6). Weights never change between steps, so
    the chain is hoisted here exactly like ``quantize_trunk_params``:
    each 2-D ``kernel`` leaf under a module named in ``names`` is
    replaced by its int8 tensor + sibling ``kernel_scale``. Same
    abs-max/round pipeline as the layer -> BIT-IDENTICAL integer taps,
    so the committed quality gate (runs/quant_ab) carries over.

    Apply AFTER ``bf16_storage_cast`` and only when the model was built
    with ``int8_fc=True`` (nn.Dense cannot consume int8 kernels).
    """
    def walk(mod, tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(k, v)
            elif (k == "kernel" and getattr(v, "ndim", 0) == 2
                    and mod in names):
                kf = v.astype(jnp.float32)
                w_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=0),
                                  1e-8) / 127.0
                out["kernel"] = jnp.round(kf / w_s).astype(jnp.int8)
                out["kernel_scale"] = w_s
            else:
                out[k] = v
        return out

    return walk("", params)


def bf16_storage_cast(params):
    """Cast fp32 params to bf16 for serving, except precision-sensitive
    paths (FrozenBatchNorm statistics, bbox regression head).

    The kept-fp32 set costs ~0.1% of the weight bytes; everything else feeds
    bf16-compute matmuls where the only numerics change is the bf16 rounding
    of the stored weight itself.
    """
    def cast(path, x):
        if x.dtype != jnp.float32 or _keep_fp32(path):
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)
