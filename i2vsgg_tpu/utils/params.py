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
