#!/usr/bin/env python
"""Quality A/B for the int8 fc6/fc7 serving path (DenseInt8).

The SGG head's 4096-wide fc6/fc7 towers are the serving budget's
compute-bound hot spot (~90% MXU — PERF.md "Path to 500" #3); precision is
the only lever left there (v5e executes int8 matmuls at 2x the bf16 rate).
This tool gates that lever on QUALITY: it loads one trained Stage-B
checkpoint and evaluates it twice — fp32 fc towers vs ``DenseInt8``
(same param tree, weights quantized per-output-channel + activations
per-row at run time) — on the parity harness's Stage-B metrics
(predicate top-1 / pred mAP over test-split GT pairs) and, with
``--stage_c``, the full video relation-detection pipeline (rel mAP, R@50).

The reference has no quantized path; the quality bar it sets is its own
fp32 eval (lib/model/faster_rcnn/resnet_SGG_emb.py:86-101 head dims).
Ship int8 as a bench default only if the deltas here are ~0.

Usage (on a parity campaign's ours Stage-B checkpoint):
  python tools/quant_ab.py --out runs/parity_r3 --seed 0 \
      --json runs/quant_ab/quant_ab.json [--stage_c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_scorer(ckpt_dir, step, int8, data_root):
    import jax
    import jax.numpy as jnp
    from tools.parity_run import HP, N_REL, _prd_vecs
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.train.checkpoint import restore_intersection

    model = SGGModel(trunk=ResNetTrunk(depth=HP["depth"],
                                       dtype=jnp.float32),
                     vrd=VRDHead(int8_fc=int8), n_rel=N_REL)
    prd = jnp.asarray(_prd_vecs())
    z = jnp.zeros
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        z((1, 240, 320, 3)), jnp.asarray([240.0, 320, 1.0]),
        z((4, 4)), z((4,), jnp.int32), z((4,), jnp.int32),
        z((4,), jnp.int32), z((4,), bool), prd)["params"]
    params = jax.device_put(restore_intersection(ckpt_dir, step, init))

    GB, PB = 8, 56

    @jax.jit
    def _score(params, im, info, boxes, ix1, ix2, pv):
        out = model.apply({"params": params}, im, info, boxes,
                          jnp.zeros((GB,), jnp.int32), ix1, ix2, pv, prd)
        return jax.nn.softmax(out["scores"], -1)

    def score_fn(index, im, scale, boxes, pairs):
        n, p = len(boxes), len(pairs)
        assert n <= GB and p <= PB, (n, p)
        bx = np.zeros((GB, 4), np.float32)
        bx[:n] = boxes
        ix1 = np.zeros((PB,), np.int32)
        ix2 = np.zeros((PB,), np.int32)
        ix1[:p] = [q[0] for q in pairs]
        ix2[:p] = [q[1] for q in pairs]
        pv = np.arange(PB) < p
        h, w = im.shape[:2]
        s = _score(params, jnp.asarray(im[None].astype(np.float32)),
                   jnp.asarray([float(h), float(w), 1.0]), jnp.asarray(bx),
                   jnp.asarray(ix1), jnp.asarray(ix2), jnp.asarray(pv))
        return np.asarray(jax.device_get(s))[:p]

    return score_fn


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_r3",
                    help="parity campaign dir holding the Stage-B ckpt")
    ap.add_argument("--seed", type=int, default=0,
                    help="ours Stage-B session = 951 + seed")
    ap.add_argument("--ckpt", default="",
                    help="explicit checkpoint path (overrides --out/--seed)")
    ap.add_argument("--stage_c", action="store_true",
                    help="also run the video relation-detection eval")
    ap.add_argument("--json", default="runs/quant_ab/quant_ab.json")
    args = ap.parse_args(argv)

    import jax
    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        jax.config.update("jax_platforms", "cpu")

    from tools.parity_run import HP
    data_root = os.path.join(args.out, "data")
    os.environ["I2VSGG_DATA_ROOT"] = data_root
    from tools.parity_run import eval_sgg, eval_video_rel
    from i2vsgg_tpu.train.checkpoint import latest_step

    if args.ckpt:
        ckpt_dir = os.path.dirname(args.ckpt)
        step = int(os.path.basename(args.ckpt))
    else:
        ckpt_dir = os.path.join(args.out, f"res{HP['depth']}", "MVRD_SGG",
                                f"session_{951 + args.seed}")
        step = latest_step(ckpt_dir)
    assert step, f"no checkpoint under {ckpt_dir}"
    print(f"checkpoint: {ckpt_dir}/{step}")

    results = {"ckpt": f"{ckpt_dir}/{step}"}
    for arm, int8 in (("fp32", False), ("int8", True)):
        fn = build_scorer(ckpt_dir, step, int8, data_root)
        r = eval_sgg(fn)
        if args.stage_c:
            r.update(eval_video_rel(fn, data_root))
        results[arm] = r
        print(f"{arm}: {json.dumps(r)}")
    results["delta"] = {
        k: results["int8"][k] - results["fp32"][k]
        for k in results["fp32"] if isinstance(results["fp32"][k], float)}
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["delta"]))
    return results


if __name__ == "__main__":
    main()
