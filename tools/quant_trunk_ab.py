#!/usr/bin/env python
"""Quality A/B for the int8 trunk-conv serving path (I2VSGG_INT8_TRUNK).

The ResNet trunk is the single biggest line in the serving budget
(~14 ms of ~32 ms/8 frames — PERF.md "Path to 500" #1) and two Pallas
kernel formulations measured tied with XLA's lowering, so precision is
the remaining big lever there: v5e executes int8 convs at 2x the bf16
MXU rate. ``BNConv`` (models/backbones.py) quantizes per-output-channel
weights + per-tensor dynamic activations and accumulates in int32 when
``I2VSGG_INT8_TRUNK=1`` — this tool gates that lever on QUALITY before
bench.py's auto-levers may cash it in.

Arms: the same converged Stage-A checkpoint evaluated with fp (bf16)
vs int8 trunk convs at the bench's serving capacity row. The quality
bar is the reference's own fp32 eval protocol
(lib/datasets/voc_eval.py:70-212 mAP over the test split); ship int8
as a serving default only if the delta here is ~0.

Usage (converged parity-campaign checkpoint, 240-scale synthetic set):
  python tools/quant_trunk_ab.py --out runs/parity_r3 \
      --ckpt runs/parity_r3/res50/MVRD/session_ref1/672 \
      --data runs/parity_r3/data --net res50 \
      --cfg ANCHOR_SCALES "[2, 4, 8]" TRAIN.SCALES "[240]" \
            TEST.SCALES "[240]" POOLING_MODE align
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _ckpt_fingerprint(ckpt: str) -> str:
    """Content fingerprint of a checkpoint dir (file names + sizes +
    mtimes). Cheap (no reads); changes whenever the checkpoint is
    rewritten, which is what --reuse_fp staleness needs to detect."""
    import hashlib
    step = int(os.path.basename(ckpt))
    path = os.path.join(os.path.dirname(ckpt), f"step_{step:08d}")
    h = hashlib.sha1()
    for root, _, files in sorted(os.walk(path)):
        for f in sorted(files):
            st = os.stat(os.path.join(root, f))
            h.update(f"{os.path.relpath(os.path.join(root, f), path)}"
                     f":{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_r3")
    ap.add_argument("--ckpt", required=True,
                    help="converged Stage-A checkpoint path (…/session_x/STEP)")
    ap.add_argument("--data", default="",
                    help="data root the checkpoint was trained on")
    ap.add_argument("--net", default="res50")
    ap.add_argument("--dataset", default="MVRD")
    ap.add_argument("--dataset_t", default="",
                    help="optional second (target-domain) eval dataset")
    ap.add_argument("--cfg", nargs="*", default=[],
                    help="config overrides matching the checkpoint")
    ap.add_argument("--rpn_topn", type=int, default=128)
    ap.add_argument("--pre_nms", type=int, default=1024)
    ap.add_argument("--max_det", type=int, default=16)
    ap.add_argument("--json", default="runs/quant_trunk_ab/quant_trunk_ab.json")
    ap.add_argument("--mode", default="sim",
                    help="int8 arm's --int8_trunk value. 'sim' = full-trunk "
                         "fake-quant (FAILED the round-4 gate at -0.018 "
                         "target mAP); scope it for the partial-depth "
                         "re-gates, e.g. 'sim:layer1,layer2'")
    ap.add_argument("--act_scales", default="",
                    help="calibration JSON (tools/calibrate_act_scales.py) "
                         "— gate the STATIC-activation-scale variant of "
                         "the int8 arm instead of dynamic abs-max")
    ap.add_argument("--reuse_fp", default="",
                    help="path to an existing quant_trunk_ab.json whose fp "
                         "arm used the SAME ckpt/datasets/capacity — copies "
                         "it instead of re-evaluating (halves a re-gate; "
                         "the fp arm is mode-independent)")
    args = ap.parse_args(argv)

    import jax
    if os.environ.get("I2VSGG_PARITY_TPU") != "1":
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        jax.config.update("jax_platforms", "cpu")

    data_root = args.data or os.path.join(args.out, "data")
    os.environ["I2VSGG_DATA_ROOT"] = data_root

    from tools.test_det import main as eval_main

    ckpt = args.ckpt
    datasets = [args.dataset] + ([args.dataset_t] if args.dataset_t else [])
    # "net" travels in the artifact so bench.py::_gate_int8trunk can
    # prefer a gate whose architecture MATCHES the bench model (round-4
    # verdict weakness #2: res50 gates were blessing a res101 program)
    results = {"ckpt": ckpt, "mode": args.mode, "net": args.net,
               "ckpt_fingerprint": _ckpt_fingerprint(ckpt)}
    if args.act_scales:
        # recorded so bench.py's _gate_int8trunk can serve the SAME
        # static-scale numerics the gate validated
        results["act_scales"] = args.act_scales
    if args.reuse_fp:
        with open(args.reuse_fp) as f:
            prev = json.load(f)
        assert prev["ckpt"] == ckpt, (
            f"--reuse_fp arm was evaluated on {prev['ckpt']}, not {ckpt}")
        # path equality is not content equality: round 4's @3x3 re-gate
        # reused an fp arm measured on a checkpoint that had since been
        # GC'd and RETRAINED at the same path — the delta compared two
        # different models. Fingerprint the checkpoint contents.
        prev_fpr = prev.get("ckpt_fingerprint")
        assert prev_fpr is None or prev_fpr == results["ckpt_fingerprint"], (
            f"--reuse_fp arm was evaluated on a DIFFERENT {ckpt} "
            f"(fingerprint {prev_fpr} != {results['ckpt_fingerprint']}) — "
            "the checkpoint was rewritten since; re-evaluate the fp arm")
        if prev_fpr is None:
            print("WARNING: --reuse_fp artifact predates checkpoint "
                  "fingerprinting — cannot verify the fp arm is from "
                  "this exact checkpoint")
        missing = [ds for ds in datasets if ds not in prev["fp"]]
        assert not missing, f"--reuse_fp arm lacks datasets {missing}"
        results["fp"] = {ds: prev["fp"][ds] for ds in datasets}
        results["fp_reused_from"] = args.reuse_fp
        print("fp arm reused:",
              {ds: results["fp"][ds]["mAP"] for ds in datasets})
    for arm in ("fp", "int8"):
        if arm in results:
            continue
        r = {}
        for ds in datasets:
            t0 = time.time()
            # the int8 arm evaluates in 'sim' (fake-quant) mode: the same
            # quantized integer taps convolved in fp32 — real int8 convs
            # run ~45x slower than bf16 on XLA:CPU; sim==mxu up to
            # accumulator rounding (pinned by tests/test_int8_trunk.py)
            aps = eval_main(
                (["--int8_trunk", args.mode]
                 + (["--act_scales", args.act_scales]
                    if args.act_scales else [])
                 if arm == "int8" else []) + [
                "--dataset", ds, "--net", args.net, "--bs", "1",
                # per-process detections dir — concurrent evals sharing
                # one save_dir corrupt each other's per-class detection
                # files (round-4 postmortem #4: fp arm scored 0.1002
                # instead of 0.2843 under an orphaned racer)
                "--ic", "--gc", "--save_dir",
                os.path.join(args.out, f"eval_pid{os.getpid()}"),
                "--load_name", ckpt,
                "--cfg"] + list(args.cfg) + [
                    "TEST.RPN_POST_NMS_TOP_N", str(args.rpn_topn),
                    "TEST.RPN_PRE_NMS_TOP_N", str(args.pre_nms),
                    "TEST.MAX_DETECTIONS_PER_IMAGE", str(args.max_det)])
            r[ds] = {"mAP": float(aps["mAP"]),
                     "eval_s": round(time.time() - t0, 1)}
            print(f"{arm}/{ds}: mAP {r[ds]['mAP']:.4f} "
                  f"({r[ds]['eval_s']}s)")
        results[arm] = r
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    results["delta"] = {ds: results["int8"][ds]["mAP"]
                        - results["fp"][ds]["mAP"] for ds in datasets}
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["delta"]))
    return results


if __name__ == "__main__":
    main()
