"""Headline benchmark: fused detection+SGG inference throughput per chip.

Runs the flagship serving program — ResNet-101 domain-adaptive Faster R-CNN
detection + per-pair predicate scoring fused into ONE jitted XLA program per
frame batch (``i2vsgg_tpu/serve.py``) — on real frames-shaped input at the
reference's 600-short-side test scale, and reports frames/sec/chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/500}
(north star: >= 500 frames/sec/chip on TPU v5e, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="frames per step (16 amortizes the per-step fixed "
                         "cost: +6.5%% fps vs 8, measured; same per-frame "
                         "program, latency 16 frames/step)")
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--max-det", type=int, default=16)
    ap.add_argument("--rpn-topn", type=int, default=128,
                    help="TEST.RPN_POST_NMS_TOP_N (default 128 = the "
                         "quality-validated serving capacity, BENCH_CONFIG"
                         ".md; 0 = config default 300)")
    ap.add_argument("--pre-nms", type=int, default=1024,
                    help="TEST.RPN_PRE_NMS_TOP_N (default 1024, "
                         "quality-validated: tools/capacity_ab.py; 0 = "
                         "config default 6000)")
    ap.add_argument("--num-classes", type=int, default=16)
    ap.add_argument("--num-relations", type=int, default=26)
    ap.add_argument("--bf16-params", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="store serving weights in bf16 — halves weight "
                         "streaming, +6%% fps measured. Excludes the "
                         "precision-sensitive fp32 paths (FrozenBatchNorm "
                         "statistics, bbox_pred regression head) from the "
                         "cast; the remaining kernels feed bf16-compute "
                         "matmuls, so the only numerics change is bf16 "
                         "rounding of stored weights "
                         "(disable with --no-bf16-params)")
    ap.add_argument("--int8-fc6", action="store_true",
                    help="run the SGG fc6/fc7 towers as int8 MXU matmuls "
                         "(DenseInt8; ~2x matmul rate on v5e, the head's "
                         "compute-bound hot spot). Quality-gate with "
                         "tools/quant_ab.py before making this default")
    ap.add_argument("--int8-trunk", action="store_true",
                    help="run the ResNet bottleneck convs as int8 MXU "
                         "convs (per-out-channel weights + per-tensor "
                         "dynamic activations, int32 accumulate; ~2x conv "
                         "rate on v5e against the ~14 ms trunk line). "
                         "Quality-gate with tools/quant_trunk_ab.py")
    ap.add_argument("--int8-trunk-scope", default="",
                    help="layer-scoped int8 trunk, e.g. '1:layer3,layer4' "
                         "(the gated production scope) — lets staged "
                         "profiling (--stage backbone/det) run the exact "
                         "levered trunk config. Ignored if --int8-trunk "
                         "(full scope) is set")
    ap.add_argument("--int8-static-acts", default="",
                    help="with --int8-trunk[-scope]: use STATIC activation "
                         "scales ('1' = unit scales for timing, or a "
                         "calibration JSON path) instead of the per-conv "
                         "dynamic abs-max pass")
    ap.add_argument("--pallas-conv1", action="store_true",
                    help="route the trunk's conv1 through the Pallas "
                         "parity-plane matmul kernel (serving path)")
    ap.add_argument("--pallas-bottleneck",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="run identity-bottleneck chains (layer3) through "
                         "the VMEM-resident fused Pallas kernel")
    ap.add_argument("--host-planes", action="store_true",
                    help="serving input-contract lever: feed the program "
                         "HOST-packed conv1 parity planes (Conv1Planes) "
                         "instead of NHWC images — the loader does the "
                         "plane relayout (numpy, measured+logged) and the "
                         "device skips the ~2.8ms/16f XLA plane transpose. "
                         "Bit-identical taps (tests/test_pallas_conv1.py)")
    ap.add_argument("--stage", default="full",
                    choices=("full", "backbone", "rpn", "det", "det_decode",
                             "train"),
                    help="bisect: backbone/det/+decode/full inference, or "
                         "the full adversarial-DA train step")
    ap.add_argument("--lever-budget-s", type=float, default=1500.0,
                    help="wall-clock budget for the auto-lever arms: each "
                         "extra arm (levered config, b32) only starts if "
                         "total elapsed time is under this. Bounds the "
                         "round-end run's exposure to slow remote compiles "
                         "(~5-8 min/arm through the axon tunnel)")
    ap.add_argument("--auto-levers", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="after measuring the requested config, also try "
                         "the quality-GATED serving levers (int8 fc towers "
                         "if runs/quant_ab passed, max_det 8 if the "
                         "converged-ckpt capacity A/B passed) and report "
                         "whichever config is fastest. Any failure in the "
                         "levered arm falls back to the base number — the "
                         "driver's bare `python bench.py` at round end may "
                         "be the only live-chip session, so it should "
                         "capture the best quality-safe config, not just "
                         "the conservative default. A/B tooling "
                         "(tools/bench_sweep.py) passes --no-auto-levers")
    args = ap.parse_args()

    import os

    # The axon TPU backend reaches the chip through a loopback relay
    # (127.0.0.1:8082+). When the relay is dead, jax backend init raises a
    # multi-page UNAVAILABLE traceback (or worse, device ops hang in futex
    # wait). Probe the relay with a bounded socket connect FIRST and emit a
    # single machine-readable diagnostic line so the driver records an
    # infra failure, not a crash (VERDICT r3 item 2).
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        import socket

        def _infra_diag(msg):
            print(json.dumps({
                "metric": "det_sgg_inference_throughput",
                "value": None,
                "unit": "frames/s/chip",
                "vs_baseline": None,
                "error": f"tpu tunnel unavailable ({msg}); "
                         "last clean-chip in-repo measurement 422.1 fps/chip"
                         " levered (runs/bench_r4b, PERF.md round 4)",
            }))

        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=3):
                pass
        except OSError as e:
            _infra_diag(f"127.0.0.1:8082 probe failed: {e}")
            return
        # The socket probe is necessary but NOT sufficient: the local
        # loopback relay accepts connections even when the REMOTE worker
        # is crashed (seen round 4: an int8 kernel fault crashed the TPU
        # worker; backend init then hangs forever in futex wait while
        # :8082 still connects). Run a tiny end-to-end device op in a
        # child process under a hard deadline — on a healthy tunnel this
        # costs ~30-60 s once (and warms the compile cache); on a wedged
        # one it converts an infinite hang into the diagnostic line.
        import subprocess
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp\n"
                 "jax.config.update('jax_compilation_cache_dir',"
                 " '/tmp/jax_cache')\n"
                 "print('PROBE_OK',"
                 " float(jnp.sum(jnp.ones((8, 128)) @ jnp.ones((128, 8)))))"
                 ],
                capture_output=True, text=True, timeout=300)
            if "PROBE_OK" not in probe.stdout:
                _infra_diag("device probe failed: "
                            + (probe.stderr or "")[-300:].replace("\n", " "))
                return
        except subprocess.TimeoutExpired:
            _infra_diag("device probe timed out after 300s — relay port "
                        "accepts but the remote TPU worker is not serving")
            return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Param init is pure setup — run it on the host CPU backend (shapes are
    # image-size independent) so only the fused serving program compiles for
    # the TPU. Under the axon tunnel every TPU compile is remote; skipping
    # the init compile cuts bench startup by minutes. (Only when the axon
    # plugin is actually registered — a CPU-forced run, e.g.
    # JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=, must stay CPU-only.)
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_platforms", "axon,cpu")
        except Exception:
            pass

    import jax.numpy as jnp
    from i2vsgg_tpu.config import Config
    from i2vsgg_tpu.models.backbones import ResNetTrunk
    from i2vsgg_tpu.models.faster_rcnn import FasterRCNN_DA
    from i2vsgg_tpu.models.sgg import SGGModel, VRDHead
    from i2vsgg_tpu.serve import make_frame_program

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    cfg = Config()
    overrides = []
    if args.rpn_topn:
        overrides += ["TEST.RPN_POST_NMS_TOP_N", str(args.rpn_topn)]
    if args.pre_nms:
        overrides += ["TEST.RPN_PRE_NMS_TOP_N", str(args.pre_nms)]
    if overrides:
        from i2vsgg_tpu.config import cfg_from_list
        cfg = cfg_from_list(overrides, cfg)
    b, h, w = args.batch, args.height, args.width
    images = jnp.asarray(
        np.random.RandomState(0).randn(b, h, w, 3).astype(np.float32) * 20)
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))

    if args.host_planes and args.stage == "train":
        log("--host-planes ignored for --stage train (it is a serving "
            "input contract; training consumes NHWC images)")
        args.host_planes = False
    if args.host_planes:
        from i2vsgg_tpu.ops.pallas.conv1_kernel import (Conv1Planes,
                                                        pack_conv1_planes_np)
        imgs_np = np.asarray(images, np.float32)
        pack_conv1_planes_np(imgs_np[:1])                # warm the path
        t0 = time.time()
        planes_np = pack_conv1_planes_np(imgs_np)
        dt = time.time() - t0
        log(f"host plane pack: {dt * 1e3:.1f} ms / {b} frames "
            f"({dt * 1e3 / b:.2f} ms/frame on one core — in serving this "
            "runs in the loader, pipelined off the device critical path)")
        images = Conv1Planes(jnp.asarray(planes_np), h, w)

    det = FasterRCNN_DA(num_classes=args.num_classes, cfg=cfg,
                        backbone="res101", ic=True, gc=True)
    dtype = jnp.dtype(cfg.COMPUTE_DTYPE)
    sgg = SGGModel(trunk=ResNetTrunk(depth=101, dtype=dtype),
                   vrd=VRDHead(dtype=dtype, pooling="align",
                               int8_fc=args.int8_fc6),
                   n_rel=args.num_relations)
    md = args.max_det
    prd_vecs = np.random.RandomState(1).randn(
        args.num_relations, 300).astype(np.float32)

    log("init params on host CPU ...")
    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    # param shapes don't depend on image size or proposal counts — init a
    # tiny-config twin of the model to keep the init trace cheap
    tiny = cfg.replace(
        TRAIN=cfg.TRAIN.__class__(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16,
                                  RPN_POST_NMS_TOP_N_TARGET=8,
                                  RPN_BATCHSIZE=16, BATCH_SIZE=8,
                                  MAX_NUM_GT_BOXES=4),
        TEST=cfg.TEST.__class__(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16))
    det_init_twin = FasterRCNN_DA(num_classes=args.num_classes, cfg=tiny,
                                  backbone="res101", ic=True, gc=True)
    with jax.default_device(cpu):
        hi, wi = 128, 160
        im_info_i = jnp.asarray([[hi, wi, 1.0]], jnp.float32)
        det_params = det_init_twin.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, hi, wi, 3), jnp.float32), im_info_i,
            mode="inference")["params"]
        ix = jnp.zeros((md * (md - 1),), jnp.int32)
        base_feat = jnp.zeros((1, hi // 16, wi // 16, 1024), dtype)
        sgg_params = sgg.init(
            {"params": jax.random.PRNGKey(1)},
            base_feat, im_info_i[0], jnp.zeros((md, 4), jnp.float32),
            ix, ix, jnp.zeros(ix.shape, bool), jnp.asarray(prd_vecs),
            method=SGGModel.head_on_features)["params"]
    if args.bf16_params:
        from i2vsgg_tpu.utils.params import bf16_storage_cast
        det_params = bf16_storage_cast(det_params)
        sgg_params = bf16_storage_cast(sgg_params)
    if args.int8_fc6:
        # hoist the fc-tower weight-quant chain out of the serving
        # program (bit-identical taps — tools/sgg_dissect.py measured the
        # in-program chain at ~3 ms/step: fc6's 50176x4096 kernel was
        # being f32-upcast + abs-maxed + rounded EVERY step)
        from i2vsgg_tpu.utils.params import quantize_dense_params
        sgg_params = quantize_dense_params(sgg_params)
    if args.int8_trunk or args.int8_trunk_scope:
        # hoist the per-step weight-quant chain out of the serving program
        # (bit-identical integer taps — tests/test_int8_trunk.py)
        from i2vsgg_tpu.utils.params import quantize_trunk_params
        scope = ("" if args.int8_trunk
                 else args.int8_trunk_scope.partition(":")[2])
        acts = None
        if args.int8_static_acts:
            # static activation scales: "1" = unit scales (timing-only —
            # same program shape/fusion as calibrated scales), else a
            # calibration JSON from tools/calibrate_act_scales.py
            if args.int8_static_acts == "1":
                acts = 1.0
            else:
                with open(args.int8_static_acts) as f:
                    acts = json.load(f)
                acts = acts.get("scales", acts)
        try:
            det_params = quantize_trunk_params(det_params, scope, acts)
        except KeyError as e:
            # same fallback as the auto-lever arm: a calibration JSON from
            # the res50 parity ckpt doesn't cover the res101 bench model's
            # extra blocks. Unit static scales keep the gated PROGRAM SHAPE
            # (static-act elementwise quant, no dynamic abs-max pass) —
            # timing-equivalent (killed a dissect run before this guard:
            # runs/dissect_r4/dissect.log, KeyError on layer3/block10)
            log(f"static act scales don't map to the bench model ({e}); "
                "timing with unit scales")
            det_params = quantize_trunk_params(det_params, scope, 1.0)
    det_params = jax.device_put(det_params, dev)
    sgg_params = jax.device_put(sgg_params, dev)
    log(f"init: {time.time() - t0:.1f}s")
    if args.pallas_conv1:
        # set AFTER the CPU-side param init: the Pallas kernel can't lower
        # for the CPU backend, and param trees are flag-independent
        os.environ["I2VSGG_PALLAS_CONV1"] = "1"
    else:
        os.environ.pop("I2VSGG_PALLAS_CONV1", None)  # stale-env-proof A/Bs
    if args.pallas_bottleneck:
        os.environ["I2VSGG_PALLAS_BOTTLENECK"] = "1"      # (same caveat)
    else:
        os.environ.pop("I2VSGG_PALLAS_BOTTLENECK", None)
    if args.int8_trunk:
        os.environ["I2VSGG_INT8_TRUNK"] = "1"             # (same caveat)
    elif args.int8_trunk_scope:
        os.environ["I2VSGG_INT8_TRUNK"] = args.int8_trunk_scope
    else:
        os.environ.pop("I2VSGG_INT8_TRUNK", None)

    if args.stage == "train":
        from i2vsgg_tpu.train.det_da import (create_train_state,
                                             make_train_step)
        from i2vsgg_tpu.train.optim import sgd_reference
        rng = np.random.RandomState(0)
        g = cfg.TRAIN.MAX_NUM_GT_BOXES
        gt = np.zeros((b, g, 5), np.float32)
        for i in range(b):
            for k in range(8):
                x1, y1 = rng.uniform(0, h // 2, 2)
                bw, bh = rng.uniform(30, 200, 2)
                gt[i, k] = [x1, y1, min(x1 + bw, w - 1),
                            min(y1 + bh, h - 1), rng.randint(1, 16)]
        batch_s = {"image": images, "im_info": im_info,
                   "gt_boxes": jnp.asarray(gt)}
        batch_t = {"image": images[:, :, ::-1], "im_info": im_info}
        # training params need the train-mode variables; init on CPU twin
        with jax.default_device(cpu):
            tparams = det_init_twin.init(
                {"params": jax.random.PRNGKey(0),
                 "sampling": jax.random.PRNGKey(1),
                 "sampling2": jax.random.PRNGKey(2),
                 "dropout": jax.random.PRNGKey(3)},
                jnp.zeros((1, hi, wi, 3), jnp.float32), im_info_i,
                jnp.zeros((1, g, 5), jnp.float32),
                mode="train_source")["params"]
        tx = sgd_reference(5e-4, cfg)
        state = create_train_state(jax.device_put(tparams, dev), tx)
        step_fn = make_train_step(det, tx, eta=0.1, eta_style=0.001,
                                  style_lambda=1.0, cr=True)
        key = jax.random.PRNGKey(0)

        def program(images, im_info):
            nonlocal state
            state, metrics = step_fn(state, batch_s, batch_t, key)
            return metrics["loss"]
    elif args.stage == "full":
        program = make_frame_program(det, det_params, sgg, sgg_params,
                                     prd_vecs, cfg, max_det=md,
                                     max_per_class=8)
    else:
        from i2vsgg_tpu.serve import decode_detections

        @jax.jit
        def _staged(p, images, im_info):
            if args.stage == "backbone":
                feat, tap = det.apply({"params": p}, images,
                                      method=lambda m, x: m.trunk(x))
                # reduce on device: the 37MB fmap fetch would dominate the
                # timed region through the tunnel
                return jnp.sum(feat.astype(jnp.float32))
            if args.stage == "rpn":
                # trunk + RPN head + proposal generation (incl. proposal
                # NMS) — (det - rpn) isolates align + layer4 + cls/bbox
                def _rpn(m, images, im_info):
                    base_feat, _ = m.trunk(images)
                    rpn_cls, rpn_bbox = m.rpn(base_feat)
                    return m._proposals(base_feat, rpn_cls, rpn_bbox,
                                        im_info, training=False,
                                        target=False)
                props = det.apply({"params": p}, images, im_info,
                                  method=_rpn)
                return props.rois, props.valid
            out = det.apply({"params": p}, images, im_info, mode="inference")
            if args.stage == "det":
                return out["cls_prob"], out["bbox_pred"], out["rois"]
            dets = decode_detections(out["rois"], out["roi_valid"],
                                     out["cls_prob"], out["bbox_pred"],
                                     im_info, cfg, max_det=md,
                                     max_per_class=8)
            return dets

        def program(images, im_info):
            return _staged(det_params, images, im_info)

    def force(out):
        """Fetch the outputs — jax.block_until_ready returns early through
        the axon tunnel (measured: a staged program 'finished' in 0.5ms that
        provably needs >2.4ms of MXU time), so completion must be forced by
        an actual device->host fetch. This is also the honest serving
        measurement: results must reach the host."""
        jax.device_get(out)

    def time_program(prog, imgs=None, info=None, bsz=None):
        imgs = images if imgs is None else imgs
        info = im_info if info is None else info
        bsz = b if bsz is None else bsz
        log("compiling fused frame program ...")
        t0 = time.time()
        force(prog(imgs, info))
        log(f"compile+first-run: {time.time() - t0:.1f}s")
        for _ in range(args.warmup):
            force(prog(imgs, info))
        t0 = time.time()
        out = None
        for _ in range(args.steps):
            out = prog(imgs, info)
        # device executes in order, so fetching the LAST step's outputs
        # forces completion of the whole timed sequence (one fetch, no
        # per-step sync)
        force(out)
        dt = time.time() - t0
        fps = args.steps * bsz / dt
        log(f"{args.steps} steps x {bsz} frames in {dt:.3f}s "
            f"-> {fps:.1f} frames/s")
        return fps

    t_start = time.time()
    fps = time_program(program)
    config = (f"b{b} rpn{args.rpn_topn}/pre{args.pre_nms} det{args.max_det}"
              + (" int8fc" if args.int8_fc6 else "")
              + (" int8trunk" if args.int8_trunk else "")
              + (f" int8trunk[{args.int8_trunk_scope}]"
                 if args.int8_trunk_scope and not args.int8_trunk else "")
              + (" bf16w" if args.bf16_params else "")
              + (" hostplanes" if args.host_planes else ""))
    winner = program  # the program behind the reported fps/config
    # constructor pieces of the winning program — the bucketed rung
    # below rebuilds the SAME models/params in two-program form
    win_parts = dict(det=det, det_params=det_params, sgg=sgg,
                     sgg_params=sgg_params, cfg=cfg, md=md)

    metric = ("det_sgg_inference_throughput" if args.stage == "full"
              else f"{args.stage}_throughput")

    def emit(code=None):
        print(json.dumps({
            "metric": metric,
            "value": round(fps, 2),
            "unit": ("frames/s/chip" if args.stage != "train"
                     else "imgs/s/chip"),
            "vs_baseline": round(fps / 500.0, 4),
            "config": config,
        }), flush=True)
        if code is not None:
            os._exit(code)

    # a base number exists from here on — if the driver times this run
    # out mid-lever-arm, SIGTERM still yields the one JSON line instead
    # of losing the round's measurement
    import signal
    signal.signal(signal.SIGTERM, lambda *_: emit(0))

    def levers_timeboxed(label):
        left = args.lever_budget_s - (time.time() - t_start)
        if left <= 0:
            log(f"auto-levers: skipping {label} (lever budget exhausted, "
                f"{args.lever_budget_s:.0f}s)")
            return False
        return True

    # --- quality-gated lever cash-in (driver's bare run = one JSON line,
    # possibly the round's only live-chip session) ---------------------
    if (args.auto_levers and args.stage == "full"
            and not args.int8_fc6 and not args.int8_trunk
            and not args.int8_trunk_scope and args.max_det == 16
            and not args.pallas_conv1 and not args.pallas_bottleneck):
        int8_ok, int8_why = _gate_int8()
        det8_ok, det8_why = _gate_det8(args)
        int8t_ok, int8t_why, int8t_env, int8t_acts = _gate_int8trunk()
        rpn64_ok, rpn64_why, rpn_gate_pre, rpn_gate_topn = \
            _gate_rpn_capacity(args)
        log(f"auto-levers: int8 gate {int8_why}; det8 gate {det8_why}; "
            f"int8trunk gate {int8t_why}; rpn-capacity gate {rpn64_why}")
        lever_md = 8 if (det8_ok or rpn64_ok) else 16
        if ((int8_ok or det8_ok or int8t_ok or rpn64_ok)
                and levers_timeboxed("levered")):
            try:
                det_params2 = det_params
                if int8t_ok:
                    # env is read at trace time (prog2's first call); if
                    # the levered arm loses or fails it is popped below so
                    # a later b32 retrace of the base program stays fp
                    os.environ["I2VSGG_INT8_TRUNK"] = int8t_env
                    # pre-quantize the in-scope kernels so the weight-quant
                    # chain runs once here instead of every step (integer
                    # taps bit-identical — the committed gates carry over)
                    from i2vsgg_tpu.utils.params import \
                        quantize_trunk_params
                    acts2 = None
                    if int8t_acts:
                        # the passing artifact was gated WITH static
                        # activation scales — serve the same numerics
                        with open(int8t_acts) as f:
                            acts2 = json.load(f)
                        acts2 = acts2.get("scales", acts2)
                    try:
                        det_params2 = quantize_trunk_params(
                            det_params, int8t_env.partition(":")[2], acts2)
                    except KeyError as e:
                        # calibration paths don't cover this model (the
                        # gate calibrates the res50 parity ckpt; the bench
                        # model is res101 with more blocks). Unit static
                        # scales keep the gated PROGRAM SHAPE (static-act
                        # elementwise quant, no dynamic abs-max pass) —
                        # timing-equivalent; the quality evidence lives in
                        # the gate artifact, not the random-weight bench
                        log(f"auto-levers: static act scales don't map to "
                            f"the bench model ({e}); timing with unit "
                            "scales")
                        det_params2 = quantize_trunk_params(
                            det_params, int8t_env.partition(":")[2], 1.0)
                det2, cfg_l = det, cfg
                rpn_l, pre_l = args.rpn_topn, args.pre_nms
                if rpn64_ok:
                    # gated serving rpn capacity: the align + layer4 +
                    # head line is roi-proportional (the converged-ckpt
                    # A/B row pre{P}_rpn{N}_det8 carries the quality
                    # evidence; _gate_rpn_capacity picked the smallest
                    # passing row)
                    from i2vsgg_tpu.config import cfg_from_list
                    rpn_l, pre_l = rpn_gate_topn, rpn_gate_pre
                    cfg_l = cfg_from_list(
                        ["TEST.RPN_POST_NMS_TOP_N", str(rpn_l),
                         "TEST.RPN_PRE_NMS_TOP_N", str(pre_l)], cfg)
                    det2 = FasterRCNN_DA(num_classes=args.num_classes,
                                         cfg=cfg_l, backbone="res101",
                                         ic=True, gc=True)
                sgg2 = SGGModel(trunk=ResNetTrunk(depth=101, dtype=dtype),
                                vrd=VRDHead(dtype=dtype, pooling="align",
                                            int8_fc=int8_ok),
                                n_rel=args.num_relations)
                # DenseInt8 is param-tree-compatible with nn.Dense and
                # max_det/proposal caps only change program shapes —
                # reuse the params (pre-quantizing the fc towers when the
                # int8 lever is on: hoists the per-step weight-quant
                # chain, ~3 ms/step — tools/sgg_dissect.py)
                sgg_params2 = sgg_params
                if int8_ok:
                    from i2vsgg_tpu.utils.params import \
                        quantize_dense_params
                    sgg_params2 = quantize_dense_params(sgg_params)
                prog2 = make_frame_program(det2, det_params2, sgg2,
                                           sgg_params2, prd_vecs, cfg_l,
                                           max_det=lever_md,
                                           max_per_class=8)
                fps2 = time_program(prog2)
                cfg2 = (f"b{b} rpn{rpn_l}/pre{pre_l} "
                        f"det{lever_md}"
                        + (" int8fc" if int8_ok else "")
                        + (f" int8trunk[{int8t_env}]" if int8t_ok else "")
                        + (" static-acts" if (int8t_ok and int8t_acts)
                           else "")
                        + (" bf16w" if args.bf16_params else ""))
                log(f"auto-levers: base {fps:.1f} fps vs levered "
                    f"[{cfg2}] {fps2:.1f} fps")
                if fps2 > fps:
                    fps, config, winner = fps2, cfg2, prog2
                    win_parts = dict(det=det2, det_params=det_params2,
                                     sgg=sgg2, sgg_params=sgg_params2,
                                     cfg=cfg_l, md=lever_md)
                else:
                    os.environ.pop("I2VSGG_INT8_TRUNK", None)
            except Exception as e:  # noqa: BLE001 — never lose the base fps
                os.environ.pop("I2VSGG_INT8_TRUNK", None)
                log(f"auto-levers: levered arm failed ({e!r}); "
                    "reporting base config")

    # --- batch-doubling rung: batch size is quality-neutral (throughput
    # is already per-frame) and larger batches amortize the per-step
    # fixed cost until HBM pressure wins: 8->16 measured +6.5%, 16->32
    # won on the @3x3+static stack (457.9 vs 437.0), and 32->64 lost at
    # rpn64 (463.2 vs 467.9) but the roi tensors halve at the rpn32
    # capacity row — so climb the WINNING program by doubling while each
    # double wins (one retrace per arm; the first losing double, OOM, or
    # budget exhaustion stops the climb).
    def worker_alive(deadline_s=240):
        """Post-failure health probe (advisor r4: an OOM/kernel fault
        through the axon tunnel can crash the REMOTE worker — the
        except/break above preserves the fps number, but a wedged worker
        then sinks every later rung in this chip session). A child
        process runs a tiny device op under a hard deadline; in-process
        device calls on a wedged tunnel hang in futex wait forever."""
        if dev.platform == "cpu":
            return True
        import subprocess
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp\n"
                 "jax.config.update('jax_compilation_cache_dir',"
                 " '/tmp/jax_cache')\n"
                 "print('PROBE_OK',"
                 " float(jnp.sum(jnp.ones((8, 128)) @ jnp.ones((128, 8)))))"
                 ], capture_output=True, text=True, timeout=deadline_s)
            return "PROBE_OK" in p.stdout
        except Exception:  # noqa: BLE001
            return False

    worker_ok = True
    win_imgs, win_info, win_bsz = images, im_info, b
    while (args.auto_levers and args.stage == "full" and args.batch == 16
           and win_bsz < 128 and levers_timeboxed(f"b{2 * win_bsz}")):
        try:
            if args.host_planes:
                imgs2 = Conv1Planes(
                    jnp.concatenate([win_imgs.planes, win_imgs.planes],
                                    axis=0), h, w)
            else:
                imgs2 = jnp.concatenate([win_imgs, win_imgs], axis=0)
            info2 = jnp.concatenate([win_info, win_info], axis=0)
            fps2x = time_program(winner, imgs2, info2, 2 * win_bsz)
            log(f"auto-levers: b{2 * win_bsz} {fps2x:.1f} fps vs "
                f"b{win_bsz} winner {fps:.1f}")
            if fps2x <= fps:
                break
            fps = fps2x
            config = config.replace(f"b{win_bsz}", f"b{2 * win_bsz}", 1)
            win_imgs, win_info, win_bsz = imgs2, info2, 2 * win_bsz
        except Exception as e:  # noqa: BLE001
            log(f"auto-levers: b{2 * win_bsz} arm failed ({e!r}); "
                f"keeping b{win_bsz}")
            worker_ok = worker_alive()
            if not worker_ok:
                log("auto-levers: worker health probe FAILED after the "
                    "arm failure — skipping remaining rungs to preserve "
                    "the captured number")
            break

    # --- host-planes rung: input-contract lever, bit-identical numerics
    # (tests/test_pallas_conv1.py, tests/test_serve.py) so no quality gate
    # applies — re-time the winner fed host-packed conv1 parity planes;
    # only the fps comparison decides.
    if (args.auto_levers and args.stage == "full" and not args.host_planes
            and worker_ok and levers_timeboxed("host-planes")):
        try:
            from i2vsgg_tpu.ops.pallas.conv1_kernel import (
                Conv1Planes as _C1P, pack_conv1_planes_np as _pack_np)
            imgs_np = np.asarray(win_imgs, np.float32)
            t0p = time.time()
            planes_np = _pack_np(imgs_np)
            dtp = time.time() - t0p
            log(f"auto-levers: host plane pack "
                f"{dtp * 1e3 / win_bsz:.2f} ms/frame (one core, loader-side)")
            planes_in = _C1P(jnp.asarray(planes_np), h, w)
            fps_p = time_program(winner, planes_in, win_info, win_bsz)
            log(f"auto-levers: host-planes {fps_p:.1f} fps vs {fps:.1f}")
            if fps_p > fps:
                fps, config = fps_p, config + " hostplanes"
        except Exception as e:  # noqa: BLE001
            log(f"auto-levers: host-planes arm failed ({e!r}); "
                "keeping current input contract")

    # --- bucketed-SGG rung: the two-program detection-count-bucketed
    # form (serve.make_bucketed_program; exactness pinned by
    # tests/test_serve.py). Per batch it fetches one scalar (the max
    # detection count) and runs the smallest covering SGG pair program.
    # Context for the expected verdict: the bench model is RANDOM-init,
    # so every detection slot scores >0 and the largest bucket always
    # runs — the rung measures the sync+split OVERHEAD, the serving
    # upside (sparse frames -> quadratically fewer pairs) only exists on
    # trained detectors (serve_video --buckets). Kept as a rung so the
    # decision is a measured number, not an assumption (round-4 verdict
    # item 6).
    if (args.auto_levers and args.stage == "full" and worker_ok
            and not args.host_planes and levers_timeboxed("bucketed")):
        try:
            from i2vsgg_tpu.serve import make_bucketed_program
            wm = win_parts["md"]
            bprog = make_bucketed_program(
                win_parts["det"], win_parts["det_params"],
                win_parts["sgg"], win_parts["sgg_params"], prd_vecs,
                win_parts["cfg"], buckets=(max(2, wm // 2), wm),
                max_per_class=8)
            fps_bk = time_program(bprog, win_imgs, win_info, win_bsz)
            log(f"auto-levers: bucketed {fps_bk:.1f} fps vs {fps:.1f} "
                "(random-weight bench saturates detection slots, so this "
                "prices the scalar-fetch sync; sparse-frame upside needs "
                "a trained detector)")
            if fps_bk > fps:
                fps, config = fps_bk, config + " bucketed"
        except Exception as e:  # noqa: BLE001
            log(f"auto-levers: bucketed arm failed ({e!r}); "
                "keeping the fused single-program form")

    emit()


# A converged parity checkpoint evaluates well above this on every metric
# the gates read (det mAP ~0.28, Stage-B pred mAP ~0.46). A broken eval —
# wrong --net leaving the trunk at random init (runs/capacity_ab_r64:
# both rows 0.0000), a clobbered eval dir, a stale checkpoint — lands
# near zero, and a "levered within tol of base" comparison between two
# broken arms would PASS vacuously. Any arm below this floor voids the
# gate instead.
_GATE_FLOOR = 0.15


def _gate_int8(path="runs/quant_ab/quant_ab.json", tol=0.01):
    """int8 fc towers pass when the Stage-B metric A/B on a trained
    checkpoint (tools/quant_ab.py) shows int8 within `tol` of fp32."""
    import os
    if not os.path.exists(path):
        return False, f"NOT RUN ({path} missing)"
    try:
        with open(path) as f:
            j = json.load(f)
        d = j["delta"]
        base = j.get("fp32", {}).get("pred_mAP", 1.0)
        if base < _GATE_FLOOR:
            return False, (f"VOID (fp32 arm pred_mAP {base:.4f} below "
                           f"sanity floor {_GATE_FLOOR} — broken eval?)")
        ok = d["pred_mAP"] >= -tol and d["top1_acc"] >= -tol
        return ok, (f"{'PASS' if ok else 'FAIL'} "
                    f"(d pred_mAP {d['pred_mAP']:+.4f}, "
                    f"d top1 {d['top1_acc']:+.4f})")
    except Exception as e:  # noqa: BLE001
        return False, f"unreadable ({e!r})"


def _gate_int8trunk(path="runs/quant_trunk_ab", tol=0.01, net="res101"):
    """int8 trunk convs pass when a converged-checkpoint detection eval
    A/B (tools/quant_trunk_ab.py) shows int8 within `tol` mAP of the fp
    trunk on every evaluated dataset. `path` is a directory of A/B
    artifacts (one per quantization scope — the round-4 FULL-trunk A/B
    failed at -0.018 target mAP, so layer-scoped variants are gated in
    their own files) or a single artifact file. Returns (ok, why,
    env_mode): env_mode is the I2VSGG_INT8_TRUNK value of the
    widest-scope PASSING variant ("1" = full trunk, "1:layer3" = scoped
    — real int8 convs; the gates run in 'sim', pinned equivalent by
    tests/test_int8_trunk.py), or None. Among otherwise-equal PASSes,
    an artifact whose recorded "net" matches the bench backbone (`net`)
    outranks — its act-scale calibration covers every block of the
    bench model, where a shallower net's calibration forces the
    unit-scale fallback (round-4 verdict item 2)."""
    import glob
    import os
    files = ([path] if path.endswith(".json")
             else sorted(glob.glob(os.path.join(path, "*.json"))))
    files = [p for p in files if os.path.exists(p)]
    if not files:
        return False, f"NOT RUN ({path} missing/empty)", None, None
    best = None  # (rank, env_mode, acts_path)
    msgs = []
    for p in files:
        name = os.path.basename(p)
        try:
            with open(p) as f:
                d = json.load(f)
            delta = d.get("delta")
            if not delta:
                msgs.append(f"{name} incomplete (no delta — A/B still "
                            "running?)")
                continue
            fp_maps = [v.get("mAP", 1.0)
                       for v in d.get("fp", {}).values()]
            if any(m < _GATE_FLOOR for m in fp_maps):
                msgs.append(f"{name} VOID (fp arm mAP below sanity "
                            f"floor {_GATE_FLOOR})")
                continue
            ok = all(v >= -tol for v in delta.values())
            scope = d.get("mode", "sim").partition(":")[2]
            msgs.append(f"{name}[{d.get('mode', 'sim')}"
                        + ("+static" if d.get("act_scales") else "") + "] "
                        f"{'PASS' if ok else 'FAIL'} ("
                        + ", ".join(f"d mAP[{k}] {v:+.4f}"
                                    for k, v in delta.items()) + ")")
            if ok:
                toks = [t for t in scope.split(",") if t]
                layers = (99 if not scope
                          else len([t for t in toks
                                    if not t.startswith("@")]))
                # ranking is MEASURED, not assumed (PERF.md round 4):
                # '@3x3' scopes beat their full-layer parents on the live
                # chip (int8 1x1 convs are slower than bf16), so k3
                # variants outrank; among equals prefer more layers, and
                # static act scales over dynamic (+0.08 ms, and the
                # precalibrated form is deployment-correct)
                acts = d.get("act_scales") or None
                if acts and not os.path.exists(acts):
                    acts = None
                rank = ("@3x3" in toks, layers, acts is not None,
                        d.get("net") == net)
                env = "1" + (f":{scope}" if scope else "")
                if best is None or rank > best[0]:
                    best = (rank, env, acts)
        except Exception as e:  # noqa: BLE001
            msgs.append(f"{name} unreadable ({e!r})")
    why = "; ".join(msgs)
    return ((True, why, best[1], best[2]) if best
            else (False, why, None, None))


_RPN_ROWS = ((256, 32), (384, 48), (512, 64),
             (512, 128), (768, 128),
             (1024, 128))  # smallest capacity first. The (·, 128) rows
# cut only pre-NMS / det: at 600-scale the binding constraint is the
# POST-NMS top-N (rpn64 lost 0.069 mAP at pre512 AND pre1024 — the
# pre-NMS pool showed zero sensitivity), so pre-only cuts are the
# remaining capacity lever; (1024, 128) is the det8-only fallback.


def _gate_rpn_capacity(args,
                       paths=("runs/capacity_ab_r101_600/capacity_ab.json",
                              "runs/capacity_ab_r101/capacity_ab.json",
                              "runs/capacity_ab_r64b/capacity_ab.json",
                              "runs/capacity_ab_r64/capacity_ab.json"),
                       tol=0.01, rows=_RPN_ROWS):
    """Pick the smallest gated serving rpn capacity. A candidate row
    pre{P}_rpn{N}_det8 passes when a converged-checkpoint capacity A/B
    artifact (tools/capacity_ab.py --ckpt) shows it within `tol` mAP of
    the pre1024_rpn128_det16 reference row in the SAME artifact (the
    quality bar is the FULL default capacity, not a softer det8
    baseline; a converged ckpt evaluates well above _GATE_FLOOR, ~0
    means the eval itself was broken).

    `paths` is ordered by DEPLOYMENT REPRESENTATIVENESS (600-px
    scale-matched res101 arm first, then the 240-scale res101 arm, then
    the res50 history) and the FIRST artifact with a valid base row and
    at least one candidate row is AUTHORITATIVE: its smallest passing
    row wins, and if every candidate row it carries FAILs, the gate
    fails — a later (less representative) artifact must NOT override a
    scale-matched FAIL with its own pass (round 5: rpn32 passes on the
    240-px corpus but LOSES 0.107 mAP on the 600-px corpus the bench
    actually serves). Artifacts lacking candidate rows entirely only
    add notes and fall through.

    Live-chip value: the rpn (+5.7 ms/32f) and det-head (+11.6) dissect
    lines are roi-proportional (PERF.md round 4), so each halving of the
    roi count returns real budget; the (1024, 128) row is the
    det8-only cut for when no rpn capacity cut survives at scale."""
    import os
    notes = []
    for path in paths:
        if not os.path.exists(path):
            notes.append(f"{path} missing")
            continue
        try:
            with open(path) as f:
                r = json.load(f)["results"]
        except Exception as e:  # noqa: BLE001
            notes.append(f"{path} unreadable ({e!r})")
            continue
        kbase = f"pre{args.pre_nms}_rpn{args.rpn_topn}_det16"
        if kbase not in r:
            notes.append(f"{path}: {kbase} missing")
            continue
        base = r[kbase]["mAP"]
        if base < _GATE_FLOOR:
            notes.append(f"{path}: VOID (base row mAP {base:.4f} below "
                         f"sanity floor {_GATE_FLOOR} — broken eval?)")
            continue
        seen_candidate = False
        for pre, topn in rows:
            k = f"pre{pre}_rpn{topn}_det8"
            if k not in r:
                continue
            seen_candidate = True
            if r[k]["mAP"] >= base - tol:
                return True, (f"PASS (rpn{topn}/pre{pre}/det8 mAP "
                              f"{r[k]['mAP']:.4f} vs default {base:.4f}; "
                              f"{path})"), pre, topn
            notes.append(f"{k} FAIL ({r[k]['mAP']:.4f} vs {base:.4f})")
        if seen_candidate:
            # authoritative artifact: every candidate row it carries
            # failed — no capacity cut ships
            return False, ("FAIL (" + "; ".join(notes)
                           + f" — authoritative artifact {path})"), 512, 64
        notes.append(f"{path}: no candidate rows")
    why = ("FAIL/NOT RUN (" + "; ".join(notes) + ")") if notes \
        else "NOT RUN (no artifacts)"
    return False, why, 512, 64


def _gate_rpn64(args, path="runs/capacity_ab_r64/capacity_ab.json",
                tol=0.01):
    """Back-compat single-row form of `_gate_rpn_capacity` (rpn64/pre512
    against one artifact) — kept because tests pin its contract."""
    ok, why, _, _ = _gate_rpn_capacity(args, paths=(path,), tol=tol,
                                       rows=((512, 64),))
    return ok, why


def _gate_det8(args, path="runs/capacity_ab_r4/capacity_ab.json", tol=0.01):
    """max_det 16->8 passes when the converged-checkpoint capacity A/B
    (tools/capacity_ab.py --ckpt, advisor r3 finding) shows det8 within
    `tol` mAP of det16 at the bench's serving capacity row."""
    import os
    if not os.path.exists(path):
        return False, f"NOT RUN ({path} missing)"
    try:
        with open(path) as f:
            r = json.load(f)["results"]
        k8 = f"pre{args.pre_nms}_rpn{args.rpn_topn}_det8"
        k16 = f"pre{args.pre_nms}_rpn{args.rpn_topn}_det16"
        if k8 not in r or k16 not in r:
            return False, f"rows missing ({k8}/{k16})"
        if r[k16]["mAP"] < _GATE_FLOOR:
            return False, (f"VOID (det16 row mAP {r[k16]['mAP']:.4f} "
                           f"below sanity floor {_GATE_FLOOR} — "
                           "broken eval?)")
        ok = r[k8]["mAP"] >= r[k16]["mAP"] - tol
        return ok, (f"{'PASS' if ok else 'FAIL'} "
                    f"(mAP det8 {r[k8]['mAP']:.4f} vs "
                    f"det16 {r[k16]['mAP']:.4f})")
    except Exception as e:  # noqa: BLE001
        return False, f"unreadable ({e!r})"


if __name__ == "__main__":
    main()
