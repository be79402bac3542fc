#!/usr/bin/env python
"""Deterministically (re)train one reference-arm Stage-A checkpoint.

The parity campaign's converged checkpoints live under gitignored
``runs/*/res50/`` dirs and are lost on VM resets; every capacity /
quantization quality gate evaluates against
``runs/parity_r3/res50/MVRD/session_ref1/672`` (mAP 0.2843410029065319).
This tool rebuilds exactly that artifact chain without touching the
committed ``parity_a.json`` results (running ``parity_run.py
--skip_eval`` would overwrite the recorded mAP tables):

1. regenerate the round-3 parity dataset bit-identically
   (``make_data`` is seeded; 300 source stills at split 0.16 = the
   documented 48 train / 252 held-out, 20 target videos x 24 frames at
   split 0.5 — PARITY_RUNS.md setup),
2. rerun ``train_reference`` (torch CPU, seeded) at the campaign's
   672 steps with the campaign's 288/480/576 snapshots.

The follow-up capacity A/B's full-capacity base row doubles as the
determinism check: it must reproduce the committed 0.2843410029065319
(round-4 postmortem; scripts/lanes/retrain_ref1.sh runs both).

Reference behavior being retrained: the styleD detector + DA losses of
/root/reference/trainval_net_instance_styleD_bilinear.py:238-341 as
driven by i2vsgg_tpu/parity/refshim.py (the reference's own module
code), shared-init + shared-data-order with our arm.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_r3")
    ap.add_argument("--data", default="",
                    help="data root (default <out>/data); regenerated "
                         "bit-identically when absent")
    ap.add_argument("--steps", type=int, default=672)
    ap.add_argument("--seed", type=int, default=1,
                    help="arm seed (ref_s1 is the best converged detector "
                         "in the repo — every round-4 gate evaluates it)")
    ap.add_argument("--snaps", default="288,480,576")
    args = ap.parse_args(argv)

    import jax
    # identical runtime config to parity_run.main (tools/parity_run.py):
    # CPU platform, persistent compile cache, fp32 matmuls for arm parity
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "float32")

    from tools.parity_run import train_reference
    from tools.train_gate_arm import ensure_parity_data

    data_root = args.data or os.path.join(args.out, "data")
    # regenerates bit-identically when absent; fails fast on a PARTIAL
    # data dir (advisor r4: MVRD surviving a VM reset while MVidVRD /
    # source_so_prior.pkl are gone must not silently train on a
    # mismatched mixture)
    ensure_parity_data(data_root)
    os.environ["I2VSGG_DATA_ROOT"] = data_root

    snaps = tuple(int(s) for s in args.snaps.split(",") if s)
    ckpts = train_reference(data_root, args.out, args.steps,
                            seed=args.seed, snap_steps=snaps)
    print({s: p for s, p in sorted(ckpts.items())}, flush=True)
    return ckpts


if __name__ == "__main__":
    main()
