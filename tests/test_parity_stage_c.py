"""Stage-C golden parity vs the reference's OWN host code.

Round-4 verdict item 3: ``video/{association,metrics}.py`` were verified
only by our own unit tests; the gap-fill window logic
(``lib/utils.py:482-506``) and greedy association
(``lib/utils.py:134-182``) are quirky enough that a randomized A/B
against the actual reference functions is warranted. This module
imports ``/root/reference/lib/utils.py`` directly (its import-time
``json.load(open("/media/sda1/..."))`` hardcoded-path defect —
SURVEY.md §8.4 — is satisfied by a scoped ``open`` patch) and pins
tuple-for-tuple equality on randomized frame-relation structures
covering the edge cases the verdict names: all-empty prefixes, isolated
islands, empty videos, score ties, boundary windows.

Input schema (both arms):
  frame_relations[vid] = [[frame_idx, pred_list], ...]
  pred_list item       = [conf, [s_cid, pid, o_cid],
                          [sub_box, obj_box], rel_idx]

Kept quirks vs deliberate differences:
* the reference association MUTATES its input in place (gap-fill
  aliases pred lists) — each arm gets a deepcopy;
* videos shorter than ~2*invalid_num frames make the REFERENCE index
  out of bounds (``lib/utils.py:497`` end=i+invalid_num unclamped);
  ours clamps — the A/B uses >=12-frame videos (the reference's own
  videos are hundreds of frames, so the quirk is unreachable there).
"""

from __future__ import annotations

import builtins
import copy
import importlib.util
import io
import json

import numpy as np
import pytest

OBJECTS = [f"obj{i}" for i in range(12)]
PREDICATES = [f"pred{i}" for i in range(7)]
REF_UTILS = "/root/reference/lib/utils.py"


@pytest.fixture(scope="module")
def ref_utils():
    import os
    if not os.path.exists(REF_UTILS):
        pytest.skip("reference checkout not present")
    pytest.importorskip("scipy")
    real_open = builtins.open

    def fake_open(path, *a, **k):
        if isinstance(path, str) and path.startswith("/media/sda1"):
            data = OBJECTS if "objects.json" in path else PREDICATES
            return io.StringIO(json.dumps(data))
        return real_open(path, *a, **k)

    builtins.open = fake_open
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_stage_c_utils", REF_UTILS)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        builtins.open = real_open
    return mod


def _rand_box(rng, lo=0.0, hi=180.0, wmin=8, wmax=60):
    x1 = float(rng.uniform(lo, hi))
    y1 = float(rng.uniform(lo, hi))
    w = float(rng.uniform(wmin, wmax))
    h = float(rng.uniform(wmin, wmax))
    return [round(x1, 2), round(y1, 2), round(x1 + w, 2), round(y1 + h, 2)]


def _walk(rng, box, step=6.0):
    dx, dy = rng.uniform(-step, step, 2)
    return [round(v + d, 2) for v, d in zip(box, [dx, dy, dx, dy])]


def random_frame_relations(rng, n_vids=5, n_frames=24):
    """Random per-frame relation dumps with the verdict's edge cases.

    Tracks move by small steps so frame-to-frame IoU straddles the 0.5
    merge threshold across a run (exercising both_overlap), runs start
    and end mid-video (exercising fstart==fend adjacency), confidences
    collide (ties in the per-frame sort AND in mean_confs), and empty
    frames appear in prefixes, suffixes, and isolated islands
    (exercising every gap-fill branch of lib/utils.py:482-506).
    """
    out = {}
    for v in range(n_vids):
        vid = f"vid{v:02d}"
        tracks = []
        for _ in range(int(rng.randint(2, 7))):
            start = int(rng.randint(0, n_frames - 4))
            length = int(rng.randint(3, n_frames - start + 1))
            tracks.append({
                "trip": [int(rng.randint(len(OBJECTS))),
                         int(rng.randint(len(PREDICATES))),
                         int(rng.randint(len(OBJECTS)))],
                "span": (start, start + length),
                "sbox": _rand_box(rng), "obox": _rand_box(rng),
                # plenty of duplicate confidences -> tie-order coverage
                "conf": round(float(rng.choice([0.3, 0.5, 0.5, 0.7,
                                                rng.uniform(0.1, 1.0)])), 3),
            })
        # empty-frame pattern: prefix, suffix, and a mid-video island
        empty = set()
        if rng.rand() < 0.7:
            empty |= set(range(int(rng.randint(0, 6))))          # prefix
        if rng.rand() < 0.7:
            empty |= set(range(n_frames - int(rng.randint(0, 6)),
                               n_frames))                        # suffix
        if rng.rand() < 0.7:
            c = int(rng.randint(6, n_frames - 6))
            empty |= set(range(c - int(rng.randint(1, 6)),
                               c + int(rng.randint(1, 6))))      # island
        frames = []
        for i in range(n_frames):
            preds = []
            if i not in empty:
                for t in tracks:
                    if t["span"][0] <= i < t["span"][1]:
                        t["sbox"] = _walk(rng, t["sbox"])
                        t["obox"] = _walk(rng, t["obox"])
                        preds.append([t["conf"], list(t["trip"]),
                                      [list(t["sbox"]), list(t["obox"])],
                                      int(rng.randint(0, 50))])
            frames.append([i, preds])
        out[vid] = frames
    # one fully-empty video: the reference prints "<vid> is empty!!!"
    # and skips it
    out["vid_empty"] = [[i, []] for i in range(n_frames)]
    return out


def _ours_association(fr):
    from i2vsgg_tpu.video.association import association
    return association(fr, objects=OBJECTS, predicates=PREDICATES)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_association_golden_vs_reference(ref_utils, seed):
    """association + gap-fill + greedy linking, tuple-for-tuple.
    [lib/utils.py:461-526, :134-182]"""
    rng = np.random.RandomState(100 + seed)
    fr = random_frame_relations(rng)
    ref_out = ref_utils.association(copy.deepcopy(fr))
    our_out = _ours_association(copy.deepcopy(fr))
    assert set(ref_out.keys()) == set(our_out.keys())
    for vid in ref_out:
        assert len(ref_out[vid]) == len(our_out[vid]), vid
        for r_ref, r_our in zip(ref_out[vid], our_out[vid]):
            assert r_ref["triplet"] == r_our["triplet"], vid
            assert r_ref["duration"] == r_our["duration"], vid
            assert r_ref["score"] == pytest.approx(r_our["score"],
                                                   abs=1e-12), vid
            assert r_ref["rel_idex"] == r_our["rel_idex"], vid
            np.testing.assert_allclose(
                np.asarray(r_ref["sub_traj"], np.float64),
                np.asarray(r_our["sub_traj"], np.float64), atol=0), vid
            np.testing.assert_allclose(
                np.asarray(r_ref["obj_traj"], np.float64),
                np.asarray(r_our["obj_traj"], np.float64), atol=0), vid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_evaluate_golden_vs_reference(ref_utils, seed, tmp_path):
    """evaluate (vIoU detection mAP/recall + tagging precision),
    value-for-value. [lib/utils.py:375-458] GT comes from one
    association output; predictions from a jittered second pass, so
    hits, misses, triplet mismatches, and tie scores all occur."""
    rng = np.random.RandomState(200 + seed)
    fr = random_frame_relations(rng, n_vids=4)
    gt = _ours_association(copy.deepcopy(fr))
    gt = {vid: rels for vid, rels in gt.items() if rels}
    if not gt:
        pytest.skip("degenerate draw — no GT relations")

    # predictions: jittered boxes + rescored + a few dropped/extra
    pred = copy.deepcopy(gt)
    for rels in pred.values():
        for r in rels:
            r["score"] = round(float(rng.uniform(0.05, 1.0)), 3)
            jx = float(rng.uniform(-12, 12))
            r["sub_traj"] = [[b[0] + jx, b[1], b[2] + jx, b[3]]
                             for b in r["sub_traj"]]
            if rng.rand() < 0.3:  # wrong triplet arm
                r["triplet"] = [OBJECTS[rng.randint(len(OBJECTS))],
                                r["triplet"][1], r["triplet"][2]]
        if rels and rng.rand() < 0.5:
            rels.append(copy.deepcopy(rels[0]))  # duplicate detection

    gt_p = tmp_path / "gt.json"
    gt_p.write_text(json.dumps(gt))
    ref_map, ref_rec, ref_prec = ref_utils.evaluate(
        copy.deepcopy(pred), gt=str(gt_p))
    from i2vsgg_tpu.video.metrics import evaluate
    our_map, our_rec, our_prec = evaluate(copy.deepcopy(pred), str(gt_p),
                                          verbose=False)
    assert our_map == pytest.approx(ref_map, abs=1e-12)
    for n in (50, 100):
        assert our_rec[n] == pytest.approx(float(ref_rec[n]), abs=1e-12)
    for n in (1, 5, 10):
        assert our_prec[n] == pytest.approx(float(ref_prec[n]), abs=1e-12)
