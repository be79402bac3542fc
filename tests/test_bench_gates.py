"""The driver's round-end `python bench.py` auto-enables serving levers
ONLY when their committed quality gates pass (bench.py `_gate_int8` /
`_gate_det8`). These gates decide what config the recorded headline
number runs — pin their artifact parsing and pass/fail thresholds."""

import argparse
import importlib.util
import json
import os

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(pre_nms=1024, rpn_topn=128):
    return argparse.Namespace(pre_nms=pre_nms, rpn_topn=rpn_topn)


def test_int8_gate_passes_within_tol(bench, tmp_path):
    p = tmp_path / "quant_ab.json"
    p.write_text(json.dumps(
        {"delta": {"pred_mAP": -0.004, "top1_acc": 0.0}}))
    ok, why = bench._gate_int8(str(p))
    assert ok and "PASS" in why


def test_int8_gate_fails_on_regression(bench, tmp_path):
    p = tmp_path / "quant_ab.json"
    p.write_text(json.dumps(
        {"delta": {"pred_mAP": -0.02, "top1_acc": 0.0}}))
    ok, why = bench._gate_int8(str(p))
    assert not ok and "FAIL" in why


def test_int8_gate_missing_artifact_is_not_a_pass(bench, tmp_path):
    ok, why = bench._gate_int8(str(tmp_path / "nope.json"))
    assert not ok and "NOT RUN" in why


def test_int8_gate_unreadable_artifact_is_not_a_pass(bench, tmp_path):
    p = tmp_path / "quant_ab.json"
    p.write_text("{broken")
    ok, _ = bench._gate_int8(str(p))
    assert not ok


def test_det8_gate_compares_the_benchs_own_capacity_row(bench, tmp_path):
    p = tmp_path / "capacity_ab.json"
    p.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre1024_rpn128_det8": {"mAP": 0.245},
        # a would-pass row at a DIFFERENT capacity must not be used
        "pre6000_rpn300_det8": {"mAP": 0.9},
    }}))
    ok, why = bench._gate_det8(_args(), str(p))
    assert ok and "PASS" in why
    ok, why = bench._gate_det8(_args(pre_nms=6000, rpn_topn=300), str(p))
    assert not ok and "rows missing" in why  # no det16 row at 6000/300


def test_det8_gate_fails_on_map_drop(bench, tmp_path):
    p = tmp_path / "capacity_ab.json"
    p.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre1024_rpn128_det8": {"mAP": 0.230},
    }}))
    ok, why = bench._gate_det8(_args(), str(p))
    assert not ok and "FAIL" in why


def test_det8_gate_missing_rows_or_file(bench, tmp_path):
    p = tmp_path / "capacity_ab.json"
    p.write_text(json.dumps({"results": {}}))
    assert not bench._gate_det8(_args(), str(p))[0]
    assert not bench._gate_det8(_args(), str(tmp_path / "nope.json"))[0]


def test_int8trunk_gate_passes_within_tol(bench, tmp_path):
    p = tmp_path / "quant_trunk_ab.json"
    p.write_text(json.dumps({"delta": {"MVRD": -0.004, "MVidVRD": 0.002}}))
    ok, why, env, acts = bench._gate_int8trunk(str(p))
    assert ok and "PASS" in why and env == "1"


def test_int8trunk_gate_fails_on_any_dataset_regression(bench, tmp_path):
    p = tmp_path / "quant_trunk_ab.json"
    p.write_text(json.dumps({"delta": {"MVRD": 0.001, "MVidVRD": -0.03}}))
    ok, why, env, acts = bench._gate_int8trunk(str(p))
    assert not ok and "FAIL" in why and env is None


def test_int8trunk_gate_missing_or_partial_is_not_a_pass(bench, tmp_path):
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path / "nope.json"))
    assert not ok and "NOT RUN" in why and env is None
    p = tmp_path / "quant_trunk_ab.json"
    # quant_trunk_ab.py writes the artifact incrementally; no "delta" key
    # means the int8 arm hasn't finished — must not gate a lever on it
    p.write_text(json.dumps({"ckpt": "x", "fp": {"MVRD": {"mAP": 0.3}}}))
    ok, why, env, acts = bench._gate_int8trunk(str(p))
    assert not ok and "incomplete" in why and env is None


def test_int8trunk_gate_scans_dir_and_picks_widest_passing_scope(
        bench, tmp_path):
    """The round-4 full-trunk A/B failed; layer-scoped re-gates live in
    sibling files. The gate must scan the directory, skip FAILing
    variants, and return the widest PASSING scope's env mode (real-int8
    kind '1', scope preserved)."""
    (tmp_path / "quant_trunk_ab.json").write_text(json.dumps(
        {"mode": "sim", "delta": {"MVRD": -0.007, "MVidVRD": -0.018}}))
    (tmp_path / "quant_trunk_l3.json").write_text(json.dumps(
        {"mode": "sim:layer3", "delta": {"MVRD": -0.002, "MVidVRD": -0.004}}))
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path))
    assert ok and env == "1:layer3"
    assert "FAIL" in why and "PASS" in why  # both variants reported
    # a passing wider scope must win over the narrower one
    (tmp_path / "quant_trunk_l23.json").write_text(json.dumps(
        {"mode": "sim:layer2,layer3",
         "delta": {"MVRD": -0.001, "MVidVRD": -0.002}}))
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path))
    assert ok and env == "1:layer2,layer3"
    # ... and a passing FULL-trunk artifact over any scoped one
    (tmp_path / "quant_trunk_ab.json").write_text(json.dumps(
        {"mode": "sim", "delta": {"MVRD": -0.001, "MVidVRD": -0.001}}))
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path))
    assert ok and env == "1"


def test_int8trunk_gate_empty_dir_is_not_run(bench, tmp_path):
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path))
    assert not ok and "NOT RUN" in why and env is None

def test_int8trunk_gate_prefers_k3_scope_and_static_acts(bench, tmp_path):
    """Ranking is MEASURED (PERF.md round 4): '@3x3' scopes outrank their
    full-layer parents (int8 1x1 convs are slower than bf16 on-chip), and
    a static-act-scales artifact outranks its dynamic twin. The acts path
    is returned only when the calibration file actually exists."""
    (tmp_path / "l34.json").write_text(json.dumps(
        {"mode": "sim:layer3,layer4",
         "delta": {"MVRD": -0.001, "MVidVRD": -0.003}}))
    (tmp_path / "l34k3.json").write_text(json.dumps(
        {"mode": "sim:layer3,layer4,@3x3",
         "delta": {"MVRD": -0.001, "MVidVRD": -0.002}}))
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path))
    assert ok and env == "1:layer3,layer4,@3x3" and acts is None

    # static-acts variant wins over dynamic at the same scope — but only
    # while its calibration JSON exists
    calib = tmp_path / "act_scales.json"
    calib.write_text(json.dumps({"scales": {}}))
    (tmp_path / "l34k3s.json").write_text(json.dumps(
        {"mode": "sim:layer3,layer4,@3x3", "act_scales": str(calib),
         "delta": {"MVRD": -0.001, "MVidVRD": -0.002}}))
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path))
    assert ok and env == "1:layer3,layer4,@3x3" and acts == str(calib)
    calib.unlink()
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path))
    assert ok and acts is None


def test_int8trunk_gate_prefers_matching_net(bench, tmp_path):
    """Among equal-rank PASSes, the artifact whose "net" matches the
    bench backbone wins — its act-scale calibration covers every block
    of the bench model, where a shallower net's calibration forces the
    unit-scale fallback (round-4 verdict item 2)."""
    c50 = tmp_path / "acts50.json"
    c101 = tmp_path / "acts101.json"
    c50.write_text(json.dumps({"scales": {}}))
    c101.write_text(json.dumps({"scales": {}}))
    # res50 artifact sorts FIRST alphabetically — without net ranking the
    # tie would keep it and bench would quantize with a res50 calibration
    (tmp_path / "a_res50.json").write_text(json.dumps(
        {"mode": "sim:layer3,layer4,@3x3", "net": "res50",
         "act_scales": str(c50),
         "delta": {"MVRD": 0.0, "MVidVRD": 0.0}}))
    (tmp_path / "b_res101.json").write_text(json.dumps(
        {"mode": "sim:layer3,layer4,@3x3", "net": "res101",
         "act_scales": str(c101),
         "delta": {"MVRD": 0.0, "MVidVRD": 0.0}}))
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path), net="res101")
    assert ok and env == "1:layer3,layer4,@3x3" and acts == str(c101)
    # with the res101 artifact gone, the res50 gate still serves
    (tmp_path / "b_res101.json").unlink()
    ok, why, env, acts = bench._gate_int8trunk(str(tmp_path), net="res101")
    assert ok and acts == str(c50)


def test_rpn64_gate_compares_against_full_default_capacity(bench, tmp_path):
    p = tmp_path / "capacity_ab.json"
    p.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre512_rpn64_det8": {"mAP": 0.244},
    }}))
    ok, why = bench._gate_rpn64(_args(), str(p))
    assert ok and "PASS" in why
    p.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre512_rpn64_det8": {"mAP": 0.230},
    }}))
    ok, why = bench._gate_rpn64(_args(), str(p))
    assert not ok and "FAIL" in why
    p.write_text(json.dumps({"results": {
        "pre512_rpn64_det8": {"mAP": 0.244}}}))
    assert not bench._gate_rpn64(_args(), str(p))[0]
    assert not bench._gate_rpn64(_args(), str(tmp_path / "no.json"))[0]


def test_rpn_capacity_gate_picks_smallest_passing_row(bench, tmp_path):
    a = tmp_path / "a.json"
    a.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre256_rpn32_det8": {"mAP": 0.230},   # fails tol 0.01
        "pre384_rpn48_det8": {"mAP": 0.243},   # smallest PASSING
        "pre512_rpn64_det8": {"mAP": 0.249},
    }}))
    ok, why, pre, topn = bench._gate_rpn_capacity(_args(), paths=(str(a),))
    assert ok and (pre, topn) == (384, 48) and "PASS" in why

    # the failing rpn32 row is recorded in the why string of a
    # no-pass artifact set
    b = tmp_path / "b.json"
    b.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre256_rpn32_det8": {"mAP": 0.200},
    }}))
    ok, why, pre, topn = bench._gate_rpn_capacity(_args(), paths=(str(b),))
    assert not ok and "FAIL" in why and (pre, topn) == (512, 64)


def test_rpn_capacity_gate_first_artifact_is_authoritative(bench,
                                                           tmp_path):
    """paths are ordered by deployment representativeness; the FIRST
    artifact with a valid base row and candidate rows decides. A
    scale-matched FAIL must not be overridden by a less representative
    artifact's pass (round 5: rpn32 passed the 240-px corpus but lost
    0.107 mAP on the 600-px corpus the bench serves)."""
    a = tmp_path / "a.json"   # most representative: only rpn64 passes
    a.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre256_rpn32_det8": {"mAP": 0.150},   # FAILs here
        "pre512_rpn64_det8": {"mAP": 0.249},
    }}))
    b = tmp_path / "b.json"   # older/less representative: rpn32 passes
    b.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre256_rpn32_det8": {"mAP": 0.246},
    }}))
    ok, why, pre, topn = bench._gate_rpn_capacity(
        _args(), paths=(str(a), str(b)))
    assert ok and (pre, topn) == (512, 64) and str(a) in why

    # every candidate row of the authoritative artifact fails -> the
    # gate FAILS; the later artifact's pass must not resurrect the cut
    a.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre256_rpn32_det8": {"mAP": 0.150},
        "pre512_rpn64_det8": {"mAP": 0.200},
    }}))
    ok, why, pre, topn = bench._gate_rpn_capacity(
        _args(), paths=(str(a), str(b)))
    assert not ok and "authoritative" in why

    # a VOID base row (broken eval) poisons only its own artifact
    a.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.001},
        "pre256_rpn32_det8": {"mAP": 0.001},
    }}))
    ok, why, pre, topn = bench._gate_rpn_capacity(
        _args(), paths=(str(a), str(b)))
    assert ok and (pre, topn) == (256, 32) and "PASS" in why

    # an artifact with a base row but NO candidate rows only adds a
    # note and falls through
    a.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
    }}))
    ok, why, pre, topn = bench._gate_rpn_capacity(
        _args(), paths=(str(a), str(b)))
    assert ok and (pre, topn) == (256, 32)

    # missing artifacts alone -> not run, default capacity returned
    ok, why, pre, topn = bench._gate_rpn_capacity(
        _args(), paths=(str(tmp_path / "no.json"),))
    assert not ok and (pre, topn) == (512, 64)


def test_rpn_capacity_gate_det8_only_row(bench, tmp_path):
    """When no rpn capacity cut survives, the (1024, 128) det8-only row
    can still cash the pair-tower cut at full proposal capacity."""
    a = tmp_path / "a.json"
    a.write_text(json.dumps({"results": {
        "pre1024_rpn128_det16": {"mAP": 0.250},
        "pre256_rpn32_det8": {"mAP": 0.150},
        "pre512_rpn64_det8": {"mAP": 0.200},
        "pre1024_rpn128_det8": {"mAP": 0.248},
    }}))
    ok, why, pre, topn = bench._gate_rpn_capacity(_args(), paths=(str(a),))
    assert ok and (pre, topn) == (1024, 128)
