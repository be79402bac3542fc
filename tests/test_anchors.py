"""Golden-value tests for anchor generation.

The expected 9-anchor table is the verified runtime output of the reference's
``generate_anchors()`` (``lib/model/rpn/generate_anchors.py:45-105``). Note
the comment block in that file (`:12-37`) is the original MATLAB table, which
is 1-indexed and therefore offset by exactly (-1,-1,-1,-1) from what the
Python code actually produces and trains with; we match the code, not the
comment.
"""

import numpy as np

from i2vsgg_tpu.ops.anchors import generate_anchors, shifted_anchors

GOLDEN_ANCHORS = np.array([
    [-84., -40., 99., 55.],
    [-176., -88., 191., 103.],
    [-360., -184., 375., 199.],
    [-56., -56., 71., 71.],
    [-120., -120., 135., 135.],
    [-248., -248., 263., 263.],
    [-36., -80., 51., 95.],
    [-80., -168., 95., 183.],
    [-168., -344., 183., 359.],
])


def test_default_anchors_match_golden():
    np.testing.assert_array_equal(generate_anchors(), GOLDEN_ANCHORS)


def test_anchor_count_scales():
    a = generate_anchors(ratios=(0.5, 1, 2), scales=(4, 8, 16, 32))
    assert a.shape == (12, 4)


def test_shifted_anchors_layout():
    base = generate_anchors()
    out = np.asarray(shifted_anchors(2, 3, 16, base))
    assert out.shape == (2 * 3 * 9, 4)
    # first cell = base anchors
    np.testing.assert_allclose(out[:9], GOLDEN_ANCHORS)
    # cell (0, 1) shifted by stride in x
    np.testing.assert_allclose(out[9:18], GOLDEN_ANCHORS + [16, 0, 16, 0])
    # cell (1, 0) shifted by stride in y: index (h=1, w=0) -> flat (1*3+0)*9
    np.testing.assert_allclose(out[27:36], GOLDEN_ANCHORS + [0, 16, 0, 16])
