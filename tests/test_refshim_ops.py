"""The refshim's fast separable RoIAlign must match the direct gather form
of the reference CUDA kernel math (``roi_align_kernel.cu:15-73``) — the
gather form is the oracle; the separable form is what parity training runs
use (it is ~100x lighter in memory traffic on CPU)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from i2vsgg_tpu.parity.refshim import install_reference_shims


def _fns():
    import sys
    install_reference_shims()
    m = sys.modules["model.roi_align.modules.roi_align"]
    return m.roi_align_forward, m.roi_align_forward_gather


@pytest.mark.parametrize("ah,aw", [(8, 8), (7, 7)])
def test_separable_matches_gather(ah, aw):
    fast, oracle = _fns()
    rng = np.random.RandomState(0)
    f = torch.from_numpy(rng.randn(2, 16, 15, 20).astype(np.float32))
    # rois spanning in-bounds, clipped-edge, out-of-bounds, degenerate
    rois = torch.tensor([
        [0, 10, 20, 200, 150],
        [0, 0, 0, 319, 239],
        [1, -40, -40, 80, 60],          # partially outside
        [1, 300, 220, 460, 330],        # extends past the image
        [0, 50, 50, 50, 50],            # degenerate box
        [1, 5, 7, 90, 33],
    ], dtype=torch.float32)
    a = fast(f, rois, ah, aw, 1.0 / 16.0)
    b = oracle(f, rois, ah, aw, 1.0 / 16.0)
    np.testing.assert_allclose(a.numpy(), b.numpy(), rtol=1e-5, atol=1e-5)


def test_separable_gradients_flow():
    fast, _ = _fns()
    f = torch.randn(1, 4, 10, 12, requires_grad=True)
    rois = torch.tensor([[0, 8, 8, 100, 100]], dtype=torch.float32)
    out = fast(f, rois, 8, 8, 1.0 / 16.0)
    out.sum().backward()
    assert f.grad is not None and float(f.grad.abs().sum()) > 0
