"""Full-resolution end-to-end parity (SURVEY.md §6 protocol; BASELINE.json
"≤1% RMSE delta" / "depth maps within float tolerance"; VERDICT r1 #5).

Runs the exact PARITY.md protocol — sequential numpy preproc + torch-CPU
oracle vs the production fused JAX pipeline — at working resolution 450×800
with a reduced sample count so it stays runnable under the slow marker.
`scripts/run_parity.py --write-md` records the full-size numbers."""

import pytest

from scripts.run_parity import run_parity

pytestmark = pytest.mark.slow


def test_full_resolution_parity():
    report = run_parity(height=450, width=800, num_samples=2, batch=2,
                        sweeps=5, decoder="upproj", depth=18,
                        progress=lambda *_: None)
    # The fused on-device rasterization must equal the sequential z-buffer
    # loop exactly (min is order-free; binning exact in f32).
    assert report["preproc_max_abs_diff"] == 0.0, report
    # Accuracy north star: ≤1% relative RMSE delta between pipelines.
    assert report["rmse_rel_delta"] <= 0.01, report
    # Float-tolerance agreement of the predicted maps themselves.
    assert report["pred_max_abs_diff"] < 5e-3, report
    assert report["pred_mean_abs_diff"] < 5e-4, report
