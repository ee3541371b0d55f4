"""Multi-step loss-curve parity vs an independent PyTorch re-run.

CI-sized version of BASELINE.md target #2 (the full 50-step batch-64 config
runs via ``tools/loss_curve_parity.py``): same init, same glimpse stream,
same schedule — per-update NT-Xent losses must track within 1% through the
optimizer/BN/stop-gradient interaction of the reference hot loop
(``Contrastive_Learning.py:577-740``).
"""

import pytest

pytest.importorskip("torch")


@pytest.mark.slow
def test_loss_curves_track_torch():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.loss_curve_parity import compare

    _, _, worst = compare(steps=8, fixations=2, batch=16, base_lr=0.8,
                          temperature=0.05, seed=15, verbose=False)
    assert worst < 0.01, f"loss curves diverged: max rel diff {worst:.4f}"
