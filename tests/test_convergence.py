"""Data-independent convergence gates (VERDICT round-1 item 2).

Wraps dev/run_convergence.py: train from scratch on 16 synthetic images
until self-eval AP50 clears the gate — proving matching, sampling, losses,
optimizer, decode and COCO evaluation end-to-end, not just loss descent.

These run on the TPU chip (dev/run_convergence.py takes ~15 min/model
there); on the CPU test mesh a single run would dominate the whole suite,
so they skip — the driver's bench environment and `python
dev/run_convergence.py` (artifact: CONVERGENCE.json) are the executable
paths.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "dev"))

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="convergence gates need the TPU chip (see dev/run_convergence.py)",
)


@pytest.mark.slow
@requires_tpu
def test_faster_rcnn_converges_on_synthetic():
    from run_convergence import run

    row = run("faster_rcnn", max_iters=600, gate=0.9)
    assert row["passed"], row


@pytest.mark.slow
@requires_tpu
def test_retinanet_converges_on_synthetic():
    from run_convergence import run

    row = run("retinanet", max_iters=600, gate=0.9)
    assert row["passed"], row
