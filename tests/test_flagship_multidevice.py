"""Real-config multi-device coverage (round-5 VERDICT #6): the FLAGSHIP
ssd_mobilenet_300 config — real 300 px shapes, real bf16 compute dtype —
runs one DP train step, one batch-sharded eval step, and the 2-D
spatial-partitioned infer on the 8-fake-device mesh, each in lockstep with
the single-device program. Shares its body with the driver's
``__graft_entry__._flagship_dryrun`` so the dryrun and the suite cannot
drift apart. Marked slow: ~3 min of XLA:CPU compiles."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
def test_flagship_dp_eval_spatial_lockstep():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import __graft_entry__ as graft

    from bdd100k_tpu.parallel.mesh import make_mesh

    # asserts internally: DP train-step loss lockstep (rel < 5e-2 with
    # mining's fp-lottery + bf16), eval detections allclose, spatial 2-D
    # (4, 2) grid detections allclose vs single-device
    graft._flagship_dryrun(make_mesh(num_data=8), 8)
