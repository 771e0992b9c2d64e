"""Real multi-process (DCN-path) test — VERDICT round-3 item 4.

Spawns TWO OS processes that bring up ``jax.distributed`` (CPU backend) via
``engine/launch.py`` and exercise ``utils/comm.py`` collectives plus the
distributed COCOEvaluator prediction merge with world_size=2 — the paths that
degenerate to no-ops in single-process CI.  Reference semantics:
detectron2/engine/launch.py:24-84 + utils/comm.py:139-263.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_comm_and_evaluator_merge(tmp_path):
    from test_data_eval import _make_fake_coco

    json_file, img_dir = _make_fake_coco(tmp_path)
    out_dir = str(tmp_path / "out")
    os.makedirs(os.path.join(out_dir, "eval"), exist_ok=True)

    coordinator = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_NUM_PROCESSES", None)
    # The axon sitecustomize registers a TPU PJRT plugin at interpreter start,
    # which initializes backend state before jax.distributed.initialize can
    # run — the CPU client then reports process_count=1.  Plain CPU-only
    # workers must not load it.
    env.pop("PALLAS_AXON_POOL_IPS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"),
             str(rank), "2", coordinator, json_file, img_dir, out_dir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank %d failed:\n%s" % (rank, out[-4000:])

    with open(os.path.join(out_dir, "rank0.json")) as f:
        r0 = json.load(f)
    with open(os.path.join(out_dir, "rank1.json")) as f:
        r1 = json.load(f)
    assert r0["shared_seed"] == r1["shared_seed"]
    # disjoint halves both processed, predictions merged on rank 0
    assert r0["n_processed"] + r1["n_processed"] >= 4
    assert r0["n_processed"] > 0 and r1["n_processed"] > 0
    assert r0["bbox_AP"] == pytest.approx(100.0, abs=1e-4)
    assert r0["n_merged_predictions"] > 0
