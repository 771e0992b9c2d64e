"""Fixture model-zoo skip-path gate (VERDICT round-3 item 8).

The real inference_acc gates need downloaded zoo weights; this test generates
a random-weight ``.pkl`` in detectron2-zoo format at the exact catalog layout
the config's ``detectron2://`` WEIGHTS resolves to under ``$FSGD_MODEL_ZOO``,
then drives ``tools/train_net.py --eval-only`` through the ENTIRE
inference_acc code path on micro-COCO: config -> zoo resolution
(checkpoint/catalog.py) -> torch_loader -> inference_on_dataset ->
verify_results.  After this, the only never-executed step left is the literal
download.  Reference: detectron2/checkpoint/catalog.py:6-112 +
evaluation/testing.py:27-57 + dev/run_inference_tests.sh.
"""

import json
import os
import pickle
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_ROOT = os.path.join(REPO, "tests", "data", "datasets")
CONFIG = os.path.join(
    REPO, "configs", "quick_schedules", "retinanet_R_50_FPN_inference_acc_test.yaml"
)
# the config's detectron2:// WEIGHTS path, relative to the zoo root
ZOO_REL = "COCO-Detection/retinanet_R_50_FPN_3x/137849486/model_final_4cafe0.pkl"


def test_verify_results_contract():
    """verify_results passes/fails on the EXPECTED_RESULTS tolerance
    (reference evaluation/testing.py:27-57)."""
    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.evaluation import verify_results

    cfg = get_cfg()
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP", 44.36, 0.02]]
    assert verify_results(cfg, {"bbox": {"AP": 44.37}})
    with pytest.raises(SystemExit):
        verify_results(cfg, {"bbox": {"AP": 40.0}})


@pytest.mark.slow
def test_inference_acc_path_with_fixture_zoo(tmp_path):
    from test_torch_loader import _make_d2_state_dict

    import jax

    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.models import build_model

    # 1. random weights in zoo format, at the catalog layout
    cfg = get_cfg()
    cfg.merge_from_file(CONFIG)
    cfg.MODEL.WEIGHTS = ""
    cfg.DATASETS.TRAIN = ()
    cfg.DATASETS.TEST = ()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = [[128, 128]]
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(5), image_size=(128, 128))
    state, unmapped = _make_d2_state_dict(params)
    assert unmapped == [], unmapped
    zoo = tmp_path / "zoo"
    pkl = zoo / ZOO_REL
    pkl.parent.mkdir(parents=True)
    with open(pkl, "wb") as f:
        pickle.dump({"model": state, "__author__": "Detectron2 Model Zoo"}, f)

    # 2. the full CLI: --eval-only through catalog resolution + loader + eval
    out_dir = str(tmp_path / "output")
    env = dict(os.environ)
    env.update(
        FSGD_DATASETS=FIXTURE_ROOT,
        FSGD_MODEL_ZOO=str(zoo),
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",  # hermetic CPU: drop the axon sitecustomize
    )
    opts = [
        "INPUT.MIN_SIZE_TEST", "96",
        "INPUT.MAX_SIZE_TEST", "128",
        "TPU.IMAGE_BUCKETS", "[[128, 128]]",
        "TPU.COMPUTE_DTYPE", "float32",
        # random weights cannot hit the published AP; the verification CODE
        # still runs (an empty list short-circuits to OK) — the contract
        # itself is unit-tested above
        "TEST.EXPECTED_RESULTS", "[]",
        "OUTPUT_DIR", out_dir,
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_net.py"),
         "--config-file", CONFIG, "--eval-only"] + opts,
        env=env, capture_output=True, text=True, timeout=3000, cwd=REPO,
    )
    tail = proc.stdout + proc.stderr
    assert proc.returncode == 0, "CLI failed:\n%s" % tail[-4000:]
    # the loader must have resolved detectron2:// into the fixture zoo and
    # matched EVERY model parameter
    assert "caffe2=False" in tail or "Loaded" in tail, tail[-2000:]
    import re

    m = re.search(r"Matched (\d+)/(\d+) parameters", tail)
    assert m, "no torch_loader match report in output"
    assert m.group(1) == m.group(2), m.group(0)
    results = os.path.join(out_dir, "inference", "coco_instances_results.json")
    alt = os.path.join(out_dir, "coco_instances_results.json")
    assert os.path.exists(results) or os.path.exists(alt)
    assert "bbox" in tail  # evaluator summary printed


def test_http_download_branch(tmp_path):
    """The literal zoo-download path (VERDICT round-4 item 8): serve a fixture
    ``.pkl`` from a localhost HTTP server, load it through a plain https-style
    URL, and verify the download-to-cache + cache-reuse semantics
    (reference: fvcore HTTPURLHandler used by checkpoint/catalog.py)."""
    import functools
    import http.server
    import threading

    import jax
    import numpy as np

    from test_torch_loader import _make_d2_state_dict

    from fsgd_tpu.checkpoint import Checkpointer
    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(CONFIG)
    cfg.MODEL.WEIGHTS = ""
    cfg.DATASETS.TRAIN = ()
    cfg.DATASETS.TEST = ()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = [[128, 128]]
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(5), image_size=(128, 128))
    state, _ = _make_d2_state_dict(params)
    serve_root = tmp_path / "www"
    pkl = serve_root / ZOO_REL
    pkl.parent.mkdir(parents=True)
    with open(pkl, "wb") as f:
        pickle.dump({"model": state, "__author__": "Detectron2 Model Zoo"}, f)

    hits = []

    class Handler(http.server.SimpleHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits.append(self.path)
            return super().do_GET()

    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), functools.partial(Handler, directory=str(serve_root))
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = "http://127.0.0.1:%d/%s" % (httpd.server_address[1], ZOO_REL)

    os.environ["FSGD_CACHE"] = str(tmp_path / "cache")
    try:
        ckpt = Checkpointer(save_dir=str(tmp_path / "out"), model=params)
        ckpt.load(url)
        loaded = ckpt.checkpointables["model"]
        leaves0 = jax.tree_util.tree_leaves(params)
        leaves1 = jax.tree_util.tree_leaves(loaded)
        assert len(leaves0) == len(leaves1)
        for a, b in zip(leaves0, leaves1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert len(hits) == 1, hits
        cached = tmp_path / "cache" / ZOO_REL
        assert cached.is_file()

        # second load: served from the cache, no new HTTP request
        ckpt2 = Checkpointer(save_dir=str(tmp_path / "out2"), model=params)
        ckpt2.load(url)
        assert len(hits) == 1, hits
    finally:
        os.environ.pop("FSGD_CACHE", None)
        httpd.shutdown()
