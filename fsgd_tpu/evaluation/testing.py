"""Result printing and golden verification.

Parity with detectron2/evaluation/testing.py:9-57 (``print_csv_format``,
``verify_results``, ``flatten_results_dict``).
"""

from __future__ import annotations

import logging
import pprint
import sys
from collections import OrderedDict

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["print_csv_format", "verify_results", "flatten_results_dict"]


def print_csv_format(results):
    """Print metrics in a copy-paste friendly format."""
    assert isinstance(results, OrderedDict) or isinstance(results, dict), results
    for task, res in results.items():
        if not isinstance(res, dict):
            continue
        important = {k: v for k, v in res.items() if "-" not in k}
        logger.info("copypaste: Task: {}".format(task))
        logger.info("copypaste: " + ",".join(important.keys()))
        logger.info("copypaste: " + ",".join(["{0:.4f}".format(v) for v in important.values()]))


def verify_results(cfg, results) -> bool:
    """Check results against cfg.TEST.EXPECTED_RESULTS entries
    [task, metric, value, tolerance]; exits non-zero on mismatch."""
    expected_results = cfg.TEST.EXPECTED_RESULTS
    if not len(expected_results):
        return True

    ok = True
    for task, metric, expected, tolerance in expected_results:
        actual = results[task].get(metric)
        if actual is None or not np.isfinite(actual):
            ok = False
            continue
        diff = abs(actual - expected)
        if diff > tolerance:
            ok = False

    logger = logging.getLogger(__name__)
    if not ok:
        logger.error("Result verification failed!")
        logger.error("Expected Results: " + str(expected_results))
        logger.error("Actual Results: " + pprint.pformat(results))
        sys.exit(1)
    else:
        logger.info("Results verification passed.")
    return ok


def flatten_results_dict(results):
    """Nested dict of scalars -> flat {'a/b': v} dict."""
    r = {}
    for k, v in results.items():
        if isinstance(v, dict):
            v = flatten_results_dict(v)
            for kk, vv in v.items():
                r[k + "/" + kk] = vv
        else:
            r[k] = v
    return r
