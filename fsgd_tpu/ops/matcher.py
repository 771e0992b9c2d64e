"""IoU-threshold matcher.

Parity with detectron2/modeling/matcher.py:5-133 (threshold-bucketed labels +
``set_low_quality_matches_``), vectorized for padded static shapes: the
reference loops per image with dynamic GT counts; here the quality matrix has
a fixed MAX_GT rows and an explicit validity mask, and everything is masked
jnp (jit/vmap-friendly — SURVEY.md section 7 "per-image Python loops").
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

__all__ = ["Matcher"]


class Matcher:
    """Assign each prediction a matched GT index and a label in {-1, 0, 1}.

    Args:
        thresholds: increasing IoU thresholds, e.g. [0.3, 0.7].
        labels: a label per threshold bucket, each in {-1, 0, 1}
            (ignore / negative / positive), e.g. [0, -1, 1].
        allow_low_quality_matches: also mark, for each GT, the predictions
            with maximum IoU to it as positive (ties included).
    """

    def __init__(self, thresholds: List[float], labels: List[int], allow_low_quality_matches: bool = False):
        thresholds = list(thresholds)
        assert thresholds[0] > 0
        thresholds.insert(0, -float("inf"))
        thresholds.append(float("inf"))
        assert all(low <= high for low, high in zip(thresholds[:-1], thresholds[1:]))
        assert all(l in [-1, 0, 1] for l in labels)
        assert len(labels) == len(thresholds) - 1
        self.thresholds = thresholds
        self.labels = labels
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(self, match_quality_matrix: jnp.ndarray, gt_valid: Optional[jnp.ndarray] = None):
        """
        Args:
            match_quality_matrix: (M, N) pairwise quality (e.g. IoU), M GT rows
                (possibly padded), N predictions.
            gt_valid: optional (M,) bool mask of real GT rows.  Padded rows are
                treated as absent; with zero valid GT all predictions get the
                first-bucket label (background if labels[0]==0), matching the
                reference's empty-GT fast path (matcher.py:80-88).

        Returns:
            matches: (N,) int32 index into [0, M) of the best GT (0 when none).
            match_labels: (N,) int8 in {-1, 0, 1}.
        """
        m = match_quality_matrix
        assert m.ndim == 2
        if gt_valid is not None:
            # invalid rows can never win the argmax nor clear any threshold
            m = jnp.where(gt_valid[:, None], m, -1.0)

        matched_vals = jnp.max(m, axis=0)
        matches = jnp.argmax(m, axis=0).astype(jnp.int32)

        match_labels = jnp.full(matches.shape, 1, dtype=jnp.int8)
        for l, low, high in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_bucket = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_bucket, jnp.int8(l), match_labels)

        if self.allow_low_quality_matches:
            match_labels = self._set_low_quality_matches(match_labels, m, gt_valid)

        return matches, match_labels

    def _set_low_quality_matches(self, match_labels, match_quality_matrix, gt_valid):
        """For each GT, predictions tied at its max quality become positive.

        Same tie-handling as the reference (matcher.py:107-133): equality with
        the per-GT max, not argmax-only.
        """
        highest_quality_foreach_gt = jnp.max(match_quality_matrix, axis=1, keepdims=True)  # (M, 1)
        is_max = match_quality_matrix == highest_quality_foreach_gt
        # GT with zero best IoU (or padded rows) must not rescue anything
        positive_gt = highest_quality_foreach_gt > 0
        if gt_valid is not None:
            positive_gt = positive_gt & gt_valid[:, None]
        rescue = jnp.any(is_max & positive_gt, axis=0)  # (N,)
        return jnp.where(rescue, jnp.int8(1), match_labels)
