"""IoU-threshold matcher.

Parity with detectron2/modeling/matcher.py:5-133 (threshold-bucketed labels +
``set_low_quality_matches_``), vectorized for padded static shapes: the
reference loops per image with dynamic GT counts; here the quality matrix has
a fixed MAX_GT rows and an explicit validity mask, and everything is masked
jnp (jit/vmap-friendly — SURVEY.md section 7 "per-image Python loops").
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
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

    def match_streamed(
        self,
        gt_boxes: jnp.ndarray,
        gt_valid: Optional[jnp.ndarray],
        anchors: jnp.ndarray,
        iou_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        chunk: int = 16384,
    ):
        """Same result as ``__call__(iou_fn(gt_boxes, anchors), gt_valid)`` but
        streamed over anchor chunks, plus the per-anchor matched quality.

        The dense path materializes the (M, N) quality matrix in HBM and then
        reads it back for every reduction (max/argmax over M, per-GT max over
        N, the tie-rescue equality scan) — at RPN scale that is a ~550 MB
        fp32 tensor touched ~5 times per step.  Here one `lax.scan` step
        computes IoU for one anchor chunk and reduces it in place, so HBM
        sees only per-anchor outputs.

        The low-quality rescue ("ties at the per-GT max become positive") is
        equality-based, so it must never compare values from two different
        compilations of ``iou_fn`` — XLA is free to fuse FMAs differently per
        shape, shifting the last ulp.  All equality material is therefore
        captured on the single IoU instance inside the scan: each anchor
        records a packed per-GT bitmask of "ties this chunk's per-GT max",
        and each chunk records that max; afterwards a chunk's ties are
        promoted to rescues exactly where its stored chunk max equals the
        stored global max (comparisons between stored fp32 values — exact).
        Padded chunk-tail anchors (zero boxes → IoU 0 against any valid GT)
        cannot raise a per-GT max above a real positive overlap (rescue
        requires quality > 0), and their outputs are sliced off.

        Returns:
            matches: (N,) int32; match_labels: (N,) int8; matched_vals: (N,)
            f32 quality of the selected GT (used by the picky-matcher mask).
        """
        n = anchors.shape[0]
        m = gt_boxes.shape[0]
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        a = jnp.pad(anchors, ((0, pad), (0, 0)))
        a = a.reshape(n_chunks, chunk, anchors.shape[1])
        n_words = -(-m // 32)
        lane = jnp.arange(m, dtype=jnp.uint32) % 32  # bit position within word

        def pass1(gt_max, a_chunk):
            q = iou_fn(gt_boxes, a_chunk)
            if gt_valid is not None:
                q = jnp.where(gt_valid[:, None], q, -1.0)
            mv = jnp.max(q, axis=0)
            mi = jnp.argmax(q, axis=0).astype(jnp.int32)
            cmax = jnp.max(q, axis=1)  # (M,) this chunk's per-GT max
            outs = (mv, mi)
            if self.allow_low_quality_matches:
                # per-anchor tie bits against THIS q instance (same values
                # the chunk max was reduced from — equality is safe)
                ties = (q == cmax[:, None]).astype(jnp.uint32) << lane[:, None]  # (M, CH)
                tie_words = jnp.stack(
                    [ties[w * 32:(w + 1) * 32].sum(axis=0, dtype=jnp.uint32) for w in range(n_words)],
                    axis=1,
                )  # (CH, n_words); distinct bits, so sum == bitwise-or
                outs = (mv, mi, cmax, tie_words)
            return jnp.maximum(gt_max, cmax), outs

        gt_max, outs = jax.lax.scan(pass1, jnp.full((m,), -jnp.inf, jnp.float32), a)
        matched_vals = outs[0].reshape(-1)[:n]
        matches = outs[1].reshape(-1)[:n]

        match_labels = jnp.full(matches.shape, 1, dtype=jnp.int8)
        for l, low, high in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_bucket = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_bucket, jnp.int8(l), match_labels)

        if self.allow_low_quality_matches:
            chunk_max, tie_words = outs[2], outs[3]  # (K, M), (K, CH, n_words)
            positive_gt = gt_max > 0
            if gt_valid is not None:
                positive_gt = positive_gt & gt_valid
            # a chunk's tie bit counts iff that chunk attains the global max
            cond = (chunk_max == gt_max[None, :]) & positive_gt[None, :]  # (K, M)
            cond_bits = cond.astype(jnp.uint32) << lane[None, :]
            cond_words = jnp.stack(
                [cond_bits[:, w * 32:(w + 1) * 32].sum(axis=1, dtype=jnp.uint32) for w in range(n_words)],
                axis=1,
            )  # (K, n_words)
            hit = (tie_words & cond_words[:, None, :]) != 0  # (K, CH, n_words)
            rescue = jnp.any(hit, axis=-1).reshape(-1)[:n]
            match_labels = jnp.where(rescue, jnp.int8(1), match_labels)

        return matches, match_labels, matched_vals

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
