#!/usr/bin/env python
"""Aggregate a jax.profiler trace (xplane.pb) into a per-op time breakdown.

The tensorboard profile plugin's converter is unusable in this venv
(TF/protobuf version mismatch), so this parses the raw XSpace proto with the
minimal hand-written schema in dev/xplane.proto (compiled to xplane_pb2.py).

Rules learned the hard way (see PROFILE_BREAKDOWN.json provenance):
 - aggregate ONLY the "XLA Ops" line: it carries the serial on-core op
   timeline.  "Async XLA Ops" / copy-start events span in-flight windows and
   double-count concurrent DMA.
 - category rollup keys off the op-name prefix (fusion/dot/conv/scatter/...),
   which is how XLA names HLOs; `%name.N` suffixes are stripped.

Usage:
  python dev/parse_xplane.py /tmp/prof            # newest xplane.pb under dir
  python dev/parse_xplane.py /tmp/prof --top 40
  python dev/parse_xplane.py /tmp/prof --steps 3  # divide totals by N steps
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import xplane_pb2  # noqa: E402

_CATEGORY_PATTERNS = [
    ("conv", r"^(%?)(convolution|conv)"),
    ("matmul", r"^(%?)(dot|cublas|gemm)"),
    ("fusion", r"^(%?)(fusion|loop_fusion|input_fusion)"),
    ("scatter", r"^(%?)scatter"),
    ("gather", r"^(%?)gather"),
    ("sort/topk", r"^(%?)(sort|top-k|topk|partial-sort)"),
    ("reduce", r"^(%?)(reduce|all-reduce)"),
    ("copy/dma", r"^(%?)(copy|dynamic-slice|dynamic-update-slice|transpose|bitcast|reshape)"),
    ("custom(pallas)", r"^(%?)custom-call"),
    ("rng", r"^(%?)rng"),
]


def categorize(name: str) -> str:
    for cat, pat in _CATEGORY_PATTERNS:
        if re.match(pat, name, re.I):
            return cat
    return "other"


def load_space(path: str) -> "xplane_pb2.XSpace":
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space


def aggregate(space, line_name="XLA Ops"):
    """returns {op_display_name: total_ps}, total_line_ps"""
    per_op = collections.Counter()
    total = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            # host planes (python, TFstreamz) are irrelevant
            if not plane.name.startswith("/device"):
                pass
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != line_name and line.display_name != line_name:
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = (m.display_name or m.name) if m is not None else str(ev.metadata_id)
                name = re.sub(r"\.\d+$", "", name)
                per_op[name] += ev.duration_ps
                total += ev.duration_ps
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=1, help="profiled step count (divide totals)")
    ap.add_argument("--line", default="XLA Ops")
    args = ap.parse_args()

    pbs = sorted(
        glob.glob(os.path.join(args.profile_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pbs:
        sys.exit("no *.xplane.pb under " + args.profile_dir)
    path = pbs[-1]
    print("# " + path)
    space = load_space(path)
    per_op, total = aggregate(space, args.line)
    if not per_op:
        lines = sorted(
            {l.name or l.display_name for p in space.planes for l in p.lines}
        )
        sys.exit("line {!r} not found; available: {}".format(args.line, lines))

    ms = 1e-9  # ps -> ms
    print(
        "total {} time: {:.2f} ms over {} step(s) = {:.2f} ms/step".format(
            args.line, total * ms, args.steps, total * ms / args.steps
        )
    )
    cats = collections.Counter()
    for name, ps in per_op.items():
        cats[categorize(name)] += ps
    print("\n== category rollup (ms/step) ==")
    for cat, ps in cats.most_common():
        print("  {:16s} {:9.3f}  ({:4.1f}%)".format(cat, ps * ms / args.steps, 100 * ps / total))
    print("\n== top {} ops (ms/step) ==".format(args.top))
    for name, ps in per_op.most_common(args.top):
        print("  {:9.3f}  {:4.1f}%  {}".format(ps * ms / args.steps, 100 * ps / total, name[:110]))


if __name__ == "__main__":
    main()
