"""Merged-config parity with the reference tree.

For every yaml that exists under BOTH configs/ trees (ours and the
reference's), merge each through its own config system and require every
shared key to resolve to the same value.  This pins the whole config surface
— schedules, datasets, loss betas, pooler types, proposal files — not just
the keys a model e2e test happens to exercise (round-4 catch: the generated
COCO-Keypoints yamls carried a spurious MODEL.RPN.SMOOTH_L1_BETA 0.2 that
silently changed the RPN loc loss).

Intentional divergences (skipped): the TPU.* / GAMBLER* extension nodes and
MODEL.DEVICE (cuda -> tpu).

Requires the reference checkout; skipped when it is absent.
"""

import glob
import os
import sys

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "configs")),
    reason="reference tree not available",
)

_IGNORED_PREFIXES = ("TPU.", "GAMBLER")
_IGNORED_KEYS = {"MODEL.DEVICE"}


def _flat(c, prefix=""):
    out = {}
    for k, v in c.items():
        if hasattr(v, "items"):
            out.update(_flat(v, prefix + k + "."))
        else:
            out[prefix + k] = v
    return out


def _norm(v):
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


@pytest.mark.slow
def test_shared_yamls_merge_identically():
    sys.path.insert(0, os.path.join(REPO, "tests", "goldens"))
    import gen_goldens  # stubs detectron2._C so the reference imports cleanly

    gen_goldens.install_stubs()
    sys.path.insert(0, REF)
    from detectron2.config import get_cfg as ref_get_cfg

    from fsgd_tpu.config import get_cfg as my_get_cfg

    shared = []
    for p in sorted(glob.glob(os.path.join(REF, "configs", "**", "*.yaml"), recursive=True)):
        rel = os.path.relpath(p, os.path.join(REF, "configs"))
        if os.path.exists(os.path.join(REPO, "configs", rel)):
            shared.append(rel)
    assert len(shared) > 80, shared  # the trees genuinely overlap

    diffs = []
    for rel in shared:
        rc = ref_get_cfg()
        rc.merge_from_file(os.path.join(REF, "configs", rel))
        mc = my_get_cfg()
        mc.merge_from_file(os.path.join(REPO, "configs", rel))
        fr, fm = _flat(rc), _flat(mc)
        for k in sorted(set(fr) & set(fm)):
            if k.startswith(_IGNORED_PREFIXES) or k in _IGNORED_KEYS:
                continue
            if _norm(fr[k]) != _norm(fm[k]):
                diffs.append("%s :: %s : %r (ref) vs %r" % (rel, k, fr[k], fm[k]))
    assert not diffs, "\n".join(diffs)
