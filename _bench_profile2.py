import time, jax, jax.numpy as jnp
import numpy as np
from __graft_entry__ import _synthetic_batch
from bench import _build_faster_rcnn

h, w, batch, max_gt = 800, 1344, 4, 64
cfg, model = _build_faster_rcnn((h, w), "bfloat16", max_gt)
params = model.init_params(jax.random.PRNGKey(0), image_size=(h, w))
np_batch = _synthetic_batch(batch, h, w, max_gt=max_gt, seed=0)
device_batch = jax.tree.map(jax.device_put, np_batch)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"{name}: {dt*1000:.1f} ms/iter")
    return out

pg = model.proposal_generator

# A. features (fwd only, no grad)
def feats_fn(p, b):
    images = model.normalize(b["image"])
    return model.backbone.apply({"params": p["backbone"]}, images)
feats_j = jax.jit(feats_fn)
feats = timeit("backbone fwd only", feats_j, params, device_batch)

# B. proposal selection alone (head + find_top, fwd only)
def props_fn(p, b, feats):
    proposals, _ = pg(p["proposal_generator"], feats, b, jax.random.PRNGKey(0), training=False)
    return proposals
props_j = jax.jit(props_fn)
props = timeit("RPN head + find_top_proposals (test cfg: 1000/level)", props_j, params, device_batch, feats)

def props_tr_fn(p, b, feats):
    proposals, losses = pg(p["proposal_generator"], feats, b, jax.random.PRNGKey(0), training=True)
    return proposals, losses
props_tr_j = jax.jit(props_tr_fn)
props_tr, _ = timeit("RPN full train (losses + find_top 2000/level)", props_tr_j, params, device_batch, feats)

# C. roi_heads train alone on fixed proposals
def roi_fn(p, b, feats, props):
    return model.roi_heads.forward_train(p["roi_heads"], feats, props, b, jax.random.PRNGKey(0))
roi_j = jax.jit(roi_fn)
timeit("ROI heads forward_train (sample+pool+head+loss)", roi_j, params, device_batch, feats, props_tr)

# D. pooling alone
sampled_boxes = props_tr["boxes"][:, :512, :]
def pool_fn(feats, boxes):
    fl = [feats[f] for f in model.roi_heads.in_features]
    return model.roi_heads.box_pooler(fl, boxes)
pool_j = jax.jit(pool_fn)
timeit("box pooler alone (4x512 rois, 4 levels)", pool_j, feats, sampled_boxes)
