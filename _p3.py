import time, jax, jax.numpy as jnp
import numpy as np
from __graft_entry__ import _synthetic_batch
from bench import _build_faster_rcnn

h, w, batch, max_gt = 800, 1344, 4, 64
cfg, model = _build_faster_rcnn((h, w), "bfloat16", max_gt)
params = model.init_params(jax.random.PRNGKey(0), image_size=(h, w))
np_batch = _synthetic_batch(batch, h, w, max_gt=max_gt, seed=0)
b = jax.tree.map(jax.device_put, np_batch)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)*100:.1f} ms/iter")
    return out

feats = jax.jit(lambda p, b: model.backbone.apply({"params": p["backbone"]}, model.normalize(b["image"])))(params, b)
jax.block_until_ready(feats)
pg = model.proposal_generator
props = jax.jit(lambda p, b, f: pg(p["proposal_generator"], f, b, jax.random.PRNGKey(0), True)[0])(params, b, feats)
jax.block_until_ready(props)

# pooler fwd alone
boxes = props["boxes"][:, :512, :]
pool_j = jax.jit(lambda f, bx: model.roi_heads.box_pooler([f[k] for k in model.roi_heads.in_features], bx))
timeit("packed pooler fwd (4x512 rois)", pool_j, feats, boxes)

# roi train fwd+bwd
def roi_loss(p, b, f, pr):
    losses = model.roi_heads.forward_train(p["roi_heads"], f, pr, b, jax.random.PRNGKey(0))
    return sum(losses.values())
roi_g = jax.jit(jax.grad(roi_loss))
timeit("roi forward_train grad", roi_g, params, b, feats, props)

# proposal selection train-mode alone
prop_j = jax.jit(lambda p, b, f: pg(p["proposal_generator"], f, b, jax.random.PRNGKey(0), True))
timeit("rpn full (train cfg)", prop_j, params, b, feats)
