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
    print(f"{name}: {dt*1000:.1f} ms/iter ({batch/dt:.1f} img/s)")
    return dt

# 1. backbone+FPN fwd+bwd only
def loss_bb(p, b):
    images = model.normalize(b["image"])
    feats = model.backbone.apply({"params": p["backbone"]}, images)
    return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats.values()) * 1e-9
g_bb = jax.jit(jax.grad(loss_bb))
timeit("backbone+FPN fwd+bwd", g_bb, params, device_batch)

# 2. + RPN losses (no proposal selection)
def loss_rpn(p, b):
    images = model.normalize(b["image"])
    feats = model.backbone.apply({"params": p["backbone"]}, images)
    pg = model.proposal_generator
    fl = [feats[f] for f in pg.in_features]
    logits, deltas = pg.head_module.apply({"params": p["proposal_generator"]}, fl)
    from fsgd_tpu.models.meta_arch.retinanet import permute_to_N_HWA_K
    grid_sizes = [(f.shape[1], f.shape[2]) for f in fl]
    anchors = pg.anchor_generator(grid_sizes)
    anchors_cat = jnp.concatenate([a.tensor for a in anchors], axis=0)
    gl, gd = pg.get_ground_truth(anchors_cat, b, jax.random.PRNGKey(0))
    lf = jnp.concatenate([permute_to_N_HWA_K(l, 1)[..., 0] for l in logits], 1)
    df = jnp.concatenate([permute_to_N_HWA_K(d, 4) for d in deltas], 1)
    losses = pg.losses(jax.lax.stop_gradient(gl), jax.lax.stop_gradient(gd), lf, df)
    return sum(losses.values())
g_rpn = jax.jit(jax.grad(loss_rpn))
timeit("+ RPN losses (no NMS)", g_rpn, params, device_batch)

# 3. full loss
def loss_full(p, b):
    return model.loss_fn(p, b, jax.random.PRNGKey(0))[0]
g_full = jax.jit(jax.grad(loss_full))
timeit("full train loss grad", g_full, params, device_batch)
