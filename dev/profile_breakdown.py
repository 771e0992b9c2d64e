#!/usr/bin/env python
"""Stage-ablation timing for the Faster/Mask R-CNN train step.

Times grad-steps of progressively larger sub-programs on the real chip to
attribute the step time without trace archaeology:

  backbone        — FPN features + dummy loss
  +rpn            — proposal losses (matcher/sampling) + find_top_proposals
  +box            — label_and_sample + pooler + box head losses
  +mask           — full loss_fn (Mask R-CNN config adds the mask branch)
  infer           — full inference_fn (NMS/top-k decode path)

Writes PROFILE_BREAKDOWN.json.  Usage: python dev/profile_breakdown.py
[--model faster_rcnn|mask_rcnn] [--hw 800,1344] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="faster_rcnn")
    ap.add_argument("--hw", default="800,1344")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    h, w = [int(v) for v in args.hw.split(",")]

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import CONFIGS, _batch, _build

    name = "mask_rcnn_r50fpn" if args.model == "mask_rcnn" else "faster_rcnn_r50fpn"
    cfg, model = _build(name, (h, w), "bfloat16", 64)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(256, 256))
    np_batch = _batch(name, args.batch, h, w, 64)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    rng = jax.random.PRNGKey(0)

    def grad_step(fn):
        def value(p, b, r):
            out = fn(p, b, r)
            total = out[0] if isinstance(out, tuple) else out
            return total

        g = jax.jit(jax.grad(value))

        def run(iters=1):
            # one blocking call per WINDOW, not per iter: through the remote
            # TPU tunnel a per-iter block_until_ready adds a full round-trip
            # of dispatch latency (~30-80 ms jitter) to every sample
            out = None
            for _ in range(iters):
                out = g(params, batch, rng)
            return jax.block_until_ready(out)

        return run

    # -- sub-programs --------------------------------------------------------
    def backbone_only(p, b, r):
        images = model.normalize(b["image"])
        features = model.backbone.apply({"params": p["backbone"]}, images)
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) * 0 + jnp.mean(f.astype(jnp.float32)) for f in features.values()), {}

    def with_rpn(p, b, r):
        r1, _ = jax.random.split(r)
        images, features = model._features(p, b)
        proposals, losses = model._proposals(p, features, b, r1, True)
        return sum(losses.values()) + 0 * jnp.sum(proposals["scores"]), {}

    def with_sample(p, b, r):
        r1, r2 = jax.random.split(r)
        images, features = model._features(p, b)
        proposals, losses = model._proposals(p, features, b, r1, True)
        rh = model.roi_heads
        sampled = rh.label_and_sample_proposals(proposals, b, r2)
        # mirror forward_train: sampling targets carry no gradient
        sampled = jax.tree.map(jax.lax.stop_gradient, sampled)
        return (
            sum(losses.values())
            + 0 * jnp.sum(sampled["boxes"].astype(jnp.float32))
            + 0 * jnp.sum(sampled["gt_classes"])
        ), {}

    def with_pool(p, b, r):
        r1, r2 = jax.random.split(r)
        images, features = model._features(p, b)
        proposals, losses = model._proposals(p, features, b, r1, True)
        rh = model.roi_heads
        sampled = rh.label_and_sample_proposals(proposals, b, r2)
        sampled = jax.tree.map(jax.lax.stop_gradient, sampled)
        feats = [features[f] for f in rh.in_features]
        pooled = rh.box_pooler(feats, sampled["boxes"])
        return sum(losses.values()) + jnp.mean(pooled.astype(jnp.float32)), {}

    def full(p, b, r):
        return model.loss_fn(p, b, r)

    stages = [
        ("backbone", backbone_only),
        ("+rpn", with_rpn),
        ("+sample", with_sample),
        ("+pool", with_pool),
        ("full_train", full),
    ]

    rows = []
    for label, fn in stages:
        run = grad_step(fn)
        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        # warm
        run()
        t0 = time.perf_counter()
        run(args.iters)
        dt = (time.perf_counter() - t0) / args.iters
        rows.append({"stage": label, "step_s": round(dt, 4), "imgs_per_s": round(args.batch / dt, 2),
                     "compile_s": round(compile_s, 1)})
        print(rows[-1], file=sys.stderr)

    # inference decode path
    inf = jax.jit(model.inference_fn)
    jax.block_until_ready(inf(params, batch))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = inf(params, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    rows.append({"stage": "infer", "step_s": round(dt, 4), "imgs_per_s": round(args.batch / dt, 2)})
    print(rows[-1], file=sys.stderr)

    doc = {"model": name, "hw": [h, w], "batch": args.batch, "stages": rows}
    try:  # keep the hand-written roofline analysis across re-profiles
        with open("PROFILE_BREAKDOWN.json") as f:
            prev = json.load(f)
        if "roofline" in prev:
            doc["roofline"] = prev["roofline"]
    except (OSError, ValueError):
        pass
    with open("PROFILE_BREAKDOWN.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
