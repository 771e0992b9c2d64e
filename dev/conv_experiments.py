#!/usr/bin/env python
"""Backbone-conv efficiency experiments (VERDICT round-3 item 5).

PROFILE_BREAKDOWN.json attributes 60.4 ms of the Faster R-CNN step to the
R50+FPN fwd+bwd vs a ~28 ms realistic floor, blaming "XLA conv scheduling"
with no recorded evidence.  This harness TESTS that claim on-chip and merges
measured deltas into PROFILE_BREAKDOWN.json under "experiments".

Under the axon tunnel, XLA_FLAGS set in the client process do NOT reach the
remote compile helper (it adopts the terminal's env), so every flag variant
is passed per-compile via ``compiler_options`` — the one channel that rides
the compile request.  All variants therefore run in ONE process, with the
persistent compilation cache disabled so cached baseline executables can't
masquerade as flag results.

Variants:
  baseline       — current build (bf16 compute, FrozenBN)
  no_norm        — MODEL.RESNETS.NORM="" / FPN.NORM="": if the elementwise
                   norm chains were NOT fused into the convs, removing them
                   would show a gap; parity here = XLA already fuses (and
                   bounds what build-time BN-folding could ever recover)
  flag:*         — xla flag flips via compiler_options
  stem_pad       — microbench: the 7x7/2 stem conv with C_in 3 vs padded
                   4/8, plus the MLPerf space-to-depth rewrite (s2d: input
                   (N,H,W,3)->(N,H/2,W/2,12), 7x7/2 -> 4x4/1 on 12ch)

Usage: python dev/conv_experiments.py [--iters 20] [--variants a,b,...]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W, BATCH = 800, 1344, 8

FLAG_VARIANTS = {
    "flag:lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "flag:vmem_128k": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "flag:vmem_64k": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "flag:licm_off": {"xla_tpu_licm_size_inflation_ratio": "1"},
    "flag:no_rematerialization": {"xla_tpu_rematerialization": "false"},
    "flag:async_ag": {"xla_tpu_enable_async_collective_fusion": "false"},
}


def _build_backbone(no_norm=False, stem_s2d=None):
    import jax

    from bench import _build

    cfg, model = _build("faster_rcnn_r50fpn", (H, W), "bfloat16", 64)
    rebuild = False
    if no_norm:
        cfg.MODEL.RESNETS.NORM = ""
        cfg.MODEL.FPN.NORM = ""
        rebuild = True
    if stem_s2d is not None:
        cfg.TPU.STEM_S2D = stem_s2d
        rebuild = True
    if rebuild:
        from fsgd_tpu.models import build_model

        model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(256, 256))
    return model, params["backbone"]


def _time_step(step_fn, args, iters, compiler_options=None):
    """Compile (optionally with per-compile XLA flag overrides) and time."""
    import jax

    lowered = jax.jit(step_fn).lower(*args)
    compiled = (
        lowered.compile(compiler_options=compiler_options)
        if compiler_options
        else lowered.compile()
    )
    g = compiled(*args)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = compiled(*args)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / iters


def _backbone_step(model, bb_params):
    import jax
    import jax.numpy as jnp

    image = (
        jax.random.uniform(jax.random.PRNGKey(1), (BATCH, H, W, 3)) * 255.0
    )

    def loss(p, img):
        feats = model.backbone.apply({"params": p}, model.normalize(img))
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) * 1e-6 for f in feats.values())

    return jax.grad(loss), (bb_params, image)


def _time_stem_pad(iters):
    """Microbench: 7x7/2 stem conv fwd+bwd, C_in 3 vs padded 4/8, vs the
    space-to-depth rewrite (stride folded into channels: 4x4/1 conv on 12ch
    over the (H/2, W/2) grid — MXU-friendlier contraction shape)."""
    import jax
    import jax.numpy as jnp

    out = {}
    key = jax.random.PRNGKey(0)
    for cin in (3, 4, 8):
        x = jax.random.uniform(key, (BATCH, H, W, cin), jnp.bfloat16)
        k = jax.random.normal(key, (7, 7, cin, 64), jnp.bfloat16) * 0.05

        def loss(kk, xx):
            y = jax.lax.conv_general_dilated(
                xx, kk, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        dt = _time_step(jax.grad(loss), (k, x), iters)
        out["stem_cin%d_ms" % cin] = round(dt * 1e3, 2)

    # space-to-depth: (N,H,W,3) -> (N,H/2,W/2,12); 7x7/2 -> 4x4/1 equivalent
    x = jax.random.uniform(key, (BATCH, H // 2, W // 2, 12), jnp.bfloat16)
    k = jax.random.normal(key, (4, 4, 12, 64), jnp.bfloat16) * 0.05

    def loss_s2d(kk, xx):
        y = jax.lax.conv_general_dilated(
            xx, kk, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    dt = _time_step(jax.grad(loss_s2d), (k, x), iters)
    out["stem_s2d_ms"] = round(dt * 1e3, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default=None, help="comma list; default all")
    args = ap.parse_args()

    import jax  # noqa: F401  (no persistent cache: flags must recompile)

    variants = (
        args.variants.split(",")
        if args.variants
        else ["baseline", "no_norm", "stem_pad"] + list(FLAG_VARIANTS)
    )
    results = []
    base_model, base_params = (None, None)
    for v in variants:
        t_start = time.time()
        try:
            if v == "stem_pad":
                row = {"variant": v, **_time_stem_pad(args.iters)}
            elif v == "no_norm":
                model, bb = _build_backbone(no_norm=True)
                fn, fargs = _backbone_step(model, bb)
                dt = _time_step(fn, fargs, args.iters)
                row = {"variant": v, "backbone_ms": round(dt * 1e3, 2)}
            elif v == "stem_direct":
                # TPU.STEM_S2D=False: the pre-s2d direct 7x7/2 stem, for the
                # recorded before/after at full-backbone granularity
                model, bb = _build_backbone(stem_s2d=False)
                fn, fargs = _backbone_step(model, bb)
                dt = _time_step(fn, fargs, args.iters)
                row = {"variant": v, "backbone_ms": round(dt * 1e3, 2)}
            else:
                if base_model is None:
                    base_model, base_params = _build_backbone()
                fn, fargs = _backbone_step(base_model, base_params)
                opts = FLAG_VARIANTS.get(v)
                dt = _time_step(fn, fargs, args.iters, compiler_options=opts)
                row = {"variant": v, "backbone_ms": round(dt * 1e3, 2)}
        except Exception as e:  # record failures (e.g. unknown flag) honestly
            row = {"variant": v, "error": str(e).splitlines()[0][:300]}
        row["compile_plus_run_s"] = round(time.time() - t_start, 1)
        results.append(row)
        print(json.dumps(row), flush=True)

    path = os.path.join(REPO, "PROFILE_BREAKDOWN.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        doc = {}
    by_name = {r["variant"]: r for r in doc.get("experiments", []) if "variant" in r}
    for r in results:
        by_name[r["variant"]] = r
    doc["experiments"] = list(by_name.values())
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote experiments to PROFILE_BREAKDOWN.json", flush=True)


if __name__ == "__main__":
    main()
