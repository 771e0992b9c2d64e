#!/usr/bin/env python
"""Per-conv microbench of the R50+FPN+RPN trunk (VERDICT round-4 item 5).

PROFILE_BREAKDOWN.json attributes ~60 ms of the Faster R-CNN train step to
"XLA conv scheduling" at region granularity.  Before writing Pallas conv
kernels we need CONV-level attribution: this harness times every distinct
(shape, kernel, stride, channels) convolution in the trunk, fwd and fwd+bwd,
and reports per-conv ms, GFLOPs, and % of the chip's bf16 MXU peak, merged
into PROFILE_BREAKDOWN.json under "per_conv".

Frozen stages (stem + res2 at the default FREEZE_AT=2) are timed fwd-only —
JAX's symbolic-zero cotangents mean no backward is traced for them in the
real step.

Usage: python dev/conv_profile.py [--iters 30] [--top 40]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 8
# v5e single chip
MXU_TFLOPS_BF16 = 197.0
HBM_GBPS = 819.0

# (name, (H, W, Cin), kernel, stride, Cout, frozen, count)
# Spatial dims are the INPUT to the conv at 800x1344; `count` is how many
# times this exact conv shape appears in the R50+FPN+RPN trunk.
def _conv_table():
    t = []
    # stem (frozen): s2d form — 4x4/1 over (400,672,12)
    t.append(("stem_s2d_4x4", (400, 672, 12), (4, 4), 1, 64, True, 1))
    # --- res2 (frozen), spatial 200x336
    t.append(("res2_conv1_64", (200, 336, 64), (1, 1), 1, 64, True, 1))
    t.append(("res2_conv1_256to64", (200, 336, 256), (1, 1), 1, 64, True, 2))
    t.append(("res2_conv2_3x3_64", (200, 336, 64), (3, 3), 1, 64, True, 3))
    t.append(("res2_conv3_64to256", (200, 336, 64), (1, 1), 1, 256, True, 3))
    t.append(("res2_shortcut_64to256", (200, 336, 64), (1, 1), 1, 256, True, 1))
    # --- res3, first block strided, spatial in 200x336 -> 100x168
    t.append(("res3_conv1_256to128_s2", (200, 336, 256), (1, 1), 2, 128, False, 1))
    t.append(("res3_shortcut_256to512_s2", (200, 336, 256), (1, 1), 2, 512, False, 1))
    t.append(("res3_conv1_512to128", (100, 168, 512), (1, 1), 1, 128, False, 3))
    t.append(("res3_conv2_3x3_128", (100, 168, 128), (3, 3), 1, 128, False, 4))
    t.append(("res3_conv3_128to512", (100, 168, 128), (1, 1), 1, 512, False, 4))
    # --- res4, spatial 50x84
    t.append(("res4_conv1_512to256_s2", (100, 168, 512), (1, 1), 2, 256, False, 1))
    t.append(("res4_shortcut_512to1024_s2", (100, 168, 512), (1, 1), 2, 1024, False, 1))
    t.append(("res4_conv1_1024to256", (50, 84, 1024), (1, 1), 1, 256, False, 5))
    t.append(("res4_conv2_3x3_256", (50, 84, 256), (3, 3), 1, 256, False, 6))
    t.append(("res4_conv3_256to1024", (50, 84, 256), (1, 1), 1, 1024, False, 6))
    # --- res5, spatial 25x42
    t.append(("res5_conv1_1024to512_s2", (50, 84, 1024), (1, 1), 2, 512, False, 1))
    t.append(("res5_shortcut_1024to2048_s2", (50, 84, 1024), (1, 1), 2, 2048, False, 1))
    t.append(("res5_conv1_2048to512", (25, 42, 2048), (1, 1), 1, 512, False, 2))
    t.append(("res5_conv2_3x3_512", (25, 42, 512), (3, 3), 1, 512, False, 3))
    t.append(("res5_conv3_512to2048", (25, 42, 512), (1, 1), 1, 2048, False, 3))
    # --- FPN laterals (1x1 -> 256) + outputs (3x3 256)
    t.append(("fpn_lat_p2_256", (200, 336, 256), (1, 1), 1, 256, False, 1))
    t.append(("fpn_lat_p3_512", (100, 168, 512), (1, 1), 1, 256, False, 1))
    t.append(("fpn_lat_p4_1024", (50, 84, 1024), (1, 1), 1, 256, False, 1))
    t.append(("fpn_lat_p5_2048", (25, 42, 2048), (1, 1), 1, 256, False, 1))
    t.append(("fpn_out_p2_3x3", (200, 336, 256), (3, 3), 1, 256, False, 1))
    t.append(("fpn_out_p3_3x3", (100, 168, 256), (3, 3), 1, 256, False, 1))
    t.append(("fpn_out_p4_3x3", (50, 84, 256), (3, 3), 1, 256, False, 1))
    t.append(("fpn_out_p5_3x3", (25, 42, 256), (3, 3), 1, 256, False, 1))
    # --- RPN head shares one 3x3/1x1 stack over 5 levels (P2..P6)
    t.append(("rpn_3x3_p2", (200, 336, 256), (3, 3), 1, 256, False, 1))
    t.append(("rpn_3x3_p3", (100, 168, 256), (3, 3), 1, 256, False, 1))
    return t


def _floor_ms(hw_cin, kernel, stride, cout, bwd):
    h, w, cin = hw_cin
    oh, ow = h // stride, w // stride
    macs = oh * ow * kernel[0] * kernel[1] * cin * cout * BATCH
    flops = 2.0 * macs * (3.0 if bwd else 1.0)  # bwd = dX + dW ~ 2x fwd
    mxu_ms = flops / (MXU_TFLOPS_BF16 * 1e12) * 1e3
    # HBM floor: read input + write output (+ bwd reads/writes of both)
    bytes_io = 2.0 * BATCH * (h * w * cin + oh * ow * cout)
    if bwd:
        bytes_io *= 3.0
    hbm_ms = bytes_io / (HBM_GBPS * 1e9) * 1e3
    return max(mxu_ms, hbm_ms), mxu_ms, hbm_ms


def _time_one(hw_cin, kernel, stride, cout, bwd, iters):
    """Time one conv config: `iters` sequential executions inside ONE jitted
    lax.scan dispatch.

    Two tunnel pathologies make the naive async-loop-over-identical-calls
    wrong here: (a) the axon server memoizes identical (executable, args)
    dispatches, so repeats return in ~15 us without executing; (b) dispatch
    RTT flaps 25 ms - 4 s, drowning sub-10 ms kernels.  The scan carries a
    data dependency through the kernel operand — a runtime-zero but
    compiler-opaque perturbation (c * 1e-20 rounds to +0.0 in bf16, but c is
    loop-carried so XLA cannot hoist the conv) — so every iteration really
    executes, and the whole measurement costs one RTT.  Best of 3 dispatches.
    """
    import jax
    import jax.numpy as jnp

    h, w, cin = hw_cin
    pad = ((kernel[0] - 1) // 2, (kernel[1] - 1) // 2)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, h, w, cin), jnp.bfloat16)
    k = jax.random.normal(key, (kernel[0], kernel[1], cin, cout), jnp.bfloat16) * 0.05

    def fwd(kk, xx):
        y = jax.lax.conv_general_dilated(
            xx, kk, (stride, stride), [pad, pad],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    def body(c, _):
        kk = k_in + (c * 1e-20).astype(k_in.dtype)
        if bwd:
            dk, dx = jax.grad(fwd, argnums=(0, 1))(kk, x_in)
            return dk[0, 0, 0, 0].astype(jnp.float32), None
        return fwd(kk, x_in).astype(jnp.float32), None

    # k_in/x_in bound inside the jit trace so body closes over traced args
    # (passing them as scan carries would add their HBM cost to every iter)
    k_in = x_in = None

    @jax.jit
    def run_jit(c0, k_arg, x_arg):
        nonlocal k_in, x_in
        k_in, x_in = k_arg, x_arg
        return jax.lax.scan(body, c0, None, length=iters)[0]

    # jax.block_until_ready does NOT wait for execution under the axon
    # tunnel (measured: 0.55 s "block" vs 84 s real completion on a chained
    # matmul scan) — force completion by fetching the scalar carry to host.
    # The fetch adds ~2 RTTs, amortized over `iters` scan iterations.
    c0 = jnp.float32(0.0)
    out = float(run_jit(c0, k, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = float(run_jit(jnp.float32(out + 1.0), k, x))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default=None, help="comma list of row names")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass

    rows = []
    total_meas = total_floor = 0.0
    for name, hw_cin, kernel, stride, cout, frozen, count in _conv_table():
        if args.only and name not in args.only.split(","):
            continue
        bwd = not frozen
        try:
            ms = _time_one(hw_cin, kernel, stride, cout, bwd, args.iters)
        except Exception as e:
            rows.append({"conv": name, "error": str(e).splitlines()[0][:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        floor, mxu, hbm = _floor_ms(hw_cin, kernel, stride, cout, bwd)
        row = {
            "conv": name,
            "pass": "fwd+bwd" if bwd else "fwd",
            "count": count,
            "ms": round(ms, 3),
            "total_ms": round(ms * count, 3),
            "floor_ms": round(floor, 3),
            "mxu_peak_ms": round(mxu, 3),
            "hbm_floor_ms": round(hbm, 3),
            "mxu_eff_pct": round(100.0 * mxu / ms, 1),
            "headroom_ms": round((ms - floor) * count, 3),
        }
        rows.append(row)
        total_meas += ms * count
        total_floor += floor * count
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -r.get("headroom_ms", -1))
    summary = {
        "sum_measured_ms": round(total_meas, 1),
        "sum_floor_ms": round(total_floor, 1),
        "note": "isolated per-conv microbenches; the full backbone overlaps "
                "convs with elementwise fusion, so the sum is an upper bound "
                "on in-model cost",
    }
    print(json.dumps(summary), flush=True)

    path = os.path.join(REPO, "PROFILE_BREAKDOWN.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        doc = {}
    doc["per_conv"] = {"rows": rows, **summary}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote per_conv to PROFILE_BREAKDOWN.json", flush=True)


if __name__ == "__main__":
    main()
