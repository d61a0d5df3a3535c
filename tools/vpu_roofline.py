#!/usr/bin/env python3
"""Measured VPU roofline for the render workload (VERDICT round 1 item 3a).

docs/PERFORMANCE.md round 1 justified the forward gap against a PAPER
v5e VPU peak (8 ops/cycle/lane x 940 MHz x 8x128 lanes ~ 2 Tops/s f32)
that was never measured.  This tool measures it: tiny Pallas kernels
whose bodies are long chains of the exact op classes the fused render
kernel issues (FMA, compare/select, sqrt/div, int32 RNG ops), sized so
the loop overhead and memory traffic are negligible -- pure-issue-rate
microbenchmarks.  The headline per-op-class throughputs go into
docs/PERFORMANCE.md and replace the paper number.

Each kernel: grid (T,), body = fori_loop(K) over a (BLK_H, 128) f32 (or
int32) block living in VMEM, each iteration issuing OPS_PER_ITER
dependent-chain-free vector ops.  Carries are folded into the output so
nothing is dead-code-eliminated.

Run inside the TPU bench window:  python tools/vpu_roofline.py
Writes build/vpu_roofline.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_toypt"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK_H = 32          # production lane tile height (32, 128)
BLK_W = 128
K = 2048            # inner loop trips
T = int(os.environ.get("ROOFLINE_GRID", "2048"))  # grid size
REPS = int(os.environ.get("ROOFLINE_REPS", "12"))

# 8 independent accumulator chains per op class: enough ILP to saturate
# issue without register spills.
CHAINS = 8


def _mk_kernel(body_fn, n_ops_per_chain):
    """body_fn(acc, x) -> acc applied to CHAINS accumulators per trip."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        accs = [x * (0.5 + 0.0625 * c) for c in range(CHAINS)]

        def step(i, accs):
            accs = list(accs)
            for c in range(CHAINS):
                accs[c] = body_fn(accs[c], x, c)
            return tuple(accs)

        accs = jax.lax.fori_loop(0, K, step, tuple(accs))
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out
    return kernel, n_ops_per_chain


def _fma(acc, x, c):
    # one vector FMA = 2 flops
    return acc * jnp.float32(0.999755859375) + x


def _cmpsel(acc, x, c):
    # compare + select, the hit-loop's running-argmin pair
    return jnp.where(acc < x, acc + x, acc)


def _sqrt(acc, x, c):
    return jnp.sqrt(jnp.abs(acc) + x)


def _div(acc, x, c):
    return x / (jnp.abs(acc) + jnp.float32(1.0))


def _rsqrt(acc, x, c):
    return jax.lax.rsqrt(jnp.abs(acc) + x)


def _mix(acc, x, c):
    # the fused render kernel's approximate op mix per bounce-iteration:
    # ~70% mul/add/fma, ~20% cmp/sel, ~10% special (sqrt/div) -- derived
    # from the HLO op census of render_pixels_fused (see
    # docs/PERFORMANCE.md).  Per trip, by the CASES counting convention:
    # 4 FMA (1 op each) + 2 where (2 ops each) + sqrt(abs+add) (3 ops)
    # = 11 vector ops.
    for _ in range(3):
        acc = acc * jnp.float32(0.999755859375) + x
    acc = jnp.where(acc > x, acc, acc + x)
    acc = acc * jnp.float32(0.5) + jnp.float32(0.1)
    acc = jnp.where(acc < jnp.float32(8.0), acc, acc - x)
    return jnp.sqrt(jnp.abs(acc) + jnp.float32(0.25))


# Op counting convention (applied uniformly): an FMA a*k+x = 1 vector op;
# a jnp.where = 2 ops (compare + select); sqrt/div/rsqrt applied to an
# (abs, add)-prepared operand = 3 ops (abs + add + special).
CASES = {
    # name: (body, vector-ops per chain-trip, flops per chain-trip)
    "fma": (_fma, 1, 2),
    "cmpsel": (_cmpsel, 2, 2),
    "sqrt": (_sqrt, 3, 3),
    "div": (_div, 3, 3),
    "rsqrt": (_rsqrt, 3, 3),
    "render_mix": (_mix, 11, 14),
}


def run_case(name, body, ops_per_trip, floor):
    kernel, _ = _mk_kernel(body, ops_per_trip)
    x = jnp.full((BLK_H, BLK_W), 1.000244140625, jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((BLK_H, BLK_W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK_H, BLK_W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLK_H, BLK_W), jnp.float32),
    )
    f = jax.jit(f)
    # axon's block_until_ready is unreliable (returns before the kernel
    # finishes -- the round-1 numbers timed dispatch only, reporting an
    # absurd 2154 Tops/s).  A host transfer of the 16KB output is the
    # only dependable sync, same as bench.py.  The measured
    # dispatch+transfer floor (~20 ms) is NOT noise for the fast op
    # classes (fma best ~115 ms -> ~19% bias), so the reported rate
    # subtracts it: rate = vops / (best - floor).
    np.asarray(f(x))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    lanes = BLK_H * BLK_W
    vops = T * K * CHAINS * ops_per_trip * lanes
    return vops / max(best - floor, 1e-9), best


def measure_floor():
    """Dispatch + 16KB host-transfer floor: a 1-trip kernel, timed the
    same way.  run_case subtracts it from every best time (it is up to
    ~19% of the fast op classes' runtimes), and the artifact reports it
    so the correction is auditable."""
    def tiny(x_ref, o_ref):
        o_ref[:] = x_ref[:] * jnp.float32(2.0)

    x = jnp.full((BLK_H, BLK_W), 1.0, jnp.float32)
    f = jax.jit(pl.pallas_call(
        tiny,
        in_specs=[pl.BlockSpec((BLK_H, BLK_W), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK_H, BLK_W), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLK_H, BLK_W), jnp.float32)))
    np.asarray(f(x))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dev = jax.devices()[0]
    floor = measure_floor()
    print(f"dispatch+transfer floor: {floor*1e3:.2f} ms", flush=True)
    out = {"device": str(dev), "blk": [BLK_H, BLK_W], "chains": CHAINS,
           "grid": T, "inner": K, "sync": "host transfer (np.asarray)",
           "floor_s": floor, "floor_subtracted": True, "cases": {}}
    for name, (body, vops, flops) in CASES.items():
        rate, best = run_case(name, body, vops, floor)
        out["cases"][name] = {
            "vector_ops_per_sec": rate,
            "best_time_s": best,
        }
        print(f"{name:12s} {rate/1e12:.3f} Tops/s  (best {best*1e3:.2f} ms)",
              flush=True)
    os.makedirs("build", exist_ok=True)
    path = os.path.join("build", "vpu_roofline.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
