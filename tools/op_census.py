"""Deterministic VPU op census of the fused wavefront loop body.

Counts jaxpr primitives of ONE iteration of render_pixels_fused's while
loop (the production kernel body, unrolled SMEM-style port), grouped by
VPU cost class.  This is the measurement tool behind docs/PERFORMANCE.md's
ops/lane-slot numbers: every op-level optimization is first verified here
as a deterministic count delta, then A/B'd on the chip (tunnel noise is
±40%, so wall-clock alone cannot attribute small wins).

Counting convention: an eqn whose OUTPUT has the lane-block shape is one
vector op per output (mul and add counted separately -- the census is a
pre-fusion upper bound, consistent across A/B arms).  Scalar ops (SMEM
reads, loop bookkeeping) are counted but reported separately; they retire
on the scalar core, not the VPU.

Usage: python tools/op_census.py [--k 15] [--merged] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The tunneled-TPU environment pins its platform at plugin registration;
# only the config update reliably selects CPU (a downed tunnel otherwise
# HANGS this pure-tracing tool at backend init).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

_ClosedJaxpr = jax._src.core.ClosedJaxpr

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from toypathtracer_tpu import RenderConfig, make_scene  # noqa: E402
from toypathtracer_tpu.camera import make_camera  # noqa: E402
from toypathtracer_tpu.ops import tracecore as tc  # noqa: E402

# VPU cost classes (docs/PERFORMANCE.md roofline categories)
CLASSES = {
    "mul_add": {"add", "sub", "mul", "neg", "max", "min", "abs",
                "and", "or", "not", "xor", "shift_left",
                "shift_right_logical", "shift_right_arithmetic"},
    "cmp_sel": {"lt", "le", "gt", "ge", "eq", "ne", "select_n"},
    "special": {"sqrt", "rsqrt", "div", "exp", "log", "sin", "cos",
                "pow", "cbrt", "tanh", "logistic"},
    "convert": {"convert_element_type", "bitcast_convert_type"},
}


def _class_of(prim: str) -> str:
    for k, names in CLASSES.items():
        if prim in names:
            return k
    return "other"


def _walk(jaxpr, counts, lane_size: int, mult: int = 1):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        # recurse into sub-jaxprs (cond branches both counted: masked
        # execution runs them straight-line when skip_empty is off)
        for v in eqn.params.values():
            if isinstance(v, _ClosedJaxpr):
                _walk(v.jaxpr, counts, lane_size, mult)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if isinstance(x, _ClosedJaxpr):
                        _walk(x.jaxpr, counts, lane_size, mult)
        if prim in ("while", "cond", "scan", "closed_call", "pjit", "jit",
                    "custom_jvp_call", "custom_vjp_call", "remat",
                    "checkpoint"):
            continue
        out = eqn.outvars[0]
        try:
            size = 1
            for d in out.aval.shape:
                size *= d
        except Exception:
            size = 1
        kind = "vector" if size >= lane_size else "scalar"
        counts.setdefault(kind, {})
        cls = _class_of(prim)
        counts[kind][cls] = counts[kind].get(cls, 0) + mult
        counts.setdefault("by_prim" if kind == "vector" else "_sp", {})
        if kind == "vector":
            counts["by_prim"][prim] = counts["by_prim"].get(prim, 0) + mult


def census_fused_body(cfg: RenderConfig, scene, lane_h: int, lane_w: int,
                      n_slots: int):
    """Trace render_pixels_fused at the production lane-block shape with an
    unrolled (stacked()-less) port of traced scene scalars, find the while
    loop, and census its body once."""

    class TracedPort(tc.ScenePort):
        """Unrolled port over traced per-sphere scalars -- the same code
        shape the SMEM port produces inside the Pallas kernel."""

        def __init__(self, vals, mat_type, emissive_ids):
            self._v = vals
            self._mat_type = mat_type
            self.n = len(mat_type)
            self.emissive_ids = emissive_ids

        def sphere(self, i):
            v = self._v
            return tc.SphereData(v[0][i], v[1][i], v[2][i], v[3][i],
                                 v[4][i], v[5][i])

        def material(self, i):
            v = self._v
            return tc.MaterialData(
                mtype=self._mat_type[i],
                alb=(v[6][i], v[7][i], v[8][i]),
                em=(v[9][i], v[10][i], v[11][i]),
                roughness=v[12][i], ri=v[13][i])

    n = scene.n_spheres
    cam_spec = make_camera(scene.camera, cfg.width / cfg.height)

    def run(scene_rows, cam_vals):
        port = TracedPort(scene_rows, scene.mat_type, scene.emissive_ids)
        cam = {k: (tuple(cam_vals[k]) if isinstance(cam_spec[k], tuple)
                   else cam_vals[k]) for k in cam_spec}
        yy = jax.lax.broadcasted_iota(jnp.int32, (lane_h, lane_w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (lane_h, lane_w), 1)
        sink = [jnp.float32(0.0)]

        def flush(finished, col, *slot):
            sink[0] = sink[0] + jnp.sum(jnp.where(finished, col[0], 0.0))

        out = tc.render_pixels_fused(port, cfg, cam, xx, yy, jnp.int32(0),
                                     flush=flush,
                                     n_slots=n_slots, slot_dy=lane_h)
        return out[1], sink[0]

    rows = tuple(tuple(jnp.float32(0.5) for _ in range(n))
                 for _ in range(14))
    cam_vals = {k: (tuple(jnp.float32(x) for x in v)
                    if isinstance(v, tuple) else jnp.float32(v))
                for k, v in cam_spec.items()}
    jaxpr = jax.make_jaxpr(run)(rows, cam_vals)

    whiles = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "while"]
    # the bounce loop is the while with the largest body
    body = max((e.params["body_jaxpr"] for e in whiles),
               key=lambda b: len(b.jaxpr.eqns))
    counts = {}
    _walk(body.jaxpr, counts, lane_size=lane_h * lane_w)
    counts.pop("_sp", None)
    vec = counts.get("vector", {})
    counts["vector_total"] = sum(vec.values())
    counts["lane_block"] = [lane_h, lane_w]
    counts["n_slots"] = n_slots
    return counts


def census_diff_bounce(cfg: RenderConfig, scene, lane_h: int, lane_w: int,
                       merged: bool):
    """Census ONE differentiable bounce (the body the backward sweep
    recomputes and transposes): bounce_parts for the round-4 lockstep
    formulation, bounce_parts_merged (+ its share of the prologue,
    amortized to ~0) for the round-5 merged route.  Counts the forward
    expressions only -- the vjp roughly doubles every differentiable op,
    so a forward delta transfers ~proportionally to fwd+bwd."""
    from toypathtracer_tpu.ops.pallas_grad import TupleScenePort
    from toypathtracer_tpu.ops.pallas_render import SCENE_ROWS

    n = scene.n_spheres

    def run(scene_rows):
        port = TupleScenePort(scene_rows, scene.mat_type,
                              scene.emissive_ids)
        shape = (lane_h, lane_w)
        zero = jnp.zeros(shape, jnp.float32)
        ro = (zero, zero + 2.0, zero + 3.0)
        rd = (zero, zero - 0.5, zero - 0.8)
        alive = zero < 1.0
        do_me = zero < 1.0
        state = jnp.full(shape, 123456789, jnp.uint32)
        raycnt = jnp.zeros(shape, jnp.int32)
        carry = (ro, rd, alive, do_me, state, raycnt)
        if merged:
            hit_t = zero + 2.5
            hit_id = jnp.zeros(shape, jnp.int32)
            out, e, c, ht2, hid2 = tc.bounce_parts_merged(
                port, cfg, carry, hit_t, hit_id)
            return out[5], e[0], c[0], ht2
        out, e, c = tc.bounce_parts(port, cfg, carry)
        return out[5], e[0], c[0]

    rows = tuple(tuple(jnp.float32(0.5) for _ in range(n))
                 for _ in range(SCENE_ROWS))
    jaxpr = jax.make_jaxpr(run)(rows)
    counts = {}
    _walk(jaxpr.jaxpr, counts, lane_size=lane_h * lane_w)
    counts.pop("_sp", None)
    vec = counts.get("vector", {})
    counts["vector_total"] = sum(vec.values())
    counts["lane_block"] = [lane_h, lane_w]
    counts["n_slots"] = 1
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=15, help="pix_per_lane")
    ap.add_argument("--tile-w", type=int, default=128)
    ap.add_argument("--lane-h", type=int, default=8)
    ap.add_argument("--merged", action="store_true",
                    help="census the software-pipelined (merged) loop")
    ap.add_argument("--diff", action="store_true",
                    help="census one DIFFERENTIABLE bounce (the unit the "
                         "backward sweep recomputes+transposes) instead "
                         "of the fused forward loop body")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    scene = make_scene(big=True)
    # production workload: 1280x720, 4 spp, depth 10
    cfg = RenderConfig(merged_wavefront=args.merged)
    if args.diff:
        counts = census_diff_bounce(cfg, scene, args.lane_h, args.tile_w,
                                    args.merged)
    else:
        counts = census_fused_body(cfg, scene, args.lane_h, args.tile_w,
                                   args.k)
    top = sorted(counts["by_prim"].items(), key=lambda kv: -kv[1])[:20]
    print(json.dumps({
        "vector_total": counts["vector_total"],
        "vector_by_class": counts.get("vector", {}),
        "scalar_by_class": counts.get("scalar", {}),
        "top_vector_prims": top,
        "lane_block": counts["lane_block"],
        "n_slots": counts["n_slots"],
    }, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(counts, f, indent=1)


if __name__ == "__main__":
    main()
