#!/usr/bin/env python3
"""Export a Scene to a Mitsuba 0.5/0.6 XML file for ground-truth renders.

The reference ships a hand-written Mitsuba translation of its 9-sphere
scene for correctness comparison (reference: Mitsuba/scene.xml:1-106,
used with DO_MITSUBA_COMPARE -- readme.md:15).  This tool generates the
equivalent XML from any of our Scene pytrees, so the comparison workflow
covers the big scene and edited/optimized scenes too:

  python tools/export_mitsuba.py --big --out build/scene_big.xml

Mapping follows the reference's translation choices exactly:
  Lambert     -> diffuse bsdf              (scene.xml:31-36)
  Metal       -> conductor, eta 0 k 1 with specularReflectance = albedo
                 (ideal mirror; the compare mode forces roughness 0,
                  Test.cpp:143-145)       (scene.xml:44-50)
  Dielectric  -> dielectric intIOR=ri      (scene.xml:87-93)
  emissive>0  -> area emitter with radiance = emissive (scene.xml:95-104)
  sky         -> constant emitter (0.15,0.21,0.3) matching the compare
                 sky (Test.cpp:226-227)    (scene.xml:26-28)
  camera      -> perspective, fov from vfov/aspect, aperture 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pure host-side XML generation: force the CPU backend via config update
# (the tunneled-TPU environment ignores the env var and a downed tunnel
# would hang this tool at first array creation).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np


HEADER = """<?xml version="1.0" encoding="utf-8"?>
<scene version="0.5.0">
    <integrator type="path">
        <integer name="maxDepth" value="{max_depth}"/>
    </integrator>

    <sensor type="perspective">
        <float name="fov" value="{vfov}"/>
        <string name="fovAxis" value="y"/>
        <transform name="toWorld">
            <lookat origin="{ox}, {oy}, {oz}" target="{tx}, {ty}, {tz}"
                    up="{ux}, {uy}, {uz}"/>
        </transform>
        <sampler type="independent">
            <integer name="sampleCount" value="{spp}"/>
        </sampler>
        <film type="hdrfilm">
            <integer name="width" value="{width}"/>
            <integer name="height" value="{height}"/>
            <string name="pixelFormat" value="rgb"/>
        </film>
    </sensor>

    <emitter type="constant">
        <spectrum name="radiance" value="0.15, 0.21, 0.3"/>
    </emitter>
"""

SPHERE = """
    <shape type="sphere">
        <point name="center" x="{cx}" y="{cy}" z="{cz}"/>
        <float name="radius" value="{r}"/>
{inner}    </shape>
"""


def bsdf_for(mtype, alb, ri):
    a = f"{alb[0]:.6g}, {alb[1]:.6g}, {alb[2]:.6g}"
    if mtype == 2:  # dielectric
        return (f'        <bsdf type="dielectric">\n'
                f'            <float name="intIOR" value="{ri:.6g}"/>\n'
                f'        </bsdf>\n')
    if mtype == 1:  # metal -> ideal mirror tinted by albedo
        return ('        <bsdf type="conductor">\n'
                '            <spectrum name="eta" value="0"/>\n'
                '            <spectrum name="k" value="1"/>\n'
                f'            <spectrum name="specularReflectance" '
                f'value="{a}"/>\n'
                '        </bsdf>\n')
    return (f'        <bsdf type="diffuse">\n'
            f'            <spectrum name="reflectance" value="{a}"/>\n'
            f'        </bsdf>\n')


def export(scene, cfg, path):
    cam = scene.camera
    parts = [HEADER.format(
        max_depth=cfg.max_depth, vfov=cam.vfov,
        ox=cam.look_from[0], oy=cam.look_from[1], oz=cam.look_from[2],
        tx=cam.look_at[0], ty=cam.look_at[1], tz=cam.look_at[2],
        ux=cam.vup[0], uy=cam.vup[1], uz=cam.vup[2],
        spp=256, width=cfg.width, height=cfg.height,
    )]
    center = np.asarray(scene.center)
    radius = np.asarray(scene.radius)
    albedo = np.asarray(scene.albedo)
    emissive = np.asarray(scene.emissive)
    ri = np.asarray(scene.ri)
    for i in range(scene.n_spheres):
        inner = bsdf_for(scene.mat_type[i], albedo[i], float(ri[i]))
        if (emissive[i] > 0).any():
            e = emissive[i]
            inner += (f'        <emitter type="area">\n'
                      f'            <spectrum name="radiance" '
                      f'value="{e[0]:.6g}, {e[1]:.6g}, {e[2]:.6g}"/>\n'
                      f'        </emitter>\n')
        parts.append(SPHERE.format(cx=center[i, 0], cy=center[i, 1],
                                   cz=center[i, 2], r=radius[i],
                                   inner=inner))
    parts.append("</scene>\n")
    with open(path, "w") as f:
        f.write("".join(parts))
    print(f"wrote {path} ({scene.n_spheres} spheres)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--out", default="build/scene.xml")
    args = ap.parse_args()

    from toypathtracer_tpu import RenderConfig, make_scene
    scene = make_scene(big=args.big, mitsuba_compare=True)
    cfg = RenderConfig(width=args.width, height=args.height,
                       do_mitsuba_compare=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    export(scene, cfg, args.out)


if __name__ == "__main__":
    main()
