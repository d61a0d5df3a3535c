"""Thin-lens camera (reference: Cpp/Source/Maths.h:414-450).

`make_camera` precomputes the derived frame (origin, lowerLeftCorner,
horizontal, vertical, u/v/w basis, lensRadius) exactly as the reference
Camera constructor (Maths.h:418-435).  The result is a dict of scalar
jnp values consumed by `tracecore.camera_get_ray`; being plain jnp math it
is differentiable w.r.t. any traced inputs.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import KPI
from .scene import CameraSpec


def _v(t):
    return tuple(jnp.float32(x) for x in t)


def _norm(a):
    inv = 1.0 / jnp.sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2])
    return (a[0] * inv, a[1] * inv, a[2] * inv)


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        -(a[0] * b[2] - a[2] * b[0]),
        a[0] * b[1] - a[1] * b[0],
    )


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def make_camera(spec: CameraSpec, aspect: float):
    """Build the camera scalar dict (reference: Maths.h:418-435)."""
    look_from = _v(spec.look_from)
    look_at = _v(spec.look_at)
    vup = _v(spec.vup)
    lens_radius = jnp.float32(spec.aperture / 2.0)
    theta = jnp.float32(spec.vfov) * jnp.float32(KPI / 180.0)
    half_height = jnp.tan(theta / 2.0)
    half_width = jnp.float32(aspect) * half_height
    origin = look_from
    w = _norm(_sub(look_from, look_at))
    u = _norm(_cross(vup, w))
    v = _cross(w, u)
    lower_left = _sub(
        _sub(_sub(origin, _scale(u, half_width * spec.focus_dist)),
             _scale(v, half_height * spec.focus_dist)),
        _scale(w, jnp.float32(spec.focus_dist)),
    )
    horizontal = _scale(u, 2.0 * half_width * spec.focus_dist)
    vertical = _scale(v, 2.0 * half_height * spec.focus_dist)
    return dict(
        origin=origin,
        lower_left=lower_left,
        horizontal=horizontal,
        vertical=vertical,
        u=u,
        v=v,
        w=w,
        lens_radius=lens_radius,
    )


def camera_to_array(cam) -> jnp.ndarray:
    """Flatten the camera dict to a (22,) f32 array for SMEM transport into
    Pallas kernels (the TPU analog of the 88-byte Camera upload,
    reference: TestWin.cpp:132-134)."""
    parts = []
    for k in ("origin", "lower_left", "horizontal", "vertical", "u", "v", "w"):
        parts.extend(cam[k])
    parts.append(cam["lens_radius"])
    return jnp.stack([jnp.float32(p) for p in parts])


def camera_from_array_reader(read):
    """Rebuild the camera dict from an element reader `read(i) -> scalar`
    (e.g. an SMEM ref indexer inside a Pallas kernel)."""
    names = ("origin", "lower_left", "horizontal", "vertical", "u", "v", "w")
    cam = {}
    for j, k in enumerate(names):
        cam[k] = (read(3 * j), read(3 * j + 1), read(3 * j + 2))
    cam["lens_radius"] = read(21)
    return cam
