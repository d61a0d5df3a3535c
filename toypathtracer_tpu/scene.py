"""Scene description: spheres + materials as a differentiable pytree.

This is the TPU-native equivalent of the reference's static scene arrays
(reference: Cpp/Source/Test.cpp:13-67) and `SpheresSoA`
(reference: Cpp/Source/Maths.h:368-404).  The sphere/material parameter
arrays ARE the differentiable parameters of the framework: `jax.grad`
flows into `center`, `radius`, `albedo`, `emissive`, `roughness`, `ri`.

Static (non-traced) metadata -- sphere count, emissive index list, camera
spec -- lives in hashable aux fields so renderers can unroll over them.
The emissive index list mirrors the reference's per-frame rebuild
(Test.cpp:321-338); it is recomputed on host whenever a scene is built
(the set never changes under the reference's animation path).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAT_LAMBERT = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2


@dataclasses.dataclass(frozen=True)
class CameraSpec:
    """Static camera parameters (reference: Test.cpp:309-319, 341)."""

    look_from: Tuple[float, float, float] = (0.0, 2.0, 3.0)
    look_at: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    vup: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    vfov: float = 60.0
    aperture: float = 0.02  # 0.1 * 0.2 for the big scene (Test.cpp:315-319)
    focus_dist: float = 3.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Differentiable scene pytree.

    Data fields are jnp arrays (leaves); meta fields are static.
    Layout mirrors the reference Material struct (Test.cpp:36-44) and
    Sphere struct (Maths.h:354-364), re-shaped as arrays-of-parameters.
    """

    center: jax.Array      # (N, 3) f32
    radius: jax.Array      # (N,)   f32
    albedo: jax.Array      # (N, 3) f32
    emissive: jax.Array    # (N, 3) f32
    roughness: jax.Array   # (N,)   f32
    ri: jax.Array          # (N,)   f32  (index of refraction, dielectrics)

    mat_type: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    emissive_ids: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    camera: CameraSpec = dataclasses.field(metadata=dict(static=True))

    @property
    def n_spheres(self) -> int:
        return len(self.mat_type)

    def replace(self, **kw) -> "Scene":
        return dataclasses.replace(self, **kw)

    def animate(self, time: jax.Array) -> "Scene":
        """Reference animation: sphere 1 bobs in y, sphere 8 sways in z
        (reference: Test.cpp:304-308)."""
        center = self.center
        center = center.at[1, 1].set(jnp.cos(time) + 1.0)
        center = center.at[8, 2].set(jnp.sin(time) * 0.3)
        return self.replace(center=center)


def _base_scene_rows():
    """The 9-sphere base scene (reference: Test.cpp:15-23, 48-56)."""
    spheres = [
        ((0, -100.5, -1), 100.0),
        ((2, 0, -1), 0.5),
        ((0, 0, -1), 0.5),
        ((-2, 0, -1), 0.5),
        ((2, 0, 1), 0.5),
        ((0, 0, 1), 0.5),
        ((-2, 0, 1), 0.5),
        ((0.5, 1, 0.5), 0.5),
        ((-1.5, 1.5, 0.0), 0.3),
    ]
    # (type, albedo, emissive, roughness, ri)
    mats = [
        (MAT_LAMBERT, (0.8, 0.8, 0.8), (0, 0, 0), 0.0, 0.0),
        (MAT_LAMBERT, (0.8, 0.4, 0.4), (0, 0, 0), 0.0, 0.0),
        (MAT_LAMBERT, (0.4, 0.8, 0.4), (0, 0, 0), 0.0, 0.0),
        (MAT_METAL, (0.4, 0.4, 0.8), (0, 0, 0), 0.0, 0.0),
        (MAT_METAL, (0.4, 0.8, 0.4), (0, 0, 0), 0.0, 0.0),
        (MAT_METAL, (0.4, 0.8, 0.4), (0, 0, 0), 0.2, 0.0),
        (MAT_METAL, (0.4, 0.8, 0.4), (0, 0, 0), 0.6, 0.0),
        (MAT_DIELECTRIC, (0.4, 0.4, 0.4), (0, 0, 0), 0.0, 1.5),
        (MAT_LAMBERT, (0.8, 0.6, 0.2), (30, 25, 15), 0.0, 0.0),
    ]
    return spheres, mats


def _big_scene_rows():
    """The 46-sphere big scene (reference: Test.cpp:24-30, 57-63).

    36 grid spheres in 4 rows of 9 (z = -3..-6, x = 4..-4) plus a second
    emissive sphere.  Material rows follow Test.cpp:58-62 exactly.
    """
    spheres, mats = _base_scene_rows()
    for z in (-3, -4, -5, -6):
        for x in (4, 3, 2, 1, 0, -1, -2, -3, -4):
            spheres.append(((float(x), 0.0, float(z)), 0.5))
    spheres.append(((1.5, 1.5, -2.0), 0.3))

    grays = [(0.1 * k,) * 3 for k in range(1, 10)]
    colors = [
        (0.8, 0.1, 0.1), (0.8, 0.5, 0.1), (0.8, 0.8, 0.1),
        (0.4, 0.8, 0.1), (0.1, 0.8, 0.1), (0.1, 0.8, 0.5),
        (0.1, 0.8, 0.8), (0.1, 0.1, 0.8), (0.5, 0.1, 0.8),
    ]
    for alb in grays:
        mats.append((MAT_LAMBERT, alb, (0, 0, 0), 0.0, 0.0))
    for alb in grays:
        mats.append((MAT_METAL, alb, (0, 0, 0), 0.0, 0.0))
    for alb in colors:
        mats.append((MAT_METAL, alb, (0, 0, 0), 0.0, 0.0))
    for alb in colors[:-1]:
        mats.append((MAT_LAMBERT, alb, (0, 0, 0), 0.0, 0.0))
    mats.append((MAT_METAL, colors[-1], (0, 0, 0), 0.0, 0.0))
    mats.append((MAT_LAMBERT, (0.1, 0.2, 0.5), (3, 10, 20), 0.0, 0.0))
    return spheres, mats


def _build(spheres, mats, camera: CameraSpec) -> Scene:
    center = np.array([s[0] for s in spheres], dtype=np.float32)
    radius = np.array([s[1] for s in spheres], dtype=np.float32)
    mat_type = tuple(int(m[0]) for m in mats)
    albedo = np.array([m[1] for m in mats], dtype=np.float32)
    emissive = np.array([m[2] for m in mats], dtype=np.float32)
    roughness = np.array([m[3] for m in mats], dtype=np.float32)
    ri = np.array([m[4] for m in mats], dtype=np.float32)
    # Emissive sphere index list (reference: Test.cpp:332-338).
    emissive_ids = tuple(
        i for i in range(len(mats)) if (emissive[i] > 0).any()
    )
    return Scene(
        center=jnp.asarray(center),
        radius=jnp.asarray(radius),
        albedo=jnp.asarray(albedo),
        emissive=jnp.asarray(emissive),
        roughness=jnp.asarray(roughness),
        ri=jnp.asarray(ri),
        mat_type=mat_type,
        emissive_ids=emissive_ids,
        camera=camera,
    )


def make_scene(big: bool = True, mitsuba_compare: bool = False) -> Scene:
    """Build the reference scene.

    big=True  -> 46 spheres, 2 emissive (DO_BIG_SCENE=1, Test.cpp:11)
    big=False -> 9 spheres, 1 emissive

    Aperture: 0.1 base, 0 under mitsuba-compare, x0.2 for the big scene
    (reference: Test.cpp:311-319).
    """
    aperture = 0.0 if mitsuba_compare else 0.1
    if big:
        aperture *= 0.2
        spheres, mats = _big_scene_rows()
    else:
        spheres, mats = _base_scene_rows()
    cam = CameraSpec(aperture=aperture)
    return _build(spheres, mats, cam)


def validate_scene(scene: Scene) -> None:
    """Host-side scene sanity checks (concrete arrays only).

    Warns when an EMISSIVE sphere's surface is embedded in (or overlaps)
    another sphere: the fast forward kernels' interval-overlap shadow test
    (ops/tracecore._occ_test) reports "occluded" for a shadow ray that
    starts inside an occluder whose root interval also spans the light,
    where the reference's nearest-valid-root rule reports "visible" --
    impossible in the shipped scenes (spheres at most tangent,
    Test.cpp:13-31) but reachable in user scenes.  NEE on such lanes is
    darkened; the golden-parity path (Samplers.exact_shadow) is exact
    regardless."""
    import warnings
    c = np.asarray(scene.center, dtype=np.float64)
    r = np.asarray(scene.radius, dtype=np.float64)
    for e in scene.emissive_ids:
        # light e's surface intersects/embeds in sphere j when the center
        # distance is below r_j + r_e (tangency is fine: measure-zero)
        d = np.sqrt(((c - c[e]) ** 2).sum(axis=1))
        over = (d < r + r[e] - 1e-12)
        over[e] = False
        if over.any():
            j = int(np.argmax(over))
            warnings.warn(
                f"emissive sphere {e} overlaps sphere {j} "
                f"(center distance {d[j]:.4g} < r_sum {r[j] + r[e]:.4g}): "
                "the fast path's interval-overlap shadow test darkens NEE "
                "for shadow rays starting inside the overlap; use the "
                "exact-shadow samplers for this scene", stacklevel=2)


def recompute_emissive_ids(scene: Scene) -> Scene:
    """Host-side rebuild of the emissive index list from concrete values
    (mirrors the per-frame rebuild at reference Test.cpp:321-338).  Call
    after materially editing `emissive`; requires concrete (non-traced)
    arrays."""
    em = np.asarray(scene.emissive)
    ids = tuple(i for i in range(em.shape[0]) if (em[i] > 0).any())
    return scene.replace(emissive_ids=ids)
