"""Checkpoint / resume.

The reference's only persistent state is implicit: the progressive
accumulation buffer + frame counter pair that survives across frames
(reference: Cpp/Source/Test.cpp:272-276, 293-294; reset on toggles,
Cpp/Windows/TestWin.cpp:424-431).  SURVEY.md section 5 identifies that
tuple as the checkpointable step state; here it is serialized explicitly,
along with scenes and inverse-rendering (scene + Adam) training state, so
long progressive renders and optimizations resume across processes.

Format: a single .npz per checkpoint (the state is tiny -- one image plus
scalars); pytrees are flattened with their treedef recorded by path.  No
multi-host coordination is needed: state is replicated or host-local.
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .render.frame import FrameState
from .scene import CameraSpec, Scene


def _tree_to_arrays(tree) -> Tuple[dict, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def _arrays_to_tree(treedef, data) -> Any:
    leaves = [jnp.asarray(data[f"leaf_{i}"])
              for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_frame_state(path: str, state: FrameState) -> None:
    np.savez(path, accum=np.asarray(state.accum),
             frame=np.asarray(state.frame))


def load_frame_state(path: str) -> FrameState:
    d = np.load(path)
    return FrameState(accum=jnp.asarray(d["accum"]),
                      frame=jnp.asarray(d["frame"], jnp.int32))


def save_scene(path: str, scene: Scene) -> None:
    meta = dict(
        mat_type=list(scene.mat_type),
        emissive_ids=list(scene.emissive_ids),
        camera=vars(scene.camera) if not isinstance(scene.camera, dict)
        else scene.camera,
    )
    np.savez(
        path,
        center=np.asarray(scene.center), radius=np.asarray(scene.radius),
        albedo=np.asarray(scene.albedo),
        emissive=np.asarray(scene.emissive),
        roughness=np.asarray(scene.roughness), ri=np.asarray(scene.ri),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def load_scene(path: str) -> Scene:
    d = np.load(path)
    meta = json.loads(bytes(d["meta"]).decode())
    cam = meta["camera"]
    for k in ("look_from", "look_at", "vup"):
        cam[k] = tuple(cam[k])
    return Scene(
        center=jnp.asarray(d["center"]), radius=jnp.asarray(d["radius"]),
        albedo=jnp.asarray(d["albedo"]), emissive=jnp.asarray(d["emissive"]),
        roughness=jnp.asarray(d["roughness"]), ri=jnp.asarray(d["ri"]),
        mat_type=tuple(meta["mat_type"]),
        emissive_ids=tuple(meta["emissive_ids"]),
        camera=CameraSpec(**cam),
    )


def save_train_state(path: str, scene: Scene, opt_state, step: int) -> None:
    """Inverse-rendering checkpoint: scene params + full Adam state."""
    arrays, treedef = _tree_to_arrays(opt_state)
    save_scene(path + ".scene.npz", scene)
    np.savez(path + ".opt.npz", step=np.int64(step), **arrays)


def load_train_state(path: str, opt_state_like) -> Tuple[Scene, Any, int]:
    """`opt_state_like`: a freshly built opt state providing the treedef."""
    scene = load_scene(path + ".scene.npz")
    d = np.load(path + ".opt.npz")
    _, treedef = _tree_to_arrays(opt_state_like)
    opt_state = _arrays_to_tree(treedef, d)
    return scene, opt_state, int(d["step"])
