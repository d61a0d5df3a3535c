"""Checkpoint/resume tests: a resumed progressive render must continue
bit-identically (the accumulation state IS the checkpoint, SURVEY.md
section 5), and train state must round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from toypathtracer_tpu import RenderConfig
from toypathtracer_tpu import checkpoint as ckpt
from toypathtracer_tpu.render.frame import init_frame_state, progressive_step

CFG = RenderConfig(width=64, height=8, samples_per_pixel=1, max_depth=4)


def test_progressive_resume_bitexact(tmp_path, small_scene):
    state = init_frame_state(CFG)
    for _ in range(3):
        state, img, _ = progressive_step(state, small_scene,
                                         jnp.float32(0.0), CFG)
    path = str(tmp_path / "frame.npz")
    ckpt.save_frame_state(path, state)

    # continue live vs continue from the checkpoint
    live = state
    for _ in range(2):
        live, img_live, _ = progressive_step(live, small_scene,
                                             jnp.float32(0.0), CFG)
    resumed = ckpt.load_frame_state(path)
    assert int(resumed.frame) == 3
    for _ in range(2):
        resumed, img_res, _ = progressive_step(resumed, small_scene,
                                               jnp.float32(0.0), CFG)
    np.testing.assert_array_equal(np.asarray(img_live), np.asarray(img_res))


def test_scene_roundtrip(tmp_path, big_scene):
    path = str(tmp_path / "scene.npz")
    ckpt.save_scene(path, big_scene)
    back = ckpt.load_scene(path)
    assert back.mat_type == big_scene.mat_type
    assert back.emissive_ids == big_scene.emissive_ids
    assert back.camera == big_scene.camera
    np.testing.assert_array_equal(np.asarray(back.center),
                                  np.asarray(big_scene.center))
    np.testing.assert_array_equal(np.asarray(back.albedo),
                                  np.asarray(big_scene.albedo))


def _flat_leaves(tree):
    return np.concatenate([
        np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "shape")
    ])


def test_train_state_roundtrip(tmp_path, small_scene):
    opt = optax.adam(1e-2)
    # make the Adam moments non-trivial with one update
    grads = jax.tree_util.tree_map(jnp.ones_like, small_scene)
    opt_state = opt.init(small_scene)
    _, opt_state = opt.update(grads, opt_state, small_scene)

    path = str(tmp_path / "train")
    ckpt.save_train_state(path, small_scene, opt_state, step=7)
    scene2, opt2, step = ckpt.load_train_state(path, opt.init(small_scene))
    assert step == 7
    np.testing.assert_array_equal(np.asarray(scene2.radius),
                                  np.asarray(small_scene.radius))
    np.testing.assert_array_equal(_flat_leaves(opt_state),
                                  _flat_leaves(opt2))
