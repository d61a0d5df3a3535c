"""Real two-process jax.distributed smoke (SURVEY.md section 2.4 DCN row).

Spawns two OS processes (tools/distributed_smoke.py) with a localhost
coordinator; each brings 2 virtual CPU devices into ONE global 4-device
mesh and runs one sharded render step.  This is the code path a TPU pod
runs (jax.distributed.initialize + global mesh + shard_map); the single
process-local analog is tests/test_sharding.py.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "distributed_smoke.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_render(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    grads_path = str(tmp_path / "dist_grads.npz")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord, "2",
             grads_path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke timed out (coordinator hang?)")

    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"

    lines = [re.search(r"SMOKE pid=(\d+) global_devices=(\d+) .*"
                       r"rays=(\d+) local_rows=(\d+) sum=([-\d.]+)", out)
             for _, out, _ in outs]
    assert all(lines), [o for _, o, _ in outs]
    rays = {m.group(3) for m in lines}
    assert len(rays) == 1, "processes disagree on the psum'd ray count"
    assert int(rays.pop()) > 0
    assert {m.group(2) for m in lines} == {"4"}  # one global 4-device mesh
    # each process holds half the rows
    assert {m.group(4) for m in lines} == {"16"}

    # The global render must be exactly the single-process render: the
    # per-pixel program depends only on pixel coords + frame seed.
    import jax.numpy as jnp
    from toypathtracer_tpu import RenderConfig, make_scene
    from toypathtracer_tpu.render.wavefront import render_frame
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=1, max_depth=3)
    _, rays_ref = render_frame(make_scene(big=True), cfg, jnp.int32(0))
    assert int(rays_ref) == int(lines[0].group(3))

    # --- multi-host GRADIENT equality (round 5, the DCN analog of
    # test_sharding.py's ICI gradient tests): the 2-process sharded
    # value_and_grad step must reproduce the single-process sharded
    # result on an equal-shape (4-virtual-device) mesh.
    losses = {re.search(r"loss=([-\d.e+]+)", out).group(1)
              for _, out, _ in outs}
    assert len(losses) == 1, "processes disagree on the psum'd loss"

    import numpy as np
    import jax
    from toypathtracer_tpu.inverse import make_sharded_value_and_grad
    from toypathtracer_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(jax.devices()[:4])
    scene = make_scene(big=True)
    scene_p = scene.replace(center=scene.center + 0.03)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    vg = jax.jit(make_sharded_value_and_grad(cfg, mesh))
    loss_ref, grads_ref = vg(scene_p, target, jnp.int32(1))
    np.testing.assert_allclose(float(losses.pop()), float(loss_ref),
                               rtol=1e-6)
    dist = np.load(grads_path)
    for f in ("center", "radius", "albedo", "emissive"):
        np.testing.assert_allclose(
            dist[f], np.asarray(getattr(grads_ref, f)),
            rtol=1e-5, atol=1e-8,
            err_msg=f"{f}: 2-process grads != single-process sharded")
