#!/usr/bin/env python3
"""Two-process jax.distributed smoke worker (SURVEY.md section 2.4 DCN row).

The reference is single-process; this exercises the framework's multi-host
path for real: two OS processes, a localhost coordinator, one GLOBAL mesh
over both processes' (virtual CPU) devices, one sharded render step whose
row shards land on each process's local devices and whose ray-count psum
crosses the process boundary (DCN analog).

Usage (run one per process; tests/test_distributed.py drives both):
    python tools/distributed_smoke.py <process_id> <num_processes> \
        <coordinator host:port> [devices_per_process]

Prints one parseable line:  SMOKE pid=.. global_devices=.. rays=.. sum=..
"""

import os
import re
import sys

# launched by script path: the repo root is not on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    per_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    # Per-process virtual CPU devices; strip any inherited device-count
    # flag (e.g. from the test suite's conftest) so ours wins.
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={per_proc}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    from toypathtracer_tpu.parallel import distributed
    distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == nproc * per_proc, jax.devices()

    import toypathtracer_tpu as tpt
    from toypathtracer_tpu.parallel.mesh import render_frame_sharded_jit

    mesh = distributed.make_global_mesh()
    cfg = tpt.RenderConfig(width=64, height=8 * n_global,
                           samples_per_pixel=1, max_depth=3)
    scene = tpt.make_scene(big=True)
    img, rays = render_frame_sharded_jit(scene, cfg, jnp.int32(0), mesh)
    local = distributed.host_local_slice(img)
    assert local.shape == (8 * per_proc, 64, 3), local.shape

    # One sharded VALUE-AND-GRAD step across the processes: per-shard
    # loss/grads psum over the global mesh (the DCN analog of the ICI
    # gradient reduction, reference: the cross-worker atomic ray-count
    # reduce Test.cpp:299).  Grads/loss come back replicated, so every
    # process can fetch them; pid 0 dumps them for the driver test to
    # compare against the single-process sharded result.
    import numpy as np
    from toypathtracer_tpu.inverse import make_sharded_value_and_grad
    vg = jax.jit(make_sharded_value_and_grad(cfg, mesh))
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    scene_p = scene.replace(center=scene.center + 0.03)
    loss, grads = vg(scene_p, target, jnp.int32(1))
    loss = float(loss)
    out_path = sys.argv[5] if len(sys.argv) > 5 else ""
    if out_path and pid == 0:
        np.savez(out_path,
                 **{f: np.asarray(getattr(grads, f))
                    for f in ("center", "radius", "albedo", "emissive")})

    print(f"SMOKE pid={pid} global_devices={n_global} "
          f"local_devices={jax.local_device_count()} rays={int(rays)} "
          f"local_rows={local.shape[0]} sum={float(local.sum()):.4f} "
          f"loss={loss:.9e}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
