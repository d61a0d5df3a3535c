#!/usr/bin/env python3
"""Generate golden fixtures from the reference's scalar C++ renderer.

Builds tools/oracle_main.cpp against the read-only reference sources
(/root/reference/Cpp/Source) with SIMD/threads disabled (scalar
single-thread semantics: Config.h:9-19, Test.cpp:362-364) and renders the
configs used by tests/test_parity.py.  Outputs .npz files into
tests/golden/ -- these are committed so CI does not need the reference
mount or a C++ toolchain.

Golden contract (see SURVEY.md section 4): images are the reference's
46-sphere big scene (DO_BIG_SCENE=1 is hardcoded at Test.cpp:11),
4 spp, maxDepth 10, CPU rejection samplers, per-row seeding
(Test.cpp:280).  Our render/parity.py renderer reproduces these exactly
(same RNG draw sequence) up to float-op rounding.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("TOYPT_REFERENCE", "/root/reference")
BUILD = os.path.join(REPO, "build")
GOLDEN = os.path.join(REPO, "tests", "golden")

CONFIGS = [
    # (name, w, h, frames, flags)  flags: 1=animate, 2=progressive
    ("small_f1", 128, 72, 1, 2),
    ("small_f2", 128, 72, 2, 2),          # progressive blend of 2 frames
    ("small_anim_f2", 128, 72, 2, 2 | 1),  # animated + progressive
    ("tiny_f1", 64, 36, 1, 2),
    ("tiny_f16", 64, 36, 16, 2),  # 16-frame progressive average
]


def build_oracle() -> str:
    os.makedirs(BUILD, exist_ok=True)
    exe = os.path.join(BUILD, "oracle")
    cmd = [
        "g++", "-O2", "-std=c++11", "-w", "-D__EMSCRIPTEN__",
        # no FMA contraction: keeps float rounding aligned with XLA's
        # mul+add sequences (GCC contracts by default at -O2)
        "-ffp-contract=off",
        "-include", "cstring",
        "-I", os.path.join(REF, "Cpp", "Source"),
        os.path.join(REPO, "tools", "oracle_main.cpp"),
        os.path.join(REF, "Cpp", "Source", "Test.cpp"),
        os.path.join(REF, "Cpp", "Source", "Maths.cpp"),
        "-o", exe,
    ]
    subprocess.run(cmd, check=True)
    return exe


def main():
    exe = build_oracle()
    os.makedirs(GOLDEN, exist_ok=True)
    for name, w, h, frames, flags in CONFIGS:
        raw = os.path.join(BUILD, f"{name}.raw")
        out = subprocess.run(
            [exe, str(w), str(h), str(frames), str(flags), raw],
            check=True, capture_output=True, text=True).stdout
        rays = int(out.strip().splitlines()[-1].split()[-1])
        per_frame = [int(l.split()[-1]) for l in out.strip().splitlines()[:-1]]
        img = np.fromfile(raw, dtype=np.float32).reshape(h, w, 4)[..., :3]
        np.savez_compressed(
            os.path.join(GOLDEN, f"{name}.npz"),
            image=img, rays=rays, per_frame_rays=np.array(per_frame),
            width=w, height=h, frames=frames, flags=flags)
        print(f"{name}: {w}x{h} frames={frames} flags={flags} rays={rays}")


if __name__ == "__main__":
    sys.exit(main())
