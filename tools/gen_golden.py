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
    # (name, w, h, frames, flags[, max_depth])  flags: 1=animate, 2=progressive
    ("small_f1", 128, 72, 1, 2),
    ("small_f2", 128, 72, 2, 2),          # progressive blend of 2 frames
    ("small_anim_f2", 128, 72, 2, 2 | 1),  # animated + progressive
    ("tiny_f1", 64, 36, 1, 2),
    ("tiny_f16", 64, 36, 16, 2),  # 16-frame progressive average
    # Per-pixel-seeded short-depth configs: with the reference's per-ROW
    # RNG threading (Test.cpp:280) one flipped rejection-loop accept
    # decorrelates the whole rest of the row, so full-frame-tight gates
    # are impossible at ANY depth.  Reseeding per PIXEL with the
    # reference's own GPU scheme (ComputeShader.hlsl:380) confines a flip
    # to its one pixel; bounding depth then bounds the per-pixel flip
    # probability, supporting near-exact full-frame gates
    # (tests/test_parity.py::test_short_depth_full_frame_tight).
    ("tiny_pp_d2_f1", 64, 36, 1, 2, 2, True),
    ("tiny_pp_d3_f1", 64, 36, 1, 2, 3, True),
]

# The mechanical per-pixel-seed patch: move seeding inside the pixel loop
# using the reference's own GPU per-pixel formula (ComputeShader.hlsl:380).
ROW_SEED_NEEDLE = (
    "        uint32_t state = (y * 9781 + data.frameCount * 6271) | 1;\n"
    "        for (int x = 0; x < data.screenWidth; ++x)\n"
    "        {\n")
PIXEL_SEED_REPL = (
    "        for (int x = 0; x < data.screenWidth; ++x)\n"
    "        {\n"
    "            uint32_t state = (uint32_t)(x * 1973 + y * 9277 + "
    "data.frameCount * 26699) | 1;\n")


def build_oracle(max_depth=None, pixel_seed=False) -> str:
    """Compile the reference-scalar oracle.  Default builds the reference
    verbatim (kMaxDepth=10, Test.cpp:73); max_depth rewrites that ONE
    constant and pixel_seed swaps the per-row seeding for the reference's
    own GPU per-pixel scheme -- mechanical fixture-generation patches on a
    build/-local copy of Test.cpp (the constant is not a #define, so it
    cannot be overridden from the compile line); the copy lives only
    under build/ (gitignored) and is never part of the framework."""
    os.makedirs(BUILD, exist_ok=True)
    test_cpp = os.path.join(REF, "Cpp", "Source", "Test.cpp")
    exe = os.path.join(BUILD, "oracle")
    if max_depth is not None or pixel_seed:
        tag = f"_d{max_depth or 10}" + ("_pp" if pixel_seed else "")
        exe = os.path.join(BUILD, f"oracle{tag}")
        src = open(test_cpp).read()
        if max_depth is not None:
            needle = "const int kMaxDepth = 10;"
            assert needle in src, "reference Test.cpp layout changed"
            src = src.replace(needle,
                              f"const int kMaxDepth = {max_depth};")
        if pixel_seed:
            assert ROW_SEED_NEEDLE in src, "reference Test.cpp layout changed"
            src = src.replace(ROW_SEED_NEEDLE, PIXEL_SEED_REPL)
        patched = os.path.join(BUILD, f"Test{tag}.cpp")
        with open(patched, "w") as f:
            f.write(src)
        test_cpp = patched
    cmd = [
        "g++", "-O2", "-std=c++11", "-w", "-D__EMSCRIPTEN__",
        # no FMA contraction: keeps float rounding aligned with XLA's
        # mul+add sequences (GCC contracts by default at -O2)
        "-ffp-contract=off",
        "-include", "cstring",
        "-I", os.path.join(REF, "Cpp", "Source"),
        os.path.join(REPO, "tools", "oracle_main.cpp"),
        test_cpp,
        os.path.join(REF, "Cpp", "Source", "Maths.cpp"),
        "-o", exe,
    ]
    subprocess.run(cmd, check=True)
    return exe


def main():
    exes = {}
    os.makedirs(GOLDEN, exist_ok=True)
    for cfg in CONFIGS:
        name, w, h, frames, flags = cfg[:5]
        depth = cfg[5] if len(cfg) > 5 else None
        pp = bool(cfg[6]) if len(cfg) > 6 else False
        key = (depth, pp)
        if key not in exes:
            exes[key] = build_oracle(max_depth=depth, pixel_seed=pp)
        raw = os.path.join(BUILD, f"{name}.raw")
        out = subprocess.run(
            [exes[key], str(w), str(h), str(frames), str(flags), raw],
            check=True, capture_output=True, text=True).stdout
        rays = int(out.strip().splitlines()[-1].split()[-1])
        per_frame = [int(l.split()[-1]) for l in out.strip().splitlines()[:-1]]
        img = np.fromfile(raw, dtype=np.float32).reshape(h, w, 4)[..., :3]
        np.savez_compressed(
            os.path.join(GOLDEN, f"{name}.npz"),
            image=img, rays=rays, per_frame_rays=np.array(per_frame),
            width=w, height=h, frames=frames, flags=flags,
            max_depth=depth if depth is not None else 10,
            pixel_seed=pp)
        print(f"{name}: {w}x{h} frames={frames} flags={flags} "
              f"depth={depth or 10} pp={pp} rays={rays}")


if __name__ == "__main__":
    sys.exit(main())
