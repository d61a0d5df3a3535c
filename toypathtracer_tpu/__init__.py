"""toypathtracer_tpu: a TPU-native differentiable path tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of
aras-p/ToyPathTracer (reference mounted read-only at /root/reference):
46-sphere scene, Lambert/Metal/Dielectric materials, explicit light
sampling, XorShift32 RNG, thin-lens DOF camera, progressive accumulation,
animation, Mray/s HUD -- reformulated as a wavefront renderer over batched
ray buffers, differentiable w.r.t. scene parameters, sharded across TPU
meshes.

Layer map (mirrors SURVEY.md section 1's seams, rebuilt TPU-first):
  ops/tracecore.py      backend-agnostic path-tracing math (L0+L1 core)
  ops/pallas_render.py  fused Pallas TPU kernel (the GPU-port analog, L4)
  render/wavefront.py   XLA jnp renderer (portable fallback + grad path)
  render/parity.py      CPU-scalar-semantics renderer (validation fixture)
  render/frame.py       progressive accumulation / sessions (L1 DrawTest)
  parallel/mesh.py      Mesh + shard_map row sharding (L2 scheduler analog)
  inverse.py            differentiable inverse rendering (north star)
  checkpoint.py         state serialization (accum buffer, Adam state)
  cli.py                headless HUD CLI (the C# Program.cs analog, L5)
  io.py                 sRGB + TGA/PNG output (frontend blit analog, L3)
"""

from .config import FLAG_ANIMATE, FLAG_PROGRESSIVE, RenderConfig
from .scene import Scene, make_scene

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "Scene",
    "make_scene",
    "FLAG_ANIMATE",
    "FLAG_PROGRESSIVE",
]
