"""toypathtracer_tpu: a TPU-native differentiable path tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of
aras-p/ToyPathTracer (reference mounted read-only at /root/reference):
46-sphere scene, Lambert/Metal/Dielectric materials, explicit light
sampling, XorShift32 RNG, thin-lens DOF camera, progressive accumulation,
animation, Mray/s HUD -- reformulated as a wavefront renderer over batched
ray buffers, differentiable w.r.t. scene parameters, sharded across TPU
meshes.
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
