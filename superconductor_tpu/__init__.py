"""superconductor-tpu: a TPU-native 3D rasterization engine in JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of expenses/superconductor (a
Rust/wgpu glTF renderer): HBM-resident scene mega-buffers, Pallas tile
rasterization, deferred PBR shading with SH light volumes, skinned
animation, particles, and stereo multiview — see SURVEY.md at the repo root
for the complete component mapping.
"""

__version__ = "0.1.0"

from .math3d import Similarity
from .render.camera import Camera, Uniforms, make_uniforms
from .render.env import EnvBindings
from .render.frame import FrameState, RenderConfig, render_frame
from .scene.scene import MaterialSettings, Scene

__all__ = [
    "Similarity",
    "Camera",
    "Uniforms",
    "make_uniforms",
    "EnvBindings",
    "FrameState",
    "RenderConfig",
    "render_frame",
    "MaterialSettings",
    "Scene",
]
