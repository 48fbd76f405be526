from .buffers import GrowableArray, RangeAllocator
from .scene import Scene, Primitive, PrimitiveLod, Model, TexturePool

__all__ = [
    "GrowableArray",
    "RangeAllocator",
    "Scene",
    "Primitive",
    "PrimitiveLod",
    "Model",
    "TexturePool",
]
