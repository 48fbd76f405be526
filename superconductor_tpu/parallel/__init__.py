from .bands import make_render_mesh, render_frame_sharded

__all__ = ["make_render_mesh", "render_frame_sharded"]
