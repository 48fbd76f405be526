"""Multi-chip rendering: views and horizontal bands sharded over a Mesh.

The reference is a single-GPU renderer; the only parallel axes that exist
in the workload are the stereo eyes (multiview, rendering.rs:209-441) and
screen space itself (SURVEY.md §2.3). The TPU-native scaling story:

  * mesh axis "view"  — each eye of the stereo pair on its own device
    group (stereo renders both eyes in one batched launch, like the
    reference's one-draw-two-layers multiview);
  * mesh axis "band"  — the image is split into horizontal bands; each
    device runs geometry + binning + its band's tile raster + deferred
    shading locally. Scene arrays are replicated (they are read-only
    weights, in ML terms); the only communicated data is the final image
    gather, which XLA emits from the output sharding — collectives ride
    ICI automatically.

Geometry work is duplicated per band device; it is ~1% of frame cost
(vertex/setup on a 15k-triangle scene) while raster+shade — the 99% — is
perfectly divided. This is the same economics that makes data-parallel
replicated-weights training the default.
"""

from __future__ import annotations

from functools import partial
import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.tonemap import to_u8
from ..render.env import EnvBindings
from ..render.frame import FrameState, RenderConfig, render_view


def make_render_mesh(
    devices=None, num_views: int = 1, name_view: str = "view", name_band: str = "band"
) -> Mesh:
    """Mesh with a view axis (stereo) and a band axis (screen-space)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % num_views == 0, (n, num_views)
    arr = np.asarray(devices).reshape(num_views, n // num_views)
    return Mesh(arr, (name_view, name_band))


def render_frame_sharded(
    scene: dict,
    state: FrameState,
    config: RenderConfig,
    env: EnvBindings,
    mesh: Mesh,
):
    """Render all views with bands sharded over `mesh` -> (V, H, W, 4) u8.

    Requires config.height % n_bands == 0 and band height % 8 == 0 (f32
    sublane tile).
    """
    n_views = mesh.shape["view"]
    n_bands = mesh.shape["band"]
    assert config.num_views == n_views, (config.num_views, n_views)
    assert config.height % n_bands == 0
    band_h = config.height // n_bands

    # check_vma stays ON for every compiled path: the raster scan carries
    # are tainted with the band's y_offset (raster_ref.taint_with) and the
    # pallas_call out_shapes carry the union of their inputs' vma
    # (raster_pallas._union_vma), so varying-manual-axes are consistent
    # end to end. The one exception is INTERPRET-mode pallas (CPU backend):
    # jax 0.9's hlo interpreter re-checks vma inside the kernel body, where
    # literals are unavoidably replicated — a known jax limitation whose
    # documented workaround is check_vma=False. Real-TPU pallas compiles
    # the body with Mosaic and never hits that path.
    interpret_pallas = (
        config.resolve_raster() == "pallas" and jax.default_backend() != "tpu"
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("view", "band", None, None),
        check_vma=not interpret_pallas,
    )
    def shard_fn(scene_rep, state_rep):
        v = jax.lax.axis_index("view")
        b = jax.lax.axis_index("band")
        y0 = b * band_h
        # view index is traced; render each view under a switch since the
        # uniforms are indexed by it (num_views is tiny: 1 or 2).
        def render_v(vi):
            return lambda: render_view(
                scene_rep,
                state_rep,
                vi,
                config,
                env,
                band_height=band_h,
                y_offset=y0,
            )

        img = jax.lax.switch(v, [render_v(i) for i in range(n_views)])
        return to_u8(img)[None, None]  # (1, 1, band_h, W, 4) per device

    out = shard_fn(scene, state)  # (V, n_bands, band_h, W, 4)
    return out.reshape(n_views, config.height, config.width, 4)
