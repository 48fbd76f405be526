"""The frame function: one jitted call scene+frame-state -> image.

This is the TPU replacement for the whole per-frame GPU command stream
(render_desktop / render_everything, src/systems/rendering.rs:61-205,
506-558). Pass order matches the reference: opaque -> alpha-clip ->
[lines] -> skybox -> [particles] -> alpha-blend -> tonemap, except that
shading is deferred so the depth prepass is unnecessary by construction.

Everything dynamic comes in as arrays (uniforms, draw lists, joint
palette); everything shape-affecting is in RenderConfig (static arg, hashed
into the jit cache). Host code builds FrameState once per frame; the jit
boundary is render_frame().

Band rendering: render_view accepts a (y_offset, band_height) viewport so
a device mesh can split the image into horizontal bands (parallel/bands.py)
— the multi-chip analog of wgpu's single-GPU submit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from ..ops.binning import bin_triangles, gather_sorted_setup
from ..ops.geometry import (
    DrawList,
    TriangleSetup,
    geometry_vertex_stage,
    geometry_view_setup,
)
from ..ops.raster_ref import VisibilityBuffer, rasterize_ref
from ..ops.shade import interpolate_gbuffer, shade
from ..ops.sky import sample_skybox
from ..ops.tonemap import to_u8
from .env import EnvBindings


@dataclass(frozen=True)
class RenderConfig:
    width: int = 512
    height: int = 512
    t_cap: int = 1 << 14  # static-geometry triangle-pair capacity
    t_cap_anim: int = 1 << 10  # animated-geometry capacity
    v_cap: int = 0  # vertex-pair capacity (0 = t_cap)
    v_cap_anim: int = 0  # animated vertex-pair capacity (0 = t_cap_anim)
    p_cap: int = 1 << 16  # binned (triangle, tile) pair capacity
    raster: str = "auto"  # 'ref' | 'pallas' | 'auto'
    reverse_z: bool = True
    flip_viewport: bool = False
    inline_tonemapping: bool = True
    inline_srgb: bool = True
    num_views: int = 1
    blend_layers: int = 4  # K-buffer depth for the alpha-blend pass
    # Per-pass k-buffer depths: the clip resolve and the particle pass each
    # see different worst-case overlap (e.g. 2 stacked clip surfaces vs 6
    # overlapping smoke puffs), and a shared K makes every pass pay the
    # deepest pass's kernel (K VMEM planes, K-step insert chain, K resolve
    # iterations). None = blend_layers (the shared-K behavior). The managed
    # paths size each from its own per-pass layers_needed stat — same
    # grow-never-drop contract as blend_layers.
    clip_layers: Optional[int] = None
    particle_layers: Optional[int] = None
    enable_clip: bool = False  # alpha-clipped materials present
    enable_blend: bool = False  # alpha-blended materials present
    enable_lines: bool = False
    enable_particles: bool = False
    line_width_px: float = 1.5
    aniso_taps: int = 1  # albedo anisotropic filtering (1 = trilinear)
    # Transparent-shading worklist capacity: clip/blend/particle layers are
    # shaded only for pixels that actually have transparent fragments
    # (fixed-capacity compaction; see _compact_px). Grown by the ECS render
    # system from the shade_px_needed stat — never silently dropped.
    shade_px_cap: int = 1 << 17
    # Optional PER-LAYER worklist capacities for the blend/particle shading
    # loops. K-buffer layer occupancy is monotone decreasing (a pixel with a
    # fragment in layer k has fragments in all layers < k), so deeper layers
    # need far smaller worklists than layer 0; with one shared cap every
    # layer pays layer 0's size. None = every layer uses shade_px_cap
    # (always correct, since needed_k <= needed_0 <= shade_px_cap after
    # growth). Managed paths set/grow this from the shade_px_needed_k stat
    # vector (same never-drop contract). Shorter tuples repeat their last
    # entry; the clip pass keeps the single shade_px_cap worklist (its loop
    # resolves one winner, it does not shade every layer).
    shade_px_caps: Optional[tuple] = None
    # Per-layer worklist capacities for the CLIP RESOLVE loop. K-buffer
    # occupancy is monotone decreasing, so layer k's candidate set shrinks
    # fast with k — with the single shared worklist every resolve round
    # paid layer 0's size (measured r5 on the all-passes scene: the clip
    # pass was +360 ms, the largest pass, with per-layer needs
    # [504k, 265k, 43k, 1k, ~0...] vs 8 rounds x 590k lanes). None =
    # every round uses shade_px_cap (always correct after growth, same
    # argument as shade_px_caps); managed paths set/grow this from the
    # clip_px_needed_k stat vector (never-drop).
    clip_px_caps: Optional[tuple] = None
    # Opaque-shading worklist capacity: the deferred PBR shade (gbuffer
    # interpolation + all material texture taps + SH + BRDF) runs only on
    # the compacted worklist of pixels the opaque/clip passes actually
    # covered; misses keep the skybox value with no shading work spent on
    # them. Same never-drop contract (opaque_px_needed stat, ECS growth).
    # None/0 disables compaction (full-screen shade + where(hit, ..., sky));
    # a cap >= the band pixel count also falls back to the full-screen
    # path, so growth self-limits. Default None because a bare
    # render_frame() call has no growth loop — overflow would silently
    # shade fewer pixels. The managed paths (ECS render system, bench
    # fit_caps, demo capacity probe) seed DEFAULT_OPAQUE_PX_CAP and grow
    # from the opaque_px_needed stat.
    opaque_px_cap: Optional[int] = None
    # Sky worklist capacity: when set (0 < cap < band pixels), the skybox
    # is evaluated only on the compacted worklist of pixels the
    # opaque/clip passes left uncovered (vis.pair < 0) — fully-covered
    # granules never pay the cubemap gather + ray math. Same never-drop
    # contract as opaque_px_cap (sky_px_needed stat, host growth;
    # overflowed sky pixels would render black, so the default None keeps
    # the always-correct full-screen sky for bare render_frame calls).
    sky_px_cap: Optional[int] = None
    # Material-path partition capacity (PARTIAL interleaved pools only —
    # scenes where some materials qualify for the matq fast path and some
    # don't, scene.py matq_plan "partial"). The opaque shade worklist is
    # permuted so matq-incapable lanes form a contiguous tail segment of
    # this many lanes, sampled by the classic (per-slot) sampler while
    # the rest keep the 3-gather interleaved path. Correctness cap: if
    # more incapable lanes exist than the segment holds, the spill lands
    # in the matq segment and reads the count=0 sentinel row (wrong
    # color, never a crash) — the matq_classic_needed stat is the grow
    # signal. None (default) disables the partition: partial scenes then
    # shade every lane on the always-correct classic path.
    matq_classic_cap: Optional[int] = None
    # Pad the per-pair shade_row to this many f32 columns (0 = off). The
    # natural row is 48+24+3-4L ~ 75 floats = 300 B — lane-misaligned on
    # TPU (the vector lane dim is 128); padding to 128 makes each
    # deferred-shade gather fetch one aligned 512 B row, the fastest
    # measured gather regime (docs/TIMING.md: 512 B rows gather 3.8x more
    # rows/s than 64 B). The pad is sliced off right after the gather —
    # bit-identical output, only the gather layout changes.
    shade_row_pad: int = 0
    # Compact ALL shading worklists (opaque, clip resolve, per-layer
    # blend/particle) at 128-pixel GRANULE granularity (128 contiguous
    # pixels of a screen row) instead of per pixel, whenever
    # width % 128 == 0. Same never-drop contract and bit-identical output;
    # the worklist machinery changes from per-pixel sorts/gathers (a
    # 2M-key sort + a 2M-row composite gather at 1080p, PER worklist —
    # the all-passes frame builds ~9 of them) to a ~16k-key granule sort
    # and FAT-row (512 B+) gathers — gather cost on TPU is per ROW nearly
    # independent of row width (docs/TIMING.md gather characterization:
    # 512 B rows move 30x the payload of 4 B lanes at HIGHER rows/s), so
    # the compaction/composite machinery becomes ~free. Flat row-granules
    # keep the screen layout (no transposes) and dilate less than 2D
    # tiles. Granule dilation (a granule is in the worklist if ANY of its
    # 128 pixels is covered) costs extra shade lanes only on
    # sparse/scattered coverage; the *_needed stats report granule-dilated
    # pixel counts so growth sizes each cap for this path's true need.
    worklist_granules: bool = True
    # Lanes per worklist granule (power of two dividing the band width).
    # Smaller granules dilate less on scattered coverage (a granule joins
    # the worklist if ANY of its pixels is covered) but shrink the
    # fat-row amortization of the worklist gathers and grow the
    # compaction sort key count; 128 measured best overall at 1080p, 64
    # is the first thing to A/B when dilation dominates (the *_needed
    # stats report granule-dilated counts, so the dilation is visible).
    granule_px: int = 128
    # Render each view in this many horizontal bands, sequentially (lax.map)
    # — bounds peak HBM for large resolutions (4K+). Geometry (vertex
    # stage + per-view setup) is hoisted out of the band loop; each band
    # re-pays only binning + raster + shading. 1 = whole frame at once.
    row_chunks: int = 1
    # Pallas raster tile shape. Mosaic runs grid steps sequentially with a
    # fixed per-step cost, so fewer/larger tiles trade per-step overhead
    # against wasted edge evaluations on small triangles (a triangle pays
    # VPU work over the WHOLE tile it binned into). (32, 128) measured
    # best on v5e at 1080p (docs/KERNELS.md tile sweep).
    tile_h: int = 32
    tile_w: int = 128

    def resolve_raster(self) -> str:
        if self.raster != "auto":
            return self.raster
        return "pallas" if jax.default_backend() == "tpu" else "ref"

    def resolve_clip_layers(self) -> int:
        return self.clip_layers or self.blend_layers

    def resolve_particle_layers(self) -> int:
        return self.particle_layers or self.blend_layers

    def layer_caps(self, k: Optional[int] = None) -> tuple:
        """Effective per-layer shading worklist caps, length k (default
        blend_layers — the blend pass; the particle pass passes its own
        K)."""
        k = k or self.blend_layers
        cs = tuple(int(c) for c in self.shade_px_caps or ())
        if not cs:  # None or empty tuple: every layer at the shared cap
            return (self.shade_px_cap,) * k
        if len(cs) < k:
            cs = cs + (cs[-1],) * (k - len(cs))
        return cs[:k]

    def needed_k_len(self) -> int:
        """Length of the shade_px_needed_k stat vector: the deepest
        per-layer shading loop (blend and particles share it by index)."""
        return max(self.blend_layers, self.resolve_particle_layers())

    def resolve_clip_caps(self) -> tuple:
        """Effective per-layer clip-resolve worklist caps, length
        resolve_clip_layers(). None falls back to the shared
        shade_px_cap for every round (layer-0 need == the old shared
        worklist's need, so post-growth correctness is unchanged)."""
        k = self.resolve_clip_layers()
        cs = tuple(int(c) for c in self.clip_px_caps or ())
        if not cs:
            return (self.shade_px_cap,) * k
        if len(cs) < k:
            cs = cs + (cs[-1],) * (k - len(cs))
        return cs[:k]


# Seed value the managed (growth-capable) paths use for opaque_px_cap:
# the ECS render system, bench.fit_caps, and the demo capacity probe.
DEFAULT_OPAQUE_PX_CAP = 1 << 17
# Same for sky_px_cap (the sky worklist; growth self-limits at the band
# pixel count, where render_view statically falls back to the
# always-correct full-screen sky).
DEFAULT_SKY_PX_CAP = 1 << 17

# Sorted-pair mode switch (see render_view): tests flip this to compare
# the sorted-table path against the classic full-screen id remap on the
# SAME Pallas kernel (trace under a fresh jax.jit when flipping — the
# flag is captured at trace time, not part of the config hash).
SORTED_PAIR_MODE = True


def size_worklist_cap(need: int, floor: int = 512) -> int:
    """Size a pixel-worklist capacity (shade_px_cap / shade_px_caps /
    opaque_px_cap) from a measured need.

    Worklist caps multiply per-frame shading cost directly — every lane
    is paid whether live or not (measured r5: cutting the headline's
    opaque cap from 917504 to 655360 lanes took 45.2 -> 36.1 ms, ~35 ns
    per excess lane) — so sizing matters more here than for the geometry
    capacities, and overshoot is paid every frame while undershoot costs
    one re-render+recompile. This uses a 1.125x headroom margin rounded
    up to a sixteenth-pow2 boundary (m * 2^e, m in (16..32]) —
    worst-case ~1.22x the need — fine enough that the margin dominates
    the bucket granularity, coarse enough that growth converges in O(1)
    recompiles and repeated frames reuse the jit cache. (The r3-r4
    sizing was 1.5x on quarter-pow2 boundaries: worst-case 1.9x, i.e.
    up to ~9 ms of dead lanes on the headline.)"""
    n = int(need) + (int(need) >> 3)  # 1.125x margin
    if n <= floor:
        return floor
    e = max((n - 1).bit_length() - 5, 0)
    m = -(-n >> e)  # ceil(n / 2^e), in (16..32]
    return m << e


class FrameState(NamedTuple):
    """All per-frame device inputs."""

    uniforms: dict  # arrays with leading view axis
    draws_static: DrawList
    draws_animated: DrawList
    joint_palette: jax.Array  # (J, 8)
    lines: dict = None  # {pos (L,2,3), color (L,), valid (L,)}
    particles: dict = None  # particle SoA (see ops/particles.py)


def _rasterize(
    tri: TriangleSetup,
    config: RenderConfig,
    band_height: int,
    y_offset,
    init=None,
    remap=True,
):
    """-> (VisibilityBuffer, pairs_needed i32, order). pairs_needed is the
    bin-pair count this pass would need (0 on the unbinned ref path); the
    host checks it against p_cap so overflow grows capacity instead of
    dropping work.

    remap=False (pallas path only) leaves SORTED bin positions in
    vis.pair and returns the (p_cap,) order array so the caller can
    instead gather its per-pair tables into sorted order — a p_cap-row
    gather instead of the full-screen sorted-pos -> pair-id remap, which
    measured 15.6 ms at 1080p (tools/raster_probe.py: the Pallas kernel
    itself is 0.5 ms; the 2.07M-pixel 4-byte remap gather dominated the
    whole raster stage). order is None when vis.pair already holds
    original ids (ref path, or remap=True)."""
    method = config.resolve_raster()
    if method == "ref":
        vis = rasterize_ref(
            tri,
            band_height,
            config.width,
            reverse_z=config.reverse_z,
            init=init,
            y_offset=y_offset,
        )
        return vis, jnp.int32(0), None
    from ..ops.raster_pallas import rasterize_pallas, rasterize_pallas_sorted

    bins = bin_triangles(
        tri, config.width, band_height, config.p_cap,
        tile_h=config.tile_h, tile_w=config.tile_w, y_offset=y_offset,
    )
    sorted_setup = gather_sorted_setup(tri, bins)
    if remap:
        vis = rasterize_pallas(
            sorted_setup,
            bins,
            band_height,
            config.width,
            reverse_z=config.reverse_z,
            init=init,
            tile_h=config.tile_h,
            tile_w=config.tile_w,
            y_offset=y_offset,
        )
        return vis, bins.num_pairs, None
    interpret = jax.default_backend() != "tpu"
    vis = rasterize_pallas_sorted(
        sorted_setup,
        bins.tile_start,
        bins.tile_count,
        band_height,
        config.width,
        tile_h=config.tile_h,
        tile_w=config.tile_w,
        reverse_z=config.reverse_z,
        init=init,
        interpret=interpret,
        y_offset=y_offset,
    )
    return vis, bins.num_pairs, bins.order


def _rasterize_kbuffer(
    tri: TriangleSetup,
    config: RenderConfig,
    band_height: int,
    y_offset,
    depth_floor,
    want_depth: bool = True,
    k: Optional[int] = None,
    remap=True,
):
    """-> (KBuffer, pairs_needed i32, layers_needed i32, order); see
    _rasterize (remap=False leaves sorted positions in kb.pair and
    returns bins.order).
    layers_needed is the max accepted-fragment count any pixel saw — when
    it exceeds k (this pass's k-buffer depth: blend_layers, clip_layers or
    particle_layers) the k-buffer dropped a surface and the host must grow
    that pass's K and re-render (never-drop policy; the reference draws
    every blended fragment, rendering.rs:550).

    want_depth=False skips the Pallas kernel's K HBM depth planes for
    callers that only consume .pair (the blend/particle shading loops; the
    clip resolve needs depths). The ref path always returns depth — XLA
    dead-code-eliminates the unused output there."""
    from ..ops.raster_kbuffer import rasterize_kbuffer_ref

    k = k or config.blend_layers
    method = config.resolve_raster()
    if method == "ref":
        kb, layers = rasterize_kbuffer_ref(
            tri,
            band_height,
            config.width,
            k=k,
            reverse_z=config.reverse_z,
            depth_floor=depth_floor,
            y_offset=y_offset,
        )
        return kb, jnp.int32(0), layers.max(), None
    from ..ops.raster_pallas import kbuffer_pallas, kbuffer_pallas_sorted

    bins = bin_triangles(
        tri, config.width, band_height, config.p_cap,
        tile_h=config.tile_h, tile_w=config.tile_w, y_offset=y_offset,
    )
    sorted_setup = gather_sorted_setup(tri, bins)
    if remap:
        kb, layers = kbuffer_pallas(
            sorted_setup,
            bins,
            band_height,
            config.width,
            k=k,
            reverse_z=config.reverse_z,
            depth_floor=depth_floor,
            tile_h=config.tile_h,
            tile_w=config.tile_w,
            y_offset=y_offset,
            want_depth=want_depth,
        )
        return kb, bins.num_pairs, layers.max(), None
    interpret = jax.default_backend() != "tpu"
    kb, layers = kbuffer_pallas_sorted(
        sorted_setup,
        bins.tile_start,
        bins.tile_count,
        band_height,
        config.width,
        k=k,
        tile_h=config.tile_h,
        tile_w=config.tile_w,
        reverse_z=config.reverse_z,
        depth_floor=depth_floor,
        interpret=interpret,
        y_offset=y_offset,
        want_depth=want_depth,
    )
    return kb, bins.num_pairs, layers.max(), bins.order


def _compact_px(mask: jax.Array, cap: int):
    """Fixed-capacity pixel compaction for the transparent-shading passes.

    The k-buffer passes produce fragments on a small fraction of the
    screen, but shading K layers over every pixel costs K full-screen
    shades regardless (the all-passes frame measured 33x the opaque-only
    headline before this). The TPU-idiomatic fix is the same
    static-capacity expansion used for bin pairs: gather the indices of
    pixels with any transparent fragment into a bounded worklist, shade
    only the worklist, scatter the composite back.

    mask: (npx,) bool. Returns (idx, safe, live, needed):
      idx   (cap',) i32 — set-lane indices, sentinel npx past the end
      safe  (cap',) i32 — idx clamped for gathers (dead lanes discarded)
      live  (cap',) bool
      needed () i32 — true set-lane count; > cap' means the worklist
      overflowed and the host must grow shade_px_cap and re-render
      (never-drop, same contract as pairs_needed/p_cap).
    """
    npx = mask.shape[0]
    cap = min(cap, npx)
    # sort-based compaction, NOT jnp.nonzero(size=cap): set lanes keep
    # their index, dead lanes get the npx sentinel, and one i32 sort
    # brings the set indices to the front in order. Probed at 2.07M
    # lanes (2026-08-19): sort 2.0 ms vs cumsum+scatter 9.9 ms vs
    # nonzero 18.7 ms — TPU scatters cost ~80 ns/row while the sort is
    # a streaming pass. ranks (pixel -> worklist slot) rides a cumsum
    # (0.7 ms) for the gather-side composite (_compose_worklist).
    keys = jnp.where(
        mask, jnp.arange(npx, dtype=jnp.int32), jnp.int32(npx)
    )
    idx = jax.lax.sort(keys)[:cap]
    ranks = jnp.cumsum(mask.astype(jnp.int32)) - 1
    live = idx < npx
    safe = jnp.minimum(idx, npx - 1)
    return idx, safe, live, jnp.sum(mask.astype(jnp.int32)), ranks


def _worklist_granule(config: RenderConfig, npx: int) -> int:
    """Lanes per worklist granule: config.granule_px when the shading
    worklists compact row-granules (RenderConfig.worklist_granules and the
    band shape divides), else 1 (per-pixel). Pure shape gate — the
    cap-vs-npx selection between compacted and full-screen shading stays
    separate."""
    gr = config.granule_px
    if config.worklist_granules and config.width % gr == 0 and npx % gr == 0:
        return gr
    return 1


class _Worklist(NamedTuple):
    """A compacted shading worklist at granule granularity (gr lanes per
    granule; gr == 1 is the per-pixel form). Call sites gather their
    per-pixel inputs through take() (FAT rows in granule mode), shade the
    expanded lanes, and write back with compose() — never-drop: lanes past
    the cap keep the destination, and `need` (granule-dilated pixel count)
    tells the host what cap would have sufficed."""

    idx: jax.Array  # (cap_g,) granule indices, sentinel = n_granules
    safe: jax.Array  # (cap_g,) clamped for gathers
    live: jax.Array  # (cap_g,) bool
    need: jax.Array  # () i32 — granule-dilated covered PIXEL count
    ranks: jax.Array  # (n_granules,) granule -> worklist slot
    mask: jax.Array  # (n_granules,) granule coverage
    gr: int
    npx: int

    @property
    def lanes(self) -> int:
        return self.idx.shape[0] * self.gr

    def lane_safe(self) -> jax.Array:
        """Flat pixel index of each worklist lane (arithmetic, no gather)."""
        if self.gr == 1:
            return self.safe
        off = jnp.arange(self.gr, dtype=jnp.int32)[None, :]
        return (self.safe[:, None] * self.gr + off).reshape(-1)

    def lane_live(self) -> jax.Array:
        if self.gr == 1:
            return self.live
        return jnp.repeat(self.live, self.gr)

    def take(self, x: jax.Array) -> jax.Array:
        """Gather flat per-pixel data (npx,) or (npx, C) to worklist lanes
        — ONE fat row per granule in granule mode. The gather operand is
        kept 2-D ((n_granules, gr*C), row-major so granule rows are
        contiguous): a 3-D (n_g, gr, C) operand lowers to a per-element
        gather on TPU (measured r5: the worklist block was ~9 ms of the
        headline frame, dominated by exactly this)."""
        if self.gr == 1:
            return x[self.safe]
        if x.ndim == 1:
            return x.reshape(-1, self.gr)[self.safe].reshape(-1)
        c = x.shape[-1]
        return x.reshape(-1, self.gr * c)[self.safe].reshape(-1, c)

    def compose(self, dst: jax.Array, rows: jax.Array) -> jax.Array:
        """Write lane rows (lanes,) / (lanes, C) into flat per-pixel dst at
        the masked pixels (overflowed/dead lanes keep dst)."""
        if self.gr == 1:
            return _compose_worklist(
                dst, self.mask, self.ranks, rows, self.idx.shape[0], self.idx
            )
        c = 1 if dst.ndim == 1 else dst.shape[-1]
        dst_g = dst.reshape(self.npx // self.gr, self.gr * c)
        rows_g = rows.reshape(-1, self.gr * c)
        out = _compose_worklist(
            dst_g, self.mask, self.ranks, rows_g, self.idx.shape[0], self.idx
        )
        return out.reshape(dst.shape)


def _compact_worklist(mask: jax.Array, cap: int, config: RenderConfig):
    """Compact a flat (npx,) coverage mask into a _Worklist of at most
    `cap` shading lanes (rounded down to whole granules in granule mode)."""
    npx = mask.shape[0]
    gr = _worklist_granule(config, npx)
    gmask = mask.reshape(-1, gr).any(axis=1) if gr > 1 else mask
    cap_g = max(1, min(cap, npx) // gr)
    idx, safe, live, gneed, ranks = _compact_px(gmask, cap_g)
    return _Worklist(idx, safe, live, gneed * gr, ranks, gmask, gr, npx)


def _compose_worklist(dst, mask, ranks, rows, cap, idx):
    """Write per-worklist-lane `rows` (cap, C) into full-screen `dst`
    (npx, C) at the masked pixels — scatter-free when the worklist is
    large.

    TPU scatters cost ~80 ns/row while narrow-row gathers cost ~4-10 ns
    (probed 2026-08-19: 917k-row composite scatter 75.9 ms, the
    equivalent cumsum+gather+where 7.8 ms at 1080p). The gather form
    pays ~one full-screen gather regardless of worklist size, so small
    worklists (the deep transparent layers) keep the scatter. Overflowed
    pixels (rank >= cap) keep dst — same never-drop contract as the
    scatter's mode="drop"."""
    npx = mask.shape[0]
    if cap * 8 < npx:
        return dst.at[idx].set(rows, mode="drop")
    take = jnp.minimum(ranks, cap - 1)
    keep = mask & (ranks < cap)
    if rows.ndim > 1:
        keep = keep[:, None]
    return jnp.where(keep, rows[take], dst)


def _partition_material_sample(g, scene, config, aniso_taps, slots=None):
    """Material sampling for PARTIAL interleaved pools: each lane samples
    on its material's own path, without ever paying both paths.

    The lanes are permuted (one i32 sort of (incapable, lane) keys) so
    matq-incapable lanes form a contiguous TAIL segment of
    config.matq_classic_cap lanes; the head segment samples the
    interleaved pool (3 gather rows/lane), the tail the classic per-slot
    sampler (correct for any material). Segment inputs (uv, derivatives,
    material id) ride one stacked permutation gather; per-segment
    material rows re-gather from the tiny (M,·) material tables. The
    concatenated s16 is inverse-permuted back to worklist-lane order
    (the inverse comes from a second sort — TPU scatters are ~80 ns/row,
    docs/TIMING.md, so no scatter anywhere).

    slots: material texture slots to return (None = all four). The
    interleaved gather always fetches all four (one row); the classic
    segment samples only the requested slots — the alpha-clip resolve
    needs albedo alone.

    Returns (s (lanes, 4*len(slots)), classic_needed () i32).
    classic_needed > matq_classic_cap means incapable lanes spilled into
    the matq segment (sentinel-row color — the host's grow signal, same
    contract as the other worklist caps)."""
    from ..ops.shade import _material_rows, _material_rows_mq
    from ..ops.texture import (
        ldr_pool,
        sample_anisotropic,
        sample_material_interleaved,
    )

    m = scene["materials"]
    lanes = g.material.shape[0]
    capable = scene["matq_capable"][jnp.maximum(g.material, 0)]
    classic_lane = (~capable) & g.valid
    classic_needed = jnp.sum(classic_lane.astype(jnp.int32))
    cap_c = max(1, min(int(config.matq_classic_cap), lanes))

    shift = max(int(lanes - 1).bit_length(), 1)
    keys = (
        classic_lane.astype(jnp.int32) << shift
    ) | jnp.arange(lanes, dtype=jnp.int32)
    order = jax.lax.sort(keys) & ((1 << shift) - 1)

    matf = jax.lax.bitcast_convert_type(g.material, jnp.float32)
    inp = jnp.concatenate(
        [g.uv, g.duvdx, g.duvdy, matf[..., None]], axis=-1
    )[order]

    want = tuple(range(4)) if slots is None else tuple(slots)

    def seg_sample(seg, use_matq):
        uv = seg[..., 0:2]
        dx = seg[..., 2:4]
        dy = seg[..., 4:6]
        mat = jax.lax.bitcast_convert_type(seg[..., 6], jnp.int32)
        if use_matq:
            pf, pi, meta, owh = _material_rows_mq(m, mat)
            s16 = sample_material_interleaved(
                scene["texels_mq"], meta, owh, uv, dx, dy, aniso_taps,
                texels_tail=scene.get("texels_mq_tail"),
            )
            if slots is None:
                return s16
            return jnp.concatenate(
                [s16[..., 4 * s:4 * s + 4] for s in want], axis=-1
            )
        pfc, pic, mtm, mlv = _material_rows(m, mat)
        texels = ldr_pool(scene)
        outs = []
        for slot in want:
            meta = mtm[..., 6 * slot:6 * slot + 6] if mtm is not None else None
            lv = mlv[..., slot, :, :] if mlv is not None else None
            outs.append(sample_anisotropic(
                texels, scene["tex"], pic[..., slot], uv, dx, dy,
                aniso_taps, meta=meta, levels_owh=lv,
            ))
        return jnp.concatenate(outs, axis=-1)

    n_h = lanes - cap_c
    s16_p = jnp.concatenate(
        [seg_sample(inp[:n_h], True), seg_sample(inp[n_h:], False)]
    )
    _, inv = jax.lax.sort_key_val(order, jnp.arange(lanes, dtype=jnp.int32))
    return s16_p[inv], classic_needed


def _composite_layers(rgb, pair_planes, caps, needed_k, shade_fn, config):
    """Back-to-front per-layer compact -> shade -> composite-scatter.

    The shared worklist/composite contract of the particle and blend
    passes: each k-buffer layer compacts its own covered pixels (k-buffer
    occupancy is monotone decreasing, so deep layers get small worklists
    — RenderConfig.shade_px_caps), shades only the worklist via
    shade_fn(pair_worklist, safe, live) -> (rgb, alpha), and alpha-blends
    straight into the image. needed_k accumulates (max) the per-layer
    true (granule-dilated) coverage for the never-drop growth loop.

    rgb: (npx, 3); pair_planes: (K, ...) layer pair ids, -1 = empty.
    Returns (rgb, needed_k)."""
    for k in range(len(caps) - 1, -1, -1):
        mask_k = (pair_planes[k] >= 0).reshape(-1)
        wl = _compact_worklist(mask_k, caps[k], config)
        needed_k = needed_k.at[k].max(wl.need)
        srgb, sa = shade_fn(
            jnp.where(wl.lane_live(), wl.take(pair_planes[k].reshape(-1)), -1),
            wl.lane_safe(),
            wl.lane_live(),
        )
        cur = wl.take(rgb)
        rows = srgb * sa[..., None] + cur * (1.0 - sa[..., None])
        rgb = wl.compose(rgb, rows)
    return rgb, needed_k


def _pixel_centers(config: RenderConfig, band_height: int, y_offset):
    ys = jnp.arange(band_height, dtype=jnp.float32) + 0.5 + y_offset
    xs = jnp.arange(config.width, dtype=jnp.float32) + 0.5
    px = jnp.tile(xs[None, :], (band_height, 1)).reshape(-1)
    py = jnp.repeat(ys[:, None], config.width, axis=1).reshape(-1)
    return px, py


def _px_py_at(idx, width: int, y_offset):
    """Pixel centers of flat band indices, computed arithmetically — the
    worklist paths used to gather px[idx]/py[idx], two gather lanes per
    worklist entry for what is a div/mod away."""
    x = (idx % width).astype(jnp.float32) + 0.5
    y = (idx // width).astype(jnp.float32) + 0.5 + y_offset
    return x, y


def _merged_vertex_stage(scene, state, config):
    """View-independent geometry for both pass families -> ((static,
    animated) VertexStage pair, merged TriangleAttrs).

    Computed ONCE per frame and shared by every view and band: skinning,
    world transforms, uv transforms, and attribute packing do not depend
    on the camera, so stereo's second eye (and each row_chunks band) pays
    only the clip transform + edge setup in _merged_setup_for_view. The
    reference gets the same sharing from one-draw-both-eyes multiview
    (pipelines.rs:373; shared-structs/src/lib.rs:50-121 selects per-eye
    matrices inside the shader)."""
    stage_s = geometry_vertex_stage(
        state.draws_static,
        scene["indices"],
        scene["positions"],
        scene["normals"],
        scene["uvs"],
        scene["lightmap_uvs"],
        scene["tri_material"],
        scene["materials"],
        config.t_cap,
        v_cap=config.v_cap or config.t_cap,
    )
    stage_a = geometry_vertex_stage(
        state.draws_animated,
        scene["anim_indices"],
        scene["anim_positions"],
        scene["anim_normals"],
        scene["anim_uvs"],
        None,
        scene["anim_tri_material"],
        scene["materials"],
        config.t_cap_anim,
        v_cap=config.v_cap_anim or config.t_cap_anim,
        joint_palette=state.joint_palette,
        joint_indices=scene["anim_joint_indices"],
        joint_weights=scene["anim_joint_weights"],
    )
    merged_attrs = jtu.tree_map(
        lambda a, b: jnp.concatenate([a, b]), stage_s.attrs, stage_a.attrs
    )
    return (stage_s, stage_a), merged_attrs


def _merged_setup_for_view(stages, view_proj, config):
    """Per-view half of the geometry pass: clip + edge setup for both
    VertexStages, merged into one pair list (static rows first)."""
    stage_s, stage_a = stages
    tri = geometry_view_setup(
        stage_s, view_proj, config.width, config.height,
        flip_viewport=config.flip_viewport,
    )
    tri_a = geometry_view_setup(
        stage_a, view_proj, config.width, config.height,
        flip_viewport=config.flip_viewport,
    )
    return TriangleSetup(
        setup=jnp.concatenate([tri.setup, tri_a.setup]),
        tri_id=jnp.concatenate([tri.tri_id, tri_a.tri_id]),
        inst_id=jnp.concatenate([tri.inst_id, tri_a.inst_id]),
        bbox=jnp.concatenate([tri.bbox, tri_a.bbox]),
        valid=jnp.concatenate([tri.valid, tri_a.valid]),
        num_valid=tri.num_valid + tri_a.num_valid,
    )


def _merged_geometry(scene, state, view_proj, config):
    """Static + animated geometry as one pair list (single-view wrapper
    over _merged_vertex_stage + _merged_setup_for_view; kept for the
    attribution tools and capacity stats)."""
    stages, merged_attrs = _merged_vertex_stage(scene, state, config)
    return _merged_setup_for_view(stages, view_proj, config), merged_attrs


def render_view(
    scene: dict,
    state: FrameState,
    view_index: int,
    config: RenderConfig,
    env: EnvBindings,
    band_height: Optional[int] = None,
    y_offset=0,
    with_stats: bool = False,
    geometry=None,
):
    """Render one view (or one horizontal band of it) -> (bh, W, 4) f32.

    geometry: optional precomputed (merged_tri, merged_attrs) for this
    view — render_frame_impl computes the view-independent vertex stage
    once per frame and each view's setup once across its bands, so
    stereo's second eye and every band skip skinning/attribute work.
    None (a bare single-view call) computes it here.

    with_stats: also return {"pairs_needed", "layers_needed",
    "shade_px_needed", "shade_px_needed_k", "opaque_px_needed"} (i32) —
    the max bin-pair count any raster pass in this view needed (vs
    config.p_cap), the max per-pixel transparent-fragment count any
    k-buffer pass saw (vs config.blend_layers), the max need of the
    worklists bounded by config.shade_px_cap (the clip resolve, plus the
    blend/particle layer-0 worklists while shade_px_caps is unset), the
    (blend_layers,) per-layer worklist needs of the blend/particle
    shading loops (vs config.layer_caps()), and the opaque/clip
    covered-pixel count (vs config.opaque_px_cap; reported on both the
    compacted and full-screen shading paths, so a host can size the cap
    from one full-screen stats frame — nothing is droppable on the
    full-screen path, where coverage <= npx <= cap by construction)."""
    band_height = band_height or config.height
    u = state.uniforms
    view_proj = u["view_proj"][view_index]

    if geometry is None:
        merged_tri, merged_attrs = _merged_geometry(scene, state, view_proj, config)
    else:
        merged_tri, merged_attrs = geometry
    px, py = _pixel_centers(config, band_height, y_offset)
    mats = scene["materials"]
    blend_mode = mats["blend_mode"][merged_attrs.material]
    # One (T, 48[+24+3L]) row per pair: the deferred stages' setup +
    # attrs fetch becomes a single per-pixel gather (interpolate_gbuffer)
    # — and on matq scenes the per-triangle material row rides the same
    # row (materials are per-triangle-static), so shade() pays ZERO
    # extra gathers for material state (GBuffer.mat_tail).
    shade_row = None
    shade_row_cols = None
    if merged_attrs.packed is not None:
        parts = [merged_tri.setup, merged_attrs.packed]
        if "texels_mq" in scene and "mat_row_mq" in mats:
            parts.append(mats["mat_row_mq"][merged_attrs.material])
        shade_row = jnp.concatenate(parts, axis=1)
        if config.shade_row_pad > 0:
            shade_row_cols = shade_row.shape[1]
            pad = -shade_row_cols % config.shade_row_pad
            if pad:
                shade_row = jnp.pad(shade_row, ((0, 0), (0, pad)))

    # Sorted-pair mode (pallas raster + packed shade rows): the raster
    # passes leave SORTED bin positions in their pair planes and the
    # per-pair shade-row table is gathered into sorted order instead —
    # a (p_cap,) row gather per pass replaces the full-screen
    # sorted-pos -> pair-id remap, which measured 15.6 ms of the
    # headline's 15.8 ms "raster" stage at 1080p (tools/raster_probe.py;
    # the Pallas kernel itself is 0.5 ms). The clip pass's sorted
    # positions are offset by p_cap and its table concatenated after the
    # opaque one, so the merged visibility buffer after the clip resolve
    # still indexes ONE table (vis_row).
    sorted_mode = (
        SORTED_PAIR_MODE
        and shade_row is not None
        and config.resolve_raster() == "pallas"
    )

    # --- pass 1: opaque visibility ---
    opaque_tri = merged_tri._replace(valid=merged_tri.valid & (blend_mode == 0))
    vis, pairs_needed, op_order = _rasterize(
        opaque_tri, config, band_height, y_offset, remap=not sorted_mode
    )
    vis_row = shade_row[op_order] if sorted_mode else shade_row

    def gbuffer_of(pair):
        return interpolate_gbuffer(
            pair.reshape(-1), px, py, merged_tri, merged_attrs,
            shade_row=vis_row, row_cols=shade_row_cols,
        )

    clip_layers_needed = jnp.int32(0)
    blend_layers_needed = jnp.int32(0)
    particle_layers_needed = jnp.int32(0)
    shade_px_needed = jnp.int32(0)
    shade_px_needed_k = jnp.zeros((config.needed_k_len(),), jnp.int32)
    clip_px_needed_k = jnp.zeros((config.resolve_clip_layers(),), jnp.int32)
    matq_classic_needed = jnp.int32(0)

    # Material-path partition: on PARTIAL interleaved pools (some
    # materials matq-capable, some not — scene publishes matq_capable),
    # sample each lane on its own path via _partition_material_sample.
    # Used by the opaque shade, the blend-layer shades, and (albedo-only)
    # the clip resolve.
    partial_pool = "matq_capable" in scene and "texels_mq" in scene
    use_partition = partial_pool and (config.matq_classic_cap or 0) > 0

    def _sampled(g, slots=None):
        nonlocal matq_classic_needed
        if not partial_pool:
            return None
        if not use_partition:
            # Partition off (all-classic shade): still report the
            # incapable-lane count so a host can size matq_classic_cap
            # from one stats frame — mirroring the other worklist caps.
            capable = scene["matq_capable"][jnp.maximum(g.material, 0)]
            needed = jnp.sum(((~capable) & g.valid).astype(jnp.int32))
            matq_classic_needed = jnp.maximum(matq_classic_needed, needed)
            return None
        s, needed = _partition_material_sample(
            g, scene, config, config.aniso_taps, slots=slots
        )
        matq_classic_needed = jnp.maximum(matq_classic_needed, needed)
        return s

    def sampled_s16(g):
        return _sampled(g)

    def sampled_albedo(g):
        return _sampled(g, slots=(0,))

    # --- pass 2: alpha-clip resolve (K nearest candidates, keep the nearest
    # one whose albedo alpha passes the cutoff; the same decision the
    # in-raster discard makes in fragment_alpha_clipped, lib.rs:405-407).
    # Alpha is evaluated only on the compacted worklist of pixels that have
    # any clip fragment (see _compact_px) — K full-screen albedo fetches
    # collapse to K worklist-sized ones. ---
    if config.enable_clip:
        from ..ops.shade import albedo_alpha

        clip_tri = merged_tri._replace(
            valid=merged_tri.valid & (blend_mode == 1)
        )
        kb, clip_pairs, clip_layers, clip_order = _rasterize_kbuffer(
            clip_tri, config, band_height, y_offset, vis.depth,
            k=config.resolve_clip_layers(), remap=not sorted_mode,
        )
        if sorted_mode:
            # Unified table: opaque rows at [0, p_cap), clip rows at
            # [p_cap, 2*p_cap); clip sorted positions shift by p_cap.
            vis_row = jnp.concatenate([vis_row, shade_row[clip_order]])
        clip_off = config.p_cap if sorted_mode else 0
        pairs_needed = jnp.maximum(pairs_needed, clip_pairs)
        clip_layers_needed = jnp.maximum(clip_layers_needed, clip_layers)
        # Per-LAYER resolve worklists (k-buffer occupancy is monotone
        # decreasing, so round k touches only the pixels that actually
        # have a layer-k candidate — the shared-worklist form paid layer
        # 0's size on every round). Full-screen found/chosen planes carry
        # the find-nearest-passing-layer state between rounds; the merge
        # is take/compose fat-row traffic (near-free in granule mode).
        npx_band = band_height * config.width
        clip_caps = config.resolve_clip_caps()
        found_p = jnp.zeros((npx_band,), jnp.int32)
        chosen_pair_p = jnp.zeros((npx_band,), jnp.int32)
        chosen_depth_p = jnp.zeros((npx_band,), jnp.float32)
        for k in range(config.resolve_clip_layers()):
            mask_k = (kb.pair[k] >= 0).reshape(-1)
            wlk = _compact_worklist(mask_k, clip_caps[k], config)
            clip_px_needed_k = clip_px_needed_k.at[k].max(wlk.need)
            livek = wlk.lane_live()
            pxc, pyc = _px_py_at(wlk.lane_safe(), config.width, y_offset)
            raw_k = wlk.take(kb.pair[k].reshape(-1))
            pair_k = jnp.where(livek & (raw_k >= 0), raw_k + clip_off, -1)
            g = interpolate_gbuffer(
                pair_k, pxc, pyc, merged_tri, merged_attrs,
                shade_row=vis_row, row_cols=shade_row_cols,
            )
            a, cutoff = albedo_alpha(
                g, scene, aniso_taps=config.aniso_taps,
                albedo4=sampled_albedo(g),
            )
            cur_found = wlk.take(found_p) != 0
            ok = g.valid & (a >= cutoff) & ~cur_found
            found_p = wlk.compose(
                found_p, (cur_found | ok).astype(jnp.int32)
            )
            chosen_pair_p = wlk.compose(
                chosen_pair_p,
                jnp.where(ok, pair_k, wlk.take(chosen_pair_p)),
            )
            chosen_depth_p = wlk.compose(
                chosen_depth_p,
                jnp.where(
                    ok,
                    wlk.take(kb.depth[k].reshape(-1)),
                    wlk.take(chosen_depth_p),
                ),
            )
        # clip_px_needed_k[0] is the old shared worklist's need (layer-0
        # occupancy == any-layer occupancy); report it on the shared-cap
        # stat while clip_px_caps is unset so existing growth keeps
        # working, and on the per-layer stat always.
        if config.clip_px_caps is None:
            shade_px_needed = jnp.maximum(shade_px_needed, clip_px_needed_k[0])
        # write the winning clip surfaces back into the visibility buffer
        # (pixels with no passing layer keep the opaque result)
        vshape = vis.pair.shape
        found_b = (found_p != 0).reshape(vshape)
        vis = VisibilityBuffer(
            depth=jnp.where(
                found_b, chosen_depth_p.reshape(vshape), vis.depth
            ),
            pair=jnp.where(
                found_b, chosen_pair_p.reshape(vshape), vis.pair
            ),
        )

    # --- skybox for misses (depth GreaterEqual at the far plane in the
    # reference, pipelines.rs:550-554; here: the base layer the shaded
    # surfaces overwrite) ---
    npx = band_height * config.width
    sky_px_needed = jnp.int32(0)
    if 0 < (config.sky_px_cap or 0) < npx:
        # Sky worklist: evaluate the cubemap only where the post-clip
        # visibility buffer has no winner. Pixels with pair >= 0 never
        # read the sky value (the shade paths select rgb_w there), so
        # zeros under covered granules are unobservable; granules with
        # ANY miss pixel are in the worklist and their partially-covered
        # lanes gather real sky rows as before.
        from ..ops.sky import sample_skybox_at

        miss = (vis.pair < 0).reshape(-1)
        swl = _compact_worklist(miss, config.sky_px_cap, config)
        sky_px_needed = swl.need
        sky_rows = sample_skybox_at(
            scene,
            env,
            swl.lane_safe(),
            config.width,
            u["projection_inverse"][view_index],
            u["view_inverse_quat"][view_index],
            inline_tonemapping=config.inline_tonemapping,
            inline_srgb=config.inline_srgb,
            y_offset=y_offset,
            full_height=config.height,
        )
        sky = swl.compose(jnp.zeros((npx, 3), jnp.float32), sky_rows)
    else:
        sky = sample_skybox(
            scene,
            env,
            config.width,
            band_height,
            u["projection_inverse"][view_index],
            u["view_inverse_quat"][view_index],
            inline_tonemapping=config.inline_tonemapping,
            inline_srgb=config.inline_srgb,
            y_offset=y_offset,
            full_height=config.height,
        )
        # Report the worklist path's true need even on the full-screen
        # path (granule-dilated miss count), so a host can size
        # sky_px_cap from one full-screen stats frame — mirroring
        # opaque_px_needed below.
        miss = (vis.pair < 0).reshape(-1)
        gr = _worklist_granule(config, npx)
        if gr > 1:
            gmiss = miss.reshape(npx // gr, gr).any(axis=1)
            sky_px_needed = jnp.sum(gmiss.astype(jnp.int32)) * gr
        else:
            sky_px_needed = jnp.sum(miss.astype(jnp.int32))

    # --- shade the winning opaque/clip surface ---
    opaque_px_needed = jnp.int32(0)

    if 0 < (config.opaque_px_cap or 0) < npx:
        # Compacted: gbuffer interpolation + the full material/lighting
        # evaluation run only on the worklist of covered pixels; sky pixels
        # never pay a texture tap. Identical per-lane math to the
        # full-screen path (bit-exact; tests/test_render.py parity tests).
        # In granule mode (worklist_granules) the worklist holds
        # granule_px-wide row-granules: the compaction sort shrinks by the
        # granule size and the pair / sky / composite moves become fat-row
        # gathers — near-free (docs/TIMING.md). Dead lanes inside a live
        # granule (pair < 0) composite the sky row they gather anyway.
        hit_mask = (vis.pair >= 0).reshape(-1)
        wl = _compact_worklist(hit_mask, config.opaque_px_cap, config)
        opaque_px_needed = wl.need
        opx, opy = _px_py_at(wl.lane_safe(), config.width, y_offset)
        g = interpolate_gbuffer(
            jnp.where(wl.lane_live(), wl.take(vis.pair.reshape(-1)), -1),
            opx,
            opy,
            merged_tri,
            merged_attrs,
            shade_row=vis_row, row_cols=shade_row_cols,
        )
        rgb_w, _ = shade(
            g,
            scene,
            u,
            view_index,
            env=env,
            inline_tonemapping=config.inline_tonemapping,
            inline_srgb=config.inline_srgb,
            aniso_taps=config.aniso_taps,
            s16=sampled_s16(g),
        )
        rgb = wl.compose(
            sky, jnp.where(g.valid[..., None], rgb_w, wl.take(sky))
        )
    else:
        gbuf = gbuffer_of(vis.pair)
        # Report coverage here too (one cheap reduction): nothing can be
        # dropped on this path, but the stat lets a host size opaque_px_cap
        # from a single full-screen stats frame (coverage <= npx <= any
        # cap that selects this path, so growth still self-limits). When
        # the sized cap will select the granule path, report the
        # granule-DILATED count — that path's true need.
        gr = _worklist_granule(config, npx)
        if gr > 1:
            gmask = gbuf.valid.reshape(npx // gr, gr).any(axis=1)
            opaque_px_needed = jnp.sum(gmask.astype(jnp.int32)) * gr
        else:
            opaque_px_needed = jnp.sum(gbuf.valid.astype(jnp.int32))
        rgb, alpha = shade(
            gbuf,
            scene,
            u,
            view_index,
            env=env,
            inline_tonemapping=config.inline_tonemapping,
            inline_srgb=config.inline_srgb,
            aniso_taps=config.aniso_taps,
            s16=sampled_s16(gbuf),
        )
        rgb = jnp.where(gbuf.valid[..., None], rgb, sky)

    # --- lines (flat-color debug geometry, depth-tested against the
    # scene; line pipeline + flat_colour shader, rendering.rs:535-539) ---
    depth_floor = vis.depth
    if config.enable_lines and state.lines is not None:
        from ..ops.lines import line_geometry

        line_tri, line_colors = line_geometry(
            state.lines["pos"],
            state.lines["color"],
            state.lines["valid"],
            view_proj,
            config.width,
            config.height,
            line_width_px=config.line_width_px,
            flip_viewport=config.flip_viewport,
        )
        line_init = VisibilityBuffer(
            depth=vis.depth,
            pair=jnp.full_like(vis.pair, -1),
        )
        # Sorted positions + a p_cap-row color reindex avoid a second
        # full-screen id remap (same trick as vis_row above).
        sorted_lines = SORTED_PAIR_MODE and config.resolve_raster() == "pallas"
        lvis, line_pairs, l_order = _rasterize(
            line_tri, config, band_height, y_offset, init=line_init,
            remap=not sorted_lines,
        )
        if sorted_lines:
            line_colors = line_colors[l_order]
        pairs_needed = jnp.maximum(pairs_needed, line_pairs)
        lhit = (lvis.pair >= 0).reshape(-1)
        lcol = line_colors[jnp.maximum(lvis.pair.reshape(-1), 0)]
        rgb = jnp.where(lhit[..., None], lcol, rgb)
        depth_floor = lvis.depth

    # --- particles (camera-facing smoke quads, k-buffer sorted per pixel;
    # drawn after skybox, before alpha-blend, rendering.rs:544-548) ---
    if config.enable_particles and state.particles is not None:
        from ..ops.particles import particle_geometry, shade_particles
        from ..ops.shade import GBuffer as _GB, sample_spherical_harmonics

        p_tri, p_attrs = particle_geometry(
            state.particles,
            u["view"][view_index],
            u["view_inverse"][view_index],
            u["projection"][view_index],
            config.width,
            config.height,
            flip_viewport=config.flip_viewport,
        )
        sorted_p = (
            SORTED_PAIR_MODE
            and p_attrs.packed is not None
            and config.resolve_raster() == "pallas"
        )
        pkb, p_pairs, p_layers, p_order = _rasterize_kbuffer(
            p_tri, config, band_height, y_offset, depth_floor,
            want_depth=False, k=config.resolve_particle_layers(),
            remap=not sorted_p,
        )
        if sorted_p:
            # Same sorted-position trick as vis_row: one p_cap-row
            # reindex of the packed particle rows instead of a
            # full-screen id remap per layer plane.
            p_attrs = p_attrs._replace(packed=p_attrs.packed[p_order])
        pairs_needed = jnp.maximum(pairs_needed, p_pairs)
        particle_layers_needed = jnp.maximum(particle_layers_needed, p_layers)

        def sh_sampler(world_pos):
            fake = _GB(
                valid=None, world_pos=world_pos, normal=None, uv=None,
                lm_uv=jnp.zeros_like(world_pos[..., :2]), material=None,
                front_facing=None,
                lightmapped=jnp.zeros(world_pos.shape[0], bool),
                dpdx=None, dpdy=None, duvdx=None, duvdy=None,
            )
            return sample_spherical_harmonics(fake, scene, u, env)

        def shade_particle_layer(pair_w, safe, live):
            spx, spy = _px_py_at(safe, config.width, y_offset)
            return shade_particles(
                pair_w,
                spx,
                spy,
                p_tri,
                p_attrs,
                state.particles,
                scene,
                u,
                env,
                view_index,
                sh_sampler,
                inline_tonemapping=config.inline_tonemapping,
                inline_srgb=config.inline_srgb,
            )

        rgb, shade_px_needed_k = _composite_layers(
            rgb, pkb.pair,
            config.layer_caps(config.resolve_particle_layers()),
            shade_px_needed_k, shade_particle_layer, config,
        )

    # --- pass 3: alpha-blend composite (K nearest blended layers, shaded
    # and blended back-to-front; drawn last like rendering.rs:550) ---
    if config.enable_blend:
        blend_tri = merged_tri._replace(
            valid=merged_tri.valid & (blend_mode == 2)
        )
        kb, blend_pairs, blend_layers_seen, blend_order = _rasterize_kbuffer(
            blend_tri, config, band_height, y_offset, depth_floor,
            want_depth=False, remap=not sorted_mode,
        )
        blend_row = shade_row[blend_order] if sorted_mode else shade_row
        pairs_needed = jnp.maximum(pairs_needed, blend_pairs)
        blend_layers_needed = jnp.maximum(blend_layers_needed, blend_layers_seen)
        def shade_blend_layer(pair_w, safe, live):
            bpx, bpy = _px_py_at(safe, config.width, y_offset)
            g = interpolate_gbuffer(
                pair_w, bpx, bpy, merged_tri, merged_attrs,
                shade_row=blend_row, row_cols=shade_row_cols,
            )
            lrgb, la = shade(
                g,
                scene,
                u,
                view_index,
                env=env,
                inline_tonemapping=config.inline_tonemapping,
                inline_srgb=config.inline_srgb,
                aniso_taps=config.aniso_taps,
                s16=sampled_s16(g),
            )
            return lrgb, jnp.where(g.valid, la, 0.0)

        rgb, shade_px_needed_k = _composite_layers(
            rgb, kb.pair, config.layer_caps(), shade_px_needed_k,
            shade_blend_layer, config,
        )

    # Non-inline path: the reference renders linear HDR to an intermediate
    # buffer and tonemaps in a composite pass (tonemap shader,
    # lib.rs:645-669, which converts everything — unlit included). The
    # deferred equivalent is one tonemap over the finished band.
    from ..ops.tonemap import aces_filmic, linear_to_srgb_approx

    if not config.inline_tonemapping:
        rgb = aces_filmic(rgb)
    if not config.inline_srgb:
        rgb = linear_to_srgb_approx(rgb)

    # shade_px_needed tracks only worklists BOUNDED by shade_px_cap: the
    # clip resolve (above), plus the blend/particle layer-0 worklists while
    # shade_px_caps is unset (layer_caps() falls back to the shared cap).
    # Once per-layer caps are set, those loops are bounded by caps[k] and
    # reported via shade_px_needed_k — including them here would trigger
    # spurious shade_px_cap growth (recompile + re-render) with nothing
    # dropped.
    if config.shade_px_caps is None:
        shade_px_needed = jnp.maximum(shade_px_needed, shade_px_needed_k[0])

    img = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1).reshape(
        band_height, config.width, 4
    )
    if with_stats:
        return img, {
            "pairs_needed": pairs_needed,
            # max over the k-buffer passes (back-compat aggregate; the
            # per-pass keys below drive per-pass K growth)
            "layers_needed": jnp.maximum(
                jnp.maximum(clip_layers_needed, blend_layers_needed),
                particle_layers_needed,
            ),
            "clip_layers_needed": clip_layers_needed,
            "blend_layers_needed": blend_layers_needed,
            "particle_layers_needed": particle_layers_needed,
            "shade_px_needed": shade_px_needed,
            "shade_px_needed_k": shade_px_needed_k,
            "opaque_px_needed": opaque_px_needed,
            "sky_px_needed": sky_px_needed,
            "matq_classic_needed": matq_classic_needed,
            "clip_px_needed_k": clip_px_needed_k,
        }
    return img


def render_frame_impl(
    scene: dict,
    state: FrameState,
    config: RenderConfig,
    env: EnvBindings = EnvBindings(),
    with_stats: bool = False,
):
    """Unjitted frame body (all views) -> (V, H, W, 4) uint8.

    with_stats: also return {"pairs_needed", "layers_needed",
    "shade_px_needed", "opaque_px_needed"} (i32) aggregated (max) over
    all views/bands, so the host can grow p_cap/blend_layers/
    shade_px_cap/opaque_px_cap instead of silently truncating."""
    views = []
    stats_acc = {
        "pairs_needed": jnp.int32(0),
        "layers_needed": jnp.int32(0),
        "clip_layers_needed": jnp.int32(0),
        "blend_layers_needed": jnp.int32(0),
        "particle_layers_needed": jnp.int32(0),
        "shade_px_needed": jnp.int32(0),
        "shade_px_needed_k": jnp.zeros((config.needed_k_len(),), jnp.int32),
        "opaque_px_needed": jnp.int32(0),
        "sky_px_needed": jnp.int32(0),
        "matq_classic_needed": jnp.int32(0),
        "clip_px_needed_k": jnp.zeros(
            (config.resolve_clip_layers(),), jnp.int32
        ),
    }
    stages, merged_attrs = _merged_vertex_stage(scene, state, config)
    for v in range(config.num_views):
        geometry = (
            _merged_setup_for_view(stages, state.uniforms["view_proj"][v], config),
            merged_attrs,
        )
        if config.row_chunks <= 1:
            out = render_view(
                scene, state, v, config, env, with_stats=with_stats,
                geometry=geometry,
            )
            if with_stats:
                out, stats = out
                stats_acc = {
                    k: jnp.maximum(stats_acc[k], stats[k]) for k in stats_acc
                }
            views.append(to_u8(out))
            continue
        assert config.height % config.row_chunks == 0
        band_h = config.height // config.row_chunks
        y0s = jnp.arange(config.row_chunks, dtype=jnp.int32) * band_h

        def band(y0, v=v, geometry=geometry):
            out = render_view(
                scene, state, v, config, env,
                band_height=band_h, y_offset=y0, with_stats=with_stats,
                geometry=geometry,
            )
            if with_stats:
                img, stats = out
                return to_u8(img), stats
            return to_u8(out)

        bands = jax.lax.map(band, y0s)  # (chunks, band_h, W, 4)
        if with_stats:
            bands, band_stats = bands
            stats_acc = {
                k: jnp.maximum(stats_acc[k], band_stats[k].max(axis=0))
                for k in stats_acc
            }
        views.append(bands.reshape(config.height, config.width, 4))
    image = jnp.stack(views)
    if with_stats:
        return image, stats_acc
    return image


render_frame = partial(jax.jit, static_argnames=("config", "env"))(render_frame_impl)


def _render_frame_stats_impl(scene, state, config, env=EnvBindings()):
    return render_frame_impl(scene, state, config, env, with_stats=True)


# (image, {"pairs_needed", "layers_needed", "shade_px_needed"}) variant —
# used by the ECS render system to detect bin-pair / k-layer / shading-
# worklist overflow and grow p_cap / blend_layers / shade_px_cap (the
# grow-never-drop policy of buffers.rs:61-106).
render_frame_stats = partial(jax.jit, static_argnames=("config", "env"))(
    _render_frame_stats_impl
)


def stats_to_host(stats: dict) -> dict:
    """Device stats dict -> plain ints / lists of ints (one device_get).

    The single conversion point for render_frame_stats outputs — scalars
    become int, the per-layer vector becomes a list — so every consumer
    (ECS render system, bench.fit_caps, tools/flop_costs) reads the same
    shapes."""
    raw = jax.device_get(stats)
    return {
        k: (
            [int(x) for x in v]
            if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0)
            else int(v)
        )
        for k, v in raw.items()
    }


@partial(jax.jit, static_argnames=("config",))
def frame_capacity_stats(scene: dict, state: FrameState, config: RenderConfig):
    """(num_triangles, num_bin_pairs) the frame would need — compare with
    t_cap/p_cap via utils.profiler.frame_capacity_report. Run once per
    scene/camera change, not per frame (capacities are static under jit,
    so overflow would silently drop triangles)."""
    u = state.uniforms
    tri, _attrs = _merged_geometry(scene, state, u["view_proj"][0], config)
    bins = bin_triangles(tri, config.width, config.height, 1)
    return tri.num_valid, bins.num_pairs
