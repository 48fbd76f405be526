"""External visual parity: the engine vs an independent GL forward
renderer (llvmpipe + GLSL re-implementation of the same published shading
equations). BASELINE.json's quality gate is PSNR >= 35 dB vs reference
frames; no wgpu exists in this environment, so Mesa's software GL is the
third opinion (the engine's two rasterizers share setup/shading code, so
only an external pipeline can catch a shared math bug).

Measured at 512x512 (2026-08-16): unlit = inf dB (bit-exact — the
watertight rasterizer reproduces Mesa's pixel coverage exactly),
diffuse 60.6 dB, metal 47.1 dB, rough_mix 55.4 dB; textured (engine mip
chain uploaded to GL, isolating UV interp + LOD + trilinear filtering):
tex_unlit 56.9 dB, tex_diffuse 56.0 dB; normal_map 37.5 dB (a broad
sub-1% haze from mip-LOD-selection differences between analytic and quad
derivatives, no structural error).
At 256x256: alpha_blend 52.9 dB (k-buffer composite vs GL sorted
src-alpha blending), alpha_clip 42.5 dB (in-kernel kill vs GL discard).
Skinning (384x384, wave-palette tube, GL vertex-shader Similarity blend):
73.4 dB. Skybox (320x320, gradient+sun cubemap vs GL samplerCube):
100.0 dB. Lightvol (320x320, 4 synthetic 8^3 volumes vs GL sampler3D):
54.0 dB. The assert stays at the official 35 dB gate."""

import numpy as np
import pytest

from superconductor_tpu import (
    Camera,
    EnvBindings,
    RenderConfig,
    Scene,
    Similarity,
    make_uniforms,
    render_frame,
)
from superconductor_tpu.math3d import look_at, mat3_to_quat, mat4_inverse
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.scene.scene import MAT_UNLIT, MaterialSettings
from superconductor_tpu.utils.metrics import psnr


def _gl_renderer(width, height):
    try:
        from superconductor_tpu.native.gloracle import GlForwardRenderer

        return GlForwardRenderer(width, height)
    except Exception as e:
        pytest.skip(f"GL oracle unavailable: {e!r}")


def _encoded_clear(c):
    """The engine's miss path tonemaps + srgb-encodes the clear color
    (inline path); GL clears with raw values, so pre-encode for parity."""
    c = np.asarray(c, np.float32)
    c = np.clip((c * (2.51 * c + 0.03)) / (c * (2.43 * c + 0.59) + 0.14), 0, 1)
    return tuple(np.power(c, 1 / 2.2).tolist()) + (1.0,)


def _camera(pos, target, width, height):
    cam = Camera(position=np.asarray(pos, np.float32))
    v = look_at(cam.position, target)
    cam.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])
    return make_uniforms(cam, width, height)


def _engine_render(scene, model, uniforms, width, height, env):
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(width=width, height=height, raster="ref")
    return np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]


def _add_mesh(scene, pos, nrm, uv, idx, mat, blend_mode=0,
              double_sided=False):
    from superconductor_tpu.scene.scene import Model, Primitive, PrimitiveLod

    first, count, fv, vc = scene.insert_static_mesh(
        pos, nrm, uv, np.zeros_like(uv), idx, mat
    )
    prim = Primitive(
        material=mat, blend_mode=blend_mode, double_sided=double_sided,
        animated=False,
        lods=[PrimitiveLod(first_index=first, index_count=count,
                           first_vertex=fv, vertex_count=vc)],
        bounding_sphere_radius=float(np.linalg.norm(pos, axis=1).max()),
        bbox_min=pos.min(0), bbox_max=pos.max(0),
    )
    return Model(primitives=[prim])


SH = np.array(
    [
        [0.8, 0.75, 0.7],      # L0
        [0.20, 0.18, 0.15],    # L1x / L0 ratios
        [0.35, 0.35, 0.30],    # L1y
        [0.10, 0.10, 0.08],    # L1z
    ],
    np.float32,
)


def _sphere_arrays():
    from superconductor_tpu.utils.procgen import uv_sphere

    return uv_sphere(48, 48)


@pytest.mark.parametrize(
    "case", ["unlit", "diffuse", "metal", "rough_mix"]
)
def test_engine_matches_gl_oracle(case):
    width = height = 512
    gl = _gl_renderer(width, height)

    params = {
        "unlit": dict(base=(0.9, 0.3, 0.1, 1.0), metallic=0.0,
                      roughness=1.0, unlit=True),
        "diffuse": dict(base=(0.8, 0.8, 0.8, 1.0), metallic=0.0,
                        roughness=1.0, unlit=False),
        "metal": dict(base=(0.9, 0.7, 0.4, 1.0), metallic=1.0,
                      roughness=0.3, unlit=False),
        "rough_mix": dict(base=(0.4, 0.6, 0.9, 1.0), metallic=0.5,
                          roughness=0.6, unlit=False),
    }[case]

    pos, nrm, uv, idx = _sphere_arrays()

    # --- engine ---
    scene = Scene()
    mat = scene.add_material(
        MaterialSettings(
            base_color_factor=params["base"],
            metallic_factor=params["metallic"],
            roughness_factor=params["roughness"],
            flags=MAT_UNLIT if params["unlit"] else 0,
        )
    )
    model = _add_mesh(scene, pos, nrm, uv, idx, mat)
    uniforms = _camera([0.6, 0.5, 2.2], [0, 0, 0], width, height)
    env = EnvBindings(
        ambient_sh=tuple(SH.reshape(-1).tolist()),
        clear_color=(0.1, 0.12, 0.15),
    )
    mine = _engine_render(scene, model, uniforms, width, height, env)

    # --- GL oracle ---
    ref = gl.render(
        [
            dict(
                positions=pos, normals=nrm, indices=idx,
                base_color=params["base"], metallic=params["metallic"],
                roughness=params["roughness"], unlit=params["unlit"],
            )
        ],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=SH,
        clear_color=_encoded_clear((0.1, 0.12, 0.15)),
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"{case}: PSNR {db:.1f} dB vs independent GL oracle"


def _gradient_texture(size=64):
    """Low-frequency RGB pattern: smooth enough that trilinear LOD
    selection differences (engine's analytic derivatives vs GL's pixel-quad
    derivatives) stay within the PSNR gate, structured enough that a
    sampling bug (wrong level, swapped axes, off-by-half texel) fails it."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    r = 0.5 + 0.45 * np.sin(2 * np.pi * x)
    g = 0.5 + 0.45 * np.cos(2 * np.pi * y)
    b = 0.5 + 0.35 * np.sin(2 * np.pi * (x + y))
    a = np.ones_like(x)
    return (np.stack([r, g, b, a], -1) * 255).astype(np.uint8)


@pytest.mark.parametrize("case", ["tex_unlit", "tex_diffuse"])
def test_engine_texture_sampling_matches_gl_oracle(case):
    """Texture sampling (SURVEY 'hard part': gathers, mip LOD, bilinear)
    against the independent GL rasterizer. The GL side uploads the ENGINE's
    own mip chain, so mip *generation* is held constant and the comparison
    isolates UV interpolation + LOD selection + (bi/tri)linear filtering."""
    from superconductor_tpu.scene.scene import build_mip_chain

    width = height = 512
    gl = _gl_renderer(width, height)
    unlit = case == "tex_unlit"
    base = (1.0, 1.0, 1.0, 1.0)

    tex = _gradient_texture()
    chain = build_mip_chain(tex)
    pos, nrm, uv, idx = _sphere_arrays()

    scene = Scene()
    tex_id = scene.textures.add_texture(chain)  # linear (no SRGB flag)
    mat = scene.add_material(
        MaterialSettings(
            base_color_factor=base,
            metallic_factor=0.0,
            roughness_factor=1.0,
            flags=MAT_UNLIT if unlit else 0,
            albedo_tex=tex_id,
        )
    )
    model = _add_mesh(scene, pos, nrm, uv, idx, mat)
    uniforms = _camera([0.6, 0.5, 2.2], [0, 0, 0], width, height)
    env = EnvBindings(
        ambient_sh=tuple(SH.reshape(-1).tolist()),
        clear_color=(0.1, 0.12, 0.15),
    )
    mine = _engine_render(scene, model, uniforms, width, height, env)

    ref = gl.render(
        [
            dict(
                positions=pos, normals=nrm, uvs=uv, indices=idx,
                base_color=base, metallic=0.0, roughness=1.0,
                unlit=unlit, tex_chain=chain,
            )
        ],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=SH,
        clear_color=_encoded_clear((0.1, 0.12, 0.15)),
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"{case}: PSNR {db:.1f} dB vs independent GL oracle"


def test_engine_normal_mapping_matches_gl_oracle():
    """Cotangent-frame normal mapping (SURVEY 'hard part': the engine
    derives the tangent frame from ANALYTIC derivatives, lib.rs:544-587
    uses hardware ddx/ddy) against the independent GL pipeline running the
    published construction with real dFdx/dFdy."""
    from superconductor_tpu.scene.scene import build_mip_chain

    width = height = 512
    gl = _gl_renderer(width, height)

    # low-frequency bump field, snorm-encoded the way the engine decodes
    # ((v - 128) / 127, shade.py map_n decode)
    size = 64
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    nx = 0.3 * np.sin(2 * np.pi * x)
    ny = 0.3 * np.cos(2 * np.pi * y)
    nz = np.sqrt(np.clip(1.0 - nx * nx - ny * ny, 0.0, 1.0))
    enc = lambda c: np.clip(np.round(c * 127.0 + 128.0), 0, 255)
    nmap = np.stack(
        [enc(nx), enc(ny), enc(nz), np.full_like(nx, 255)], -1
    ).astype(np.uint8)
    chain = build_mip_chain(nmap)

    pos, nrm, uv, idx = _sphere_arrays()
    base = (0.85, 0.8, 0.75, 1.0)

    scene = Scene()
    nrm_id = scene.textures.add_texture(chain)
    mat = scene.add_material(
        MaterialSettings(
            base_color_factor=base,
            metallic_factor=0.0,
            roughness_factor=1.0,
            normal_tex=nrm_id,
        )
    )
    model = _add_mesh(scene, pos, nrm, uv, idx, mat)
    uniforms = _camera([0.6, 0.5, 2.2], [0, 0, 0], width, height)
    env = EnvBindings(
        ambient_sh=tuple(SH.reshape(-1).tolist()),
        clear_color=(0.1, 0.12, 0.15),
    )
    mine = _engine_render(scene, model, uniforms, width, height, env)

    ref = gl.render(
        [
            dict(
                positions=pos, normals=nrm, uvs=uv, indices=idx,
                base_color=base, metallic=0.0, roughness=1.0,
                unlit=False, nrm_chain=chain, normal_scale=1.0,
            )
        ],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=SH,
        clear_color=_encoded_clear((0.1, 0.12, 0.15)),
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"normal mapping: PSNR {db:.1f} dB vs GL oracle"


def _quad(z, half=0.9):
    pos = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z],
         [-half, half, z]], np.float32
    )
    nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    return pos, nrm, uv, idx


def test_engine_alpha_blend_matches_gl_oracle():
    """Sorted alpha blending: the engine composites the K nearest blended
    fragments per pixel (k-buffer); GL blends sorted draws with src-alpha
    framebuffer blending. Opaque sphere behind two translucent quads.
    256x256: the k-buffer ref path is heavy to compile on CPU."""
    from superconductor_tpu.scene.scene import BLEND_ALPHA_BLENDED

    width = height = 256
    gl = _gl_renderer(width, height)

    spos, snrm, suv, sidx = _sphere_arrays()
    q1 = _quad(1.2)   # farther translucent quad
    q2 = _quad(1.6)   # nearer translucent quad

    scene = Scene()
    mat_s = scene.add_material(
        MaterialSettings(base_color_factor=(0.8, 0.8, 0.8, 1.0),
                         metallic_factor=0.0, roughness_factor=1.0)
    )
    mat_1 = scene.add_material(
        MaterialSettings(base_color_factor=(0.2, 0.4, 1.0, 0.6),
                         flags=MAT_UNLIT, blend_mode=BLEND_ALPHA_BLENDED)
    )
    mat_2 = scene.add_material(
        MaterialSettings(base_color_factor=(1.0, 0.3, 0.2, 0.5),
                         flags=MAT_UNLIT, blend_mode=BLEND_ALPHA_BLENDED)
    )
    models = [
        (_add_mesh(scene, spos, snrm, suv, sidx, mat_s), 0),
        (_add_mesh(scene, *q1, mat_1, blend_mode=BLEND_ALPHA_BLENDED,
                   double_sided=True), 0),
        (_add_mesh(scene, *q2, mat_2, blend_mode=BLEND_ALPHA_BLENDED,
                   double_sided=True), 0),
    ]
    uniforms = _camera([0.3, 0.2, 3.2], [0, 0, 0], width, height)
    env = EnvBindings(
        ambient_sh=tuple(SH.reshape(-1).tolist()),
        clear_color=(0.1, 0.12, 0.15),
    )
    state = build_frame_state(
        scene, [(m, Similarity()) for m, _ in models], uniforms
    )
    config = RenderConfig(
        width=width, height=height, raster="ref", enable_blend=True
    )
    mine = np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]

    ref = gl.render(
        [
            dict(positions=spos, normals=snrm, indices=sidx,
                 base_color=(0.8, 0.8, 0.8, 1.0), metallic=0.0,
                 roughness=1.0, unlit=False),
            # back-to-front for GL's order-dependent blending
            dict(positions=q1[0], normals=q1[1], indices=q1[3],
                 base_color=(0.2, 0.4, 1.0, 0.6), unlit=True, blend=True,
                 double_sided=True),
            dict(positions=q2[0], normals=q2[1], indices=q2[3],
                 base_color=(1.0, 0.3, 0.2, 0.5), unlit=True, blend=True,
                 double_sided=True),
        ],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=SH,
        clear_color=_encoded_clear((0.1, 0.12, 0.15)),
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"alpha blend: PSNR {db:.1f} dB vs GL oracle"


def test_engine_alpha_clip_matches_gl_oracle():
    """Alpha-clipped materials: in-kernel kill after sampling vs GL
    discard. A sphere with a smooth alpha-gradient albedo at cutoff 0.5.
    256x256: the k-buffer ref path is heavy to compile on CPU."""
    from superconductor_tpu.scene.scene import (
        BLEND_ALPHA_CLIPPED,
        build_mip_chain,
    )

    width = height = 256
    gl = _gl_renderer(width, height)

    size = 64
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    rgba = np.stack(
        [
            np.full_like(x, 0.9), np.full_like(x, 0.6),
            np.full_like(x, 0.2),
            0.5 + 0.49 * np.sin(2 * np.pi * (x + 0.5 * y)),
        ],
        -1,
    )
    tex = (rgba * 255).astype(np.uint8)
    chain = build_mip_chain(tex)

    pos, nrm, uv, idx = _sphere_arrays()
    base = (1.0, 1.0, 1.0, 1.0)
    scene = Scene()
    tex_id = scene.textures.add_texture(chain)
    mat = scene.add_material(
        MaterialSettings(base_color_factor=base, metallic_factor=0.0,
                         roughness_factor=1.0, albedo_tex=tex_id,
                         blend_mode=BLEND_ALPHA_CLIPPED)
    )
    model = _add_mesh(scene, pos, nrm, uv, idx, mat,
                      blend_mode=BLEND_ALPHA_CLIPPED)
    uniforms = _camera([0.6, 0.5, 2.2], [0, 0, 0], width, height)
    env = EnvBindings(
        ambient_sh=tuple(SH.reshape(-1).tolist()),
        clear_color=(0.1, 0.12, 0.15),
    )
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(
        width=width, height=height, raster="ref", enable_clip=True
    )
    mine = np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]

    ref = gl.render(
        [
            dict(positions=pos, normals=nrm, uvs=uv, indices=idx,
                 base_color=base, metallic=0.0, roughness=1.0, unlit=False,
                 tex_chain=chain, clip=True, alpha_cutoff=0.5),
        ],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=SH,
        clear_color=_encoded_clear((0.1, 0.12, 0.15)),
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"alpha clip: PSNR {db:.1f} dB vs GL oracle"


def test_engine_skinning_matches_gl_oracle():
    """Joint-palette Similarity skinning (animated_vertex parity,
    lib.rs:64-127): the engine's fused gather/matmul skinning vs the same
    blend in a GL vertex shader, on a bent tube with a wave palette."""
    from superconductor_tpu.scene.scene import Model, Primitive, PrimitiveLod
    from superconductor_tpu.utils.procgen import (
        skinned_tube_mesh,
        wave_joint_palette,
    )

    width = height = 384
    gl = _gl_renderer(width, height)

    pos, nrm, uv, ji, jw, idx = skinned_tube_mesh(24, 24, 2.0, 0.25, 8)
    palette = wave_joint_palette(0.8, 8, amp=0.5)
    base = (0.8, 0.75, 0.7, 1.0)

    scene = Scene()
    mat = scene.add_material(
        MaterialSettings(base_color_factor=base, metallic_factor=0.0,
                         roughness_factor=1.0)
    )
    first, count, fv, vc = scene.insert_animated_mesh(
        pos, nrm, uv, ji, jw, idx, mat
    )
    prim = Primitive(
        material=mat, blend_mode=0, double_sided=True, animated=True,
        lods=[PrimitiveLod(first_index=first, index_count=count,
                           first_vertex=fv, vertex_count=vc)],
        bounding_sphere_radius=float(np.linalg.norm(pos, axis=1).max()) + 2.0,
        bbox_min=pos.min(0), bbox_max=pos.max(0),
    )
    model = Model(primitives=[prim], animated=True, num_joints=8)

    uniforms = _camera([1.2, 1.4, 3.4], [0, 0.9, 0], width, height)
    env = EnvBindings(
        ambient_sh=tuple(SH.reshape(-1).tolist()),
        clear_color=(0.1, 0.12, 0.15),
    )
    state = build_frame_state(
        scene, [(model, Similarity())], uniforms, joint_palettes={0: palette}
    )
    config = RenderConfig(
        width=width, height=height, raster="ref", t_cap_anim=1 << 12
    )
    mine = np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]

    ref = gl.render(
        [
            dict(positions=pos, normals=nrm, indices=idx, base_color=base,
                 metallic=0.0, roughness=1.0, unlit=False,
                 double_sided=True, joints=ji, weights=jw, palette=palette),
        ],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=SH,
        clear_color=_encoded_clear((0.1, 0.12, 0.15)),
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"skinning: PSNR {db:.1f} dB vs GL oracle"


def test_engine_skybox_matches_gl_oracle():
    """Cubemap sampling (skybox path): the engine's face-select + bilinear
    gathers vs GL's native samplerCube on the same 6 faces, same
    inverse-projection ray, ACES, and gamma."""
    from superconductor_tpu.utils.procgen import gradient_cubemap

    width = height = 320
    gl = _gl_renderer(width, height)

    scene = Scene()
    base = gradient_cubemap(scene, size=64)
    pool = scene.textures_hdr
    faces = []
    for f in range(6):
        entry = pool.tex_mip_base[base + f]
        off = pool.mip_offset[entry]
        w, h = pool.mip_w[entry], pool.mip_h[entry]
        faces.append(
            np.asarray(pool.texels.host[off:off + w * h]).reshape(h, w, 4)
        )

    uniforms = _camera([0.0, 0.0, 0.0], [0.4, 0.25, -1.0], width, height)
    env = EnvBindings(ibl_cubemap_base=base)
    state = build_frame_state(scene, [], uniforms)
    config = RenderConfig(width=width, height=height, raster="ref")
    mine = np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]

    proj_inv = np.linalg.inv(np.asarray(uniforms.projection[0], np.float64))
    view_inv = mat4_inverse(np.asarray(uniforms.view[0]))
    cam_quat = mat3_to_quat(view_inv[:3, :3])
    ref = gl.render_skybox(faces, proj_inv.astype(np.float32), cam_quat)

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"skybox: PSNR {db:.1f} dB vs GL samplerCube"


def test_engine_lightvol_matches_gl_oracle():
    """3D light-volume SH sampling (sample_2d_array_as_3d parity,
    lib.rs:185-250): the engine's stacked-2D-layer emulation with z-lerp
    vs GL's native sampler3D on the same four synthetic volumes."""
    from superconductor_tpu.scene.scene import WRAP_CLAMP

    width = height = 320
    gl = _gl_renderer(width, height)

    D = S = 8
    z, y, x = np.mgrid[0:D, 0:S, 0:S].astype(np.float32)
    z, y, x = z / (D - 1), y / (S - 1), x / (S - 1)

    def vol(r, g, b):
        a = np.ones_like(r)
        return np.stack([r, g, b, a], -1).astype(np.float32)

    # smooth spatially-varying L0 + L1 fields, encoded 0..1 like the assets
    v0 = vol(0.4 + 0.4 * x, 0.3 + 0.5 * y, 0.5 + 0.3 * z)
    enc = lambda c: (c * 0.5 + 0.5) * (127.0 / 255.0) * 2.0  # [-1,1] -> [0,1]ish
    vx = vol(enc(0.4 * np.sin(3 * x)), enc(0.3 * y - 0.1), enc(0.2 * z))
    vy = vol(enc(0.5 * np.cos(2 * y)), enc(0.35 * x), enc(0.1 + 0.2 * z))
    vz = vol(enc(0.2 * z - 0.1), enc(0.25 * np.sin(4 * z)), enc(0.3 * x))

    scene = Scene()
    ids = []
    for v in (v0, vx, vy, vz):
        ids.append(
            scene.textures_hdr.add_texture(list(v), wrap=WRAP_CLAMP)
        )

    pos, nrm, uv, idx = _sphere_arrays()
    base = (0.85, 0.8, 0.75, 1.0)
    mat = scene.add_material(
        MaterialSettings(base_color_factor=base, metallic_factor=0.0,
                         roughness_factor=0.7)
    )
    model = _add_mesh(scene, pos, nrm, uv, idx, mat)

    bl = np.array([-1.5, -1.5, -1.5], np.float32)
    extent = np.array([3.0, 3.0, 3.0], np.float32)
    uniforms = _camera([0.6, 0.5, 2.2], [0, 0, 0], width, height)
    uniforms.probes_bottom_left = bl
    uniforms.probes_scale = extent
    env = EnvBindings(
        lightvol_tex_ids=tuple(ids), lightvol_z_layers=D,
        clear_color=(0.1, 0.12, 0.15),
    )
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(width=width, height=height, raster="ref")
    mine = np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]

    ref = gl.render(
        [
            dict(positions=pos, normals=nrm, indices=idx, base_color=base,
                 metallic=0.0, roughness=0.7, unlit=False),
        ],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=np.zeros((4, 3), np.float32),
        clear_color=_encoded_clear((0.1, 0.12, 0.15)),
        lightvol=([v0, vx, vy, vz], bl, extent),
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"lightvol: PSNR {db:.1f} dB vs GL sampler3D"


def test_engine_lines_match_gl_oracle():
    """Line pipeline (flat_colour, shaders/src/lib.rs:712-732): the
    engine's screen-space line quads + palette colors + depth test against
    the opaque scene vs GL triangles built from an independent numpy
    expansion of the same segments."""
    width, height = 320, 240
    gl = _gl_renderer(width, height)

    # opaque unlit occluder: some lines pass behind it
    qpos = np.array(
        [[-0.7, -0.7, 0], [0.7, -0.7, 0], [0.7, 0.7, 0], [-0.7, 0.7, 0]],
        np.float32,
    )
    qnrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    quv = np.zeros((4, 2), np.float32)
    qidx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    scene = Scene()
    mat = scene.add_material(
        MaterialSettings(base_color_factor=(0.3, 0.5, 0.3, 1.0),
                         flags=MAT_UNLIT)
    )
    model = _add_mesh(scene, qpos, qnrm, quv, qidx, mat)

    uniforms = _camera([0.4, 0.3, 3.0], [0, 0, 0], width, height)

    segments = []
    colors = []
    rng = np.random.default_rng(7)
    for i in range(9):
        a = rng.uniform(-1.4, 1.4, 3).astype(np.float32)
        b = rng.uniform(-1.4, 1.4, 3).astype(np.float32)
        a[2] = rng.uniform(-1.2, 1.2)
        b[2] = rng.uniform(-1.2, 1.2)
        segments.append([a.tolist(), b.tolist()])
        colors.append(i + 4)

    from superconductor_tpu.render.draws import pack_lines

    line_w = 5.0
    state = build_frame_state(
        scene, [(model, Similarity())], uniforms,
        lines=pack_lines(segments, colors),
    )
    config = RenderConfig(
        width=width, height=height, raster="ref", enable_lines=True,
        line_width_px=line_w,
    )
    mine = np.asarray(
        render_frame(scene.device_arrays(), state, config, EnvBindings())
    )[0]

    # independent quad expansion (the line-pipeline spec: project, extrude
    # perpendicular by width/2 in screen space, screen-linear depth)
    from superconductor_tpu.ops.lines import DEBUG_COLOURS

    vp = np.asarray(uniforms.view_proj[0], np.float32)
    line_draws = []
    for seg, cid in zip(segments, colors):
        p = np.concatenate(
            [np.asarray(seg, np.float32), np.ones((2, 1), np.float32)], -1
        )
        clip = p @ vp.T
        w = clip[:, 3]
        assert (w > 1e-6).all()
        px = (clip[:, 0] / w + 1.0) * (width * 0.5)
        py = (1.0 - clip[:, 1] / w) * (height * 0.5)
        z = clip[:, 2] / w
        d = np.array([px[1] - px[0], py[1] - py[0]], np.float32)
        d /= max(np.linalg.norm(d), 1e-3)
        n = np.array([-d[1], d[0]], np.float32) * (line_w * 0.5)
        corners = np.array(
            [
                [px[0] - n[0], py[0] - n[1], z[0]],
                [px[0] + n[0], py[0] + n[1], z[0]],
                [px[1] + n[0], py[1] + n[1], z[1]],
                [px[1] - n[0], py[1] - n[1], z[1]],
            ],
            np.float32,
        )
        line_draws.append(
            {"corners": corners, "color": DEBUG_COLOURS[cid % 16]}
        )

    ref = gl.render(
        [
            dict(positions=qpos, normals=qnrm, indices=qidx,
                 base_color=(0.3, 0.5, 0.3, 1.0), unlit=True),
        ],
        view_proj=vp,
        eye=uniforms.eye[0],
        sh=np.zeros((4, 3), np.float32),
        clear_color=_encoded_clear((0, 0, 0)),
        lines=line_draws,
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"lines: PSNR {db:.1f} dB vs GL flat-color quads"


def _smooth_u8(rng, size, lo=0, hi=255):
    """Smooth random u8 field: low-res noise upsampled bilinearly."""
    small = rng.uniform(lo, hi, (8, 8, 4)).astype(np.float32)
    # bilinear upsample via repeat + box averaging passes
    img = small
    while img.shape[0] < size:
        h, w = img.shape[:2]
        up = np.zeros((h * 2, w * 2, 4), np.float32)
        up[0::2, 0::2] = img
        up[1::2, 0::2] = np.roll(img, -1, 0) * 0.5 + img * 0.5
        up[0::2, 1::2] = np.roll(img, -1, 1) * 0.5 + img * 0.5
        up[1::2, 1::2] = (
            img + np.roll(img, -1, 0) + np.roll(img, -1, 1)
            + np.roll(np.roll(img, -1, 0), -1, 1)
        ) * 0.25
        img = up
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def test_engine_particles_match_gl_oracle():
    """Particle pipeline (particle_vertex/fragment, shaders/src/
    lib.rs:817-972): the engine's k-buffer-sorted camera-facing smoke quads
    with the 6-way hemisphere lighting model + emissive LUT vs GL quads
    blended back-to-front with the same model in GLSL."""
    width, height = 320, 240
    gl = _gl_renderer(width, height)

    from superconductor_tpu.render.draws import pack_particles
    from superconductor_tpu.scene.scene import TEXFLAG_SRGB, WRAP_CLAMP

    rng = np.random.default_rng(11)
    smoke_a = _smooth_u8(rng, 64)
    smoke_b = _smooth_u8(rng, 64, lo=40, hi=255)
    lut = _smooth_u8(rng, 32)

    scene = Scene()
    a_id = scene.textures.add_texture([smoke_a], wrap=WRAP_CLAMP)
    b_id = scene.textures.add_texture([smoke_b], wrap=WRAP_CLAMP)
    lut_id = scene.textures.add_texture(
        [lut], wrap=WRAP_CLAMP, flags=TEXFLAG_SRGB
    )

    uniforms = _camera([0.3, 0.4, 4.0], [0, 0, 0], width, height)
    env = EnvBindings(
        smoke_tex_ids=(a_id, b_id, lut_id),
        ambient_sh=tuple(SH.reshape(-1).tolist()),
    )

    parts = [
        {"center": [-0.6, 0.1, -0.8], "scale": [1.6, 1.4],
         "colour": [0.9, 0.85, 0.95], "emissive_colour": [0.4, 0.25, 0.1]},
        {"center": [0.5, -0.2, 0.0], "scale": [1.8, 1.8],
         "colour": [0.8, 0.9, 1.0], "emissive_colour": [0.5, 0.4, 0.6],
         "use_emissive_lut": 1, "lut_y": 0.35},
        {"center": [0.0, 0.5, 0.9], "scale": [1.3, 1.7],
         "colour": [1.0, 0.95, 0.9], "emissive_colour": [0.0, 0.0, 0.0]},
    ]

    state = build_frame_state(
        scene, [], uniforms, particles=pack_particles(parts)
    )
    config = RenderConfig(
        width=width, height=height, raster="ref", enable_particles=True,
    )
    mine = np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]

    # independent quad expansion: view-space offset corners, world via the
    # inverse view; uv = (x + 0.5, 0.5 - y) (particle_vertex, lib.rs:838-855)
    view = np.asarray(uniforms.view[0], np.float32)
    view_inv = mat4_inverse(view)
    corner_x = np.array([-0.5, 0.5, 0.5, -0.5], np.float32)
    corner_y = np.array([-0.5, -0.5, 0.5, 0.5], np.float32)
    draws = []
    order = []
    for p in parts:
        c = np.asarray(p["center"] + [1.0], np.float32)
        vc = view @ c
        sx, sy = p["scale"]
        corners_v = np.stack(
            [
                vc[0] + sx * corner_x,
                vc[1] + sy * corner_y,
                np.full(4, vc[2], np.float32),
                np.ones(4, np.float32),
            ],
            axis=-1,
        )
        world = (corners_v @ view_inv.T)[:, :3]
        uvs = np.stack([corner_x + 0.5, 0.5 - corner_y], axis=-1)
        draws.append(
            {
                "corners": world, "uvs": uvs, "center": p["center"],
                "colour": p["colour"],
                "emissive_colour": p["emissive_colour"],
                "use_emissive_lut": p.get("use_emissive_lut", 0),
                "lut_y": p.get("lut_y", 0.0),
            }
        )
        order.append(vc[2])
    # back-to-front: most negative view z (farthest) first
    draws = [draws[i] for i in np.argsort(order)]

    ref = gl.render(
        [],
        view_proj=uniforms.view_proj[0],
        eye=uniforms.eye[0],
        sh=np.zeros((4, 3), np.float32),
        clear_color=_encoded_clear((0, 0, 0)),
        particles={
            "smoke": (smoke_a, smoke_b, lut),
            "draws": draws,
            "sh": SH,
            "cam_right": view_inv[:3, 0],
            "cam_down": -view_inv[:3, 1],
        },
    )

    db = psnr(mine[..., :3], ref[..., :3])
    assert db >= 35.0, f"particles: PSNR {db:.1f} dB vs GL 6-way smoke"
