import os

import numpy as np
import pytest

from superconductor_tpu.assets.ktx2 import decode_level_images, parse_ktx2

LIGHTING = "/root/reference/demo/web/assets/lighting/uncompressed"
SMOKE = "/root/reference/demo/web/assets/smoke"


def _read(path):
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    with open(path, "rb") as f:
        return f.read()


def test_parse_lightvol_f16():
    data = _read(f"{LIGHTING}/lightvol.ktx2")
    ktx = parse_ktx2(data)
    assert (ktx.width, ktx.height, ktx.depth) == (96, 48, 48)
    assert ktx.vk_format == 97  # RGBA16F
    images = decode_level_images(ktx, 0)
    assert len(images) == 48
    assert images[0].shape == (48, 96, 4)
    stack = np.stack(images)
    assert np.isfinite(stack).all()
    assert stack[..., :3].max() > 0.01  # actually contains light


def test_parse_lightvol_axis_rgba8():
    data = _read(f"{LIGHTING}/lightvol_x.ktx2")
    ktx = parse_ktx2(data)
    assert ktx.vk_format == 37  # RGBA8
    images = decode_level_images(ktx, 0)
    assert len(images) == 48
    assert 0.0 <= images[0].min() and images[0].max() <= 1.0


def test_load_lightvol_into_scene():
    from superconductor_tpu.assets.environment import load_lightvol
    from superconductor_tpu.scene.scene import Scene

    scene = Scene()
    lv = load_lightvol(
        scene,
        _read(f"{LIGHTING}/lightvol.ktx2"),
        _read(f"{LIGHTING}/lightvol_x.ktx2"),
        _read(f"{LIGHTING}/lightvol_y.ktx2"),
        _read(f"{LIGHTING}/lightvol_z.ktx2"),
        bottom_left=(-10, 0, -10),
        scale=(20, 10, 20),
    )
    assert lv["z_layers"] == 48
    assert len(lv["tex_ids"]) == 4
    # HDR pool contains all layers
    assert scene.textures_hdr.num_textures == 4


def test_lightvol_lit_render():
    """Render the PBR sphere lit by the real Sponza light volume."""
    from superconductor_tpu import (
        Camera,
        EnvBindings,
        RenderConfig,
        Scene,
        Similarity,
        make_uniforms,
        render_frame,
    )
    from superconductor_tpu.assets.environment import load_lightvol
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import add_pbr_sphere

    scene = Scene()
    model = add_pbr_sphere(scene, stacks=16, slices=16)
    load_lightvol(
        scene,
        _read(f"{LIGHTING}/lightvol.ktx2"),
        _read(f"{LIGHTING}/lightvol_x.ktx2"),
        _read(f"{LIGHTING}/lightvol_y.ktx2"),
        _read(f"{LIGHTING}/lightvol_z.ktx2"),
        bottom_left=(-12, -2, -6),
        scale=(24, 12, 12),
    )
    env = EnvBindings.from_scene(scene)
    assert env.lightvol_tex_ids is not None

    camera = Camera(position=np.array([0, 0, 3.0], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    # place the probes box around the origin
    uniforms.probes_bottom_left = np.array([-12, -2, -6], np.float32)
    uniforms.probes_scale = np.array([24, 12, 12], np.float32)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(width=64, height=64, t_cap=1024, t_cap_anim=8, raster="ref")
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
    center = img[32, 32, :3]
    assert center.sum() > 30  # sphere is lit by the volume


def test_ibl_cubemap_end_to_end():
    """noon.ktx2 (BC6H) -> skybox render: the sky gradient must appear."""
    from superconductor_tpu import (
        Camera,
        EnvBindings,
        RenderConfig,
        Scene,
        make_uniforms,
        render_frame,
    )
    from superconductor_tpu.assets.environment import load_ibl_cubemap
    from superconductor_tpu.render.draws import build_frame_state

    data = _read("/root/reference/demo/web/assets/cubemaps/noon.ktx2")
    scene = Scene()
    base = load_ibl_cubemap(scene, data)
    env = EnvBindings.from_scene(scene)
    assert env.ibl_cubemap_base == base

    camera = Camera(position=np.zeros(3, np.float32))
    uniforms = make_uniforms(camera, 96, 64)
    state = build_frame_state(scene, [], uniforms)
    config = RenderConfig(width=96, height=64, t_cap=8, t_cap_anim=8, raster="ref")
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
    # A sky cubemap: top of frame bluish-bright, overall non-trivial variance
    top = img[:8, :, :3].astype(int)
    assert top.mean() > 60
    assert img[..., :3].std() > 5


def test_astc_lightvol_matches_uncompressed():
    """ASTC 4x4 decode (Mesa GL path) vs the uncompressed ground truth."""
    path = "/root/reference/demo/web/assets/lighting/astc/lightvol_x.ktx2"
    import os

    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    try:
        astc = np.stack(
            decode_level_images(parse_ktx2(_read(path)), 0)
        )[..., :3]
    except Exception:
        pytest.skip("GL ASTC decode unavailable")
    un = np.stack(
        decode_level_images(
            parse_ktx2(_read(f"{LIGHTING}/lightvol_x.ktx2")), 0
        )
    )[..., :3]
    corr = np.corrcoef(astc.ravel(), un.ravel())[0, 1]
    assert corr > 0.99


def test_lightvol_sh_packed_matches_layered():
    """The SH-interleaved lightvol path (Scene.device_lightvol_sh +
    sample_lightvol_sh: 2 gathers, static addressing) must reproduce the
    four-volume layered sampling path exactly — same texels, same lerp
    order (ops/shade.py sample_spherical_harmonics picks the packed path
    whenever the scene publishes "lv_sh")."""
    import jax.numpy as jnp

    from superconductor_tpu.assets.environment import load_lightvol
    from superconductor_tpu.ops.shade import GBuffer, sample_spherical_harmonics
    from superconductor_tpu.render.env import EnvBindings
    from superconductor_tpu.scene.scene import Scene

    scene = Scene()
    load_lightvol(
        scene,
        _read(f"{LIGHTING}/lightvol.ktx2"),
        _read(f"{LIGHTING}/lightvol_x.ktx2"),
        _read(f"{LIGHTING}/lightvol_y.ktx2"),
        _read(f"{LIGHTING}/lightvol_z.ktx2"),
    )
    env = EnvBindings.from_scene(scene)
    assert env.lightvol_wh is not None
    d = scene.device_arrays()
    assert "lv_sh" in d
    assert d["lv_sh"].shape == (96 * 48 * 48, 48)
    d_layered = {k: v for k, v in d.items() if k != "lv_sh"}

    rng = np.random.default_rng(7)
    # points inside, at the edges of, and outside the probe box (clamp)
    pts = rng.uniform(-0.3, 1.3, size=(512, 3)).astype(np.float32)
    uniforms = {
        "probes_bottom_left": jnp.zeros((3,), jnp.float32),
        "probes_scale": jnp.ones((3,), jnp.float32),
    }
    gbuf = GBuffer(
        valid=None, world_pos=jnp.asarray(pts), normal=None, uv=None,
        lm_uv=jnp.zeros((512, 2), jnp.float32), material=None,
        front_facing=None, lightmapped=jnp.zeros((512,), bool),
        dpdx=None, dpdy=None, duvdx=None, duvdy=None,
    )
    sh_packed = np.asarray(
        sample_spherical_harmonics(gbuf, d, uniforms, env)
    )
    sh_layered = np.asarray(
        sample_spherical_harmonics(gbuf, d_layered, uniforms, env)
    )
    assert sh_packed.shape == (512, 4, 3)
    np.testing.assert_allclose(sh_packed, sh_layered, rtol=0, atol=2e-6)
