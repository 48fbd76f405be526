"""Static-descriptor cubemap sampling == the descriptor-gather path.

The skybox base layer is full-screen, so its per-pixel descriptor
gathers (tex_meta + mip_owh) are pure overhead when the cubemap's pool
placement is a compile-time constant (EnvBindings.ibl_cubemap_static).
The static path must be bit-exact vs the dynamic one.
"""

import numpy as np
import jax.numpy as jnp

import superconductor_tpu as sc
from superconductor_tpu.ops.texture import hdr_pool, sample_cubemap
from superconductor_tpu.render.env import EnvBindings
from superconductor_tpu.utils.procgen import gradient_cubemap


def _rays(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d)


def test_from_scene_fills_static_placement():
    scene = sc.Scene()
    base = gradient_cubemap(scene, size=32)
    env = EnvBindings.from_scene(scene)
    assert env.ibl_cubemap_base == base
    offs, w, h = env.ibl_cubemap_static
    assert (w, h) == (32, 32)
    assert len(offs) == 6
    pool = scene.textures_hdr
    assert offs[0] == pool.mip_offset[pool.tex_mip_base[base]]


def test_static_path_bit_exact_vs_dynamic():
    scene = sc.Scene()
    base = gradient_cubemap(scene, size=32)
    env = EnvBindings.from_scene(scene)
    dev = scene.device_arrays()
    rays = _rays()
    dyn = sample_cubemap(hdr_pool(dev), dev["tex_hdr"], base, rays)
    stat = sample_cubemap(hdr_pool(dev), dev["tex_hdr"], base, rays,
                          static=env.ibl_cubemap_static)
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(stat))


def test_static_path_bit_exact_flat_pool():
    scene = sc.Scene()
    base = gradient_cubemap(scene, size=32)
    env = EnvBindings.from_scene(scene)
    scene.quad_pools = False
    dev = scene.device_arrays()
    rays = _rays(seed=1)
    dyn = sample_cubemap(hdr_pool(dev), dev["tex_hdr"], base, rays)
    stat = sample_cubemap(hdr_pool(dev), dev["tex_hdr"], base, rays,
                          static=env.ibl_cubemap_static)
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(stat))


def test_skybox_render_uses_static_and_matches():
    """Full render_frame with/without the static field is pixel-identical
    (the sky pass is the consumer)."""
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import add_pbr_sphere

    import dataclasses

    scene = sc.Scene()
    model = add_pbr_sphere(scene)
    gradient_cubemap(scene, size=32)
    cam = sc.Camera(position=np.array([0.0, 0.3, 2.4], np.float32))
    uni = sc.make_uniforms(cam, 128, 128)
    cfg = sc.RenderConfig(width=128, height=128, raster="ref")
    state = build_frame_state(scene, [(model, sc.Similarity())], uni)
    dev = scene.device_arrays()
    env = EnvBindings.from_scene(scene)
    assert env.ibl_cubemap_static is not None
    img_static = np.asarray(sc.render_frame(dev, state, cfg, env))
    env_dyn = dataclasses.replace(env, ibl_cubemap_static=None)
    img_dyn = np.asarray(sc.render_frame(dev, state, cfg, env_dyn))
    np.testing.assert_array_equal(img_static, img_dyn)
