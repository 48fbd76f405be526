"""Interleaved material pool (Scene.device_matq): plan capability rules
and sampling parity vs the classic per-slot path.

The deferred shade's four material samples share uv, footprint, and —
when the textures have equal dims — mip level; device_matq interleaves
their quad footprints into one (N, 64) u8 pool so the four trilinear
samples cost TWO gathers instead of eight (docs/KERNELS.md: the stage
is gather-row-bound). Parity target: identical math to four
sample_anisotropic calls; exact for real-texture slots, and within
float associativity for constant (1x1 dummy) slots, whose classic path
lerps on a 1x1 grid while matq lerps equal values on the shared grid.
"""

import numpy as np
import jax.numpy as jnp

import superconductor_tpu as sc
from superconductor_tpu.ops.shade import _material_rows, _material_rows_mq
from superconductor_tpu.ops.texture import (
    ldr_pool,
    sample_anisotropic,
    sample_material_interleaved,
)
from superconductor_tpu.scene.scene import (
    MaterialSettings,
    TEXFLAG_SRGB,
    WRAP_CLAMP,
    build_mip_chain,
)


def _add_tex(scene, size, seed, flags=0, wrap=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (size, size, 4), np.uint8)
    return scene.textures.add_texture(build_mip_chain(img), wrap=wrap,
                                      flags=flags)


def _full_material_scene(size=64, wrap=0):
    scene = sc.Scene()
    a = _add_tex(scene, size, 1, flags=TEXFLAG_SRGB, wrap=wrap)
    n = _add_tex(scene, size, 2, wrap=wrap)
    mr = _add_tex(scene, size, 3, wrap=wrap)
    e = _add_tex(scene, size, 4, flags=TEXFLAG_SRGB, wrap=wrap)
    scene.add_material(MaterialSettings(
        albedo_tex=a, normal_tex=n, metallic_roughness_tex=mr,
        emissive_tex=e,
    ))
    return scene


def test_plan_equal_dims_capable():
    scene = _full_material_scene()
    plan = scene.matq_plan()
    assert plan is not None
    assert plan["total_rows"] == sum(
        (64 >> l) * (64 >> l) for l in range(7)
    )
    assert plan["srgb_masks"] == [0b1001]  # albedo + emissive sRGB


def test_plan_mixed_dims_incapable():
    scene = sc.Scene()
    a = _add_tex(scene, 64, 1)
    n = _add_tex(scene, 32, 2)
    scene.add_material(MaterialSettings(albedo_tex=a, normal_tex=n))
    assert scene.matq_plan() is None


def test_plan_mixed_wrap_incapable():
    scene = sc.Scene()
    a = _add_tex(scene, 64, 1, wrap=0)
    n = _add_tex(scene, 64, 2, wrap=WRAP_CLAMP)
    scene.add_material(MaterialSettings(albedo_tex=a, normal_tex=n))
    assert scene.matq_plan() is None


def test_plan_dummy_slots_are_constant():
    scene = sc.Scene()
    a = _add_tex(scene, 64, 1, flags=TEXFLAG_SRGB)
    scene.add_material(MaterialSettings(albedo_tex=a))  # rest are dummies
    plan = scene.matq_plan()
    assert plan is not None and plan["L"] == 7


def test_plan_dedups_shared_chains():
    scene = _full_material_scene()
    m0 = scene.materials[0]
    scene.add_material(m0)  # identical slot tuple
    plan = scene.matq_plan()
    assert len(plan["chains"]) == 1 and plan["mat_chain"] == [0, 0]


def test_withheld_while_streaming():
    scene = _full_material_scene()
    assert scene.device_matq() is not None
    tid = scene.materials[0].albedo_tex
    count = scene.textures.tex_mip_count[tid]
    scene.textures.set_mip_view(tid, count - 1, 1)
    assert scene.device_matq() is None
    scene.textures.restore_mip_view(tid)
    assert scene.device_matq() is not None
    assert "texels_mq" in scene.device_arrays()


def _sample_both(scene, P=4096, taps=1, seed=9, dscale=0.2):
    dev = scene.device_arrays()
    assert "texels_mq" in dev
    m = dev["materials"]
    rng = np.random.default_rng(seed)
    n_mats = len(scene.materials)
    mat = jnp.asarray(rng.integers(0, n_mats, (P,), np.int32))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (P, 2)).astype(np.float32))
    duvdx = jnp.asarray(
        rng.uniform(-dscale, dscale, (P, 2)).astype(np.float32)
    )
    duvdy = jnp.asarray(
        rng.uniform(-dscale, dscale, (P, 2)).astype(np.float32)
    )

    pf, pi, mq_meta, mq_owh = _material_rows_mq(m, mat)
    got16 = sample_material_interleaved(
        dev["texels_mq"], mq_meta, mq_owh, uv, duvdx, duvdy, taps
    )

    pfc, pic, mtm, mlv = _material_rows(m, mat)
    np.testing.assert_array_equal(np.asarray(pf), np.asarray(pfc))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(pic))
    texels = ldr_pool(dev)
    want = []
    for slot in range(4):
        meta = mtm[..., 6 * slot : 6 * slot + 6]
        lv = mlv[..., slot, :, :]
        want.append(sample_anisotropic(
            texels, dev["tex"], pic[..., slot], uv, duvdx, duvdy, taps,
            meta=meta, levels_owh=lv,
        ))
    return np.asarray(got16), [np.asarray(w) for w in want]


def test_sampling_exact_vs_classic_real_slots():
    # default = two-gather 64 B rows (the wide mq3 rows measured slower
    # in the fused frame — scene.py matq3x3 docstring)
    scene = _full_material_scene(size=64)
    assert scene.device_arrays()["texels_mq"].shape[-1] == 64
    got16, want = _sample_both(scene)
    for slot in range(4):
        np.testing.assert_array_equal(
            got16[:, 4 * slot : 4 * slot + 4], want[slot],
            err_msg=f"slot {slot}",
        )


def test_sampling_exact_wide_rows():
    # matq3x3: single-gather trilinear from 208 B rows, same values
    scene = _full_material_scene(size=64)
    scene.matq3x3 = True
    assert scene.device_arrays()["texels_mq"].shape[-1] == 208
    got16, want = _sample_both(scene)
    for slot in range(4):
        np.testing.assert_array_equal(
            got16[:, 4 * slot : 4 * slot + 4], want[slot],
            err_msg=f"slot {slot}",
        )


def test_sampling_exact_clamp_wrap_and_taps():
    for mq3 in (True, False):
        scene = _full_material_scene(size=32, wrap=WRAP_CLAMP)
        scene.matq3x3 = mq3
        for taps in (1, 4):
            got16, want = _sample_both(scene, taps=taps, seed=11)
            for slot in range(4):
                np.testing.assert_array_equal(
                    got16[:, 4 * slot : 4 * slot + 4], want[slot],
                    err_msg=f"mq3 {mq3} taps {taps} slot {slot}",
                )


def test_sampling_exact_chain_end_self_pair():
    """Huge derivatives push lod past the chain end: the level-b tap
    self-pairs with the last level (baked same-grid 3x3) — exact for
    both wrap modes and both row widths."""
    for wrap in (0, WRAP_CLAMP):
        for mq3 in (True, False):
            scene = _full_material_scene(size=32, wrap=wrap)
            scene.matq3x3 = mq3
            got16, want = _sample_both(scene, seed=13, dscale=4.0)
            for slot in range(4):
                np.testing.assert_array_equal(
                    got16[:, 4 * slot : 4 * slot + 4], want[slot],
                    err_msg=f"wrap {wrap} mq3 {mq3} slot {slot}",
                )


def test_sampling_constant_slots_close():
    """Dummy (1x1) slots: classic lerps on the dummy's own 1x1 grid,
    matq lerps the broadcast constant on the shared grid — equal up to
    float associativity of the lerp weights."""
    scene = sc.Scene()
    a = _add_tex(scene, 64, 1, flags=TEXFLAG_SRGB)
    scene.add_material(MaterialSettings(albedo_tex=a))
    got16, want = _sample_both(scene, seed=12)
    np.testing.assert_array_equal(got16[:, 0:4], want[0])
    for slot in range(1, 4):
        np.testing.assert_allclose(
            got16[:, 4 * slot : 4 * slot + 4], want[slot],
            rtol=0, atol=1e-6, err_msg=f"slot {slot}",
        )


def test_full_frame_image_parity():
    """End-to-end: the same scene rendered with and without the matq
    pool produces the same image (constant dummy slots may differ by
    lerp associativity, everything else exact)."""
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import add_pbr_sphere

    scene = sc.Scene()
    tex = {
        "albedo": _add_tex(scene, 64, 21, flags=TEXFLAG_SRGB),
        "normal": _add_tex(scene, 64, 22),
        "mr": _add_tex(scene, 64, 23),
        "emissive": _add_tex(scene, 64, 24, flags=TEXFLAG_SRGB),
    }
    model = add_pbr_sphere(scene, name="s")
    ms = scene.materials[model.primitives[0].material]
    ms.albedo_tex = tex["albedo"]
    ms.normal_tex = tex["normal"]
    ms.metallic_roughness_tex = tex["mr"]
    ms.emissive_tex = tex["emissive"]
    scene._materials_dirty = True

    cam = sc.Camera(position=np.array([0.0, 0.3, 2.4], np.float32))
    uni = sc.make_uniforms(cam, 96, 64)
    cfg = sc.RenderConfig(width=96, height=64, raster="ref")
    state = build_frame_state(scene, [(model, sc.Similarity())], uni)

    dev = scene.device_arrays()
    assert "texels_mq" in dev
    img_mq = np.asarray(sc.render_frame(dev, state, cfg, sc.EnvBindings()))

    scene.matq_pools = False
    scene._matq_cache = None
    dev2 = scene.device_arrays()
    assert "texels_mq" not in dev2
    img_classic = np.asarray(
        sc.render_frame(dev2, state, cfg, sc.EnvBindings())
    )
    np.testing.assert_allclose(img_mq, img_classic, rtol=0, atol=2e-6)


def test_budget_drops_mq3_then_matq():
    scene = _full_material_scene(size=64)
    scene.matq3x3 = True
    wide = scene.matq_bytes()
    scene.matq3x3 = False
    narrow = scene.matq_bytes()
    scene.matq3x3 = True
    plan = scene.matq_plan()
    # mq3 carries both levels in its wide rows (no tail pool); the 64B
    # layout adds the levels>=1 tail pool for the second trilinear gather
    assert wide == plan["total_rows"] * 208 > 0
    assert narrow == (plan["total_rows"] + plan["tail_total"]) * 64 > 0
    base = scene.projected_texture_bytes()
    # budget that fits after the mq3->64B rung alone
    scene.texture_budget_bytes = base - (wide - narrow) // 2
    scene.enforce_texture_budget()
    assert scene._budget_state["mq3_dropped"]
    assert not scene._budget_state["matq_dropped"]
    assert scene.matq_bytes() == narrow
    # tighter: the matq rung fires too
    scene.texture_budget_bytes = base - wide - 1
    scene.enforce_texture_budget()
    assert scene._budget_state["matq_dropped"]
    assert scene.matq_bytes() == 0
    report = scene.texture_memory_report()
    assert report["matq_pool_bytes"] == 0


def test_matq_tail_pool_bit_exact():
    """The second trilinear gather from the dedicated levels>=1 tail pool
    (Scene.device_matq texels_mq_tail) is BIT-exact vs gathering both
    levels from the main pool — the tail rows are built from the same
    quad pool with identical per-texel indices, only rebased offsets."""
    scene = _full_material_scene(size=64)
    dev = scene.device_arrays()
    assert "texels_mq_tail" in dev
    assert dev["texels_mq_tail"].shape[0] < dev["texels_mq"].shape[0]
    m = dev["materials"]
    rng = np.random.default_rng(3)
    P = 4096
    mat = jnp.asarray(rng.integers(0, len(scene.materials), (P,), np.int32))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (P, 2)).astype(np.float32))
    # derivative spread covering magnification through deep minification,
    # so the second level crosses every chain level incl. the clamp
    duv = rng.uniform(-0.4, 0.4, (P, 2, 2)).astype(np.float32)
    duv[: P // 4] *= 0.01
    duvdx, duvdy = jnp.asarray(duv[:, 0]), jnp.asarray(duv[:, 1])
    pf, pi, meta, owh = _material_rows_mq(m, mat)
    with_tail = sample_material_interleaved(
        dev["texels_mq"], meta, owh, uv, duvdx, duvdy, 1,
        texels_tail=dev["texels_mq_tail"],
    )
    without = sample_material_interleaved(
        dev["texels_mq"], meta, owh, uv, duvdx, duvdy, 1,
    )
    np.testing.assert_array_equal(np.asarray(with_tail), np.asarray(without))


def _partial_scene(size=64):
    """Two materials: 0 capable (uniform dims), 1 incapable (mixed dims)."""
    scene = sc.Scene()
    a = _add_tex(scene, size, 1, flags=TEXFLAG_SRGB)
    n = _add_tex(scene, size, 2)
    scene.add_material(MaterialSettings(albedo_tex=a, normal_tex=n))
    a2 = _add_tex(scene, size, 5, flags=TEXFLAG_SRGB)
    n2 = _add_tex(scene, size // 2, 6)  # mixed dims -> incapable
    scene.add_material(MaterialSettings(albedo_tex=a2, normal_tex=n2))
    return scene


def test_partial_plan_keeps_capable_materials():
    scene = _partial_scene()
    plan = scene.matq_plan()
    assert plan is not None and plan["partial"]
    assert plan["mat_capable"] == [True, False]
    assert plan["mat_chain"][1] == -1
    dev = scene.device_arrays()
    assert "texels_mq" in dev and "matq_capable" in dev
    assert list(np.asarray(dev["matq_capable"])) == [True, False]


def test_partition_material_sample_matches_per_path():
    """Partitioned sampling routes each lane to its material's path:
    incapable lanes are BIT-exact vs the classic sampler; capable lanes
    match it within the matq-vs-classic tolerance. The spill stat
    reports the incapable-lane count."""
    from types import SimpleNamespace

    from superconductor_tpu.render.frame import (
        RenderConfig,
        _partition_material_sample,
    )

    scene = _partial_scene()
    dev = scene.device_arrays()
    m = dev["materials"]
    rng = np.random.default_rng(11)
    P = 2048
    mat = jnp.asarray(rng.integers(0, 2, (P,), np.int32))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (P, 2)).astype(np.float32))
    duvdx = jnp.asarray(rng.uniform(-0.2, 0.2, (P, 2)).astype(np.float32))
    duvdy = jnp.asarray(rng.uniform(-0.2, 0.2, (P, 2)).astype(np.float32))
    g = SimpleNamespace(uv=uv, duvdx=duvdx, duvdy=duvdy, material=mat,
                        valid=jnp.ones((P,), bool))
    n_inc = int((np.asarray(mat) == 1).sum())
    cfg = RenderConfig(matq_classic_cap=n_inc + 64)
    s16, needed = _partition_material_sample(g, dev, cfg, 1)
    assert int(needed) == n_inc

    # classic reference for every lane
    pfc, pic, mtm, mlv = _material_rows(m, mat)
    texels = ldr_pool(dev)
    want = []
    for slot in range(4):
        meta = mtm[..., 6 * slot:6 * slot + 6]
        lv = mlv[..., slot, :, :]
        want.append(sample_anisotropic(
            texels, dev["tex"], pic[..., slot], uv, duvdx, duvdy, 1,
            meta=meta, levels_owh=lv,
        ))
    want = np.concatenate([np.asarray(w) for w in want], axis=-1)
    got = np.asarray(s16)
    incapable = np.asarray(mat) == 1
    np.testing.assert_array_equal(got[incapable], want[incapable])
    np.testing.assert_allclose(got[~incapable], want[~incapable],
                               rtol=0, atol=2e-6)


def test_partition_spill_reports_need():
    """A classic segment smaller than the incapable-lane count still
    reports the true need (the host's grow signal)."""
    from types import SimpleNamespace

    from superconductor_tpu.render.frame import (
        RenderConfig,
        _partition_material_sample,
    )

    scene = _partial_scene()
    dev = scene.device_arrays()
    rng = np.random.default_rng(12)
    P = 512
    mat = jnp.asarray(rng.integers(0, 2, (P,), np.int32))
    g = SimpleNamespace(
        uv=jnp.asarray(rng.uniform(0, 1, (P, 2)).astype(np.float32)),
        duvdx=jnp.zeros((P, 2), jnp.float32),
        duvdy=jnp.zeros((P, 2), jnp.float32),
        material=mat, valid=jnp.ones((P,), bool),
    )
    n_inc = int((np.asarray(mat) == 1).sum())
    cfg = RenderConfig(matq_classic_cap=max(1, n_inc // 4))
    _s16, needed = _partition_material_sample(g, dev, cfg, 1)
    assert int(needed) == n_inc > cfg.matq_classic_cap


def test_partial_scene_partitioned_render_matches_classic():
    """Full-frame parity on a partial-pool scene: partitioned sampling
    (matq_classic_cap set) vs the all-classic fallback (cap None) differ
    only by the matq-vs-classic math path on capable lanes — within one
    u8 step after display encoding. Stats report the incapable count on
    both paths."""
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.render.frame import (
        RenderConfig,
        render_frame_stats,
        stats_to_host,
    )
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
    )
    from superconductor_tpu.math3d import Similarity

    scene = sc.Scene()
    m_cap = add_pbr_sphere(scene, stacks=12, slices=12, name="cap")
    m_inc = add_pbr_sphere(scene, stacks=12, slices=12, name="inc")
    # make the second sphere's material incapable: half-size normal map
    # (materials were appended in order: 0 = cap's, 1 = inc's)
    small_n = _add_tex(scene, 128, 7)
    scene.materials[1] = MaterialSettings(
        albedo_tex=scene.materials[1].albedo_tex, normal_tex=small_n,
        metallic_roughness_tex=scene.materials[1].metallic_roughness_tex,
    )
    plan = scene.matq_plan()
    assert plan is not None and plan["partial"]

    cam = sc.Camera(position=np.array([0.0, 0.2, 3.2], np.float32))
    uni = sc.make_uniforms(cam, 192, 96)
    state = build_frame_state(
        scene,
        [(m_cap, Similarity(translation=np.array([-0.8, 0, 0], np.float32))),
         (m_inc, Similarity(translation=np.array([0.8, 0, 0], np.float32)))],
        uni,
    )
    env = sc.EnvBindings(ambient_sh=default_ambient_sh(),
                         clear_color=(0.1, 0.1, 0.3))
    dev = scene.device_arrays()
    assert "matq_capable" in dev
    base = dict(width=192, height=96, t_cap=2048, t_cap_anim=8, raster="ref",
                opaque_px_cap=16384)

    img_classic, st_c = render_frame_stats(
        dev, state, RenderConfig(**base), env
    )
    st_c = stats_to_host(st_c)
    need = st_c["matq_classic_needed"]
    assert need > 0

    img_part, st_p = render_frame_stats(
        dev, state, RenderConfig(matq_classic_cap=need + 128, **base), env
    )
    st_p = stats_to_host(st_p)
    assert st_p["matq_classic_needed"] == need
    a = np.asarray(img_classic).astype(np.int32)
    b = np.asarray(img_part).astype(np.int32)
    assert np.abs(a - b).max() <= 1


def test_partial_scene_partition_covers_clip_and_blend():
    """The partition also backs the clip resolve (albedo-only) and the
    blend-layer shades: partitioned vs all-classic frames agree within
    one u8 step on a partial-pool scene with clipped + blended spheres."""
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.render.frame import (
        RenderConfig,
        render_frame_stats,
        stats_to_host,
    )
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
    )
    from superconductor_tpu.math3d import Similarity
    from superconductor_tpu.scene.scene import (
        BLEND_ALPHA_BLENDED,
        BLEND_ALPHA_CLIPPED,
    )

    scene = sc.Scene()
    m_clip = add_pbr_sphere(scene, stacks=12, slices=12, name="clip")
    m_blend = add_pbr_sphere(scene, stacks=12, slices=12, name="blend")
    m_bg = add_pbr_sphere(scene, stacks=12, slices=12, name="bg")
    # material 0: clipped + INCAPABLE (half-size normal map)
    small_n = _add_tex(scene, 128, 7)
    m0 = scene.materials[0]
    scene.materials[0] = MaterialSettings(
        albedo_tex=m0.albedo_tex, normal_tex=small_n,
        metallic_roughness_tex=m0.metallic_roughness_tex,
        blend_mode=BLEND_ALPHA_CLIPPED, alpha_cutoff=0.4,
    )
    # material 1: blended + capable
    m1 = scene.materials[1]
    scene.materials[1] = MaterialSettings(
        albedo_tex=m1.albedo_tex, normal_tex=m1.normal_tex,
        metallic_roughness_tex=m1.metallic_roughness_tex,
        blend_mode=BLEND_ALPHA_BLENDED, base_color_factor=(1, 1, 1, 0.6),
    )
    plan = scene.matq_plan()
    assert plan is not None and plan["partial"]

    cam = sc.Camera(position=np.array([0.0, 0.2, 3.4], np.float32))
    uni = sc.make_uniforms(cam, 192, 96)
    state = build_frame_state(
        scene,
        [(m_bg, Similarity(translation=np.array([0, 0, -1.5], np.float32))),
         (m_clip, Similarity(translation=np.array([-0.6, 0, 0], np.float32))),
         (m_blend, Similarity(translation=np.array([0.6, 0, 0], np.float32)))],
        uni,
    )
    env = sc.EnvBindings(ambient_sh=default_ambient_sh(),
                         clear_color=(0.1, 0.1, 0.3))
    dev = scene.device_arrays()
    base = dict(width=192, height=96, t_cap=2048, t_cap_anim=8, raster="ref",
                opaque_px_cap=16384, enable_clip=True, enable_blend=True,
                shade_px_cap=16384)

    img_classic, st_c = render_frame_stats(
        dev, state, RenderConfig(**base), env
    )
    st_c = stats_to_host(st_c)
    need = st_c["matq_classic_needed"]
    assert need > 0  # the clipped incapable sphere is visible

    img_part, st_p = render_frame_stats(
        dev, state, RenderConfig(matq_classic_cap=need + 128, **base), env
    )
    a = np.asarray(img_classic).astype(np.int32)
    b = np.asarray(img_part).astype(np.int32)
    assert np.abs(a - b).max() <= 1
