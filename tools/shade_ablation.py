#!/usr/bin/env python3
"""Ablate shade-stage components of the headline frame (TPU).

Times the FULL frame with individual shading components stubbed out
(monkeypatched to constants before jit), so each component's cost falls
out as a difference from the unmodified frame:

    sky       = t(full) - t(ibl_cubemap_base = -1)   (clear-color sky)
    mat taps  = t(full) - t(sample_anisotropic -> ones)
    sh        = t(full) - t(sample_spherical_harmonics -> const)

Attribution-grade (stubs change fusion), same caveat as stage_costs.py.
Methodology: k=1 absolute with readback barrier minus RTT (docs/TIMING.md).

Usage: python tools/shade_ablation.py [--size 1920x1080] [--calls 4]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--fine", action="store_true",
                    help="finer in-shade component stubs only")
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import superconductor_tpu as sc
    import bench as B
    from superconductor_tpu.ops import shade as shade_mod
    from superconductor_tpu.render import frame as frame_mod

    dev, build, config, env = B.headline_scene(sc, width, height)
    state0 = build(0.0)
    config = B.fit_caps(dev, state0, config, env)
    rtt = None

    def timed(env_now, label):
        nonlocal rtt
        fn = B.make_unrolled(dev, state0, config, env_now, 1)
        t0 = time.perf_counter()
        img = fn()
        B._sync(img)  # compile + first run
        compile_s = time.perf_counter() - t0
        if rtt is None:
            rtt = B._probe_rtt(img)
            print(json.dumps({"rtt_ms": round(rtt, 1)}), flush=True)
        ts = []
        for _ in range(args.calls):
            t0 = time.perf_counter()
            B._sync(fn())
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        ms = ts[len(ts) // 2] - rtt
        print(
            json.dumps(
                {"variant": label, "ms": round(ms, 1),
                 "min_ms": round(ts[0] - rtt, 1),
                 "compile_s": round(compile_s, 1)}
            ),
            flush=True,
        )
        return ms

    full = timed(env, "full")

    if args.fine:
        # Finer stubs inside shade(): each isolates one component of the
        # non-tap shading cost (the coarse pass measured ~19 ms beyond
        # the material taps on the r5 headline).
        from superconductor_tpu.ops import texture as tex_mod

        def sub(label, module, name, repl):
            orig = getattr(module, name)
            setattr(module, name, repl)
            try:
                return timed(env, label)
            finally:
                setattr(module, name, orig)

        sub("sh_eval=const", shade_mod, "eval_sh_nonlinear",
            lambda sh, normal: jnp.ones_like(sh[:, 0, :]) * 0.5)
        sub("specular=0", shade_mod, "sh_specular_approximation",
            lambda sh, n, v, r, f0, f90: jnp.zeros_like(n))
        sub("cotangent=geo", shade_mod, "compute_cotangent_frame_normal",
            lambda geo_n, m, dpdx, dpdy, duvdx, duvdy: geo_n)
        sub("srgb_decode=linear", tex_mod, "_matq_srgb",
            lambda out16, mask: out16)
        # shade.py binds these by name at import: patch ITS references.
        sub("aces=identity", shade_mod, "aces_filmic", lambda x: x)
        sub("srgb_enc=identity", shade_mod, "linear_to_srgb_approx",
            lambda x: x)
        orig_gb = frame_mod.interpolate_gbuffer

        def zero_deriv_gbuf(pair, px, py, tri, attrs, shade_row=None):
            g = orig_gb(pair, px, py, tri, attrs, shade_row=shade_row)
            z3 = jnp.zeros_like(g.dpdx)
            z2 = jnp.full_like(g.duvdx, 1e-3)
            return g._replace(dpdx=z3, dpdy=z3, duvdx=z2, duvdy=z2)

        # frame.py binds interpolate_gbuffer by name: patch ITS reference.
        sub("gbuf_derivs=const", frame_mod, "interpolate_gbuffer",
            zero_deriv_gbuf)
        return

    orig_aniso = shade_mod.sample_anisotropic
    orig_mq = shade_mod.sample_material_interleaved

    def const_aniso(texels, tex_desc, tex_id, uv, duvdx, duvdy, taps,
                    decode_srgb=True, meta=None, levels_owh=None):
        return jnp.ones(uv.shape[:-1] + (4,), jnp.float32)

    def const_mq(texels_mq, meta, owh, uv, duvdx, duvdy, taps,
                 decode_srgb=True):
        return jnp.ones(uv.shape[:-1] + (16,), jnp.float32)

    shade_mod.sample_anisotropic = const_aniso
    shade_mod.sample_material_interleaved = const_mq
    try:
        no_taps = timed(env, "mat_taps=const")
    finally:
        shade_mod.sample_anisotropic = orig_aniso
        shade_mod.sample_material_interleaved = orig_mq

    orig_sh = shade_mod.sample_spherical_harmonics

    def const_sh(gbuf, scene, uniforms, env2):
        p = gbuf.world_pos.shape[0]
        return jnp.broadcast_to(
            jnp.asarray([[0.5, 0.5, 0.5], [0.1, 0.0, 0.0],
                         [0.0, 0.1, 0.0], [0.0, 0.0, 0.1]], jnp.float32),
            (p, 4, 3),
        )

    shade_mod.sample_spherical_harmonics = const_sh
    try:
        no_sh = timed(env, "sh=const")
    finally:
        shade_mod.sample_spherical_harmonics = orig_sh

    # opaque-only config: cost of the (empty here) clip/blend/lines/
    # particle passes
    opq = dataclasses.replace(
        config, enable_clip=False, enable_blend=False,
        enable_lines=False, enable_particles=False,
    )
    fn = B.make_unrolled(dev, state0, opq, env, 1)
    t0 = time.perf_counter()
    B._sync(fn())
    cs = time.perf_counter() - t0
    ts = []
    for _ in range(args.calls):
        t0 = time.perf_counter()
        B._sync(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    opaque_only = ts[len(ts) // 2] - rtt
    print(json.dumps({"variant": "opaque_only_config", "ms": round(opaque_only, 1),
                      "min_ms": round(ts[0] - rtt, 1), "compile_s": round(cs, 1)}),
          flush=True)

    # shade -> constant: removes ALL material/lighting work, keeps
    # gbuffer interpolation + scatter + sky + tonemap
    orig_shade = frame_mod.shade

    def const_shade(gbuf, scene, uniforms, view_index, env=None,
                    inline_tonemapping=True, inline_srgb=True, aniso_taps=1):
        p = gbuf.material.shape[0]
        rgb = jnp.broadcast_to(jnp.asarray([0.5, 0.4, 0.3], jnp.float32), (p, 3))
        return rgb, jnp.ones((p,), jnp.float32)

    frame_mod.shade = const_shade
    try:
        no_shade = timed(env, "shade=const")
    finally:
        frame_mod.shade = orig_shade

    # ... and ALSO gbuffer interpolation -> constants: leaves raster +
    # sky + scatter + tonemap
    orig_gb = frame_mod.interpolate_gbuffer

    def const_gbuf(pair, px, py, merged_tri, merged_attrs, shade_row=None):
        p = pair.reshape(-1).shape[0]
        f3 = jnp.ones((p, 3), jnp.float32)
        f2 = jnp.ones((p, 2), jnp.float32)
        return shade_mod.GBuffer(
            valid=pair.reshape(-1) >= 0, world_pos=f3, normal=f3, uv=f2,
            lm_uv=f2, material=jnp.zeros((p,), jnp.int32),
            front_facing=jnp.ones((p,), bool),
            lightmapped=jnp.zeros((p,), bool),
            dpdx=f3, dpdy=f3, duvdx=f2 * 1e-3, duvdy=f2 * 1e-3,
        )

    frame_mod.shade = const_shade
    frame_mod.interpolate_gbuffer = const_gbuf
    try:
        no_gbuf = timed(env, "gbuf+shade=const")
    finally:
        frame_mod.shade = orig_shade
        frame_mod.interpolate_gbuffer = orig_gb

    print(
        json.dumps(
            {
                "attribution_ms": {
                    "sky": round(full - no_sky, 1),
                    "material_taps": round(full - no_taps, 1),
                    "sh": round(full - no_sh, 1),
                    "empty_transparent_passes": round(full - opaque_only, 1),
                    "shade_beyond_gbuf": round(full - no_shade, 1),
                    "gbuf_interp": round(no_shade - no_gbuf, 1),
                    "raster_sky_scatter_tonemap": round(no_gbuf, 1),
                    "full": round(full, 1),
                },
                "size": args.size,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
