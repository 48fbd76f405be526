#!/usr/bin/env python3
"""Benchmark: FPS at 1920x1080 on one TPU chip.

Three configurations:

1. **Headline (primary metric)** — the PBR+IBL north-star scene.
   BASELINE.json target: >= 60 FPS rendering DamagedHelmet with PBR + IBL.
   DamagedHelmet.glb is not present and cannot be fetched (egress probe
   2026-08-19: DNS fails), so the scene is the committed DamagedHelmet-class
   authored asset tests/fixtures/hero_helmet.glb (16k tris at LOD0 vs the
   helmet's 15.4k; regenerated deterministically by
   tools/make_hero_fixture.py), loaded through the FULL asset pipeline:
   GLB parse -> EXT_meshopt_compression vertex+index decode -> MSFT_lod
   chains -> KHR_texture_basisu KTX2 textures (BasisLZ/ETC1S through the
   native transcoder) + an uncompressed-RGBA8 KTX2 normal map -> texture
   pools, two PBR materials (riveted shell + emissive-visor faceplate),
   SH ambient lighting, and an IBL skybox (VERDICT r3 #6; reference
   analog: demo/src/lib.rs feeding Sponza through models.rs/textures.rs).

2. **All-passes** — every pass enabled at 1080p on real compressed assets:
   sponza_cubes.glb + the BC6H/BCn light volume + the noon.ktx2 IBL
   (demo/src/lib.rs:114-192's scene config), with the triangle load
   carried by the committed dense_terrain.glb fixture (114k-tri LOD0,
   meshopt-compressed, multi-LOD, textured) + 8 procedural spheres for
   alpha-clipped and alpha-blended materials (~240k tris total; full
   Sponza's 262k — Sponza.bin is absent from this checkout), debug lines,
   and smoke particles: opaque -> clip -> lines -> skybox -> particles ->
   blend -> tonemap.

3. **Stereo + animated** — BASELINE configs 4+5: two 1080p eyes (multiview
   batch axis), skinned waving tubes (joint-palette path, FK sampled on the
   host every frame) + PBR spheres.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
primary, with the all-passes numbers as extra keys.
"""

import hashlib
import json
import os
import sys
import threading
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
)

import numpy as np

REF_ASSETS = "/root/reference/demo/web/assets"

HEADLINE_METRIC = (
    "true device FPS 1920x1080 PBR+IBL authored asset "
    "(hero_helmet.glb 16k-tri meshopt+ETC1S-KTX2, 2 PBR "
    "materials; TPU v5e via axon tunnel, at-spec executor "
    "r4 re-characterization — docs/TIMING.md)"
)

# --- Fitted-capacity cache -------------------------------------------------
# fit_caps compiles a stats frame per growth round; on a cold compile cache
# behind the (queue-dominated, 1-4 min/compile) remote compiler that alone
# can eat the driver's kill window before the primary metric even starts
# (BENCH_r04 died exactly this way). The bench scenes are deterministic, so
# the fitted caps are too: cache them in a committed JSON keyed by scene
# tag + size + a version salt + the content hash of the fixture assets, and
# skip the stats frames entirely on a hit. SC_BENCH_REFIT=1 forces a refit
# (bump CAPS_VERSION instead when worklist/cap semantics change).
CAPS_VERSION = 5  # v5: clip_px_caps (per-layer clip-resolve worklists)
CAPS_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_caps.json"
)
_CAPS_FIELDS = (
    "p_cap", "blend_layers", "clip_layers", "particle_layers",
    "shade_px_cap", "shade_px_caps", "opaque_px_cap", "sky_px_cap",
    "matq_classic_cap", "clip_px_caps",
)


def _caps_cache_key(tag, width, height, fixtures=()):
    h = hashlib.sha1()
    for f in fixtures:
        try:
            with open(f, "rb") as fh:
                h.update(fh.read())
        except OSError:
            h.update(b"missing:" + f.encode())
    return f"{tag}-{width}x{height}-v{CAPS_VERSION}-{h.hexdigest()[:12]}"


def _caps_cache_load(key):
    if os.environ.get("SC_BENCH_REFIT"):
        return None
    try:
        with open(CAPS_CACHE_PATH) as fh:
            entry = json.load(fh).get(key)
    except (OSError, ValueError):
        return None
    if entry is None:
        return None
    for f in ("shade_px_caps", "clip_px_caps"):
        if entry.get(f) is not None:
            entry[f] = tuple(entry[f])
    return entry


def _caps_cache_store(key, config):
    entry = {f: getattr(config, f) for f in _CAPS_FIELDS}
    for f in ("shade_px_caps", "clip_px_caps"):
        if entry.get(f) is not None:
            entry[f] = list(entry[f])
    try:
        data = {}
        if os.path.exists(CAPS_CACHE_PATH):
            with open(CAPS_CACHE_PATH) as fh:
                data = json.load(fh)
        data[key] = entry
        with open(CAPS_CACHE_PATH, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
    except (OSError, ValueError) as e:
        print(f"# caps cache write failed: {e!r}", file=sys.stderr)


def _aim(cam, target, look_at, mat4_inverse, mat3_to_quat):
    v = look_at(cam.position, target)
    cam.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])


def make_unrolled(dev, state0, config, env, k):
    """K back-to-back frame copies in ONE executable, image output.

    The tunnel-proof device-time metric is the unroll-count SLOPE of
    t(k) (see measure_device_delta — (t(k=4) - t(k=1)) / 3):
    all executables are dispatched with the identical window pattern, so
    every transport cost (dispatch floor, RTT) is common-mode and cancels;
    what remains is exactly one frame of on-device work. Two compilation
    pitfalls shape this design (both measured 2026-08-17):

    * The copies are a straight-line unroll, NOT a loop — wrapping the
      frame in lax.fori_loop compiles a different, massively slower
      program (fused gather layouts lost: 753 ms/frame vs 0.23 ms).
    * The output must stay an IMAGE — reducing to a scalar inside the jit
      ALSO de-optimizes the frame body (27 ms/frame at 256px), and the
      tunnel's block_until_ready can return speculatively for scalar
      results, silently not waiting (even device faults go unsurfaced).
      With the (V,H,W,4) u8 output kept, blocking is honest and per-copy
      layout assignment matches the production frame executable.

    Copy i scales view_proj by (1 + i*1e-6) — ~3 f32 ulps on unit-scale
    entries, invisible after u8 quantization (1/255), but a real bit
    change so no two copies CSE. An earlier additive +i*1e-12 was a
    lesson: it underflows against f32 eps (1.2e-7), every copy became
    bit-identical, XLA folded the whole unroll to ONE frame, and the
    bench reported delta ~= 0 (BENCH r3b: -0.003/-0.0/-0.002 ms).
    Copies combine by elementwise max so every pixel stays live."""
    import functools

    import jax
    import jax.numpy as jnp

    from superconductor_tpu.render.frame import render_frame_impl

    step = functools.partial(render_frame_impl, config=config, env=env)

    @jax.jit
    def run(dev_arrays, state):
        out = None
        for i in range(k):
            u = dict(state.uniforms)
            u["view_proj"] = u["view_proj"] * (1.0 + jnp.float32(i) * 1e-6)
            img = step(dev_arrays, state._replace(uniforms=u))
            out = img if out is None else jnp.maximum(out, img)
        return out

    fn = lambda: run(dev, state0)  # noqa: E731
    # AOT handle for validation: compiled-FLOPs must scale ~k, proving
    # the copies were not CSE-folded (tools/check_unroll.py).
    fn.lowered = lambda: run.lower(dev, state0)
    return fn


def _sync(img):
    """The only honest completion barrier on the axon tunnel.

    block_until_ready() RACES on this transport: called immediately after
    the dispatch it is meant to await, it can return in ~0 ms with the
    execution still queued (measured 2026-08-17: block 0.0 ms, the
    subsequent 4-byte readback then waited 32.7 s for the backlog). Every
    timing loop that dispatches and immediately blocks therefore measures
    DISPATCH RATE, not render rate — this is how the r1/r2 wall-clock FPS
    numbers were inflated ~500x. A device_get of one pixel cannot lie:
    the 4-byte answer does not exist until the frame executed. Costs one
    transport RTT (~33 ms, measured via _probe_rtt) which is common-mode
    in the unroll-count slope."""
    import jax

    return jax.device_get(img[(0,) * img.ndim])


def _probe_rtt(img, n=5):
    """Median readback latency of an ALREADY-materialized buffer: the
    transport floor that _sync adds on top of true device time."""
    _sync(img)  # materialize
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(img)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def measure_device_delta(results, calls=3, repeats=3, budget_s=None,
                         t_start=None, ns=(1, 2, 8)):
    """Measure every scene's TRUE on-device frame time (unroll slope).

    Estimator: each of the k-unrolled executables in r["delta_fns"]
    (a tuple of (k, fn) pairs, k ascending) is timed over `calls`
    dispatch+_sync round trips (median); the reported frame time is the
    slope (t(k_max) - t(k_1)) / (k_max - k_1), which cancels the
    transport RTT and any fixed per-program cost exactly — all
    endpoints carry the identical dispatch+readback pattern, and only
    real frame copies differ. The whole interleaved set runs `repeats`
    times; the median repeat is reported and (max-min)/median across
    repeats is delta_spread, the run's own round-over-round
    comparability figure. Intermediate k's are linearity cross-checks:
    delta_check_ms lists the consecutive-pair slopes, which should
    bracket the headline slope. tools/check_unroll.py separately proves
    (via compiled FLOPs) that the k copies were not CSE-folded — an
    earlier underflowing perturbation was, silently.

    Few calls suffice because per-call times here are 100s of ms of real
    device work with sub-ms jitter (measured spread between full repeats:
    <1%), unlike the sub-ms dispatch-floor timings this replaced.

    budget_s/t_start: overall bench wall-clock budget. Scenes are
    processed in order; once elapsed exceeds the budget the remaining
    scenes get delta_error="skipped: bench budget" instead of hanging
    the driver on more multi-minute unroll compiles (the scene order in
    main() puts the headline metric first, so it always lands).

    Sets r["delta_ms"], r["delta_spread"], r["delta_check_ms"] (list of
    consecutive-pair slopes of the median repeat), r["rtt_ms"], or
    r["delta_error"]."""

    def timed_ms(fn):
        ts = []
        for _ in range(calls):
            t0 = time.perf_counter()
            _sync(fn())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    for r in results:
        if "delta_fns" not in r:
            continue
        if (budget_s is not None and t_start is not None
                and time.time() - t_start > budget_s):
            r["delta_error"] = "skipped: bench budget"
            print(f"# delta[{r.get('tag', '?')}]: skipped (budget "
                  f"{budget_s:.0f}s exceeded)", file=sys.stderr, flush=True)
            continue
        try:
            pairs = list(r["delta_fns"])
            ks = [k for k, _ in pairs]
            fns = [f for _, f in pairs]
            for k, f in pairs:
                t0 = time.time()
                _sync(f())  # compile + settle
                print(f"# delta[{r.get('tag', '?')}] k={k}: compile+settle "
                      f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
            r["rtt_ms"] = _probe_rtt(fns[0]())
            reps = []
            for _ in range(repeats):
                reps.append([timed_ms(f) for f in fns])
            span = ks[-1] - ks[0]
            reps.sort(key=lambda w: w[-1] - w[0])
            mid_rep = reps[len(reps) // 2]
            mid = (mid_rep[-1] - mid_rep[0]) / span
            lo = (reps[0][-1] - reps[0][0]) / span
            hi = (reps[-1][-1] - reps[-1][0]) / span
            r["delta_ms"] = mid
            r["delta_spread"] = (hi - lo) / mid if mid > 0 else None
            r["delta_check_ms"] = [
                (mid_rep[i + 1] - mid_rep[i]) / (ks[i + 1] - ks[i])
                for i in range(len(ks) - 1)
            ]
            # Self-describing bracket disagreement (ADVICE r3): each
            # unroll k is a DIFFERENT compiled program, and XLA's compile
            # quality varies across them — consecutive-pair slopes can
            # disagree far beyond the run-to-run repeat spread (measured
            # 2x on the 2026-08-19 stereo scene). When that happens the
            # JSON carries an explicit warning so a reader of the
            # artifact alone cannot mistake delta_spread (repeatability)
            # for the delta metric's accuracy; frame_ms (one program,
            # dispatch-count slope) is the primary metric either way.
            checks = r["delta_check_ms"]
            if len(checks) >= 2 and min(checks) > 0:
                ratio = max(checks) / min(checks)
                r["delta_bracket_ratio"] = ratio
                spread = r["delta_spread"] or 0.0
                if ratio - 1.0 > max(3.0 * spread, 0.05):
                    r["delta_warning"] = (
                        f"consecutive-k slopes disagree {ratio:.2f}x "
                        f"(repeat spread {spread:.3f}): per-k XLA compile "
                        "variance; trust device_frame_ms, not "
                        "device_delta_ms"
                    )
            # PRIMARY metric: dispatch-count slope of the PRODUCTION
            # (k = ks[0]) executable. The unroll slope above compiles a
            # different program per k, and XLA's compile quality varies
            # across them (measured 2026-08-19: the k=2 headline program
            # ran ~2x the per-frame cost of k=1/k=4, brackets [297, 143]
            # ms on identical code). Here ONE program is dispatched n
            # times back-to-back with one honest readback at the end —
            # the executor drains its queue serially, so
            # t(n) = fixed + n*k1*frame and the slope cancels RTT and
            # the dispatch floor with nothing left to vary
            # (measured brackets agree to ~2%: 175/182/177 ms).
            f1, k1 = fns[0], ks[0]

            def timed_n(n):
                ts = []
                for _ in range(calls):
                    t0 = time.perf_counter()
                    o = None
                    for _ in range(n):
                        o = f1()
                    _sync(o)
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                return ts[len(ts) // 2] * 1e3

            reps_f = [[timed_n(n) for n in ns] for _ in range(repeats)]
            span = (ns[-1] - ns[0]) * k1
            reps_f.sort(key=lambda w: w[-1] - w[0])
            mid_f = reps_f[len(reps_f) // 2]
            fm = (mid_f[-1] - mid_f[0]) / span
            lo_f = (reps_f[0][-1] - reps_f[0][0]) / span
            hi_f = (reps_f[-1][-1] - reps_f[-1][0]) / span
            r["frame_ms"] = fm
            r["frame_spread"] = (hi_f - lo_f) / fm if fm > 0 else None
            r["frame_check_ms"] = [
                (mid_f[i + 1] - mid_f[i]) / ((ns[i + 1] - ns[i]) * k1)
                for i in range(len(ns) - 1)
            ]
        except Exception as e:  # noqa: BLE001 - report, don't kill the bench
            r["delta_error"] = f"{type(e).__name__}: {e}"[:200]


def measure_frame_slope(fn, ns=(1, 2, 8), calls=3, repeats=3):
    """PRIMARY metric: dispatch-count slope of ONE compiled program.

    Dispatch the same executable n times back-to-back, then force
    completion with one honest 4-byte readback (_sync). The executor
    drains its queue serially, so t(n) = fixed + n*frame; the slope
    cancels RTT and the dispatch floor, and — unlike the k-fold unroll
    slope, where each k is a DIFFERENT program whose XLA compile quality
    varies (docs/TIMING.md round-3 follow-up) — there is no second
    program to vary. One compile, measured brackets agree to ~2%.

    Returns {"frame_ms", "frame_spread", "frame_check_ms", "rtt_ms",
    "compile_s"}."""
    t0 = time.time()
    _sync(fn())  # compile + settle
    compile_s = time.time() - t0
    rtt = _probe_rtt(fn())

    def timed_n(n):
        ts = []
        for _ in range(calls):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn()
            _sync(o)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    reps = [[timed_n(n) for n in ns] for _ in range(repeats)]
    span = ns[-1] - ns[0]
    reps.sort(key=lambda w: w[-1] - w[0])
    mid = reps[len(reps) // 2]
    fm = (mid[-1] - mid[0]) / span
    lo = (reps[0][-1] - reps[0][0]) / span
    hi = (reps[-1][-1] - reps[-1][0]) / span
    return {
        "frame_ms": fm,
        "frame_spread": (hi - lo) / fm if fm > 0 else None,
        "frame_check_ms": [
            (mid[i + 1] - mid[i]) / (ns[i + 1] - ns[i])
            for i in range(len(ns) - 1)
        ],
        "rtt_ms": rtt,
        "compile_s": compile_s,
    }


def _measure(frame_fn, device_fn=None, n=10, windows=2, device_windows=2,
             device_n=10):
    """Returns {"fps", "compile_s", "img", "device_ms", "device_spread"}.
    The TRUE frame-time metric is NOT measured here (measure_device_delta).

    WARNING — both numbers below are DISPATCH rates, not render rates
    (discovered 2026-08-17, docs/TIMING.md): block_until_ready() called
    right after a dispatch races on the axon transport and returns without
    waiting, so these loops time how fast frames can be SUBMITTED. They
    are kept (reported as dispatch_fps/dispatch_ms) for continuity with
    the r1/r2 records, which were produced by exactly these loops.

    fps: median over `windows` windows of `n` frames each, including
    per-frame host draw-build work — an upper bound on end-to-end rate,
    and still the honest measure of HOST-side per-frame cost.

    device_ms: min-of-windows replay of one pre-built frame. With the
    broken barrier this is the transport's per-dispatch floor (~0.2-0.5
    ms), NOT device time — the true number is measure_device_delta's
    unroll slope with the _sync readback barrier.

    Window sizes are deliberately SMALL now (the r1/r2 values were 16
    windows x 200 frames): every un-awaited dispatch queues ~0.65 s of
    real device work that measure_device_delta's first honest _sync must
    then drain — 3200 queued frames made the bench take hours.
    """
    t0 = time.time()
    img = frame_fn(0.0)
    img.block_until_ready()
    compile_s = time.time() - t0
    for i in range(3):
        frame_fn(0.1 * (i + 1)).block_until_ready()
    rates = []
    for w in range(windows):
        t0 = time.time()
        for i in range(n):
            img = frame_fn(0.01 * i + w)
        img.block_until_ready()
        rates.append(n / (time.time() - t0))
    out = {
        "fps": float(np.median(rates)),
        "compile_s": compile_s,
        "img": img,
        "device_ms": None,
        "device_spread": None,
    }
    if device_fn is not None:
        device_fn().block_until_ready()  # same executable: cache-warm
        times = []
        for _ in range(device_windows):
            t0 = time.perf_counter()
            for _ in range(device_n):
                img2 = device_fn()
            img2.block_until_ready()
            times.append((time.perf_counter() - t0) / device_n)
        out["device_ms"] = min(times) * 1e3
        out["device_spread"] = (max(times) - min(times)) / min(times)
    return out


def headline_scene(sc, width=1920, height=1080):
    """BASELINE config 2: the authored hero_helmet.glb (DamagedHelmet-class)
    PBR+IBL at 1080p — the headline metric's scene, fed through the full
    asset pipeline (meshopt + MSFT_lod + ETC1S/RGBA8 KTX2; see module
    docstring). Returns (dev, build, config, env) like all_passes_scene;
    caps are NOT yet fitted."""
    from superconductor_tpu.assets.models import load_model
    from superconductor_tpu.math3d import (
        look_at,
        mat3_to_quat,
        mat4_inverse,
        quat_from_axis_angle,
    )
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import (
        default_ambient_sh,
        gradient_cubemap,
    )

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "hero_helmet.glb",
    )
    scene = sc.Scene()
    with open(fixture, "rb") as f:
        model = load_model(scene, f.read(), name="hero_helmet")
    cubemap_base = gradient_cubemap(scene)
    # Faceplate (second material, emissive visor) toward the camera;
    # helmet fills the center of the 16:9 frame like the reference's
    # DamagedHelmet framing.
    cam = sc.Camera(position=np.array([0.0, 0.25, 2.8], np.float32))
    _aim(cam, [0, 0, 0], look_at, mat4_inverse, mat3_to_quat)
    uniforms = sc.make_uniforms(cam, width, height)
    # from_scene picks up the cubemap's static pool placement (skybox
    # then samples with zero per-pixel descriptor gathers).
    env = sc.EnvBindings.from_scene(scene, ambient_sh=default_ambient_sh())
    assert env.ibl_cubemap_base == cubemap_base
    config = sc.RenderConfig(
        width=width, height=height, t_cap=1 << 15, t_cap_anim=1 << 6,
        p_cap=1 << 17, raster="auto",
    )
    dev = scene.device_arrays()

    def build(angle):
        # The faceplate/visor is authored at +z (front), which faces the
        # camera at angle 0 — both materials (shell + emissive visor)
        # shade every frame.
        sim = sc.Similarity(rotation=quat_from_axis_angle([0, 1, 0], angle))
        return build_frame_state(scene, [(model, sim)], uniforms)

    return dev, build, config, env


def bench_headline(sc, width=1920, height=1080):
    dev, build, config, env = headline_scene(sc, width, height)
    state0 = build(0.0)
    # Right-size the never-drop caps (opaque_px_cap matters here: the
    # helmet covers a third of 1080p and the compacted opaque shade must
    # hold all of it; coverage is near rotation-invariant for this scene).
    config = fit_caps(dev, state0, config, env)

    def frame(angle):
        return sc.render_frame(dev, build(angle), config, env)

    r = _measure(frame, lambda: sc.render_frame(dev, state0, config, env))
    # Headline metric: full k=1/2/4 rig (slope + linearity cross-check).
    r["tag"] = "headline"
    r["delta_fns"] = tuple(
        (k, make_unrolled(dev, state0, config, env, k)) for k in (1, 2, 4)
    )
    return r


def all_passes_scene(sc, width=1920, height=1080, n_spheres=8):
    """Everything on, 1080p, real compressed assets + Sponza-scale load.

    The bulk triangle load is the committed dense_terrain.glb fixture
    (114k-tri LOD0, meshopt-compressed, multi-LOD, textured — authored by
    tools/make_dense_fixture.py), so the full asset path (meshopt decode ->
    mega-buffers -> LOD select -> texture sampling) carries the bench the
    way demo/src/lib.rs:57-193 feeds the reference; procedural spheres
    provide the alpha-clip/blend materials.

    Returns (dev, build, config, env): device scene arrays, a
    build(angle)->FrameState closure, the all-passes RenderConfig, and the
    EnvBindings — shared by bench_all_passes and tools/pass_costs.py."""
    from superconductor_tpu.assets.environment import (
        load_ibl_cubemap,
        load_lightvol,
    )
    from superconductor_tpu.assets.models import load_model
    from superconductor_tpu.math3d import (
        look_at,
        mat3_to_quat,
        mat4_inverse,
        quat_from_axis_angle,
    )
    from superconductor_tpu.render.draws import (
        build_frame_state,
        pack_lines,
        pack_particles,
    )
    from superconductor_tpu.scene.scene import (
        BLEND_ALPHA_BLENDED,
        BLEND_ALPHA_CLIPPED,
    )
    from superconductor_tpu.utils.procgen import add_pbr_sphere

    scene = sc.Scene()
    cubes = load_model(
        scene,
        open(f"{REF_ASSETS}/models/sponza_cubes.glb", "rb").read(),
        name="sponza_cubes",
    )
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "dense_terrain.glb",
    )
    terrain = load_model(
        scene, open(fixture, "rb").read(), name="dense_terrain"
    )
    lv = f"{REF_ASSETS}/lighting/bcn"
    load_lightvol(
        scene,
        open(f"{lv}/lightvol.ktx2", "rb").read(),
        open(f"{lv}/lightvol_x.ktx2", "rb").read(),
        open(f"{lv}/lightvol_y.ktx2", "rb").read(),
        open(f"{lv}/lightvol_z.ktx2", "rb").read(),
        # ProbesArrayInfo::new(center (0,6,0), scale (24,12,12)) of the
        # reference demo (demo/src/lib.rs:120-123): scale is the volume's
        # full world extent, so rescaled coords span [0,1] over the volume
        bottom_left=(-12.0, 0.0, -6.0),
        scale=(24.0, 12.0, 12.0),
    )
    load_ibl_cubemap(
        scene, open(f"{REF_ASSETS}/cubemaps/noon.ktx2", "rb").read()
    )
    from superconductor_tpu.assets.environment import load_smoke_textures

    smoke = f"{REF_ASSETS}/smoke"
    load_smoke_textures(
        scene,
        open(f"{smoke}/burst/TX_Pyro_AerialBurst_P.tga.ktx2", "rb").read(),
        open(f"{smoke}/burst/TX_Pyro_AerialBurst_N.tga.ktx2", "rb").read(),
        open(f"{smoke}/lut.ktx2", "rb").read(),
    )

    # Alpha-clip/blend materials: 8 PBR spheres (~15.5k tris each) around
    # the cube field; every 5th clipped, every 7th blended.
    spheres = []
    for i in range(n_spheres):
        m = add_pbr_sphere(scene, name=f"sphere{i}")
        mat = scene.materials[m.primitives[0].material]
        if i % 5 == 1:
            mat.blend_mode = BLEND_ALPHA_CLIPPED
            m.primitives[0].blend_mode = BLEND_ALPHA_CLIPPED
        elif i % 7 == 2:
            mat.blend_mode = BLEND_ALPHA_BLENDED
            mat.base_color_factor = (1.0, 1.0, 1.0, 0.6)
            m.primitives[0].blend_mode = BLEND_ALPHA_BLENDED
        spheres.append(m)
    scene._materials_dirty = True

    cam = sc.Camera(position=np.array([8.0, 2.5, 3.0], np.float32))
    _aim(cam, [0, 1.2, 0], look_at, mat4_inverse, mat3_to_quat)
    uniforms = sc.make_uniforms(cam, width, height)
    uniforms.probes_bottom_left = np.asarray(
        scene.lightvol["bottom_left"], np.float32
    )
    uniforms.probes_scale = np.asarray(scene.lightvol["scale"], np.float32)

    env = sc.EnvBindings.from_scene(scene)
    config = sc.RenderConfig(
        width=width, height=height, t_cap=1 << 18, t_cap_anim=1 << 6,
        p_cap=1 << 19, raster="auto",
        enable_clip=True, enable_blend=True,
        enable_lines=True, enable_particles=True,
    )
    dev = scene.device_arrays()

    lines = pack_lines(
        [[[g, 0.02, -5], [g, 0.02, 5]] for g in range(-5, 6)]
        + [[[-5, 0.02, g], [5, 0.02, g]] for g in range(-5, 6)],
        list(range(22)),
    )
    particles = pack_particles(
        [
            {
                "center": [
                    3.0 * np.cos(0.8 * k), 1.0 + 0.2 * k, 3.0 * np.sin(0.8 * k)
                ],
                "scale": [1.5, 1.5],
                "colour": [0.9, 0.9, 0.95],
                "emissive_colour": [0.3, 0.2, 0.1],
            }
            for k in range(16)
        ]
    )

    def build(angle):
        rot = quat_from_axis_angle([0, 1, 0], angle)
        instances = [
            (cubes, sc.Similarity()),
            # the dense authored asset carries the triangle load
            (terrain, sc.Similarity(translation=[0.0, -0.6, 0.0], scale=1.6)),
        ]
        for i, m in enumerate(spheres):
            a = 2.0 * np.pi * i / len(spheres)
            instances.append(
                (m, sc.Similarity(
                    translation=[6.0 * np.cos(a), 1.3, 3.0 * np.sin(a)],
                    rotation=rot,
                ))
            )
        return build_frame_state(
            scene, instances, uniforms, lines=lines, particles=particles
        )

    return dev, build, config, env


def fit_caps(dev, state0, config, env, max_rounds=8, cache_key=None):
    """Right-size the never-drop capacities for a bench scene.

    Runs one stats frame (honest readback) and grows any exceeded cap
    exactly as the ECS render system would (ecs/systems.py render()):
    pairs -> p_cap, k-layers -> blend_layers, transparent-shading
    worklist -> shade_px_cap. Without this, a bench scene whose
    transparent coverage exceeds shade_px_cap would silently leave
    pixels unshaded — and the timed executable would be measuring a
    frame that drops work. Returns the (possibly grown) config.

    cache_key (from _caps_cache_key): reuse/record the fitted caps in the
    committed bench_caps.json — the scenes are deterministic, and on a
    cold compile cache the stats-frame compiles alone can outlast the
    driver's kill window."""
    import jax

    from superconductor_tpu.ecs.systems import _next_pow2
    from superconductor_tpu.render import frame as frame_mod
    from superconductor_tpu.render.frame import (
        render_frame_stats,
        size_worklist_cap,
    )

    if cache_key is not None:
        # The fitted caps depend on the raster method (the ref path has no
        # bin pairs, so its p_cap tightens to the floor — reusing that on
        # the pallas path would silently drop pairs): scope the key to it.
        cache_key = f"{cache_key}-{config.resolve_raster()}"
        cached = _caps_cache_load(cache_key)
        if cached is not None:
            print(f"# fit_caps: cache hit {cache_key} -> {cached}",
                  file=sys.stderr, flush=True)
            return replace_config(config, **cached)

    if config.opaque_px_cap is None:
        # Seed the compacted opaque shade (growth below right-sizes it;
        # plain render_frame defaults it off because it has no grower).
        config = replace_config(
            config, opaque_px_cap=frame_mod.DEFAULT_OPAQUE_PX_CAP
        )
    # sky_px_cap is NOT pre-seeded: the sky worklist only wins when
    # geometry covers most of the screen (measured on the hero headline:
    # 82% sky coverage, 43.2 vs 36.4 ms — the worklist form costs more
    # than the 18% lane saving). The loop below sets it from the measured
    # miss fraction instead.
    from superconductor_tpu.render.frame import stats_to_host

    for _ in range(max_rounds):
        _, stats = render_frame_stats(dev, state0, config, env)
        stats = stats_to_host(stats)
        grow = {}
        if stats["pairs_needed"] > config.p_cap:
            grow["p_cap"] = _next_pow2(stats["pairs_needed"] * 2)
        layers = stats["layers_needed"]
        blend_l = stats.get("blend_layers_needed", layers)
        clip_l = stats.get("clip_layers_needed", layers)
        part_l = stats.get("particle_layers_needed", layers)
        if blend_l > config.blend_layers:
            grow["blend_layers"] = _next_pow2(blend_l)
        if config.enable_clip and clip_l > config.resolve_clip_layers():
            grow["clip_layers"] = _next_pow2(clip_l)
        if config.enable_particles and part_l > config.resolve_particle_layers():
            grow["particle_layers"] = _next_pow2(part_l)
        # First clean sighting: pin each pass's K to its own need (pure
        # perf — a deep smoke stack must not make the clip/blend kernels
        # pay K=8; mirrors the ECS render system's tighten). blend_layers
        # itself tightens only once clip/particles no longer inherit it.
        if not grow:
            # Tighten the bin-pair capacity too: every raster pass sorts
            # and gathers p_cap rows whether live or not, so a static
            # seed far above the scene's need taxes each pass's binning.
            # The grow branch above still protects never-drop if a later
            # angle needs more.
            tight_p = size_worklist_cap(stats["pairs_needed"])
            if tight_p < config.p_cap:
                grow["p_cap"] = tight_p
        if not grow:
            new_blend = (
                _next_pow2(max(blend_l, 1))
                if config.enable_blend
                else config.blend_layers
            )
            tighten_blend = new_blend < config.blend_layers
            if config.enable_clip and config.clip_layers is None:
                k = _next_pow2(max(clip_l, 1))
                if tighten_blend or k != config.blend_layers:
                    grow["clip_layers"] = k
            if config.enable_particles and config.particle_layers is None:
                k = _next_pow2(max(part_l, 1))
                if tighten_blend or k != config.blend_layers:
                    grow["particle_layers"] = k
            if tighten_blend and (
                not config.enable_clip
                or config.clip_layers is not None
                or "clip_layers" in grow
            ) and (
                not config.enable_particles
                or config.particle_layers is not None
                or "particle_layers" in grow
            ):
                grow["blend_layers"] = new_blend
        if stats.get("shade_px_needed", 0) > config.shade_px_cap:
            grow["shade_px_cap"] = size_worklist_cap(stats["shade_px_needed"])
        if (config.opaque_px_cap or 0) and (
            config.opaque_px_cap < stats.get("opaque_px_needed", 0)
        ):
            grow["opaque_px_cap"] = size_worklist_cap(
                stats["opaque_px_needed"]
            )
        if (config.sky_px_cap or 0) and (
            config.sky_px_cap < stats.get("sky_px_needed", 0)
        ):
            grow["sky_px_cap"] = size_worklist_cap(stats["sky_px_needed"])
        mc_need = stats.get("matq_classic_needed", 0)
        if "matq_capable" in dev and (
            config.matq_classic_cap is None
            or config.matq_classic_cap < mc_need
        ):
            # Partial interleaved pool: engage the material-path
            # partition (even at mc_need=0 — the floor-sized classic
            # tail is noise next to every capable lane dropping from ~9
            # classic gathers to 3 interleaved ones) and grow the tail
            # on spill (correctness — spilled incapable lanes read the
            # sentinel row).
            grow["matq_classic_cap"] = size_worklist_cap(mc_need)
        if config.sky_px_cap is None and not grow:
            # Engage the sky worklist only when geometry covers at least
            # half the screen — below that, evaluating the skybox on a
            # compacted worklist costs more than the skipped lanes save
            # (hero headline: 82% sky, 43.2 vs 36.4 ms).
            sky_need = stats.get("sky_px_needed", 0)
            npx_band = config.width * (config.height // config.row_chunks)
            if 0 < sky_need < npx_band // 2:
                grow["sky_px_cap"] = size_worklist_cap(sky_need)
        ck = stats.get("clip_px_needed_k")
        # DISABLED pending an XLA fault: setting clip_px_caps on the
        # all-passes scene compiles but faults the TPU backend at
        # execution ("INTERNAL", deterministic across three runs,
        # 2026-08-21; the identical config minus clip_px_caps runs).
        # The per-layer clip machinery stays (CPU-exact, tested) for
        # explicit use; the growers keep the shared-worklist clip until
        # the fault is understood. See NOTES-NEXT-ROUND.md.
        if False and ck and config.enable_clip:
            # Per-layer clip-resolve worklists: size every round from its
            # own (monotone-decreasing) need on first sighting, grow
            # overflowed rounds after (never-drop — an overflowed round
            # loses clip surfaces on the spilled pixels).
            caps_ck = config.resolve_clip_caps()
            if config.clip_px_caps is None:
                grow["clip_px_caps"] = tuple(size_worklist_cap(n) for n in ck)
            elif any(n > c for n, c in zip(ck, caps_ck)):
                grow["clip_px_caps"] = tuple(
                    max(c, size_worklist_cap(n))
                    for n, c in zip(ck, caps_ck)
                )
        nk = stats.get("shade_px_needed_k")
        if nk and (config.enable_blend or config.enable_particles):
            # Per-layer worklists for the blend/particle shading loops:
            # tighten from the shared shade_px_cap on first sight, grow a
            # layer whose worklist overflowed (never-drop; the next loop
            # round's stats frame validates the new caps).
            caps_k = config.layer_caps()
            if config.shade_px_caps is None:
                grow["shade_px_caps"] = tuple(size_worklist_cap(n) for n in nk)
            elif any(n > c for n, c in zip(nk, caps_k)):
                grow["shade_px_caps"] = tuple(
                    max(c, size_worklist_cap(n))
                    for n, c in zip(nk, caps_k)
                )
        print(f"# fit_caps: {stats} grow={grow or None}",
              file=sys.stderr, flush=True)
        if not grow:
            if cache_key is not None:
                _caps_cache_store(cache_key, config)
            return config
        config = replace_config(config, **grow)
    return config


def replace_config(config, **kw):
    from dataclasses import replace

    return replace(config, **kw)


def bench_all_passes(sc, width=1920, height=1080, n_spheres=8):
    dev, build, config, env = all_passes_scene(sc, width, height, n_spheres)
    config = fit_caps(dev, build(0.0), config, env)

    def frame(angle):
        return sc.render_frame(dev, build(angle), config, env)

    state0 = build(0.0)
    r = _measure(frame, lambda: sc.render_frame(dev, state0, config, env))
    # Secondary scene: 2-point slope (k=1,2) — same RTT/fixed-cost
    # cancellation, one fewer multi-minute unroll compile; linearity was
    # established by the headline's 3-point rig (delta_check brackets).
    r["tag"] = "all_passes"
    r["delta_fns"] = tuple(
        (k, make_unrolled(dev, state0, config, env, k)) for k in (1, 2)
    )
    return r


def bench_stereo_animated(sc, width=1920, height=1080, n_tubes=6, n_spheres=6):
    """BASELINE configs 4+5 in one scene: stereo multiview (two 1080p eyes)
    of skinned animated geometry (waving 8-joint tubes, the animated_vertex
    joint-palette path) plus static PBR spheres. Per-frame host work includes
    the palette FK sampling, as the real app loop would."""
    from superconductor_tpu.math3d import (
        look_at,
        mat3_to_quat,
        mat4_inverse,
        quat_from_axis_angle,
    )
    from superconductor_tpu.render.camera import make_stereo_uniforms
    from superconductor_tpu.render.draws import build_frame_state
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        add_skinned_tube,
        default_ambient_sh,
        gradient_cubemap,
        wave_joint_palettes,
    )

    # ONE tube model and ONE sphere model, instanced n times with distinct
    # transforms/palettes — geometry and textures live once in the scene
    # (instanced rendering, the GpuInstance path of rendering.rs:642-646).
    scene = sc.Scene()
    tube = add_skinned_tube(scene, segments=64, slices=48, name="tube")
    sphere = add_pbr_sphere(scene, name="st_sphere")
    cubemap_base = gradient_cubemap(scene)
    env = sc.EnvBindings.from_scene(scene, ambient_sh=default_ambient_sh())
    assert env.ibl_cubemap_base == cubemap_base

    center = np.array([0.0, 1.0, 0.0], np.float32)
    eye_mid = np.array([0.0, 1.4, 7.0], np.float32)
    rot = mat3_to_quat(mat4_inverse(look_at(eye_mid, center))[:3, :3])
    half_ipd = np.array([0.032, 0.0, 0.0], np.float32)
    left = sc.Camera(position=eye_mid - half_ipd, rotation=rot)
    right = sc.Camera(position=eye_mid + half_ipd, rotation=rot)
    lu = sc.make_uniforms(left, width, height)
    ru = sc.make_uniforms(right, width, height)
    uniforms = make_stereo_uniforms(
        lu.view[0], ru.view[0], lu.projection[0], ru.projection[0],
        lu.eye[0], ru.eye[0], left.rotation, right.rotation,
    )

    config = sc.RenderConfig(
        width=width, height=height, num_views=2,
        t_cap=1 << 17, t_cap_anim=1 << 16, p_cap=1 << 19, raster="auto",
    )
    dev = scene.device_arrays()

    def frame(t):
        rot_i = quat_from_axis_angle([0, 1, 0], 0.3 * t)
        instances = []
        pals = wave_joint_palettes(
            t + 0.7 * np.arange(n_tubes, dtype=np.float32), 8, amp=0.45
        )
        palettes = {i: pals[i] for i in range(n_tubes)}
        for i in range(n_tubes):
            a = 2.0 * np.pi * i / n_tubes
            instances.append(
                (tube, sc.Similarity(
                    translation=[3.2 * np.cos(a), 0.0, 3.2 * np.sin(a)]
                ))
            )
        for i in range(n_spheres):
            a = 2.0 * np.pi * (i + 0.5) / n_spheres
            instances.append(
                (sphere, sc.Similarity(
                    translation=[5.5 * np.cos(a), 1.2, 5.5 * np.sin(a)],
                    rotation=rot_i,
                ))
            )
        state = build_frame_state(
            scene, instances, uniforms, joint_palettes=palettes
        )
        return sc.render_frame(dev, state, config, env)

    def build_fixed(t=0.0):
        instances = []
        pals = wave_joint_palettes(
            t + 0.7 * np.arange(n_tubes, dtype=np.float32), 8, amp=0.45
        )
        palettes = {i: pals[i] for i in range(n_tubes)}
        for i in range(n_tubes):
            a = 2.0 * np.pi * i / n_tubes
            instances.append(
                (tube, sc.Similarity(
                    translation=[3.2 * np.cos(a), 0.0, 3.2 * np.sin(a)]
                ))
            )
        for i in range(n_spheres):
            a = 2.0 * np.pi * (i + 0.5) / n_spheres
            instances.append(
                (sphere, sc.Similarity(
                    translation=[5.5 * np.cos(a), 1.2, 5.5 * np.sin(a)]
                ))
            )
        return build_frame_state(
            scene, instances, uniforms, joint_palettes=palettes
        )

    state0 = build_fixed()
    config = fit_caps(dev, state0, config, env, cache_key=_caps_cache_key(
        "stereo", config.width, config.height))
    r = _measure(frame, lambda: sc.render_frame(dev, state0, config, env))
    r["tag"] = "stereo"
    r["delta_fns"] = tuple(
        (k, make_unrolled(dev, state0, config, env, k)) for k in (1, 2)
    )
    return r


def main():
    import jax

    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import superconductor_tpu as sc

    # Overall wall-clock budget, sized to fit INSIDE the driver's
    # observed ~20 min kill window (BENCH_r04 was killed at rc=124 with
    # the JSON unprinted — the whole round lost its evidence). Two
    # defenses now: (1) the budget default fits the window, and (2) the
    # primary JSON line is printed the moment the headline metric lands
    # and re-printed enriched after every optional block — the driver
    # takes the LAST parseable line, so a kill at any point after the
    # first emit still records the round.
    t_bench0 = time.time()
    budget_s = float(os.environ.get("SC_BENCH_BUDGET_S", "1000"))

    # Last-resort JSON guarantee: if the primary metric has not landed by
    # the deadline (cold compile cache + the queue-dominated remote
    # compiler can exceed the driver's kill window all by themselves —
    # BENCH_r04 recorded nothing for exactly this reason), print an
    # honest value-0 line so the round still records a parseable result.
    # The real line, if it lands later, prints after and wins (the driver
    # takes the LAST parseable line); the lock closes the race where the
    # watchdog could interleave after a just-landed primary.
    deadline_s = float(os.environ.get("SC_BENCH_DEADLINE_S", "900"))
    primary_landed = threading.Event()
    emit_lock = threading.Lock()

    def watchdog():
        if primary_landed.wait(deadline_s):
            return
        with emit_lock:
            if primary_landed.is_set():
                return
            print(json.dumps({
                "metric": HEADLINE_METRIC,
                "value": 0.0,
                "unit": "fps",
                "vs_baseline": 0.0,
                "error": (
                    f"primary metric did not land within {deadline_s:.0f}s "
                    "(compile queue / tunnel degradation) — see stderr"
                ),
            }), flush=True)

    threading.Thread(target=watchdog, daemon=True).start()

    def progress(msg):
        print(f"# [{time.time() - t_bench0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    def over_budget():
        return time.time() - t_bench0 > budget_s

    # --- PRIMARY metric: ONE compile (the production k=1 executable),
    # dispatch-count slope, emitted immediately. ---
    progress("headline scene (load + fit_caps)...")
    dev, build, config, env = headline_scene(sc)
    state0 = build(0.0)
    config = fit_caps(dev, state0, config, env, cache_key=_caps_cache_key(
        "headline", config.width, config.height,
        [os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tests", "fixtures", "hero_helmet.glb")]))
    head = {"tag": "headline", "device_ms": None, "device_spread": None,
            "fps": None}
    k1 = make_unrolled(dev, state0, config, env, 1)
    progress("headline primary (dispatch-count slope, one compile)...")
    head.update(measure_frame_slope(k1))

    fps = 1e3 / head["frame_ms"] if head["frame_ms"] > 0 else 0.0
    out = {
        "metric": HEADLINE_METRIC,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }

    def add(prefix, r, views=1):
        """Regression metrics. device_delta_ms (true on-device frame time,
        honest barrier, transport cancels in the slope) is THE
        round-over-round comparable; dispatch_ms/dispatch_fps are the old
        pipelined wall-clock numbers kept for r1/r2 continuity — they
        measure transport dispatch rate, NOT render rate."""
        if r.get("device_ms") is not None:
            out[f"{prefix}dispatch_ms"] = round(r["device_ms"], 3)
            out[f"{prefix}dispatch_spread"] = round(r["device_spread"], 3)
        if r.get("frame_ms") is not None:
            out[f"{prefix}device_frame_ms"] = round(r["frame_ms"], 3)
            out[f"{prefix}mpix_per_s"] = round(
                1920 * 1080 * views / (r["frame_ms"] * 1e-3) / 1e6, 2
            )
            if r.get("frame_spread") is not None:
                out[f"{prefix}device_frame_spread"] = round(
                    r["frame_spread"], 3
                )
            out[f"{prefix}device_frame_check_ms"] = [
                round(d, 3) for d in r["frame_check_ms"]
            ]
        if r.get("delta_ms") is not None:
            out[f"{prefix}device_delta_ms"] = round(r["delta_ms"], 3)
            if r.get("frame_ms") is None:
                out[f"{prefix}mpix_per_s"] = round(
                    1920 * 1080 * views / (r["delta_ms"] * 1e-3) / 1e6, 2
                )
            if r.get("delta_spread") is not None:
                out[f"{prefix}device_delta_spread"] = round(
                    r["delta_spread"], 3
                )
            out[f"{prefix}device_delta_check_ms"] = [
                round(d, 3) for d in r["delta_check_ms"]
            ]
            if r.get("delta_bracket_ratio") is not None:
                out[f"{prefix}device_delta_bracket_ratio"] = round(
                    r["delta_bracket_ratio"], 3
                )
            if r.get("delta_warning"):
                out[f"{prefix}device_delta_warning"] = r["delta_warning"]
        if r.get("rtt_ms") is not None:
            out[f"{prefix}rtt_ms"] = round(r["rtt_ms"], 1)
        if r.get("delta_error"):
            out[f"{prefix}device_delta_error"] = r["delta_error"]

    add("", head)
    # FIRST emit: the primary metric is now on record no matter what the
    # driver does to the rest of this run.
    with emit_lock:
        primary_landed.set()
        print(json.dumps(out), flush=True)

    if os.environ.get("SC_BENCH_SAVE"):
        import imageio.v3 as iio

        iio.imwrite(os.environ["SC_BENCH_SAVE"], np.asarray(k1())[0])

    # --- Optional blocks, each budget-gated and each re-emitting the
    # enriched JSON (last parseable line wins). Order = evidence value
    # per second: all-passes (never measured at-spec before r5) first,
    # then stereo, then the headline unroll cross-check, then roofline.
    #
    # The expensive part of each block is its COMPILE, and the remote
    # compile queue processes independent requests concurrently (the
    # program itself is tiny — docs/COMPILE.md), so the all-passes prep
    # and the k=2/4 unroll compiles run in background threads while the
    # main thread measures; each measurement joins its own job first.
    # Threads only load/fit/compile + settle one dispatch — all timing
    # loops stay on the main thread, serial, so nothing perturbs a
    # running measurement window. Daemon threads (not a ThreadPoolExecutor)
    # so an unjoined compile can never block process exit past the budget.

    class _Job:
        def __init__(self, fn):
            self._done = threading.Event()
            self._value = self._error = None

            def run():
                try:
                    self._value = fn()
                except BaseException as e:  # noqa: BLE001 — re-raised in result()
                    self._error = e
                finally:
                    self._done.set()

            threading.Thread(target=run, daemon=True).start()

        def result(self, timeout=None):
            if not self._done.wait(timeout):
                raise TimeoutError("background job still compiling")
            if self._error is not None:
                raise self._error
            return self._value

    def prep_allpasses():
        adev, abuild, acfg, aenv = all_passes_scene(sc)
        astate0 = abuild(0.0)
        _root = os.path.dirname(os.path.abspath(__file__))
        acfg = fit_caps(adev, astate0, acfg, aenv,
                        cache_key=_caps_cache_key(
                            "allpasses", acfg.width, acfg.height,
                            [os.path.join(_root, "tests", "fixtures",
                                          "dense_terrain.glb"),
                             f"{REF_ASSETS}/models/sponza_cubes.glb"]))
        ak1 = make_unrolled(adev, astate0, acfg, aenv, 1)
        # AOT compile (no dispatch — nothing from this thread can land
        # inside a main-thread measurement window); the persistent compile
        # cache turns the later jit call into a fast deserialize.
        ak1.lowered().compile()
        return ak1

    def prep_unrolls():
        fns = tuple(
            (k, make_unrolled(dev, state0, config, env, k)) for k in (2, 4)
        )
        for _k, fn in fns:
            fn.lowered().compile()
        return fns

    have_allpasses = os.path.exists(f"{REF_ASSETS}/models/sponza_cubes.glb")
    allpasses_job = (
        _Job(prep_allpasses)
        if have_allpasses and not over_budget() else None
    )
    unroll_job = _Job(prep_unrolls) if not over_budget() else None

    if allpasses_job is not None:
        try:
            progress("all-passes (join background load+fit+compile)...")
            ak1 = allpasses_job.result(
                timeout=max(1.0, budget_s - (time.time() - t_bench0))
            )
            progress("all-passes dispatch-count slope...")
            allp = {"tag": "all_passes"}
            allp.update(measure_frame_slope(ak1))
            out["all_passes_true_fps"] = round(1e3 / allp["frame_ms"], 2)
            out["all_passes_scene"] = (
                "1080p, ~240k tris (dense_terrain 114k meshopt/LOD fixture "
                "+ sponza_cubes + 8 spheres), bcn lightvol+noon IBL, "
                "clip+blend+lines+particles"
            )
            add("all_passes_", allp)
            print(json.dumps(out), flush=True)
            if os.environ.get("SC_BENCH_SAVE"):
                import imageio.v3 as iio

                iio.imwrite(
                    os.environ["SC_BENCH_SAVE"].replace(".png", "_all.png"),
                    np.asarray(ak1())[0],
                )
        except Exception as e:  # noqa: BLE001 — primary already emitted
            print(f"# all-passes bench failed: {e!r}", file=sys.stderr)
            out["all_passes_error"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps(out), flush=True)

    if not over_budget():
        try:
            progress("stereo+animated scene (load + fit_caps + compile)...")
            stereo = bench_stereo_animated(sc)
            progress("stereo dispatch-count slope...")
            measure_device_delta([stereo], budget_s=budget_s,
                                 t_start=t_bench0, ns=(1, 4))
            out["stereo_anim_dispatch_fps"] = round(stereo["fps"], 2)
            d = stereo.get("frame_ms") or stereo.get("delta_ms")
            if d and d > 0:
                out["stereo_anim_true_fps"] = round(1e3 / d, 2)
            out["stereo_anim_scene"] = (
                "2x1080p stereo, 6 skinned 8-joint tubes (37k anim tris) "
                "+ 6 PBR spheres (93k tris), per-frame FK palettes"
            )
            add("stereo_anim_", stereo, views=2)
            print(json.dumps(out), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# stereo+animated bench failed: {e!r}", file=sys.stderr)

    # Headline k=1/2/4 unroll cross-check (a DIFFERENT program per k —
    # compile-quality varies, docs/TIMING.md; kept as linearity evidence
    # for the primary slope, not as the metric).
    if unroll_job is not None and not over_budget():
        try:
            progress("headline unroll cross-check (join k=2/4 compiles)...")
            head["delta_fns"] = ((1, k1),) + unroll_job.result(
                timeout=max(1.0, budget_s - (time.time() - t_bench0))
            )
            saved = head.pop("frame_ms"), head.pop("frame_spread"), \
                head.pop("frame_check_ms")
            measure_device_delta([head], budget_s=budget_s, t_start=t_bench0)
            head["frame_ms"], head["frame_spread"], head["frame_check_ms"] \
                = saved
            add("", head)
            print(json.dumps(out), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# unroll cross-check failed: {e!r}", file=sys.stderr)

    # Roofline utilization: how much of the executor's own measured
    # memory system the frame uses. Numerator = the k=1 production
    # program's cost_analysis bytes/flops; denominators = live ceiling
    # probes with the same dispatch-count-slope methodology.
    if not over_budget():
        try:
            from superconductor_tpu.utils.roofline import (
                predict_ms,
                probe_ceilings,
                program_costs,
            )

            progress("roofline: headline program cost analysis...")
            flops, bytes_ = program_costs(k1.lowered().compile())
            progress("roofline: ceiling probes (matmul/stream/gather)...")
            ceil = probe_ceilings(ns=(1, 2), calls=2, quick=True)
            pred = predict_ms(flops, bytes_, ceil)
            out.update({
                "headline_gflops": round(flops / 1e9, 2),
                "headline_gbytes": round(bytes_ / 1e9, 3),
                "matmul_tflops_ceiling": round(ceil["matmul_tflops"], 4),
                "stream_gbps_ceiling": round(ceil["stream_gbps"], 3),
                "gather_gbps_ceiling": round(ceil["gather_gbps"], 3),
                "gather_mrows_per_s_ceiling": round(
                    ceil["gather_mrows_per_s"], 1),
                "pred_lo_ms": round(pred["pred_lo_ms"], 1),
                "pred_hi_ms": round(pred["pred_hi_ms"], 1),
            })
            fm = head.get("frame_ms")
            if fm and fm > 0:
                gbps = out["headline_gbytes"] / (fm * 1e-3)
                out["achieved_gbps"] = round(gbps, 3)
                # fraction of the executor's measured streaming bandwidth
                # the frame sustains (gathers count at XLA's
                # bytes-accessed accounting)
                out["stream_bw_utilization"] = round(
                    gbps / out["stream_gbps_ceiling"], 3
                )
                lo, hi = out["pred_lo_ms"], out["pred_hi_ms"]
                if lo > 0 and hi > 0:
                    out["frame_vs_roofline_band"] = (
                        round(fm / lo, 2) if fm < lo
                        else round(fm / hi, 2) if fm > hi else 1.0
                    )
            print(json.dumps(out), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# roofline block failed: {e!r}", file=sys.stderr)

    progress("done")
    print(json.dumps(out), flush=True)
    print(
        f"# backend={jax.default_backend()} "
        f"headline compile={head['compile_s']:.1f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
