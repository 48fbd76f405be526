#!/usr/bin/env python3
"""Interactive frame server — the continuous present-loop analog of the
reference's run_rendering_loop (src/lib.rs:420-564).

The reference's loop: poll input -> update camera rig -> run the ECS
schedule -> submit + present, every frame, forever. A TPU host has no
swapchain, so "present" here is: the frame is rendered and its device
buffer is ready (block_until_ready); optionally the newest frame is
written to a PNG for a viewer to poll (readback over the axon tunnel is
~1 s per 2 MB, so saving is off by default and never in the latency path).

--frames-in-flight N emulates the swapchain's frame queue (wgpu's
desired_maximum_frame_latency defaults to 2): up to N frames are
submitted before blocking on the oldest, overlapping host draw-build of
frame n+1 with device render of frame n. Latency is measured
submit->ready per frame, so added queue latency is reported, not hidden.

Two modes:

  --selftest N   drive the loop with synthetic WASD+mouse input at 60 Hz
                 for N seconds and report p50/p99 frame latency (input
                 apply + host draw-build + device render, blocking) plus
                 pipelined throughput. This is the sustained-interactive
                 evidence run.

  --stdin        newline-delimited JSON commands on stdin:
                     {"keys": "w+d", "mouse": [dx, dy]}   input delta
                     {"save": "/tmp/frame.png"}           readback + save
                     {"quit": true}
                 NOTE (axon tunnel only): the first "save" readback
                 permanently switches the tunnel session to eager output
                 readback (~RTT x frame bytes per frame) — save at the end
                 of a session, or restart after saving.
                 each frame answers with one JSON status line on stdout:
                     {"frame": n, "latency_ms": ..., "p50_ms": ..., "p99_ms": ...}

Zero-read serving + the capacity probe: the frame loop defaults to
stats_interval=0 (no device->host reads — required for speed on
readback-hostile transports), which turns off in-loop bin-pair/k-layer
overflow detection. To keep never-drop sizing anyway, startup runs a
CAPACITY PROBE subprocess (own device session): the same scene with
stats ON over a deterministic camera sweep; the capacities its growth
loop settles on are what this process serves with. --probe off skips it.

Usage:
    python demo/serve.py --selftest 10 [--size 1920x1080] [--model PATH]
    python demo/serve.py --stdin [--size 640x360]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REF_ASSETS = "/root/reference/demo/web/assets"


def build_app(width, height, raster, model_path, ibl_path, stats_interval=0,
              p_cap=1 << 19, blend_layers=None, shade_px_cap=None,
              opaque_px_cap=None, shade_px_caps=None, clip_layers=None,
              particle_layers=None):
    import superconductor_tpu as sc
    from superconductor_tpu.assets.fetch import FileClient
    from superconductor_tpu.ecs.app import App
    from superconductor_tpu.ecs.components import Instance, InstanceOf, ModelUrl
    from superconductor_tpu.ecs.resources import NewIblCubemap, RenderSettings
    from superconductor_tpu.ecs.systems import CorePlugin
    from superconductor_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg_kw = {}
    if blend_layers is not None:
        cfg_kw["blend_layers"] = blend_layers
    if shade_px_cap is not None:
        cfg_kw["shade_px_cap"] = shade_px_cap
    if opaque_px_cap is not None:
        cfg_kw["opaque_px_cap"] = opaque_px_cap
    if shade_px_caps is not None:
        cfg_kw["shade_px_caps"] = tuple(shade_px_caps)
    if clip_layers is not None:
        cfg_kw["clip_layers"] = clip_layers
    if particle_layers is not None:
        cfg_kw["particle_layers"] = particle_layers
    app = App()
    app.add_plugin(
        CorePlugin(
            config=sc.RenderConfig(
                width=width, height=height, t_cap=1 << 18, t_cap_anim=1 << 8,
                p_cap=p_cap, raster=raster, **cfg_kw,
            ),
            client=FileClient(),
        )
    )
    w = app.world
    # Zero-read frame loop by default: on the axon tunnel, ONE device->host
    # read permanently drops the session from ~0.2 ms/frame (speculated
    # dispatch) to RTT x output-bytes per frame (~737 ms at 1080p). Size
    # p_cap/blend_layers generously instead (see RenderSettings docstring);
    # pass --stats-interval 1 on directly attached TPUs for full never-drop
    # overflow detection.
    w.resource(RenderSettings).stats_interval = stats_interval
    if ibl_path and os.path.exists(ibl_path):
        w.insert_resource(NewIblCubemap(ibl_path))
    model_e = w.spawn(ModelUrl(model_path))
    w.spawn(Instance(sc.Similarity()), InstanceOf(model_e))
    return app


def _probe_cmd(args, width, height, model_path, ibl):
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--probe-only", "--size", f"{width}x{height}",
        "--raster", args.raster, "--model", model_path, "--ibl", ibl,
    ]
    if args.platform:
        cmd += ["--platform", args.platform]
    return cmd


def capacity_probe(args, width, height, model_path, ibl):
    """Size p_cap/blend_layers for zero-read serving, without reading.

    Runs a SUBPROCESS that renders the same scene with stats ON
    (stats_interval=1) over a deterministic camera sweep and reports the
    capacities the never-drop growth loop settled on. The subprocess owns
    its own device session, so its device->host stats reads cannot
    de-speculate THIS process's session — the serving loop stays
    zero-read at full speed while still being sized from measured
    per-pixel demand rather than guesses. Steady-state scene churn beyond
    what the sweep saw can still exceed the probed caps (documented
    limitation of stats_interval=0; use --stats-interval 1 on directly
    attached TPUs for full never-drop semantics).
    """
    import subprocess

    cmd = _probe_cmd(args, width, height, model_path, ibl)
    try:
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=900,
        )
        line = res.stdout.strip().splitlines()[-1]
        caps = json.loads(line)
        print(json.dumps({"probe": caps}), file=sys.stderr)
        return {
            "p_cap": int(caps["p_cap"]),
            "blend_layers": int(caps["blend_layers"]),
            "shade_px_cap": int(caps.get("shade_px_cap", 0)) or None,
            "opaque_px_cap": int(caps.get("opaque_px_cap", 0)) or None,
            "shade_px_caps": tuple(caps["shade_px_caps"])
            if caps.get("shade_px_caps") else None,
            "clip_layers": caps.get("clip_layers"),
            "particle_layers": caps.get("particle_layers"),
        }
    except Exception as e:  # noqa: BLE001 - probe is best-effort sizing
        print(
            json.dumps({"probe_failed": str(e)[:200]}), file=sys.stderr
        )
        return {"p_cap": 1 << 19}


def probe_only(args, width, height, model_path, ibl):
    """Subprocess body for capacity_probe: stats-on sweep, report caps."""
    from superconductor_tpu.ecs.components import ModelComponent
    from superconductor_tpu.ecs.resources import CameraResource, RenderSettings
    from superconductor_tpu.render.rig import FlyCameraRig

    app = build_app(width, height, args.raster, model_path, ibl,
                    stats_interval=1)
    w = app.world
    cam_res = w.resource(CameraResource)
    rig = FlyCameraRig(position=(6.0, 3.0, 6.0), speed=6.0)
    rig.look_at((6.0, 3.0, 6.0), (0, 0.5, 0))
    rig.pos, rig.yaw, rig.pitch = (
        rig.target_pos.copy(), rig.target_yaw, rig.target_pitch,
    )
    for _ in range(100):
        app.update()
        if any(True for _ in w.components.get(ModelComponent, {}).items()):
            break
    keyset = ["w", "w+d", "w+a", "s", "w+e", "w+q", "d", "a"]
    for n in range(24):
        keys = frozenset(keyset[(n // 3) % len(keyset)].split("+"))
        rig.apply_keys(keys, dt=1 / 60.0, mouse=(15.0 * np.sin(0.3 * n), 0.0))
        cam_res.camera.position, cam_res.camera.rotation = rig.update(1 / 60.0)
        app.update()
    cfg = w.resource(RenderSettings).config
    print(json.dumps({"p_cap": cfg.p_cap, "blend_layers": cfg.blend_layers,
                      "shade_px_cap": cfg.shade_px_cap,
                      "opaque_px_cap": cfg.opaque_px_cap,
                      "shade_px_caps": list(cfg.shade_px_caps)
                      if cfg.shade_px_caps else None,
                      "clip_layers": cfg.clip_layers,
                      "particle_layers": cfg.particle_layers}))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--raster", default="auto")
    ap.add_argument("--model", default=None)
    ap.add_argument("--ibl", default=None)
    ap.add_argument("--selftest", type=float, default=0.0,
                    help="run N seconds of synthetic 60 Hz input and report")
    ap.add_argument("--stdin", action="store_true",
                    help="read JSON input deltas from stdin")
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument(
        "--frames-in-flight", type=int, default=1,
        help="present-queue depth: submit up to N frames before blocking "
        "on the oldest (the swapchain frames-in-flight pattern — wgpu's "
        "default desired_maximum_frame_latency is 2). 1 = fully "
        "synchronous. Latency is still measured submit->ready per frame, "
        "so queue wait is included honestly",
    )
    ap.add_argument(
        "--sync", default="probe", choices=("probe", "block"),
        help="frame completion barrier: 'probe' reads back one texel "
        "(the only honest barrier on the axon tunnel, ~33 ms RTT, "
        "docs/TIMING.md); 'block' trusts block_until_ready (fine on "
        "directly attached devices, lies on the tunnel)",
    )
    ap.add_argument(
        "--stats-interval", type=int, default=0,
        help="device-stats read period for overflow detection (0 = never "
        "read: required for full speed over the axon tunnel, where one "
        "device->host read permanently de-speculates the session; use 1 "
        "on directly attached TPUs)",
    )
    ap.add_argument(
        "--probe", choices=("auto", "off"), default="auto",
        help="capacity probe before zero-read serving: a subprocess (own "
        "device session, so its stats reads can't slow this one) renders "
        "a stats-on camera sweep and the measured p_cap/blend_layers are "
        "used here (auto = when --stats-interval 0)",
    )
    ap.add_argument("--probe-only", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument(
        "--platform", default=None,
        help="force a JAX platform (e.g. cpu). Note the axon TPU plugin "
        "ignores the JAX_PLATFORMS env var, so this uses "
        "jax.config.update, which wins",
    )
    args = ap.parse_args()
    width, height = map(int, args.size.split("x"))

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
    )

    model_path = args.model
    if model_path is None:
        for cand in (
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "tests", "fixtures", "dense_terrain.glb"),
            os.path.join(REF_ASSETS, "models/sponza_cubes.glb"),
        ):
            if os.path.exists(cand):
                model_path = cand
                break
    if model_path is None:
        print("no model found; pass --model", file=sys.stderr)
        return 1
    ibl = args.ibl or os.path.join(REF_ASSETS, "cubemaps/noon.ktx2")

    if args.probe_only:
        return probe_only(args, width, height, model_path, ibl)

    from superconductor_tpu.ecs.components import ModelComponent
    from superconductor_tpu.ecs.resources import CameraResource, FrameOutput
    from superconductor_tpu.render.rig import FlyCameraRig

    probed = {"p_cap": 1 << 19}
    if args.stats_interval == 0 and args.probe == "auto":
        probed = capacity_probe(args, width, height, model_path, ibl)

    app = build_app(width, height, args.raster, model_path, ibl,
                    stats_interval=args.stats_interval, **probed)
    w = app.world
    cam_res = w.resource(CameraResource)
    rig = FlyCameraRig(position=(6.0, 3.0, 6.0), speed=6.0)
    rig.look_at((6.0, 3.0, 6.0), (0, 0.5, 0))
    rig.pos = rig.target_pos.copy()
    rig.yaw, rig.pitch = rig.target_yaw, rig.target_pitch

    from superconductor_tpu.render.present import (
        PresentQueue,
        block_sync,
        probe_sync,
    )

    out = w.resource(FrameOutput)
    dt = 1.0 / 60.0
    depth = max(1, args.frames_in_flight)
    queue = PresentQueue(
        depth, sync=probe_sync if args.sync == "probe" else block_sync
    )

    def present(keys=frozenset(), mouse=(0.0, 0.0)):
        """One present-loop iteration: apply input, run the ECS schedule,
        submit the frame. Returns the completed (oldest in-flight)
        frame's input-to-ready latency in seconds, or None while the
        present queue is still filling (see PresentQueue)."""
        t0 = time.time()
        rig.apply_keys(keys, dt=dt, mouse=mouse)
        cam_res.camera.position, cam_res.camera.rotation = rig.update(dt)
        app.update()
        return queue.submit(out.image, t_start=t0)

    drain = queue.drain

    # warmup: model load (async) + jit compile
    for _ in range(100):
        app.update()
        if any(True for _ in w.components.get(ModelComponent, {}).items()):
            break
    for _ in range(args.warmup):
        present()
    list(drain())  # enter the measured loop with an empty present queue

    if args.selftest > 0:
        keyset = ["w", "w", "w+d", "w+d", "w+a", "s", "w+e", "w+q"]
        lat = []
        t_start = time.time()
        n = 0
        while time.time() - t_start < args.selftest:
            keys = frozenset(keyset[(n // 30) % len(keyset)].split("+"))
            mouse = (1.1 * np.sin(0.02 * n), 0.35 * np.cos(0.013 * n))
            s = present(keys, mouse)
            if s is not None:
                lat.append(s)
            n += 1
        lat.extend(drain())
        total = time.time() - t_start
        lat_ms = np.array(lat) * 1e3
        report = {
            "mode": "selftest",
            "frames": n,
            "frames_in_flight": depth,
            "sync": args.sync,
            "seconds": round(total, 2),
            "fps": round(n / total, 1),
            "latency_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "latency_p90_ms": round(float(np.percentile(lat_ms, 90)), 2),
            "latency_p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "latency_max_ms": round(float(lat_ms.max()), 2),
            "size": f"{width}x{height}",
            "sustained_60fps": bool(n / total >= 60.0),
        }
        print(json.dumps(report))
        return 0

    if args.stdin:
        lat_hist = []
        n = 0
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                cmd = json.loads(line)
            except json.JSONDecodeError:
                print(json.dumps({"error": "bad json"}), flush=True)
                continue
            if cmd.get("quit"):
                break
            if "save" in cmd:
                import imageio.v3 as iio

                lat_hist.extend(s * 1e3 for s in drain())  # newest frame
                iio.imwrite(cmd["save"], np.asarray(out.image)[0])
                print(json.dumps({"saved": cmd["save"]}), flush=True)
                continue
            keys = frozenset(
                k for k in str(cmd.get("keys", "")).split("+") if k
            )
            mouse = tuple(cmd.get("mouse", (0.0, 0.0)))
            s = present(keys, mouse)
            n += 1
            if s is None:  # pipeline still filling
                print(json.dumps({"frame": n, "queued": True}), flush=True)
                continue
            lat_hist.append(s * 1e3)
            hist = np.array(lat_hist[-600:])
            print(
                json.dumps(
                    {
                        "frame": n,
                        "latency_ms": round(s * 1e3, 2),
                        "p50_ms": round(float(np.percentile(hist, 50)), 2),
                        "p99_ms": round(float(np.percentile(hist, 99)), 2),
                    }
                ),
                flush=True,
            )
        return 0

    print("pass --selftest N or --stdin", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
