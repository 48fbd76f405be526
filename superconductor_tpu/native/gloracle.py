"""Independent forward-rendering oracle: llvmpipe GL + GLSL shaders.

The engine's two rasterizers (ops/raster_ref.py and ops/raster_pallas.py)
share their setup and shading code, so cross-checking them cannot catch a
shared shading-math bug. This module renders the same scene through a
THIRD, fully independent pipeline — Mesa's software GL rasterizer with
the lighting model re-implemented in GLSL from the same published
equations the reference's shaders use (nonlinear L1 SH irradiance,
shared-structs/src/lib.rs:357-388; GGX dominant-direction specular,
shaders/src/lib.rs:777-815; Narkowicz ACES + gamma-2.2, lib.rs:616-624).

Used by tests/test_gl_oracle.py as the external visual-parity evidence
standing in for "PSNR vs wgpu reference frames" (no wgpu/cargo exists in
this environment; llvmpipe is the same class of oracle the repo already
uses for compressed-texture decode).
"""

from __future__ import annotations

import os
import sys

import numpy as np

# PyOpenGL must resolve the current context through EGL (the default GLX
# platform sees no context for our surfaceless EGL setup). Must be set
# before any OpenGL import anywhere in the process.
if "OpenGL" not in sys.modules:
    os.environ.setdefault("PYOPENGL_PLATFORM", "egl")

VERT_SRC = b"""
#version 330 core
layout(location = 0) in vec3 in_pos;
layout(location = 1) in vec3 in_normal;
layout(location = 2) in vec2 in_uv;
layout(location = 3) in vec4 in_joints;
layout(location = 4) in vec4 in_weights;
uniform mat4 u_view_proj;
uniform vec3 u_translation;
uniform float u_scale;
uniform vec4 u_quat;
// Similarity joint palette (animated_vertex parity, lib.rs:64-127):
// u_joint_ts[i].xyz = translation, .w = uniform scale; u_joint_q[i] = quat
uniform int u_skinned;
uniform vec4 u_joint_ts[128];
uniform vec4 u_joint_q[128];
out vec3 v_world;
out vec3 v_normal;
out vec2 v_uv;

vec3 quat_rotate(vec4 q, vec3 v) {
    vec3 t = 2.0 * cross(q.xyz, v);
    return v + q.w * t + cross(q.xyz, t);
}

void main() {
    vec3 pos = in_pos;
    vec3 nrm = in_normal;
    if (u_skinned != 0) {
        vec4 w = in_weights / dot(in_weights, vec4(1.0));
        vec3 p = vec3(0.0);
        vec3 n = vec3(0.0);
        for (int k = 0; k < 4; ++k) {
            int j = int(in_joints[k] + 0.5);
            vec4 ts = u_joint_ts[j];
            vec4 q = u_joint_q[j];
            p += w[k] * (ts.xyz + ts.w * quat_rotate(q, pos));
            n += w[k] * quat_rotate(q, nrm);
        }
        pos = p;
        nrm = n;
    }
    vec3 world = u_translation + u_scale * quat_rotate(u_quat, pos);
    v_world = world;
    v_normal = quat_rotate(u_quat, nrm);
    v_uv = in_uv;
    gl_Position = u_view_proj * vec4(world, 1.0);
}
"""

FRAG_SRC = b"""
#version 330 core
in vec3 v_world;
in vec3 v_normal;
in vec2 v_uv;
out vec4 frag;
uniform int u_has_tex;
uniform sampler2D u_tex;
uniform int u_has_nrm;
uniform sampler2D u_nrm;
uniform float u_normal_scale;
uniform vec4 u_base_color;
uniform float u_metallic;
uniform float u_roughness;
uniform int u_unlit;
uniform int u_clip;
uniform float u_alpha_cutoff;
uniform vec3 u_eye;
uniform vec3 u_sh0;
uniform vec3 u_sh1x;
uniform vec3 u_sh1y;
uniform vec3 u_sh1z;
// per-pixel SH from a 3D light volume (sample_spherical_harmonics,
// lib.rs:204-250): L0 raw, L1 x/y/z decoded with *255/127 - 128/127
uniform int u_has_lightvol;
uniform sampler3D u_lv0;
uniform sampler3D u_lvx;
uniform sampler3D u_lvy;
uniform sampler3D u_lvz;
uniform vec3 u_probes_bl;
uniform vec3 u_probes_scale;

// Nonlinear L1 SH irradiance, per channel (the reference's
// eval_spherical_harmonics_nonlinear).
float sh_eval_channel(float r0, vec3 r1, vec3 n) {
    float len = length(r1) + 1e-10;
    float a = (1.0 - len) / (1.0 + len);
    float p = 1.0 + 2.0 * len;
    float q = max(0.5 * (1.0 + dot(r1, n)), 0.0);
    return r0 * (a + (1.0 - a) * (p + 1.0) * pow(q, p));
}

// 'Normal Mapping Without Precomputed Tangents' with hardware ddx/ddy --
// the reference's compute_cotangent_frame (lib.rs:571-587); the engine
// builds the same frame from analytic derivatives.
vec3 cotangent_normal(vec3 n, vec3 map_n, vec3 pos, vec2 uv) {
    vec3 dpdx = dFdx(pos), dpdy = dFdy(pos);
    vec2 duvdx = dFdx(uv), duvdy = dFdy(uv);
    vec3 dp2perp = cross(dpdy, n);
    vec3 dp1perp = cross(n, dpdx);
    vec3 t = dp2perp * duvdx.x + dp1perp * duvdy.x;
    vec3 b = dp2perp * duvdx.y + dp1perp * duvdy.y;
    float invmax = inversesqrt(max(max(dot(t, t), dot(b, b)), 1e-20));
    return normalize((t * map_n.x + b * map_n.y) * invmax + n * map_n.z);
}

vec3 aces(vec3 x) {
    return clamp((x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14),
                 0.0, 1.0);
}

void main() {
    vec4 tex = (u_has_tex != 0) ? texture(u_tex, v_uv) : vec4(1.0);
    vec3 albedo = u_base_color.rgb * tex.rgb;
    float alpha = u_base_color.a * tex.a;
    // alpha test after all sampling, like fragment_alpha_clipped
    // (lib.rs:405-407); the engine tests the same sampled albedo alpha
    if (u_clip != 0 && alpha < u_alpha_cutoff) discard;
    if (u_unlit != 0) {
        frag = vec4(pow(clamp(albedo, 0.0, 1.0), vec3(1.0 / 2.2)), alpha);
        return;
    }
    vec3 n = normalize(v_normal);
    if (!gl_FrontFacing) n = -n;
    if (u_has_nrm != 0) {
        vec3 mn = texture(u_nrm, v_uv).rgb * (255.0 / 127.0)
                  - (128.0 / 127.0);
        mn.xy *= u_normal_scale;
        mn = normalize(mn);
        n = cotangent_normal(n, mn, v_world, v_uv);
    }
    vec3 view = normalize(u_eye - v_world);

    vec3 sh0 = u_sh0, sh1x = u_sh1x, sh1y = u_sh1y, sh1z = u_sh1z;
    if (u_has_lightvol != 0) {
        vec3 pr = (v_world - u_probes_bl) / u_probes_scale;
        const float sc = 255.0 / 127.0;
        const float bi = -128.0 / 127.0;
        sh0 = texture(u_lv0, pr).rgb;
        sh1x = texture(u_lvx, pr).rgb * sc + bi;
        sh1y = texture(u_lvy, pr).rgb * sc + bi;
        sh1z = texture(u_lvz, pr).rgb * sc + bi;
    }

    // SH channel direction vectors: r1_for_channel_c = (sh1x[c], sh1y[c],
    // sh1z[c]).
    vec3 r1r = vec3(sh1x.r, sh1y.r, sh1z.r);
    vec3 r1g = vec3(sh1x.g, sh1y.g, sh1z.g);
    vec3 r1b = vec3(sh1x.b, sh1y.b, sh1z.b);

    vec3 irradiance = vec3(sh_eval_channel(sh0.r, r1r, n),
                           sh_eval_channel(sh0.g, r1g, n),
                           sh_eval_channel(sh0.b, r1b, n));
    vec3 diffuse = albedo * (1.0 - u_metallic) * irradiance;

    // Dominant-direction GGX specular approximation
    // (spherical_harmonics_specular_approximation), with sh0 boosted by
    // pi^2 as the reference does before specular.
    vec3 sh0_boost = sh0 * (3.14159265 * 3.14159265);
    vec3 avg_dir = (r1r + r1g + r1b) / 3.0;
    float dir_len = length(avg_dir) + 1e-10;
    float smoothness = 1.0 - u_roughness;
    float adj_smooth = smoothness * sqrt(dir_len);
    float arp = 1.0 - adj_smooth;
    float rough = arp * arp;
    vec3 l = avg_dir / dir_len;
    vec3 strength = sh0_boost * dir_len;

    vec3 h = normalize(view + l);
    float ndv = max(dot(n, view), 1e-4);
    float ndl = max(dot(n, l), 0.0);
    float ndh = max(dot(n, h), 0.0);
    float vdh = max(dot(view, h), 0.0);
    float a2 = rough * rough;
    float denom = ndh * ndh * (a2 - 1.0) + 1.0;
    float D = a2 / max(3.14159265 * denom * denom, 1e-8);
    float lv = ndl * sqrt(ndv * ndv * (1.0 - a2) + a2);
    float ll = ndv * sqrt(ndl * ndl * (1.0 - a2) + a2);
    float V = 0.5 / max(lv + ll, 1e-8);
    vec3 f0 = mix(vec3(0.04), albedo, u_metallic);
    vec3 F = f0 + (1.0 - f0) * pow(1.0 - vdh, 5.0);
    vec3 specular = (D * V) * F * strength * ndl;

    vec3 lit = diffuse + specular;
    lit = aces(lit);
    lit = pow(clamp(lit, 0.0, 1.0), vec3(1.0 / 2.2));
    frag = vec4(lit, alpha);
}
"""


SKY_VERT_SRC = b"""
#version 330 core
out vec2 v_ndc;
void main() {
    // fullscreen triangle (fullscreen_tri, lib.rs:589-599)
    vec2 pos = vec2((gl_VertexID << 1) & 2, gl_VertexID & 2) * 2.0 - 1.0;
    v_ndc = pos;
    gl_Position = vec4(pos, 0.0, 1.0);
}
"""

SKY_FRAG_SRC = b"""
#version 330 core
in vec2 v_ndc;
out vec4 frag;
uniform samplerCube u_cube;
uniform mat4 u_proj_inv;
uniform vec4 u_view_quat;

vec3 quat_rotate(vec4 q, vec3 v) {
    vec3 t = 2.0 * cross(q.xyz, v);
    return v + q.w * t + cross(q.xyz, t);
}

vec3 aces(vec3 x) {
    return clamp((x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14),
                 0.0, 1.0);
}

void main() {
    // ray = view_rotation * (projection_inverse @ [ndc, 0, 1]).xyz
    // (vertex_skybox, lib.rs:671-710; ops/sky.py skybox_rays)
    vec4 unproj = u_proj_inv * vec4(v_ndc, 0.0, 1.0);
    vec3 ray = quat_rotate(u_view_quat, unproj.xyz);
    vec3 rgb = texture(u_cube, ray).rgb;
    rgb = aces(rgb);
    rgb = pow(clamp(rgb, 0.0, 1.0), vec3(1.0 / 2.2));
    frag = vec4(rgb, 1.0);
}
"""


LINE_VERT_SRC = b"""
#version 330 core
// Engine-pixel-space line-quad corners: (px, py top-down, depth [0,1]).
// With glClipControl(LOWER_LEFT, ZERO_TO_ONE) the z passes through as the
// [0,1] reverse-z depth the engine uses.
layout(location = 0) in vec3 in_pxz;
uniform vec2 u_size;
void main() {
    vec2 ndc = vec2(in_pxz.x / u_size.x * 2.0 - 1.0,
                    1.0 - in_pxz.y / u_size.y * 2.0);
    gl_Position = vec4(ndc, in_pxz.z, 1.0);
}
"""

LINE_FRAG_SRC = b"""
#version 330 core
// flat_colour (shaders/src/lib.rs:712-732): constant palette color, no
// tonemap (the engine writes the palette value to the display buffer).
out vec4 frag;
uniform vec3 u_color;
void main() { frag = vec4(u_color, 1.0); }
"""

PARTICLE_VERT_SRC = b"""
#version 330 core
layout(location = 0) in vec3 in_world;  // camera-facing quad corner (world)
layout(location = 1) in vec2 in_uv;
uniform mat4 u_view_proj;
out vec2 v_uv;
out vec3 v_world;
void main() {
    v_uv = in_uv;
    v_world = in_world;
    gl_Position = u_view_proj * vec4(in_world, 1.0);
}
"""

PARTICLE_FRAG_SRC = b"""
#version 330 core
// The 6-way smoke lighting model (particle_fragment, shaders/src/
// lib.rs:873-972): smoke map A carries left/bottom/front/emissive, map B
// right/top/back/alpha; the hemisphere maps are selected along the SH
// dominant light direction expressed in the quad's tangent space and
// weighted by the squared direction components; directional + ambient mix
// from the SH L0/L1 lengths; emissive from the scalar or a LUT row.
in vec2 v_uv;
in vec3 v_world;
out vec4 frag;
uniform sampler2D u_smoke_a;
uniform sampler2D u_smoke_b;
uniform sampler2D u_lut;   // SRGB8_ALPHA8: GL decodes on sample, like the
                           // engine's TEXFLAG_SRGB
uniform vec3 u_sh0;
uniform vec3 u_sh1x;
uniform vec3 u_sh1y;
uniform vec3 u_sh1z;
uniform vec3 u_eye;
uniform vec3 u_center;
uniform vec3 u_cam_right;
uniform vec3 u_cam_down;
uniform vec3 u_colour;
uniform vec3 u_emissive;
uniform int u_use_lut;
uniform float u_lut_y;

vec3 aces(vec3 x) {
    return clamp((x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14),
                 0.0, 1.0);
}

void main() {
    vec4 a = texture(u_smoke_a, v_uv);
    vec4 b = texture(u_smoke_b, v_uv);
    float m_left = a.r, m_bottom = a.g, m_front = a.b, emissive_s = a.a;
    float m_right = b.r, m_top = b.g, m_back = b.b, alpha = b.a;

    vec3 r1r = vec3(u_sh1x.r, u_sh1y.r, u_sh1z.r);
    vec3 r1g = vec3(u_sh1x.g, u_sh1y.g, u_sh1z.g);
    vec3 r1b = vec3(u_sh1x.b, u_sh1y.b, u_sh1z.b);
    vec3 rgb_len = vec3(length(r1r), length(r1g), length(r1b));
    float avg_len = (rgb_len.r + rgb_len.g + rgb_len.b) / 3.0;
    vec3 avg_dir = ((r1r + r1g + r1b) / 3.0) / max(avg_len, 1e-8);

    vec3 n = normalize(u_eye - u_center);
    vec3 t = normalize(cross(u_cam_down, n));
    vec3 bt = normalize(cross(n, u_cam_right));
    vec3 lts = vec3(dot(t, avg_dir), dot(bt, avg_dir), dot(n, avg_dir));

    float hm = (lts.x > 0.0) ? m_left : m_right;
    float vm = (lts.y > 0.0) ? m_top : m_bottom;
    float zm = (lts.z > 0.0) ? m_front : m_back;
    float light_map = hm * lts.x * lts.x + vm * lts.y * lts.y
                    + zm * lts.z * lts.z;

    vec3 directional = u_sh0 * rgb_len;
    vec3 ambient = u_sh0 * 0.2 * (1.0 - rgb_len);
    vec3 lut = texture(u_lut, vec2(emissive_s, u_lut_y)).rgb;
    vec3 emission = ((u_use_lut != 0) ? lut : vec3(emissive_s)) * u_emissive;

    vec3 outc = (directional * light_map + ambient) * u_colour + emission;
    outc = aces(outc);
    outc = pow(clamp(outc, 0.0, 1.0), vec3(1.0 / 2.2));
    frag = vec4(outc, alpha);
}
"""


class GlForwardRenderer:
    """Offscreen GL renderer matching the engine's frame conventions:
    wgpu-style [0,1] reverse-z clip (glClipControl), row 0 = top."""

    def __init__(self, width: int, height: int):
        from .gldecode import _get, _lock

        self._lock = _lock
        with _lock:
            _get()  # surfaceless EGL context, made current
        import OpenGL.GL as gl

        self.gl = gl
        self.width = width
        self.height = height
        with _lock:
            self._setup()

    def _setup(self):
        gl = self.gl
        self.fbo = gl.glGenFramebuffers(1)
        gl.glBindFramebuffer(gl.GL_FRAMEBUFFER, self.fbo)
        self.color = gl.glGenTextures(1)
        gl.glBindTexture(gl.GL_TEXTURE_2D, self.color)
        gl.glTexImage2D(gl.GL_TEXTURE_2D, 0, gl.GL_RGBA8, self.width,
                        self.height, 0, gl.GL_RGBA, gl.GL_UNSIGNED_BYTE, None)
        gl.glFramebufferTexture2D(gl.GL_FRAMEBUFFER, gl.GL_COLOR_ATTACHMENT0,
                                  gl.GL_TEXTURE_2D, self.color, 0)
        self.depth = gl.glGenRenderbuffers(1)
        gl.glBindRenderbuffer(gl.GL_RENDERBUFFER, self.depth)
        gl.glRenderbufferStorage(gl.GL_RENDERBUFFER, gl.GL_DEPTH_COMPONENT32F,
                                 self.width, self.height)
        gl.glFramebufferRenderbuffer(gl.GL_FRAMEBUFFER, gl.GL_DEPTH_ATTACHMENT,
                                     gl.GL_RENDERBUFFER, self.depth)
        assert (gl.glCheckFramebufferStatus(gl.GL_FRAMEBUFFER)
                == gl.GL_FRAMEBUFFER_COMPLETE)

        def compile_shader(src, kind):
            s = gl.glCreateShader(kind)
            gl.glShaderSource(s, src)
            gl.glCompileShader(s)
            if not gl.glGetShaderiv(s, gl.GL_COMPILE_STATUS):
                raise RuntimeError(gl.glGetShaderInfoLog(s).decode())
            return s

        self.prog = gl.glCreateProgram()
        gl.glAttachShader(self.prog, compile_shader(VERT_SRC, gl.GL_VERTEX_SHADER))
        gl.glAttachShader(self.prog, compile_shader(FRAG_SRC, gl.GL_FRAGMENT_SHADER))
        gl.glLinkProgram(self.prog)
        if not gl.glGetProgramiv(self.prog, gl.GL_LINK_STATUS):
            raise RuntimeError(gl.glGetProgramInfoLog(self.prog).decode())
        self.vao = gl.glGenVertexArrays(1)

    def render_skybox(
        self,
        faces,  # 6 x (S, S, 4) float32 linear RGBA, order +X -X +Y -Y +Z -Z
        projection_inverse: np.ndarray,  # (4, 4)
        view_quat: np.ndarray,  # (4,) camera rotation quaternion
    ) -> np.ndarray:
        """Skybox-only frame through GL's samplerCube (the cubemap gather
        oracle): same inverse-projection ray + ACES + gamma as the engine's
        ops/sky.py. Returns (H, W, 4) u8, row 0 = top."""
        with self._lock:
            gl = self.gl
            if not hasattr(self, "sky_prog"):
                self.sky_prog = self._link(SKY_VERT_SRC, SKY_FRAG_SRC)
            gl.glBindFramebuffer(gl.GL_FRAMEBUFFER, self.fbo)
            gl.glViewport(0, 0, self.width, self.height)
            gl.glDisable(gl.GL_DEPTH_TEST)
            gl.glDisable(gl.GL_BLEND)
            gl.glDisable(gl.GL_CULL_FACE)
            gl.glUseProgram(self.sky_prog)
            gl.glBindVertexArray(self.vao)
            for a in range(5):
                gl.glDisableVertexAttribArray(a)

            tex = gl.glGenTextures(1)
            gl.glActiveTexture(gl.GL_TEXTURE0)
            gl.glBindTexture(gl.GL_TEXTURE_CUBE_MAP, tex)
            for f, img in enumerate(faces):
                img = np.ascontiguousarray(img, np.float32)
                s = img.shape[0]
                gl.glTexImage2D(
                    gl.GL_TEXTURE_CUBE_MAP_POSITIVE_X + f, 0, gl.GL_RGBA32F,
                    s, s, 0, gl.GL_RGBA, gl.GL_FLOAT, img,
                )
            for p, v in (
                (gl.GL_TEXTURE_MIN_FILTER, gl.GL_LINEAR),
                (gl.GL_TEXTURE_MAG_FILTER, gl.GL_LINEAR),
                (gl.GL_TEXTURE_WRAP_S, gl.GL_CLAMP_TO_EDGE),
                (gl.GL_TEXTURE_WRAP_T, gl.GL_CLAMP_TO_EDGE),
                (gl.GL_TEXTURE_WRAP_R, gl.GL_CLAMP_TO_EDGE),
            ):
                gl.glTexParameteri(gl.GL_TEXTURE_CUBE_MAP, p, v)

            loc = lambda n: gl.glGetUniformLocation(self.sky_prog, n)
            gl.glUniform1i(loc("u_cube"), 0)
            gl.glUniformMatrix4fv(loc("u_proj_inv"), 1, gl.GL_TRUE,
                                  np.asarray(projection_inverse, np.float32))
            gl.glUniform4fv(loc("u_view_quat"), 1,
                            np.asarray(view_quat, np.float32))
            gl.glDrawArrays(gl.GL_TRIANGLES, 0, 3)
            out = gl.glReadPixels(0, 0, self.width, self.height, gl.GL_RGBA,
                                  gl.GL_UNSIGNED_BYTE)
            gl.glDeleteTextures(1, [tex])
            gl.glEnable(gl.GL_DEPTH_TEST)
            img = np.frombuffer(out, np.uint8).reshape(
                self.height, self.width, 4
            )
            return img[::-1].copy()

    def _link(self, vert_src, frag_src):
        gl = self.gl

        def compile_shader(src, kind):
            s = gl.glCreateShader(kind)
            gl.glShaderSource(s, src)
            gl.glCompileShader(s)
            if not gl.glGetShaderiv(s, gl.GL_COMPILE_STATUS):
                raise RuntimeError(gl.glGetShaderInfoLog(s).decode())
            return s

        prog = gl.glCreateProgram()
        gl.glAttachShader(prog, compile_shader(vert_src, gl.GL_VERTEX_SHADER))
        gl.glAttachShader(prog, compile_shader(frag_src, gl.GL_FRAGMENT_SHADER))
        gl.glLinkProgram(prog)
        if not gl.glGetProgramiv(prog, gl.GL_LINK_STATUS):
            raise RuntimeError(gl.glGetProgramInfoLog(prog).decode())
        return prog

    def render(
        self,
        draws,
        view_proj: np.ndarray,
        eye: np.ndarray,
        sh: np.ndarray,  # (4, 3) [L0, L1x, L1y, L1z] rgb
        clear_color=(0.0, 0.0, 0.0, 1.0),
        lightvol=None,  # ([4 x (D,S,S,4) f32], bottom_left, scale)
        lines=None,  # list of {corners (4,3) px/py/depth, color (3,)}
        particles=None,  # {"smoke": (a,b,lut u8 imgs), "draws": [dict]}
    ) -> np.ndarray:
        """draws: list of dicts {positions (V,3), normals (V,3), indices
        (I,), base_color (4,), metallic, roughness, unlit, double_sided,
        translation (3,), scale, quat (4,)}. Returns (H, W, 4) u8,
        row 0 = top.

        lines: flat-color screen-space line quads (engine pixel coords,
        reverse-z depth), depth-tested against the scene — the flat_colour
        pipeline oracle. particles: camera-facing smoke quads drawn
        back-to-front with src-alpha blending after the scene — the 6-way
        smoke model oracle; each draw dict has corners (4,3) world, uvs
        (4,2), center, colour, emissive_colour, use_emissive_lut, lut_y."""
        with self._lock:
            return self._render(draws, view_proj, eye, sh, clear_color,
                                lightvol, lines, particles)

    def _render(self, draws, view_proj, eye, sh, clear_color, lightvol=None,
                lines=None, particles=None):
        gl = self.gl
        gl.glBindFramebuffer(gl.GL_FRAMEBUFFER, self.fbo)
        gl.glViewport(0, 0, self.width, self.height)
        # wgpu-style [0,1] depth range + reverse-z
        gl.glClipControl(gl.GL_LOWER_LEFT, gl.GL_ZERO_TO_ONE)
        gl.glEnable(gl.GL_DEPTH_TEST)
        gl.glDepthFunc(gl.GL_GREATER)
        gl.glDepthMask(gl.GL_TRUE)  # a blended draw may have left it off
        gl.glDisable(gl.GL_BLEND)
        gl.glClearDepth(0.0)
        gl.glClearColor(*clear_color)
        gl.glClear(gl.GL_COLOR_BUFFER_BIT | gl.GL_DEPTH_BUFFER_BIT)
        gl.glUseProgram(self.prog)
        gl.glBindVertexArray(self.vao)
        textures = []

        loc = lambda n: gl.glGetUniformLocation(self.prog, n)
        gl.glUniformMatrix4fv(loc("u_view_proj"), 1, gl.GL_TRUE,
                              np.asarray(view_proj, np.float32))
        gl.glUniform3fv(loc("u_eye"), 1, np.asarray(eye, np.float32))
        sh = np.asarray(sh, np.float32)
        gl.glUniform3fv(loc("u_sh0"), 1, sh[0])
        gl.glUniform3fv(loc("u_sh1x"), 1, sh[1])
        gl.glUniform3fv(loc("u_sh1y"), 1, sh[2])
        gl.glUniform3fv(loc("u_sh1z"), 1, sh[3])

        # optional 3D light volume: 4 (D, S, S, 4) float32 arrays, sampled
        # per pixel with the same rescale + snorm decode as the engine.
        # The sampler3D uniforms must ALWAYS point at dedicated units: left
        # at the default unit 0 they alias the sampler2Ds, which is invalid
        # GL state even when unused (every draw errors).
        for unit, name in enumerate(("u_lv0", "u_lvx", "u_lvy", "u_lvz"),
                                    start=4):
            gl.glUniform1i(loc(name), unit)
        gl.glUniform1i(loc("u_has_lightvol"), 1 if lightvol else 0)
        if lightvol:
            vols, bl, scale = lightvol
            for unit, (name, vol) in enumerate(
                zip(("u_lv0", "u_lvx", "u_lvy", "u_lvz"), vols), start=4
            ):
                tex = gl.glGenTextures(1)
                textures.append(tex)
                gl.glActiveTexture(gl.GL_TEXTURE0 + unit)
                gl.glBindTexture(gl.GL_TEXTURE_3D, tex)
                vol = np.ascontiguousarray(vol, np.float32)
                d, h, w = vol.shape[:3]
                gl.glTexImage3D(gl.GL_TEXTURE_3D, 0, gl.GL_RGBA32F, w, h, d,
                                0, gl.GL_RGBA, gl.GL_FLOAT, vol)
                for p, v in (
                    (gl.GL_TEXTURE_MIN_FILTER, gl.GL_LINEAR),
                    (gl.GL_TEXTURE_MAG_FILTER, gl.GL_LINEAR),
                    (gl.GL_TEXTURE_WRAP_S, gl.GL_CLAMP_TO_EDGE),
                    (gl.GL_TEXTURE_WRAP_T, gl.GL_CLAMP_TO_EDGE),
                    (gl.GL_TEXTURE_WRAP_R, gl.GL_CLAMP_TO_EDGE),
                ):
                    gl.glTexParameteri(gl.GL_TEXTURE_3D, p, v)
                gl.glUniform1i(loc(name), unit)
            gl.glUniform3fv(loc("u_probes_bl"), 1,
                            np.asarray(bl, np.float32))
            gl.glUniform3fv(loc("u_probes_scale"), 1,
                            np.asarray(scale, np.float32))

        buffers = []
        for d in draws:
            pos = np.ascontiguousarray(d["positions"], np.float32)
            nrm = np.ascontiguousarray(d["normals"], np.float32)
            uv = np.ascontiguousarray(
                d.get("uvs", np.zeros((len(pos), 2))), np.float32
            )
            idx = np.ascontiguousarray(d["indices"], np.uint32)
            vbo = gl.glGenBuffers(1)
            nbo = gl.glGenBuffers(1)
            ubo = gl.glGenBuffers(1)
            ibo = gl.glGenBuffers(1)
            buffers += [vbo, nbo, ubo, ibo]
            gl.glBindBuffer(gl.GL_ARRAY_BUFFER, vbo)
            gl.glBufferData(gl.GL_ARRAY_BUFFER, pos.nbytes, pos, gl.GL_STATIC_DRAW)
            gl.glEnableVertexAttribArray(0)
            gl.glVertexAttribPointer(0, 3, gl.GL_FLOAT, gl.GL_FALSE, 0, None)
            gl.glBindBuffer(gl.GL_ARRAY_BUFFER, nbo)
            gl.glBufferData(gl.GL_ARRAY_BUFFER, nrm.nbytes, nrm, gl.GL_STATIC_DRAW)
            gl.glEnableVertexAttribArray(1)
            gl.glVertexAttribPointer(1, 3, gl.GL_FLOAT, gl.GL_FALSE, 0, None)
            gl.glBindBuffer(gl.GL_ARRAY_BUFFER, ubo)
            gl.glBufferData(gl.GL_ARRAY_BUFFER, uv.nbytes, uv, gl.GL_STATIC_DRAW)
            gl.glEnableVertexAttribArray(2)
            gl.glVertexAttribPointer(2, 2, gl.GL_FLOAT, gl.GL_FALSE, 0, None)
            gl.glBindBuffer(gl.GL_ELEMENT_ARRAY_BUFFER, ibo)
            gl.glBufferData(gl.GL_ELEMENT_ARRAY_BUFFER, idx.nbytes, idx,
                            gl.GL_STATIC_DRAW)

            # Textures: the caller passes the ENGINE's mip chains (finest
            # first, (h, w, 4) u8, linear color) so only the sampling logic
            # — not mip generation — is being compared.
            def upload_chain(chain, unit, sampler_name, has_name):
                gl.glUniform1i(loc(has_name), 1 if chain is not None else 0)
                if chain is None:
                    return
                tex = gl.glGenTextures(1)
                textures.append(tex)
                gl.glActiveTexture(gl.GL_TEXTURE0 + unit)
                gl.glBindTexture(gl.GL_TEXTURE_2D, tex)
                for lvl, img in enumerate(chain):
                    img = np.ascontiguousarray(img, np.uint8)
                    h, w = img.shape[:2]
                    gl.glTexImage2D(gl.GL_TEXTURE_2D, lvl, gl.GL_RGBA8, w, h,
                                    0, gl.GL_RGBA, gl.GL_UNSIGNED_BYTE, img)
                gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MAX_LEVEL,
                                   len(chain) - 1)
                gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MIN_FILTER,
                                   gl.GL_LINEAR_MIPMAP_LINEAR)
                gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MAG_FILTER,
                                   gl.GL_LINEAR)
                gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_WRAP_S,
                                   gl.GL_REPEAT)
                gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_WRAP_T,
                                   gl.GL_REPEAT)
                gl.glUniform1i(loc(sampler_name), unit)

            upload_chain(d.get("tex_chain"), 0, "u_tex", "u_has_tex")
            upload_chain(d.get("nrm_chain"), 1, "u_nrm", "u_has_nrm")
            gl.glUniform1f(loc("u_normal_scale"),
                           float(d.get("normal_scale", 1.0)))

            # joint-palette skinning: "joints" (V,4), "weights" (V,4),
            # "palette" (J,8) packed Similarity rows
            palette = d.get("palette")
            gl.glUniform1i(loc("u_skinned"), 1 if palette is not None else 0)
            if palette is not None:
                pal = np.asarray(palette, np.float32)
                ts = np.ascontiguousarray(pal[:, 0:4])
                q = np.ascontiguousarray(pal[:, 4:8])
                gl.glUniform4fv(loc("u_joint_ts"), len(pal), ts)
                gl.glUniform4fv(loc("u_joint_q"), len(pal), q)
                joints = np.ascontiguousarray(d["joints"], np.float32)
                weights = np.ascontiguousarray(d["weights"], np.float32)
                jbo = gl.glGenBuffers(1)
                wbo = gl.glGenBuffers(1)
                buffers += [jbo, wbo]
                gl.glBindBuffer(gl.GL_ARRAY_BUFFER, jbo)
                gl.glBufferData(gl.GL_ARRAY_BUFFER, joints.nbytes, joints,
                                gl.GL_STATIC_DRAW)
                gl.glEnableVertexAttribArray(3)
                gl.glVertexAttribPointer(3, 4, gl.GL_FLOAT, gl.GL_FALSE, 0,
                                         None)
                gl.glBindBuffer(gl.GL_ARRAY_BUFFER, wbo)
                gl.glBufferData(gl.GL_ARRAY_BUFFER, weights.nbytes, weights,
                                gl.GL_STATIC_DRAW)
                gl.glEnableVertexAttribArray(4)
                gl.glVertexAttribPointer(4, 4, gl.GL_FLOAT, gl.GL_FALSE, 0,
                                         None)
            else:
                gl.glDisableVertexAttribArray(3)
                gl.glDisableVertexAttribArray(4)

            if d.get("double_sided", False):
                gl.glDisable(gl.GL_CULL_FACE)
            else:
                gl.glEnable(gl.GL_CULL_FACE)
                gl.glCullFace(gl.GL_BACK)
            # alpha-blend draws: src-alpha over, depth test on, write off
            # (the reference's alpha_blended pipeline blend/depth state);
            # the caller is responsible for back-to-front draw order
            if d.get("blend", False):
                gl.glEnable(gl.GL_BLEND)
                gl.glBlendFunc(gl.GL_SRC_ALPHA, gl.GL_ONE_MINUS_SRC_ALPHA)
                gl.glDepthMask(gl.GL_FALSE)
            else:
                gl.glDisable(gl.GL_BLEND)
                gl.glDepthMask(gl.GL_TRUE)
            gl.glUniform1i(loc("u_clip"), int(d.get("clip", False)))
            gl.glUniform1f(loc("u_alpha_cutoff"),
                           float(d.get("alpha_cutoff", 0.5)))
            gl.glUniform4fv(loc("u_base_color"), 1,
                            np.asarray(d["base_color"], np.float32))
            gl.glUniform1f(loc("u_metallic"), float(d.get("metallic", 1.0)))
            gl.glUniform1f(loc("u_roughness"), float(d.get("roughness", 1.0)))
            gl.glUniform1i(loc("u_unlit"), int(d.get("unlit", False)))
            gl.glUniform3fv(loc("u_translation"), 1,
                            np.asarray(d.get("translation", (0, 0, 0)), np.float32))
            gl.glUniform1f(loc("u_scale"), float(d.get("scale", 1.0)))
            gl.glUniform4fv(loc("u_quat"), 1,
                            np.asarray(d.get("quat", (0, 0, 0, 1)), np.float32))
            gl.glDrawElements(gl.GL_TRIANGLES, len(idx), gl.GL_UNSIGNED_INT, None)

        if lines:
            self._draw_lines(lines, buffers)
        if particles:
            self._draw_particles(particles, view_proj, eye, buffers, textures)

        out = gl.glReadPixels(0, 0, self.width, self.height, gl.GL_RGBA,
                              gl.GL_UNSIGNED_BYTE)
        gl.glDeleteBuffers(len(buffers), buffers)
        if textures:
            gl.glDeleteTextures(len(textures), textures)
        img = np.frombuffer(out, np.uint8).reshape(self.height, self.width, 4)
        return img[::-1].copy()  # GL reads bottom-up; engine rows are top-down

    def _draw_lines(self, lines, buffers):
        """Flat-color line quads (engine pixel space + reverse-z depth),
        depth-tested GREATER against the scene depth like the engine's line
        pass (render_view's init=vis.depth)."""
        gl = self.gl
        if not hasattr(self, "line_prog"):
            self.line_prog = self._link(LINE_VERT_SRC, LINE_FRAG_SRC)
        gl.glUseProgram(self.line_prog)
        gl.glDisable(gl.GL_CULL_FACE)
        gl.glDisable(gl.GL_BLEND)
        gl.glDepthMask(gl.GL_TRUE)
        loc = lambda n: gl.glGetUniformLocation(self.line_prog, n)
        gl.glUniform2f(loc("u_size"), float(self.width), float(self.height))
        idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
        for a in range(1, 5):
            gl.glDisableVertexAttribArray(a)
        for d in lines:
            corners = np.ascontiguousarray(d["corners"], np.float32)
            vbo = gl.glGenBuffers(1)
            ibo = gl.glGenBuffers(1)
            buffers += [vbo, ibo]
            gl.glBindBuffer(gl.GL_ARRAY_BUFFER, vbo)
            gl.glBufferData(gl.GL_ARRAY_BUFFER, corners.nbytes, corners,
                            gl.GL_STATIC_DRAW)
            gl.glEnableVertexAttribArray(0)
            gl.glVertexAttribPointer(0, 3, gl.GL_FLOAT, gl.GL_FALSE, 0, None)
            gl.glBindBuffer(gl.GL_ELEMENT_ARRAY_BUFFER, ibo)
            gl.glBufferData(gl.GL_ELEMENT_ARRAY_BUFFER, idx.nbytes, idx,
                            gl.GL_STATIC_DRAW)
            gl.glUniform3fv(loc("u_color"), 1,
                            np.asarray(d["color"], np.float32))
            gl.glDrawElements(gl.GL_TRIANGLES, 6, gl.GL_UNSIGNED_INT, None)

    def _draw_particles(self, particles, view_proj, eye, buffers, textures):
        """Smoke quads back-to-front with src-alpha blending, depth test on
        / write off — the particle pipeline's blend+depth state."""
        gl = self.gl
        if not hasattr(self, "particle_prog"):
            self.particle_prog = self._link(PARTICLE_VERT_SRC,
                                            PARTICLE_FRAG_SRC)
        gl.glUseProgram(self.particle_prog)
        gl.glDisable(gl.GL_CULL_FACE)
        gl.glEnable(gl.GL_BLEND)
        gl.glBlendFunc(gl.GL_SRC_ALPHA, gl.GL_ONE_MINUS_SRC_ALPHA)
        gl.glDepthMask(gl.GL_FALSE)
        loc = lambda n: gl.glGetUniformLocation(self.particle_prog, n)
        gl.glUniformMatrix4fv(loc("u_view_proj"), 1, gl.GL_TRUE,
                              np.asarray(view_proj, np.float32))
        gl.glUniform3fv(loc("u_eye"), 1, np.asarray(eye, np.float32))
        sh = particles["sh"]
        gl.glUniform3fv(loc("u_sh0"), 1, np.asarray(sh[0], np.float32))
        gl.glUniform3fv(loc("u_sh1x"), 1, np.asarray(sh[1], np.float32))
        gl.glUniform3fv(loc("u_sh1y"), 1, np.asarray(sh[2], np.float32))
        gl.glUniform3fv(loc("u_sh1z"), 1, np.asarray(sh[3], np.float32))
        gl.glUniform3fv(loc("u_cam_right"), 1,
                        np.asarray(particles["cam_right"], np.float32))
        gl.glUniform3fv(loc("u_cam_down"), 1,
                        np.asarray(particles["cam_down"], np.float32))

        smoke_a, smoke_b, lut = particles["smoke"]
        for unit, (img, internal) in enumerate(
            ((smoke_a, gl.GL_RGBA8), (smoke_b, gl.GL_RGBA8),
             (lut, gl.GL_SRGB8_ALPHA8))
        ):
            tex = gl.glGenTextures(1)
            textures.append(tex)
            gl.glActiveTexture(gl.GL_TEXTURE0 + unit)
            gl.glBindTexture(gl.GL_TEXTURE_2D, tex)
            img = np.ascontiguousarray(img, np.uint8)
            h, w = img.shape[:2]
            gl.glTexImage2D(gl.GL_TEXTURE_2D, 0, internal, w, h, 0,
                            gl.GL_RGBA, gl.GL_UNSIGNED_BYTE, img)
            gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MAX_LEVEL, 0)
            gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MIN_FILTER,
                               gl.GL_LINEAR)
            gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MAG_FILTER,
                               gl.GL_LINEAR)
            gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_WRAP_S,
                               gl.GL_CLAMP_TO_EDGE)
            gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_WRAP_T,
                               gl.GL_CLAMP_TO_EDGE)
        gl.glUniform1i(loc("u_smoke_a"), 0)
        gl.glUniform1i(loc("u_smoke_b"), 1)
        gl.glUniform1i(loc("u_lut"), 2)

        idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
        for a in range(2, 5):
            gl.glDisableVertexAttribArray(a)
        for d in particles["draws"]:  # caller passes back-to-front
            corners = np.ascontiguousarray(d["corners"], np.float32)
            uvs = np.ascontiguousarray(d["uvs"], np.float32)
            vbo = gl.glGenBuffers(1)
            ubo = gl.glGenBuffers(1)
            ibo = gl.glGenBuffers(1)
            buffers += [vbo, ubo, ibo]
            gl.glBindBuffer(gl.GL_ARRAY_BUFFER, vbo)
            gl.glBufferData(gl.GL_ARRAY_BUFFER, corners.nbytes, corners,
                            gl.GL_STATIC_DRAW)
            gl.glEnableVertexAttribArray(0)
            gl.glVertexAttribPointer(0, 3, gl.GL_FLOAT, gl.GL_FALSE, 0, None)
            gl.glBindBuffer(gl.GL_ARRAY_BUFFER, ubo)
            gl.glBufferData(gl.GL_ARRAY_BUFFER, uvs.nbytes, uvs,
                            gl.GL_STATIC_DRAW)
            gl.glEnableVertexAttribArray(1)
            gl.glVertexAttribPointer(1, 2, gl.GL_FLOAT, gl.GL_FALSE, 0, None)
            gl.glBindBuffer(gl.GL_ELEMENT_ARRAY_BUFFER, ibo)
            gl.glBufferData(gl.GL_ELEMENT_ARRAY_BUFFER, idx.nbytes, idx,
                            gl.GL_STATIC_DRAW)
            gl.glUniform3fv(loc("u_center"), 1,
                            np.asarray(d["center"], np.float32))
            gl.glUniform3fv(loc("u_colour"), 1,
                            np.asarray(d.get("colour", (1, 1, 1)), np.float32))
            gl.glUniform3fv(loc("u_emissive"), 1,
                            np.asarray(d.get("emissive_colour", (0, 0, 0)),
                                       np.float32))
            gl.glUniform1i(loc("u_use_lut"), int(d.get("use_emissive_lut", 0)))
            gl.glUniform1f(loc("u_lut_y"), float(d.get("lut_y", 0.0)))
            gl.glDrawElements(gl.GL_TRIANGLES, 6, gl.GL_UNSIGNED_INT, None)
        gl.glDisable(gl.GL_BLEND)
        gl.glDepthMask(gl.GL_TRUE)
