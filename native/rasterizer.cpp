// Offline z-buffer rasterizer — the native replacement for the reference's
// wgpu render path (reference: src/rendering.rs renders instanced textured
// meshes with a depth test; here the same instanced-mesh draw is done in
// software on the host, entirely outside the simulation path, per the
// headless state-export design in SURVEY.md §3.5).
//
// C ABI, called from Python via ctypes (no pybind11 in this environment).
// Build: g++ -O2 -shared -fPIC -o librasterizer.so rasterizer.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

struct Vec3 {
    float x, y, z;
};

static inline Vec3 mat4_mul_point(const float* m, const Vec3& p, float* w_out) {
    // m is row-major 4x4
    float x = m[0] * p.x + m[1] * p.y + m[2] * p.z + m[3];
    float y = m[4] * p.x + m[5] * p.y + m[6] * p.z + m[7];
    float z = m[8] * p.x + m[9] * p.y + m[10] * p.z + m[11];
    float w = m[12] * p.x + m[13] * p.y + m[14] * p.z + m[15];
    *w_out = w;
    return {x, y, z};
}

static inline Vec3 mat4_rot_vec(const float* m, const Vec3& v) {
    return {
        m[0] * v.x + m[1] * v.y + m[2] * v.z,
        m[4] * v.x + m[5] * v.y + m[6] * v.z,
        m[8] * v.x + m[9] * v.y + m[10] * v.z,
    };
}

static inline Vec3 cross(const Vec3& a, const Vec3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}

static inline Vec3 sub(const Vec3& a, const Vec3& b) {
    return {a.x - b.x, a.y - b.y, a.z - b.z};
}

static inline float dot(const Vec3& a, const Vec3& b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}

static inline Vec3 normalize(const Vec3& v) {
    float n = std::sqrt(dot(v, v));
    if (n <= 0.0f) return {0, 0, 0};
    return {v.x / n, v.y / n, v.z / n};
}

}  // namespace

namespace {

// Shared triangle-fill core. If `uvs`+`tex` are given, samples the diffuse
// texture with perspective-correct bilinear interpolation (the reference's
// fragment shader is a plain texture sample, src/shader.wgsl:48-51 — set
// light_strength=0 for that exact unlit look); otherwise flat-shades with
// the per-instance base color.
void rasterize_core(const float* verts, int32_t n_verts, const float* uvs,
                    const int32_t* tris, int32_t n_tris, const float* models,
                    int32_t n_inst, const float* view_proj,
                    const float* colors, const uint8_t* tex, int32_t tex_w,
                    int32_t tex_h, float light_strength, int32_t width,
                    int32_t height, uint8_t* out_rgb,
                    const float* background) {
    std::vector<float> zbuf((size_t)width * height, 1e30f);
    for (int32_t i = 0; i < width * height; ++i) {
        out_rgb[i * 3 + 0] = (uint8_t)(background[0] * 255.0f);
        out_rgb[i * 3 + 1] = (uint8_t)(background[1] * 255.0f);
        out_rgb[i * 3 + 2] = (uint8_t)(background[2] * 255.0f);
    }

    const bool textured = uvs && tex && tex_w > 0 && tex_h > 0;
    const Vec3 light = normalize({0.4f, 0.8f, 0.45f});
    std::vector<Vec3> screen(n_verts);
    std::vector<float> depth(n_verts), inv_w_v(n_verts);
    std::vector<uint8_t> ok(n_verts);

    for (int32_t inst = 0; inst < n_inst; ++inst) {
        const float* model = models + (size_t)inst * 16;
        float base_r = 0.8f, base_g = 0.8f, base_b = 0.82f;
        if (colors) {
            base_r = colors[inst * 3 + 0];
            base_g = colors[inst * 3 + 1];
            base_b = colors[inst * 3 + 2];
        }
        float mvp[16];
        for (int r = 0; r < 4; ++r)
            for (int c = 0; c < 4; ++c) {
                float acc = 0.0f;
                for (int k = 0; k < 4; ++k)
                    acc += view_proj[r * 4 + k] * model[k * 4 + c];
                mvp[r * 4 + c] = acc;
            }

        for (int32_t v = 0; v < n_verts; ++v) {
            Vec3 p = {verts[v * 3], verts[v * 3 + 1], verts[v * 3 + 2]};
            float w;
            Vec3 clip = mat4_mul_point(mvp, p, &w);
            if (w <= 1e-6f) {
                ok[v] = 0;
                continue;
            }
            ok[v] = 1;
            float inv_w = 1.0f / w;
            inv_w_v[v] = inv_w;
            screen[v] = {(clip.x * inv_w * 0.5f + 0.5f) * (float)width,
                         (1.0f - (clip.y * inv_w * 0.5f + 0.5f)) *
                             (float)height,
                         0.0f};
            depth[v] = clip.z * inv_w;
        }

        for (int32_t t = 0; t < n_tris; ++t) {
            int32_t i0 = tris[t * 3], i1 = tris[t * 3 + 1],
                    i2 = tris[t * 3 + 2];
            if (!ok[i0] || !ok[i1] || !ok[i2]) continue;

            Vec3 a = {verts[i0 * 3], verts[i0 * 3 + 1], verts[i0 * 3 + 2]};
            Vec3 b = {verts[i1 * 3], verts[i1 * 3 + 1], verts[i1 * 3 + 2]};
            Vec3 c = {verts[i2 * 3], verts[i2 * 3 + 1], verts[i2 * 3 + 2]};
            Vec3 n_world =
                normalize(mat4_rot_vec(model, cross(sub(b, a), sub(c, a))));
            float lambert = 1.0f - light_strength * 0.75f +
                            light_strength * 0.75f *
                                std::max(0.0f, dot(n_world, light));

            const Vec3& s0 = screen[i0];
            const Vec3& s1 = screen[i1];
            const Vec3& s2 = screen[i2];
            float area = (s1.x - s0.x) * (s2.y - s0.y) -
                         (s1.y - s0.y) * (s2.x - s0.x);
            if (area >= -1e-9f) continue;  // backface (CCW front)

            int minx = std::max(0, (int)std::floor(
                                       std::min({s0.x, s1.x, s2.x})));
            int maxx = std::min(width - 1,
                                (int)std::ceil(std::max({s0.x, s1.x, s2.x})));
            int miny = std::max(0, (int)std::floor(
                                       std::min({s0.y, s1.y, s2.y})));
            int maxy = std::min(height - 1,
                                (int)std::ceil(std::max({s0.y, s1.y, s2.y})));
            float inv_area = 1.0f / area;

            for (int py = miny; py <= maxy; ++py) {
                for (int px = minx; px <= maxx; ++px) {
                    float fx = (float)px + 0.5f, fy = (float)py + 0.5f;
                    float w0 = ((s1.x - fx) * (s2.y - fy) -
                                (s1.y - fy) * (s2.x - fx)) *
                               inv_area;
                    float w1 = ((s2.x - fx) * (s0.y - fy) -
                                (s2.y - fy) * (s0.x - fx)) *
                               inv_area;
                    float w2 = 1.0f - w0 - w1;
                    if (w0 < 0.0f || w1 < 0.0f || w2 < 0.0f) continue;
                    float z = w0 * depth[i0] + w1 * depth[i1] + w2 * depth[i2];
                    size_t idx = (size_t)py * width + px;
                    if (z >= zbuf[idx]) continue;
                    zbuf[idx] = z;

                    float r = base_r, g = base_g, bl = base_b;
                    if (textured) {
                        // perspective-correct: interpolate (uv/w, 1/w)
                        float iw = w0 * inv_w_v[i0] + w1 * inv_w_v[i1] +
                                   w2 * inv_w_v[i2];
                        float u = (w0 * uvs[i0 * 2] * inv_w_v[i0] +
                                   w1 * uvs[i1 * 2] * inv_w_v[i1] +
                                   w2 * uvs[i2 * 2] * inv_w_v[i2]) /
                                  iw;
                        float vq = (w0 * uvs[i0 * 2 + 1] * inv_w_v[i0] +
                                    w1 * uvs[i1 * 2 + 1] * inv_w_v[i1] +
                                    w2 * uvs[i2 * 2 + 1] * inv_w_v[i2]) /
                                   iw;
                        // wrap; flip v (image rows top-down vs OBJ uv)
                        u -= std::floor(u);
                        vq -= std::floor(vq);
                        float tx = u * (float)(tex_w)-0.5f;
                        float ty = (1.0f - vq) * (float)(tex_h)-0.5f;
                        int x0 = (int)std::floor(tx), y0 = (int)std::floor(ty);
                        float fxs = tx - (float)x0, fys = ty - (float)y0;
                        auto texel = [&](int xx, int yy, int ch) -> float {
                            xx = std::min(std::max(xx, 0), tex_w - 1);
                            yy = std::min(std::max(yy, 0), tex_h - 1);
                            return (float)tex[((size_t)yy * tex_w + xx) * 4 +
                                              ch] /
                                   255.0f;
                        };
                        float cch[3];
                        for (int ch = 0; ch < 3; ++ch) {
                            float c00 = texel(x0, y0, ch),
                                  c10 = texel(x0 + 1, y0, ch);
                            float c01 = texel(x0, y0 + 1, ch),
                                  c11 = texel(x0 + 1, y0 + 1, ch);
                            cch[ch] = (c00 * (1 - fxs) + c10 * fxs) *
                                          (1 - fys) +
                                      (c01 * (1 - fxs) + c11 * fxs) * fys;
                        }
                        r = cch[0];
                        g = cch[1];
                        bl = cch[2];
                    }
                    out_rgb[idx * 3 + 0] =
                        (uint8_t)std::min(255.0f, r * lambert * 255.0f);
                    out_rgb[idx * 3 + 1] =
                        (uint8_t)std::min(255.0f, g * lambert * 255.0f);
                    out_rgb[idx * 3 + 2] =
                        (uint8_t)std::min(255.0f, bl * lambert * 255.0f);
                }
            }
        }
    }
}

}  // namespace

extern "C" {

// Textured instanced-mesh rasterization (reference pipeline parity:
// vertex = camera.view_proj * model * pos with tex_coords passthrough,
// fragment = diffuse texture sample — src/shader.wgsl:24-51).
//   uvs: [n_verts][2] or nullptr; tex: RGBA8 [tex_h][tex_w][4] or nullptr;
//   light_strength: 0 = unlit (reference look), 1 = full lambert.
void rasterize_textured(const float* verts, int32_t n_verts, const float* uvs,
                        const int32_t* tris, int32_t n_tris,
                        const float* models, int32_t n_inst,
                        const float* view_proj, const float* colors,
                        const uint8_t* tex, int32_t tex_w, int32_t tex_h,
                        float light_strength, int32_t width, int32_t height,
                        uint8_t* out_rgb, const float* background) {
    rasterize_core(verts, n_verts, uvs, tris, n_tris, models, n_inst,
                   view_proj, colors, tex, tex_w, tex_h, light_strength,
                   width, height, out_rgb, background);
}

// Rasterize `n_inst` instances of one triangle mesh.
//   verts:      [n_verts][3]      body-frame positions
//   tris:       [n_tris][3]       vertex indices
//   models:     [n_inst][16]      row-major model matrices (T(p)·R(q),
//                                 the reference's InstanceRaw layout,
//                                 graphics.rs:14-21)
//   view_proj:  [16]              row-major camera matrix
//   colors:     [n_inst][3] or nullptr (default light gray)
//   out_rgb:    [height][width][3]  (caller-cleared or not: we clear)
//   background: [3]
void rasterize(const float* verts, int32_t n_verts, const int32_t* tris,
               int32_t n_tris, const float* models, int32_t n_inst,
               const float* view_proj, const float* colors, int32_t width,
               int32_t height, uint8_t* out_rgb, const float* background) {
    rasterize_core(verts, n_verts, nullptr, tris, n_tris, models, n_inst,
                   view_proj, colors, nullptr, 0, 0, 1.0f, width, height,
                   out_rgb, background);
}

}  // extern "C"
