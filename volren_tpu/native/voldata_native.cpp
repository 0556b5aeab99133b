// Native volume-data kernels (C ABI, loaded via ctypes).
//
// The reference keeps its whole volume-data layer native (the voldata
// submodule, C++17). Here the hot host-side ops are native: the 8^3
// brick-grid builder (dense -> indirection/range/atlas, the layout consumed
// by the device kernels; decode contract from
// /root/reference/shader/common.glsl:268-275) and the dense decode used for
// round-trip validation. Everything else (file parsing, containers) stays
// in Python where it is IO-bound anyway.
//
// Build: make -C volren_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Returns the number of allocated atlas slots, or -1 if atlas_capacity is
// too small. Arrays are caller-allocated:
//   dense:       (Z, Y, X) row-major float32 (x fastest)
//   indirection: (bz*by*bx) uint32 slot ids
//   range:       (bz*by*bx, 2) float32 min/max
//   atlas:       (atlas_capacity, 512) uint8, voxel order (z, y, x)
int vdn_build_brick_grid(const float* dense, int X, int Y, int Z,
                         uint32_t* indirection, float* range,
                         uint8_t* atlas, long atlas_capacity) {
    const int bx = (X + 7) / 8, by = (Y + 7) / 8, bz = (Z + 7) / 8;
    long n_slots = 0;
    for (int bzi = 0; bzi < bz; ++bzi) {
        for (int byi = 0; byi < by; ++byi) {
            for (int bxi = 0; bxi < bx; ++bxi) {
                const long bidx = ((long)bzi * by + byi) * bx + bxi;
                // gather the (padded) 8^3 block
                float block[512];
                float lo = 3.402823466e+38f, hi = -3.402823466e+38f;
                for (int vz = 0; vz < 8; ++vz) {
                    const int z = bzi * 8 + vz;
                    for (int vy = 0; vy < 8; ++vy) {
                        const int y = byi * 8 + vy;
                        for (int vx = 0; vx < 8; ++vx) {
                            const int x = bxi * 8 + vx;
                            const float v = (x < X && y < Y && z < Z)
                                ? dense[((long)z * Y + y) * X + x]
                                : 0.0f;
                            block[(vz * 8 + vy) * 8 + vx] = v;
                            lo = std::min(lo, v);
                            hi = std::max(hi, v);
                        }
                    }
                }
                range[bidx * 2 + 0] = lo;
                range[bidx * 2 + 1] = hi;
                if (hi > lo) {  // varying content -> allocate a slot
                    if (n_slots >= atlas_capacity) return -1;
                    const float scale = 255.0f / (hi - lo);
                    uint8_t* dst = atlas + n_slots * 512;
                    for (int i = 0; i < 512; ++i)
                        dst[i] = (uint8_t)((block[i] - lo) * scale + 0.5f);
                    indirection[bidx] = (uint32_t)n_slots;
                    ++n_slots;
                } else {
                    indirection[bidx] = 0;  // constant brick: range decodes it
                }
            }
        }
    }
    if (n_slots == 0) {
        // keep one placeholder slot so device gathers stay in bounds
        if (atlas_capacity < 1) return -1;
        std::memset(atlas, 0, 512);
        n_slots = 1;
    }
    return (int)n_slots;
}

// min/max mip level over a (bz, by, bx, 2) range buffer with ceil-halved
// dims and edge clamping (conservative majorants).
void vdn_range_mip(const float* src, int bx, int by, int bz,
                   float* dst, int nx, int ny, int nz) {
    for (int z = 0; z < nz; ++z) {
        for (int y = 0; y < ny; ++y) {
            for (int x = 0; x < nx; ++x) {
                float lo = 3.402823466e+38f, hi = -3.402823466e+38f;
                for (int dz = 0; dz < 2; ++dz) {
                    const int sz = std::min(z * 2 + dz, bz - 1);
                    for (int dy = 0; dy < 2; ++dy) {
                        const int sy = std::min(y * 2 + dy, by - 1);
                        for (int dx = 0; dx < 2; ++dx) {
                            const int sx = std::min(x * 2 + dx, bx - 1);
                            const long i = (((long)sz * by + sy) * bx + sx) * 2;
                            lo = std::min(lo, src[i]);
                            hi = std::max(hi, src[i + 1]);
                        }
                    }
                }
                const long o = (((long)z * ny + y) * nx + x) * 2;
                dst[o] = lo;
                dst[o + 1] = hi;
            }
        }
    }
}

// decode a brick grid back to dense (used in tests/round trips)
void vdn_decode_dense(const uint32_t* indirection, const float* range,
                      const uint8_t* atlas, int bx, int by, int bz,
                      float* dense, int X, int Y, int Z) {
    for (int z = 0; z < Z; ++z) {
        for (int y = 0; y < Y; ++y) {
            for (int x = 0; x < X; ++x) {
                const long bidx = ((long)(z >> 3) * by + (y >> 3)) * bx + (x >> 3);
                const float lo = range[bidx * 2], hi = range[bidx * 2 + 1];
                const uint8_t u =
                    atlas[(long)indirection[bidx] * 512 +
                          ((z & 7) * 8 + (y & 7)) * 8 + (x & 7)];
                dense[((long)z * Y + y) * X + x] = lo + (u / 255.0f) * (hi - lo);
            }
        }
    }
}

}  // extern "C"
