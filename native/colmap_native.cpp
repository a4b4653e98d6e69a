// Native COLMAP binary parsers (points3D.bin / images.bin).
//
// The reference links CUDA/C++ submodules for its native components; here
// the compute path is Pallas/XLA, but host-side IO hot spots stay native:
// COLMAP files have variable-length records (track lists, image names)
// that force a sequential walk — a Python per-record loop takes seconds on
// million-point reconstructions, this walk is ~memory speed.
//
// Exposed via a C ABI for ctypes (no pybind11 dependency):
//   colmap_count_points3d(path)                      -> int64 count
//   colmap_read_points3d(path, xyz, rgb, err, cap)   -> int64 written
//   colmap_count_images(path)                        -> int64 count
//   colmap_read_image_poses(path, ids, qvec, tvec, cam_ids, names,
//                           name_cap, cap)           -> int64 written
// All outputs are caller-allocated buffers.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
    FILE* f = nullptr;
    explicit Reader(const char* path) { f = std::fopen(path, "rb"); }
    ~Reader() { if (f) std::fclose(f); }
    bool ok() const { return f != nullptr; }
    template <typename T> bool read(T* out, size_t n = 1) {
        return std::fread(out, sizeof(T), n, f) == n;
    }
    bool skip(long n) { return std::fseek(f, n, SEEK_CUR) == 0; }
};

}  // namespace

extern "C" {

int64_t colmap_count_points3d(const char* path) {
    Reader r(path);
    if (!r.ok()) return -1;
    uint64_t n = 0;
    if (!r.read(&n)) return -1;
    return static_cast<int64_t>(n);
}

// xyz: (cap,3) f64, rgb: (cap,3) u8, err: (cap,) f64
int64_t colmap_read_points3d(const char* path, double* xyz, uint8_t* rgb,
                             double* err, int64_t cap) {
    Reader r(path);
    if (!r.ok()) return -1;
    uint64_t n = 0;
    if (!r.read(&n)) return -1;
    const uint64_t count = n < static_cast<uint64_t>(cap)
                               ? n
                               : static_cast<uint64_t>(cap);
    for (uint64_t i = 0; i < count; ++i) {
        uint64_t id;
        if (!r.read(&id)) return -1;
        if (!r.read(xyz + 3 * i, 3)) return -1;
        if (!r.read(rgb + 3 * i, 3)) return -1;
        if (!r.read(err + i)) return -1;
        uint64_t track_len;
        if (!r.read(&track_len)) return -1;
        if (!r.skip(static_cast<long>(8 * track_len))) return -1;
    }
    return static_cast<int64_t>(count);
}

int64_t colmap_count_images(const char* path) {
    Reader r(path);
    if (!r.ok()) return -1;
    uint64_t n = 0;
    if (!r.read(&n)) return -1;
    return static_cast<int64_t>(n);
}

// ids: (cap,) i32; qvec: (cap,4) f64; tvec: (cap,3) f64; cam_ids: (cap,) i32;
// names: (cap*name_cap,) char, NUL-padded.
int64_t colmap_read_image_poses(const char* path, int32_t* ids, double* qvec,
                                double* tvec, int32_t* cam_ids, char* names,
                                int64_t name_cap, int64_t cap) {
    Reader r(path);
    if (!r.ok()) return -1;
    uint64_t n = 0;
    if (!r.read(&n)) return -1;
    const uint64_t count = n < static_cast<uint64_t>(cap)
                               ? n
                               : static_cast<uint64_t>(cap);
    for (uint64_t i = 0; i < count; ++i) {
        if (!r.read(ids + i)) return -1;
        if (!r.read(qvec + 4 * i, 4)) return -1;
        if (!r.read(tvec + 3 * i, 3)) return -1;
        if (!r.read(cam_ids + i)) return -1;
        // NUL-terminated name
        char* dst = names + i * name_cap;
        std::memset(dst, 0, static_cast<size_t>(name_cap));
        int64_t pos = 0;
        for (;;) {
            char c;
            if (!r.read(&c)) return -1;
            if (c == '\0') break;
            if (pos < name_cap - 1) dst[pos++] = c;
        }
        uint64_t n_pts;
        if (!r.read(&n_pts)) return -1;
        if (!r.skip(static_cast<long>(24 * n_pts))) return -1;
    }
    return static_cast<int64_t>(count);
}

}  // extern "C"
