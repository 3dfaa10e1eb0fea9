// difusion-tpu native frame IO: PNG decoding + threaded sequence prefetching.
//
// The reference's native layer covers its performance-critical runtime
// (CUDA kernels, the sampler binary); in this framework the device-side
// compute is XLA, and the host-side hot path is frame IO -- decoding RGB-D
// PNGs and keeping the SLAM loop fed.  This library provides:
//
//   * a minimal PNG decoder (zlib inflate + per-scanline unfiltering) for
//     the formats RGB-D datasets actually use: 8-bit gray/RGB/RGBA and
//     16-bit gray (ICL-NUIM / TUM / ScanNet depth), non-interlaced;
//   * a bounded ring-buffer prefetcher: worker threads decode frames ahead
//     of the consumer, overlapping disk+decode latency with TPU compute.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).
//
// Build: g++ -O2 -shared -fPIC -o libframeio.so frameio.cpp -lz -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Image {
    int w = 0, h = 0, channels = 0, bitdepth = 0;
    std::vector<uint8_t> data;   // big-endian 16-bit as in the PNG stream
};

uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16)
         | (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

// returns 0 on success, negative error code otherwise
int decode_png(const char* path, Image& img) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    std::vector<uint8_t> file;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    file.resize(n);
    if (fread(file.data(), 1, n, f) != size_t(n)) { fclose(f); return -2; }
    fclose(f);

    static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (n < 8 || memcmp(file.data(), magic, 8) != 0) return -3;

    std::vector<uint8_t> idat;
    int color_type = -1, interlace = 0;
    size_t off = 8;
    while (off + 8 <= file.size()) {
        uint32_t len = be32(&file[off]);
        const char* type = (const char*)&file[off + 4];
        const uint8_t* payload = &file[off + 8];
        if (off + 12 + len > file.size()) return -4;
        if (memcmp(type, "IHDR", 4) == 0) {
            img.w = be32(payload);
            img.h = be32(payload + 4);
            img.bitdepth = payload[8];
            color_type = payload[9];
            interlace = payload[12];
        } else if (memcmp(type, "IDAT", 4) == 0) {
            idat.insert(idat.end(), payload, payload + len);
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        off += 12 + len;
    }
    if (interlace != 0) return -5;                       // Adam7 unsupported
    switch (color_type) {
        case 0: img.channels = 1; break;
        case 2: img.channels = 3; break;
        case 4: img.channels = 2; break;
        case 6: img.channels = 4; break;
        default: return -6;                              // palette unsupported
    }
    if (img.bitdepth != 8 && img.bitdepth != 16) return -7;

    const int bpp = img.channels * img.bitdepth / 8;     // bytes per pixel
    const size_t stride = size_t(img.w) * bpp;
    std::vector<uint8_t> raw((stride + 1) * img.h);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return -8;
    if (raw_len != raw.size()) return -9;

    img.data.resize(stride * img.h);
    std::vector<uint8_t> prev(stride, 0);
    for (int y = 0; y < img.h; ++y) {
        const uint8_t* src = &raw[size_t(y) * (stride + 1)];
        uint8_t filter = src[0];
        ++src;
        uint8_t* dst = &img.data[size_t(y) * stride];
        for (size_t x = 0; x < stride; ++x) {
            int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
            int b = prev[x];
            int c = x >= size_t(bpp) ? prev[x - bpp] : 0;
            int v = src[x];
            switch (filter) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return -10;
            }
            dst[x] = uint8_t(v);
        }
        memcpy(prev.data(), dst, stride);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Prefetcher: N worker threads decode frames in index order into a bounded
// ring of slots; the consumer takes frames sequentially.
// ---------------------------------------------------------------------------

struct Prefetcher {
    std::vector<std::string> paths;
    int ring_size = 0;
    std::vector<Image> slots;
    std::vector<int> slot_state;      // 0 empty, 1 decoding, 2 ready (or <0 err)
    std::vector<int> slot_err;
    std::mutex mu;
    std::condition_variable cv;
    int next_to_decode = 0;
    int next_to_consume = 0;
    bool stop = false;
    std::vector<std::thread> workers;

    void worker() {
        for (;;) {
            int idx;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv.wait(lk, [&] {
                    return stop || (next_to_decode < (int)paths.size()
                                    && next_to_decode - next_to_consume < ring_size);
                });
                if (stop) return;
                idx = next_to_decode++;
                slot_state[idx % ring_size] = 1;
            }
            Image img;
            int err = decode_png(paths[idx].c_str(), img);
            {
                std::lock_guard<std::mutex> lk(mu);
                int s = idx % ring_size;
                slots[s] = std::move(img);
                slot_err[s] = err;
                slot_state[s] = 2;
            }
            cv.notify_all();
        }
    }
};

}  // namespace

extern "C" {

// one-shot decode: pass out=null to query dimensions first
int frameio_read_png(const char* path, uint8_t* out, int* w, int* h,
                     int* channels, int* bitdepth) {
    Image img;
    int err = decode_png(path, img);
    if (err != 0) return err;
    *w = img.w; *h = img.h; *channels = img.channels; *bitdepth = img.bitdepth;
    if (out) memcpy(out, img.data.data(), img.data.size());
    return 0;
}

void* frameio_prefetcher_create(const char** paths, int n_paths,
                                int ring_size, int n_threads) {
    auto* p = new Prefetcher();
    p->paths.assign(paths, paths + n_paths);
    p->ring_size = ring_size;
    p->slots.resize(ring_size);
    p->slot_state.assign(ring_size, 0);
    p->slot_err.assign(ring_size, 0);
    for (int i = 0; i < n_threads; ++i)
        p->workers.emplace_back(&Prefetcher::worker, p);
    return p;
}

// blocks until frame `idx` (which must be the next sequential index) is
// decoded; returns 0 and fills dims, or a negative decode error
int frameio_prefetcher_next(void* handle, uint8_t* out, int* w, int* h,
                            int* channels, int* bitdepth) {
    auto* p = (Prefetcher*)handle;
    int idx;
    {
        std::unique_lock<std::mutex> lk(p->mu);
        idx = p->next_to_consume;
        if (idx >= (int)p->paths.size()) return -100;    // exhausted
        int s = idx % p->ring_size;
        p->cv.wait(lk, [&] { return p->slot_state[s] == 2; });
        const Image& img = p->slots[s];
        int err = p->slot_err[s];
        if (err == 0) {
            *w = img.w; *h = img.h;
            *channels = img.channels; *bitdepth = img.bitdepth;
            if (out) memcpy(out, img.data.data(), img.data.size());
        }
        p->slot_state[s] = 0;
        p->next_to_consume++;
        p->cv.notify_all();
        return err;
    }
}

void frameio_prefetcher_destroy(void* handle) {
    auto* p = (Prefetcher*)handle;
    {
        std::lock_guard<std::mutex> lk(p->mu);
        p->stop = true;
    }
    p->cv.notify_all();
    for (auto& t : p->workers) t.join();
    delete p;
}

}  // extern "C"
