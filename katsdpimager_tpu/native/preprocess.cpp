// Native visibility preprocessing core: Mueller conversion, weight
// propagation, quantization, sort and merge-compression.
//
// Host-side counterpart of katsdpimager_tpu/preprocess.py for the
// file-streaming data plane (the on-device JAX path is the design target;
// this exists where the reference uses preprocess.cpp: keeping multi-core
// CPU ingest fast enough to feed the accelerator).  C ABI for ctypes; no
// pybind11 dependency.
//
// Semantics (matching the Python/JAX implementation, which itself mirrors
// the reference's behaviour):
//  - a visibility with any zero input weight is discarded;
//  - the Mueller matrix maps Q input products to P outputs; weights are
//    propagated as variances with 0*inf = 0 handling;
//  - w < 0 is flipped with conjugation;
//  - uv is quantized to (cell, subpixel) at `oversample` subcells, w to
//    (w_slice, w_plane) with a half-width first slice;
//  - records out of gridding range are dropped;
//  - identically-quantized records are merged (vis and weights summed);
//  - output is sorted by (w_slice, v, u, sub_v, sub_u, w_plane).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#include <parallel/algorithm>
#endif

namespace {

struct ChannelConfig {
    double cell_size;   // metres
    double max_w;       // metres
    int32_t oversample;
    int32_t w_slices;
    int32_t w_planes;
    int32_t pixels;
    int32_t kernel_width;
};

constexpr int MAX_P = 4;

struct Record {
    uint64_t key;
    int16_t uv[2];
    int16_t sub_uv[2];
    int16_t w_plane;
    int16_t w_slice;
    float weights[MAX_P];
    std::complex<float> vis[MAX_P];
};

inline void subpixel_coord(float x, int32_t oversample, int16_t &pixel,
                           int16_t &subpixel) {
    int32_t xs = int32_t(std::floor(double(x) * oversample));
    int32_t p = xs / oversample;
    int32_t s = xs % oversample;
    if (s < 0) {
        p--;
        s += oversample;
    }
    pixel = int16_t(p);
    subpixel = int16_t(s);
}

inline uint64_t pack_key(int16_t u, int16_t v, int16_t su, int16_t sv,
                         int16_t wp, int16_t ws) {
    // (w_slice, v, u, sub_v, sub_u, w_plane), all biased non-negative.
    uint64_t key = uint64_t(uint16_t(ws));
    key = (key << 16) | uint16_t(v + 16384);
    key = (key << 16) | uint16_t(u + 16384);
    key = (key << 7) | uint16_t(sv);
    key = (key << 7) | uint16_t(su);
    key = (key << 10) | uint16_t(wp);
    return key;
}

}  // namespace

extern "C" {

// Returns the number of merged output records (<= n), or -1 on error.
// Outputs are written per the struct-of-arrays layout; out_slice_counts has
// w_slices entries with per-slice record counts.
int64_t ktpu_preprocess_channel(
    int64_t n, int32_t num_q, int32_t num_p,
    const float *uvw,              // (n, 3)
    const float *weights_in,       // (n, Q)
    const float *vis_in,           // (n, Q) complex interleaved
    const float *mueller,          // (P, Q) complex interleaved, or (n, P, Q)
    int32_t per_vis_mueller,
    const ChannelConfig *cfg,
    int16_t *out_uv,               // (n, 2)
    int16_t *out_sub_uv,           // (n, 2)
    int16_t *out_w_plane,          // (n,)
    float *out_weights,            // (n, P)
    float *out_vis,                // (n, P) complex interleaved
    int64_t *out_slice_counts)     // (w_slices,)
{
    if (num_p > MAX_P || num_p < 1) return -1;
    const auto *vis_c = reinterpret_cast<const std::complex<float> *>(vis_in);
    const auto *mueller_c = reinterpret_cast<const std::complex<float> *>(mueller);

    const float uv_scale = float(1.0 / cfg->cell_size);
    const float w_scale =
        float((cfg->w_slices - 0.5) * cfg->w_planes / cfg->max_w);
    const int32_t max_slice_plane = cfg->w_slices * cfg->w_planes - 1;
    const int32_t uv_bias = (cfg->kernel_width - 1) / 2 - cfg->pixels / 2;

    std::vector<Record> records(n);
    std::vector<uint8_t> keep(n, 0);

#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        Record &r = records[i];
        const float *w_row = weights_in + i * num_q;
        bool flagged = false;
        for (int32_t q = 0; q < num_q; q++)
            if (w_row[q] == 0.0f) flagged = true;
        if (flagged) continue;

        const std::complex<float> *v_row = vis_c + i * num_q;
        const std::complex<float> *M = per_vis_mueller
            ? mueller_c + i * num_p * num_q : mueller_c;

        std::complex<float> xvis[MAX_P];
        float xw[MAX_P];
        for (int32_t p = 0; p < num_p; p++) {
            std::complex<float> acc(0.0f, 0.0f);
            float var = 0.0f;
            for (int32_t q = 0; q < num_q; q++) {
                const std::complex<float> m = M[p * num_q + q];
                acc += m * v_row[q];
                const float m2 = std::norm(m);
                if (m2 > 0.0f) var += m2 / std::fabs(w_row[q]);
            }
            xvis[p] = acc;
            xw[p] = 1.0f / var;
        }

        float u = uvw[i * 3 + 0];
        float v = uvw[i * 3 + 1];
        float w = uvw[i * 3 + 2];
        if (w < 0.0f) {
            u = -u;
            v = -v;
            w = -w;
            for (int32_t p = 0; p < num_p; p++) xvis[p] = std::conj(xvis[p]);
        }

        bool any_weight = false;
        for (int32_t p = 0; p < num_p; p++) {
            float weight = xw[p];
            std::complex<float> wv = xvis[p] * weight;
            if (!std::isfinite(wv.real()) || !std::isfinite(wv.imag())) {
                wv = 0.0f;
                weight = 0.0f;
            }
            r.vis[p] = wv;
            r.weights[p] = weight;
            if (weight > 0.0f) any_weight = true;
        }
        if (!any_weight) continue;

        subpixel_coord(u * uv_scale, cfg->oversample, r.uv[0], r.sub_uv[0]);
        subpixel_coord(v * uv_scale, cfg->oversample, r.uv[1], r.sub_uv[1]);
        float wq = std::trunc(w * w_scale + cfg->w_planes * 0.5f);
        int32_t slice_plane = std::min(int32_t(wq), max_slice_plane);
        if (slice_plane < 0) slice_plane = 0;
        r.w_plane = int16_t(slice_plane % cfg->w_planes);
        r.w_slice = int16_t(slice_plane / cfg->w_planes);

        // Footprint must fit the grid.
        const int32_t iu = r.uv[0] + cfg->pixels / 2 - (cfg->kernel_width - 1) / 2;
        const int32_t iv = r.uv[1] + cfg->pixels / 2 - (cfg->kernel_width - 1) / 2;
        (void)uv_bias;
        if (iu < 0 || iv < 0 || iu + cfg->kernel_width > cfg->pixels ||
            iv + cfg->kernel_width > cfg->pixels)
            continue;

        r.key = pack_key(r.uv[0], r.uv[1], r.sub_uv[0], r.sub_uv[1],
                         r.w_plane, r.w_slice);
        keep[i] = 1;
    }

    // Sort lightweight (key, index) pairs instead of whole records.
    std::vector<std::pair<uint64_t, int32_t>> kept;
    kept.reserve(n);
    for (int64_t i = 0; i < n; i++)
        if (keep[i]) kept.emplace_back(records[i].key, int32_t(i));
    if (kept.empty()) {
        std::memset(out_slice_counts, 0, sizeof(int64_t) * cfg->w_slices);
        return 0;
    }

#ifdef _OPENMP
    __gnu_parallel::sort(kept.begin(), kept.end());
#else
    std::sort(kept.begin(), kept.end());
#endif

    // Merge runs with identical keys: partition the sorted array at key
    // boundaries and merge each partition in parallel, then compact.
    std::memset(out_slice_counts, 0, sizeof(int64_t) * cfg->w_slices);
    auto *out_vis_c = reinterpret_cast<std::complex<float> *>(out_vis);
    const size_t total = kept.size();
#ifdef _OPENMP
    const int nthreads = omp_get_max_threads();
#else
    const int nthreads = 1;
#endif
    std::vector<size_t> part(nthreads + 1, total);
    part[0] = 0;
    for (int t = 1; t < nthreads; t++) {
        size_t pos = total * t / nthreads;
        // advance to the start of the next key run
        while (pos < total && pos > 0 && kept[pos].first == kept[pos - 1].first)
            pos++;
        part[t] = pos;
    }
    // Each partition merges into its own span of the output (upper bound:
    // partition length), then spans are compacted.
    std::vector<int64_t> part_out(nthreads, 0);
    std::vector<std::vector<Record>> part_records(nthreads);

#pragma omp parallel for schedule(static, 1)
    for (int t = 0; t < nthreads; t++) {
        std::vector<Record> &local = part_records[t];
        local.reserve(part[t + 1] - part[t]);
        for (size_t i = part[t]; i < part[t + 1];) {
            Record acc = records[kept[i].second];
            size_t j = i + 1;
            while (j < part[t + 1] && kept[j].first == acc.key) {
                const Record &other = records[kept[j].second];
                for (int32_t p = 0; p < num_p; p++) {
                    acc.vis[p] += other.vis[p];
                    acc.weights[p] += other.weights[p];
                }
                j++;
            }
            local.push_back(acc);
            i = j;
        }
        part_out[t] = int64_t(local.size());
    }

    int64_t out_n = 0;
    for (int t = 0; t < nthreads; t++) {
        for (const Record &acc : part_records[t]) {
            out_uv[out_n * 2 + 0] = acc.uv[0];
            out_uv[out_n * 2 + 1] = acc.uv[1];
            out_sub_uv[out_n * 2 + 0] = acc.sub_uv[0];
            out_sub_uv[out_n * 2 + 1] = acc.sub_uv[1];
            out_w_plane[out_n] = acc.w_plane;
            for (int32_t p = 0; p < num_p; p++) {
                out_weights[out_n * num_p + p] = acc.weights[p];
                out_vis_c[out_n * num_p + p] = acc.vis[p];
            }
            out_slice_counts[acc.w_slice]++;
            out_n++;
        }
    }
    return out_n;
}

int32_t ktpu_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
