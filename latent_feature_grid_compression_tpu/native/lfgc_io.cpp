// Native IO runtime for latent_feature_grid_compression_tpu.
//
// Provides the hot host-side paths the Python layer delegates to via ctypes:
//   * LZ4 block decompression (streaming dictionary) for .cvol volume loading
//   * fixed-width bit packing/unpacking for the quantized binary container
//   * 1-bit mask packing/unpacking for the .bnr sparsity masks
//   * 1-D k-means (k-means++ init + Lloyd iterations) for container
//     quantization, replacing sklearn in the export hot path
//
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// LZ4 block decompression with streaming dictionary.
// Returns bytes written to dst, or -1 on malformed input.
// The dictionary (`hist`, may be null) logically precedes dst; matches may
// reference back into it (cvol slices are compressed in streaming mode).
// ---------------------------------------------------------------------------
int64_t lfgc_lz4_decompress(const uint8_t* src, int64_t src_len,
                            uint8_t* dst, int64_t dst_cap,
                            const uint8_t* hist, int64_t hist_len) {
    int64_t ip = 0, op = 0;
    while (ip < src_len && op < dst_cap) {
        uint8_t token = src[ip++];
        // literals
        int64_t lit = token >> 4;
        if (lit == 15) {
            uint8_t b;
            do {
                if (ip >= src_len) return -1;
                b = src[ip++];
                lit += b;
            } while (b == 255);
        }
        if (ip + lit > src_len || op + lit > dst_cap) {
            lit = std::min(lit, std::min(src_len - ip, dst_cap - op));
            std::memcpy(dst + op, src + ip, lit);
            return op + lit;
        }
        std::memcpy(dst + op, src + ip, lit);
        ip += lit;
        op += lit;
        if (ip >= src_len || op >= dst_cap) break;
        // match
        if (ip + 2 > src_len) return -1;
        int64_t offset = src[ip] | (int64_t(src[ip + 1]) << 8);
        ip += 2;
        if (offset == 0) return -1;
        int64_t mlen = (token & 0xF) + 4;
        if ((token & 0xF) == 15) {
            uint8_t b;
            do {
                if (ip >= src_len) return -1;
                b = src[ip++];
                mlen += b;
            } while (b == 255);
        }
        mlen = std::min(mlen, dst_cap - op);
        int64_t start = op - offset;
        for (int64_t k = 0; k < mlen; ++k) {
            int64_t s = start + k;
            dst[op + k] = (s >= 0) ? dst[s]
                                   : (hist && hist_len + s >= 0)
                                         ? hist[hist_len + s]
                                         : 0;
        }
        op += mlen;
    }
    return op;
}

// ---------------------------------------------------------------------------
// Fixed-width big-endian bit packing (container label streams).
// ---------------------------------------------------------------------------
int64_t lfgc_pack_bits(const int64_t* values, int64_t n, int32_t n_bits,
                       uint8_t* out /* size >= ceil(n*n_bits/8) */) {
    int64_t total_bits = n * n_bits;
    int64_t n_bytes = (total_bits + 7) / 8;
    std::memset(out, 0, n_bytes);
    int64_t bitpos = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t v = uint64_t(values[i]);
        for (int32_t b = n_bits - 1; b >= 0; --b) {
            if ((v >> b) & 1) out[bitpos >> 3] |= uint8_t(0x80u >> (bitpos & 7));
            ++bitpos;
        }
    }
    // reference-format quirk (model_utils.py:88-89): a trailing partial byte
    // holds its bits RIGHT-aligned (int of the remaining bit string), not
    // left-aligned.
    int32_t rem = int32_t(total_bits & 7);
    if (rem) out[n_bytes - 1] >>= (8 - rem);
    return n_bytes;
}

void lfgc_unpack_bits(const uint8_t* packed, int64_t n, int32_t n_bits,
                      int64_t* out) {
    int64_t bitpos = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t v = 0;
        for (int32_t b = 0; b < n_bits; ++b) {
            v = (v << 1) | ((packed[bitpos >> 3] >> (7 - (bitpos & 7))) & 1);
            ++bitpos;
        }
        out[i] = int64_t(v);
    }
}

// 1-bit mask pack/unpack (.bnr)
int64_t lfgc_pack_mask(const uint8_t* bits, int64_t n, uint8_t* out) {
    int64_t n_bytes = (n + 7) / 8;
    std::memset(out, 0, n_bytes);
    for (int64_t i = 0; i < n; ++i)
        if (bits[i]) out[i >> 3] |= uint8_t(0x80u >> (i & 7));
    return n_bytes;
}

void lfgc_unpack_mask(const uint8_t* packed, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = (packed[i >> 3] >> (7 - (i & 7))) & 1;
}

// ---------------------------------------------------------------------------
// 1-D k-means: k-means++ seeding + Lloyd iterations on sorted data.
// For 1-D data clusters are contiguous ranges of the sorted values, so each
// Lloyd step is O(n log k) via binary search on center midpoints.
// ---------------------------------------------------------------------------
void lfgc_kmeans_1d(const float* data, int64_t n, int32_t k,
                    int32_t max_iter, uint64_t seed,
                    float* centers /*k*/, int32_t* labels /*n*/) {
    std::vector<float> sorted(data, data + n);
    std::sort(sorted.begin(), sorted.end());

    // k-means++ init on the sorted array
    std::mt19937_64 rng(seed);
    std::vector<float> c(k);
    std::uniform_int_distribution<int64_t> uni(0, n - 1);
    c[0] = sorted[uni(rng)];
    std::vector<double> d2(n);
    for (int64_t i = 0; i < n; ++i) {
        double d = double(sorted[i]) - double(c[0]);
        d2[i] = d * d;
    }
    for (int32_t j = 1; j < k; ++j) {
        double sum = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            double d = double(sorted[i]) - double(c[j - 1]);
            d2[i] = std::min(d2[i], d * d);  // incremental nearest-so-far
            sum += d2[i];
        }
        if (sum <= 0) { c[j] = sorted[uni(rng)]; continue; }
        std::uniform_real_distribution<double> ur(0.0, sum);
        double r = ur(rng), acc = 0.0;
        int64_t pick = n - 1;
        for (int64_t i = 0; i < n; ++i) {
            acc += d2[i];
            if (acc >= r) { pick = i; break; }
        }
        c[j] = sorted[pick];
    }
    std::sort(c.begin(), c.end());

    // Lloyd iterations on sorted data: boundaries at midpoints
    std::vector<int64_t> cnt(k);
    std::vector<double> sum(k);
    for (int32_t it = 0; it < max_iter; ++it) {
        std::fill(cnt.begin(), cnt.end(), 0);
        std::fill(sum.begin(), sum.end(), 0.0);
        int32_t j = 0;
        for (int64_t i = 0; i < n; ++i) {
            float x = sorted[i];
            while (j + 1 < k && std::abs(x - c[j + 1]) <= std::abs(x - c[j]))
                ++j;
            // j may need to move back for k-means++ inits out of order; reset
            // scan per element would be O(nk); instead exploit sortedness:
            cnt[j]++;
            sum[j] += x;
        }
        bool changed = false;
        for (int32_t q = 0; q < k; ++q) {
            if (cnt[q] == 0) continue;
            float nc = float(sum[q] / cnt[q]);
            if (nc != c[q]) { c[q] = nc; changed = true; }
        }
        std::sort(c.begin(), c.end());
        if (!changed) break;
    }

    std::memcpy(centers, c.data(), k * sizeof(float));
    // final labels for the ORIGINAL (unsorted) order
    for (int64_t i = 0; i < n; ++i) {
        float x = data[i];
        int32_t lo = 0, hi = k - 1;
        while (lo < hi) {
            int32_t mid = (lo + hi) / 2;
            float boundary = 0.5f * (c[mid] + c[mid + 1]);
            if (x <= boundary) hi = mid; else lo = mid + 1;
        }
        labels[i] = lo;
    }
}

}  // extern "C"
