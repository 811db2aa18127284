// Native CPU implementation of the exact read x window scorer.
//
// Computes EXACTLY the canonical quantized-limb score defined in
// strelka_tpu/ops/pallas_readlik.py (see its module doc): per-base
// deltas are integer multiples of 2^-QUANT_BITS (=2^-11: max delta
// quantizes to 62139 < 2^16, two base-256 limbs); the per-offset score
// is the fixed-order f32 limb combination
//     s = (S1*256 + S0) * 2^-QUANT_BITS + lnmis
// with S1/S0 the exact integer limb sums over matching positions.
// All integer arithmetic here is exact, and the final float ops are
// the same IEEE-754 f32 operations the XLA/Pallas paths run, so best
// scores AND first-max argmax offsets are bit-identical to
// exact_best_offsets / the TPU kernel.
//
// Algorithm: bit-parallel base matching (the CPU analog of the TPU
// kernel's one-hot MXU matmul). Bases are 2-bit codes, so a 64-wide
// match mask is two XOR/ANDN word ops; per-base deltas take few
// distinct values (one per basecall qscore), so the masked delta sum
// becomes   sum_g d_int(g) * popcount(match & group_mask(g))
// over the read's qual groups — exact integer counts, ~8x fewer ops
// than the scalar compare-accumulate loop and ~16x less memory
// traffic than the XLA one-hot einsums it replaces on the CPU backend.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {
constexpr float kQuantScale = 2048.0f;      // 2^11 == ops/readlik QUANT_BITS
constexpr float kQuantInv = 1.0f / 2048.0f;
constexpr int64_t kMaxL = 512;
constexpr int kMaxW64 = (int)(kMaxL / 64);
}

extern "C" {

int32_t exact_score_best_offsets(
    const int8_t* codes,   // [B, R, L]
    const float* delta,    // [B, R, L] quantized multiples of 2^-11
    const float* lnmis,    // [B, R]
    const int8_t* win_t,   // [B, L, W] offset-major windows
    int64_t B, int64_t R, int64_t L, int64_t W,
    float* best,           // [B, R] out
    int32_t* best_off)     // [B, R] out
{
    if (L > kMaxL) return -1;
    const int nw = (int)((L + 63) / 64);
    const int n_threads = (int)std::min<int64_t>(
        std::max(1u, std::thread::hardware_concurrency()),
        std::max<int64_t>(B, 1));

    auto run = [&](int64_t b0, int64_t b1) {
        // per-offset window planes: bit l of wp*[w] = window base bit,
        // wv[w] = base valid (<4)
        std::vector<uint64_t> wp0((size_t)W * nw), wp1((size_t)W * nw),
            wv((size_t)W * nw);
        std::vector<int32_t> gval(kMaxL);     // per-group d_int
        std::vector<uint64_t> gmask((size_t)kMaxL * kMaxW64);
        for (int64_t b = b0; b < b1; ++b) {
            const int8_t* cb = codes + b * R * L;
            const float* db = delta + b * R * L;
            const int8_t* wb = win_t + b * L * W;
            std::memset(wp0.data(), 0, wp0.size() * 8);
            std::memset(wp1.data(), 0, wp1.size() * 8);
            std::memset(wv.data(), 0, wv.size() * 8);
            for (int64_t l = 0; l < L; ++l) {
                const uint64_t bit = 1ull << (l & 63);
                const size_t word = (size_t)(l >> 6);
                const int8_t* row = wb + l * W;
                for (int64_t w = 0; w < W; ++w) {
                    const uint8_t c = (uint8_t)row[w];
                    if (c >= 4) continue;
                    if (c & 1) wp0[(size_t)w * nw + word] |= bit;
                    if (c & 2) wp1[(size_t)w * nw + word] |= bit;
                    wv[(size_t)w * nw + word] |= bit;
                }
            }
            for (int64_t r = 0; r < R; ++r) {
                const int8_t* cr = cb + r * L;
                const float* dr = db + r * L;
                // read planes + qual groups (distinct d_int values)
                uint64_t rp0[kMaxW64] = {0}, rp1[kMaxW64] = {0};
                int G = 0;
                for (int64_t l = 0; l < L; ++l) {
                    const uint8_t c = (uint8_t)cr[l];
                    if (c >= 4) continue;
                    const uint64_t bit = 1ull << (l & 63);
                    const size_t word = (size_t)(l >> 6);
                    if (c & 1) rp0[word] |= bit;
                    if (c & 2) rp1[word] |= bit;
                    const int32_t d = (int32_t)(dr[l] * kQuantScale);
                    if (d == 0) continue;   // contributes nothing
                    int g = 0;
                    while (g < G && gval[g] != d) ++g;
                    if (g == G) {
                        gval[G] = d;
                        std::memset(&gmask[(size_t)G * nw], 0, nw * 8);
                        ++G;
                    }
                    gmask[(size_t)g * nw + word] |= bit;
                }
                const float lm = lnmis[b * R + r];
                float bs = 0.0f;
                int32_t bo = 0;
                bool first = true;
                for (int64_t w = 0; w < W; ++w) {
                    const uint64_t* w0 = &wp0[(size_t)w * nw];
                    const uint64_t* w1 = &wp1[(size_t)w * nw];
                    const uint64_t* wvv = &wv[(size_t)w * nw];
                    uint64_t m[kMaxW64];
                    for (int k = 0; k < nw; ++k)
                        m[k] = ~(rp0[k] ^ w0[k]) & ~(rp1[k] ^ w1[k]) & wvv[k];
                    int32_t s1 = 0, s0 = 0;
                    for (int g = 0; g < G; ++g) {
                        const uint64_t* gm = &gmask[(size_t)g * nw];
                        int cnt = 0;
                        for (int k = 0; k < nw; ++k)
                            cnt += __builtin_popcountll(m[k] & gm[k]);
                        const int32_t d = gval[g];
                        s1 += ((d >> 8) & 255) * cnt;
                        s0 += (d & 255) * cnt;
                    }
                    // identical op order to the XLA/Pallas combination
                    float s = (float)s1 * 256.0f + (float)s0 * 1.0f;
                    s = s * kQuantInv + lm;
                    if (first || s > bs) { bs = s; bo = (int32_t)w; first = false; }
                }
                best[b * R + r] = bs;
                best_off[b * R + r] = bo;
            }
        }
    };

    if (n_threads <= 1 || B == 1) {
        run(0, B);
    } else {
        std::vector<std::thread> ths;
        for (int t = 0; t < n_threads; ++t)
            ths.emplace_back(run, B * t / n_threads, B * (t + 1) / n_threads);
        for (auto& th : ths) th.join();
    }
    return 0;
}

}  // extern "C"
