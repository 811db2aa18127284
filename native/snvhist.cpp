// (qscore, base) histogram over an SNV pileup tile.
//
// Replaces the XLA scatter in strelka_tpu/models/snv_digt._masked_lhood_hist
// (the germline digt likelihood's histogram-matmul formulation): XLA:CPU
// lowers the [L, D] -> [L, Q*4] scatter-add to a serial loop that dominates
// the germline host profile; here it is a threaded linear pass. The counts
// are exact integers, so the downstream [L, Q*4] @ [Q*4, 10] matmul is
// bit-identical to the device-scatter route.
//
// hist is int8 (jax CPU zero-copies int8 host buffers into device inputs);
// callers must guarantee D <= 127 so no cell can overflow.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

int32_t snv_hist(const int8_t* base, const int16_t* qual,
                 const uint8_t* mask, int64_t L, int64_t D,
                 int32_t qtab_size, int8_t* hist /* [L, qtab_size*4] */)
{
    if (D > 127) return -1;
    const int64_t C = (int64_t)qtab_size * 4;
    const int n_threads =
        (int)std::min<int64_t>(std::max(1u, std::thread::hardware_concurrency()),
                               std::max<int64_t>(1, L / 4096));
    auto stripe = [&](int64_t l0, int64_t l1) {
        // zero + count in one cache-warm pass (the caller previously
        // memset whole 16MB buffers on one core)
        for (int64_t l = l0; l < l1; ++l) {
            const int8_t* b = base + l * D;
            const int16_t* q = qual + l * D;
            const uint8_t* m = mask + l * D;
            int8_t* h = hist + l * C;
            std::memset(h, 0, (size_t)C);
            for (int64_t d = 0; d < D; ++d) {
                // branchless: invalid calls land in a scratch cell
                const uint32_t bi = (uint32_t)(uint8_t)b[d];
                int32_t qi = q[d];
                qi = qi < 0 ? 0 : (qi >= qtab_size ? qtab_size - 1 : qi);
                const bool ok = m[d] && bi < 4;
                int8_t scratch;
                int8_t* cell = ok ? &h[qi * 4 + bi] : &scratch;
                *cell = (int8_t)(*cell + 1);
            }
        }
    };
    if (n_threads <= 1) {
        stripe(0, L);
    } else {
        std::vector<std::thread> ths;
        for (int t = 0; t < n_threads; ++t)
            ths.emplace_back(stripe, L * t / n_threads,
                             L * (t + 1) / n_threads);
        for (auto& th : ths) th.join();
    }
    return 0;
}

}  // extern "C"
