// Native germline SNV call tail: genotype log-likelihoods from the
// (qscore, base) histogram plus the full posterior tail
// (position_snp_call_pprob_digt.cpp get_diploid_gt_lhood +
// calculate_result_set + the PL block :498-511).
//
// This is the CPU-backend replacement for the XLA hist-matmul chain
// (snv_digt.call_snv_hist_tile): the histogram is sparse (<= depth
// nonzero of 512 slots per row), so a sequential gather-sum does ~50x
// less arithmetic than the dense [L, 512] @ [512, 10] matmul and
// needs no device round trips. The accumulation is DEFINED as the
// canonical order for this path (ascending (q, base) slot, f32
// mult+add; closer to the reference's sequential per-call float
// accumulation than a blocked matmul) — the python transcription in
// tests/test_native_snvcall.py mirrors it exactly, and the XLA tile
// path remains as the device/TPU implementation whose ulp-level
// accumulation-order differences are accepted there.
//
// Posterior tail (f64, _result_set semantics):
//   pp[g]  = (double)lhood[g] + ln_prior[ref_gt][g]
//   p      = exp(pp - max) ; p /= sum(p)
//   max_gt = argmax(pp) (first max)
//   q_ref  = min(floor(-10*log10(max(p[ref], tiny)) + 0.5), 999)
//   comp   = max(sum(p) - p[max_gt], 0)
//   q_max  = min(floor(-10*log10(max(comp, tiny)) + 0.5), 999)
//   ln_ref = log(max(p[ref], tiny))
// PL: float d = lhood[g] - lmax (haploid: lmax over the 4 homs);
//     pl = clip(floor((double)(-10f*d) / ln(10) + 0.5), 0, 999).

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {
constexpr int kGt = 10;
constexpr double kTiny = DBL_MIN;  // np.finfo(f64).tiny

struct ResultSet {
    int max_gt;
    int q_ref;
    int q_max;
    double ln_ref;
};

inline ResultSet result_set(const float* lh, const double* prior,
                            int ref_clamped)
{
    double pp[kGt];
    for (int g = 0; g < kGt; ++g) pp[g] = (double)lh[g] + prior[g];
    double mx = pp[0];
    for (int g = 1; g < kGt; ++g)
        if (pp[g] > mx) mx = pp[g];
    double p[kGt], s1 = 0.0;
    for (int g = 0; g < kGt; ++g) p[g] = std::exp(pp[g] - mx);
    for (int g = 0; g < kGt; ++g) s1 += p[g];
    for (int g = 0; g < kGt; ++g) p[g] /= s1;
    int max_gt = 0;
    for (int g = 1; g < kGt; ++g)
        if (pp[g] > pp[max_gt]) max_gt = g;
    double total = 0.0;
    for (int g = 0; g < kGt; ++g) total += p[g];
    const double ref_pprob = p[ref_clamped];
    const double comp = std::max(total - p[max_gt], 0.0);
    ResultSet r;
    r.max_gt = max_gt;
    double qr = std::floor(-10.0 * std::log10(std::max(ref_pprob, kTiny))
                           + 0.5);
    double qm = std::floor(-10.0 * std::log10(std::max(comp, kTiny))
                           + 0.5);
    r.q_ref = (int)std::min(qr, 999.0);
    r.q_max = (int)std::min(qm, 999.0);
    r.ln_ref = std::log(std::max(ref_pprob, kTiny));
    return r;
}
}  // namespace

extern "C" {

int32_t snv_call_tail(
    const int8_t* hist,       // [L, K] counts (K = qtab_size*4)
    const int8_t* ref_gt,     // [L] 0..4
    const float* s_mis,       // [L, 4] dep-eprob mismatch sums or null
    const uint8_t* haploid,   // [L] or null
    const float* qtab,        // [K, 10]
    const float* e0,          // [4, 10] mismatch-cell indicator
    const double* gen_prior,  // [5, 10] by ref index (4 = N average)
    const double* poly_prior, // [5, 10]
    const double* gen_hap,    // [5, 10]
    const double* poly_hap,   // [5, 10]
    int64_t L, int64_t K,
    float* lhood_out,         // [L, 10]
    int32_t* g_max, int32_t* p_max,
    int32_t* snv_q, int32_t* g_qmax, int32_t* p_qmax,
    int32_t* pl,              // [L, 10]
    double* ln_ref)           // [L]
{
    const double ln10 = std::log(10.0);
    const int n_threads = (int)std::min<int64_t>(
        std::max(1u, std::thread::hardware_concurrency()),
        std::max<int64_t>(L / 8192, 1));

    auto run = [&](int64_t l0, int64_t l1) {
        for (int64_t l = l0; l < l1; ++l) {
            float lh[kGt] = {0};
            const int8_t* h = hist + l * K;
            for (int64_t k = 0; k < K; ++k) {
                const int c = h[k];
                if (c == 0) continue;
                const float fc = (float)c;
                const float* t = qtab + k * kGt;
                for (int g = 0; g < kGt; ++g) lh[g] += fc * t[g];
            }
            if (s_mis) {
                // mirrors lhood + s_mis @ e0: the 4-term dot is summed
                // first (b ascending), then added once
                const float* s = s_mis + l * 4;
                for (int g = 0; g < kGt; ++g) {
                    float m = 0.0f;
                    for (int b = 0; b < 4; ++b)
                        m += s[b] * e0[b * kGt + g];
                    lh[g] += m;
                }
            }
            std::memcpy(lhood_out + l * kGt, lh, sizeof lh);

            const int ref = ref_gt[l];
            const int refc = ref < 4 ? ref : 3;
            const bool hap = haploid && haploid[l];
            const double* gp = (hap ? gen_hap : gen_prior) + ref * kGt;
            const double* ppr = (hap ? poly_hap : poly_prior) + ref * kGt;
            const ResultSet gr = result_set(lh, gp, refc);
            const ResultSet pr = result_set(lh, ppr, refc);
            g_max[l] = gr.max_gt;
            snv_q[l] = gr.q_ref;
            g_qmax[l] = gr.q_max;
            ln_ref[l] = gr.ln_ref;
            p_max[l] = pr.max_gt;
            p_qmax[l] = pr.q_max;

            // PL normalizer: diploid max over all 10 genotypes;
            // haploid rows over the 4 homs only (gtcount=N_BASE,
            // position_snp_call_pprob_digt.cpp:501)
            float lmax = lh[0];
            const int span = hap ? 4 : kGt;
            for (int g = 1; g < span; ++g)
                if (lh[g] > lmax) lmax = lh[g];
            int32_t* plr = pl + l * kGt;
            for (int g = 0; g < kGt; ++g) {
                const float d = lh[g] - lmax;
                const float t = -10.0f * d;
                double u = std::floor((double)t / ln10 + 0.5);
                if (u < 0.0) u = 0.0;
                if (u > 999.0) u = 999.0;
                plr[g] = (int32_t)u;
            }
        }
    };

    if (n_threads <= 1) {
        run(0, L);
    } else {
        std::vector<std::thread> ths;
        for (int t = 0; t < n_threads; ++t)
            ths.emplace_back(run, L * t / n_threads,
                             L * (t + 1) / n_threads);
        for (auto& th : ths) th.join();
    }
    return 0;
}

}  // extern "C"
