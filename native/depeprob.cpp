// Dependent basecall-error adjustment (blt_common/adjust_joint_eprob.cpp).
//
// The reference germline caller runs this on every cleaned pileup
// (PileupCleaner::CleanPileupErrorProb; enabled by default via
// starling_shared.hh:34-35 bsnp_ssd_no_mismatch=0.35 /
// bsnp_ssd_one_mismatch=0.6): within each per-site (strand x base)
// group of used basecalls with qscore >= 3, error probabilities are
// inflated for all but the strongest call — quality is discounted
// toward a 0.75-converged error when several same-allele same-strand
// calls stack up (systematic sequencing error suppression). The
// adjusted probability only enters the MISMATCH likelihood term
// (position_snp_call_pprob_digt.cpp:346-352 val[0] = log(de)+log(1/3);
// match terms keep the raw eprob), so this pass emits the per-call
// ADDITIVE log-space delta
//     dep_delta = ln(de) - ln(e_raw)   (>= 0; zero when unadjusted)
// and its per-site per-base sum s_delta[l, b] — the only inputs the
// vectorized likelihood paths need. The first (highest-q) call of
// every group has de == e exactly, so singleton groups contribute
// nothing and most sites stay bit-identical to the unadjusted path.
//
// Per-group algorithm (adjust_icalls_eprob :96-186):
//   weight_i   = ln(0.75) - ln(e_i)
//   mfrac      = sum(weight over neighbor-mismatch calls) / sum(weight)
//   vexp_frac  = (1-mfrac)*ssd_no_mismatch + mfrac*ssd_one_mismatch
//   sort group by qscore descending; vexp starts at 1 and multiplies
//   by (1-vexp_frac) per call;
//   de_i = max(e, frac*val + (1-frac)*0.75),
//          val = e^vexp, frac = (1-val)/(1-e)   (get_dependent_eprob)
// Equal-q ties get the same multiset of de values regardless of sort
// order, and only group SUMS feed the likelihood, so the unstable
// std::sort in the reference does not make the result ill-defined.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {
constexpr double kLnRan = -0.2876820724517809;  // ln(0.75)
constexpr double kConverge = 0.75;

constexpr int kRankCap = 64;

inline double dep_delta_exact(double e, double lne, double vexp)
{
    const double val = std::exp(vexp * lne);
    const double frac = (1.0 - val) / (1.0 - e);
    const double de = std::max(e, frac * val + (1.0 - frac) * kConverge);
    return std::log(de) - lne;
}

// per-qscore LUTs: e, ln(e), the mismatch-frac weight, and — for the
// dominant mfrac==0 case where vexp_frac is EXACTLY ssd_no — the
// per-rank delta table (vexp = (1-ssd_no)^rank), so the inner loop is
// a table read instead of exp+log per call
struct QTabs {
    double e[256], ln_e[256], w[256];
    float delta0[256][kRankCap];
    double decay0 = 0.0;
    QTabs() {
        for (int q = 0; q < 256; ++q) {
            e[q] = std::pow(10.0, -q / 10.0);
            ln_e[q] = std::log(e[q]);
            w[q] = kLnRan - ln_e[q];
        }
    }
    void build_rank_table(double ssd_no) {
        decay0 = 1.0 - ssd_no;
        for (int q = 0; q < 256; ++q) {
            double vexp = 1.0;
            for (int r = 0; r < kRankCap; ++r) {
                delta0[q][r] =
                    r == 0 ? 0.0f
                           : (float)dep_delta_exact(e[q], ln_e[q], vexp);
                vexp *= decay0;
            }
        }
    }
};
QTabs kQ;
}

extern "C" {

int32_t dependent_eprob_delta(
    const int8_t* base,    // [L, D]
    const int16_t* qual,   // [L, D] mapq-adjusted qscore
    const uint8_t* used,   // [L, D]
    const uint8_t* fwd,    // [L, D]
    const uint8_t* nbmm,   // [L, D] neighbor-mismatch flags
    int64_t L, int64_t D,
    float ssd_no, float ssd_one,
    float* s_delta,        // [L, 4] out (callee zeroes)
    float* de_delta)       // [L, D] out or null (callee zeroes)
{
    const int n_threads = (int)std::min<int64_t>(
        std::max(1u, std::thread::hardware_concurrency()),
        std::max<int64_t>(L / 4096, 1));
    if (kQ.decay0 != 1.0 - (double)ssd_no)
        kQ.build_rank_table(ssd_no);  // single-threaded caller per opts

    auto run = [&](int64_t l0, int64_t l1) {
        // group members: indices into the site's depth axis, collected
        // for all 8 (strand, base) groups in ONE depth scan (the old
        // per-group re-scan tripled the depth traffic at typical sites,
        // where both ref-strand groups qualify)
        std::vector<int32_t> mem[8];
        for (int64_t l = l0; l < l1; ++l) {
            const int8_t* cb = base + l * D;
            const int16_t* cq = qual + l * D;
            const uint8_t* cu = used + l * D;
            const uint8_t* cf = fwd + l * D;
            const uint8_t* cn = nbmm + l * D;
            float* sd = s_delta + l * 4;
            sd[0] = sd[1] = sd[2] = sd[3] = 0.0f;
            float* dd = de_delta ? de_delta + l * D : nullptr;
            if (dd) std::memset(dd, 0, sizeof(float) * D);
            double num8[8], den8[8];
            for (int g = 0; g < 8; ++g) {
                mem[g].clear();
                num8[g] = den8[g] = 0.0;
            }
            for (int64_t d = 0; d < D; ++d) {
                if (!cu[d]) continue;
                const uint8_t b = (uint8_t)cb[d];
                if (b >= 4 || cq[d] < 3) continue;
                const int g = (cf[d] ? 1 : 0) + 2 * b;
                mem[g].push_back((int32_t)d);
                const double w = kQ.w[cq[d] & 255];
                den8[g] += w;
                if (cn[d]) num8[g] += w;
            }
            for (int g = 0; g < 8; ++g) {
                if ((int)mem[g].size() < 2)
                    continue;  // singleton: de == e exactly
                const uint8_t gb = (uint8_t)(g >> 1);
                std::vector<int32_t>& grp = mem[g];
                const double num = num8[g], den = den8[g];
                double mfrac = 0.0;
                if (den > 0.0) mfrac = num / den;
                const double vexp_frac =
                    (1.0 - mfrac) * ssd_no + mfrac * ssd_one;
                std::sort(grp.begin(), grp.end(),
                          [&](int32_t a, int32_t b2) {
                              return cq[a] > cq[b2];
                          });
                const bool lut_ok =
                    num == 0.0 && (int)grp.size() <= kRankCap;
                if (lut_ok) {
                    // mfrac == 0 exactly: per-rank deltas are in the
                    // precomputed (q, rank) table
                    int r = 0;
                    for (int32_t d : grp) {
                        const float delta = kQ.delta0[cq[d] & 255][r++];
                        sd[gb] += delta;
                        if (dd) dd[d] = delta;
                    }
                } else {
                    double vexp = 1.0;
                    bool first = true;
                    for (int32_t d : grp) {
                        if (first) {
                            // vexp == 1: de == e exactly, delta 0
                            first = false;
                            vexp *= (1.0 - vexp_frac);
                            continue;
                        }
                        const int qi = cq[d] & 255;
                        const float delta = (float)dep_delta_exact(
                            kQ.e[qi], kQ.ln_e[qi], vexp);
                        sd[gb] += delta;
                        if (dd) dd[d] = delta;
                        vexp *= (1.0 - vexp_frac);
                    }
                }
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
