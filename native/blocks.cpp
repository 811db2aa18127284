// strelka_tpu native gVCF hom-ref block compressor.
//
// Replaces the per-position Python loop over BlockState
// (pipeline/gvcf.py BlockState.can_join/add; reference semantics:
// gvcf_block_site_record.hh — sites join a block while gqx/dp/dpf stay
// within max(lo+abs_tol, lo*(1+frac_tol)) of the running min and the
// filter string matches). Processes one hom-ref run [i0, i1) for one
// sample and emits row tuples the Python side formats into text.

#include <algorithm>
#include <cstdint>

namespace {

struct Band
{
    int32_t lo, hi;
    void reset(int32_t v) { lo = hi = v; }
    // exact port of gvcf_block_site_record.cpp check_block_tolerance
    // over the running [lo, hi] extended by v: (min + tol) >= max/2
    // with the abs/frac two-stage rule
    bool fits(int32_t v, int32_t abs_tol, double frac_tol) const
    {
        const int32_t m = std::min(lo, v);
        const int32_t h = std::max(hi, v);
        if ((m + abs_tol) >= h / 2.0) return true;
        const int32_t ftol = static_cast<int32_t>(m * frac_tol);
        if (ftol <= abs_tol) return false;
        return (m + ftol) >= h / 2.0;
    }
    void add(int32_t v)
    {
        lo = std::min(lo, v);
        hi = std::max(hi, v);
    }
};

}  // namespace

extern "C" {

// Row layout (int64 x 9):
//   kind(0=block,1=single-site), start_i, count,
//   gqx_min, dp_sum, dpf_sum, dp_min, fcode, gt_code
// gt codes: 0="0/0" 1="0" 2="." 3="./." (from the block's FIRST site).
// Returns the number of rows written (<= i1-i0).
int64_t block_compress_run(
    const int32_t* gqx, const int32_t* dp, const int32_t* dpf,
    const int8_t* fcode, const uint8_t* nonref_ok,
    const int8_t* ploidy /* may be null -> diploid */,
    const uint8_t* nocompress /* may be null */,
    int64_t i0, int64_t i1,
    int32_t abs_tol, double frac_tol,
    int64_t* out)
{
    int64_t n_rows = 0;
    bool open = false;
    int64_t start = 0, count = 0, dp_sum = 0, dpf_sum = 0;
    Band bq{}, bd{}, bf{};
    int8_t cur_f = 0;
    int64_t gt_code = 0;
    int cur_pl = 2;
    bool cur_used_cov = false;

    auto flush = [&]()
    {
        if (!open) return;
        int64_t* r = out + 9 * n_rows++;
        r[0] = 0;
        r[1] = start;
        r[2] = count;
        r[3] = bq.lo;
        r[4] = dp_sum;
        r[5] = dpf_sum;
        r[6] = bd.lo;
        r[7] = cur_f;
        r[8] = gt_code;
        open = false;
    };

    for (int64_t i = i0; i < i1; ++i)
    {
        const int32_t g = gqx[i], d = dp[i], f = dpf[i];
        if (!nonref_ok[i] || (nocompress && nocompress[i]))
        {
            // always emitted as an individual site record
            flush();
            int64_t* r = out + 9 * n_rows++;
            r[0] = 1;
            r[1] = i;
            r[2] = 1;
            r[3] = g;
            r[4] = d;
            r[5] = f;
            r[6] = d;
            r[7] = fcode[i];
            r[8] = 0;
            continue;
        }
        const bool covered = (d + f) > 0;
        const bool used_cov = d > 0;
        const int pl = ploidy ? ploidy[i] : 2;
        const int64_t gtc = (pl == 0) ? 2
                            : (pl == 1) ? (covered ? 1 : 2)
                                        : (covered ? 0 : 3);
        // join requires filter/genotype/ploidy/coverage-state equality
        // + every tracked value within check_block_tolerance
        // (testCanSiteJoinSampleBlockShared)
        if (open && (fcode[i] != cur_f ||
                     gtc != gt_code ||
                     pl != cur_pl ||
                     used_cov != cur_used_cov ||
                     !bq.fits(g, abs_tol, frac_tol) ||
                     !bd.fits(d, abs_tol, frac_tol) ||
                     !bf.fits(f, abs_tol, frac_tol)))
        {
            flush();
        }
        if (!open)
        {
            open = true;
            start = i;
            count = 0;
            dp_sum = dpf_sum = 0;
            bq.reset(g);
            bd.reset(d);
            bf.reset(f);
            cur_f = fcode[i];
            gt_code = gtc;
            cur_pl = pl;
            cur_used_cov = used_cov;
        }
        else
        {
            bq.add(g);
            bd.add(d);
            bf.add(f);
        }
        ++count;
        dp_sum += d;
        dpf_sum += f;
    }
    flush();
    return n_rows;
}

}  // extern "C"
