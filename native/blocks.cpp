// strelka_tpu native gVCF hom-ref block compressor.
//
// Replaces the per-position Python loop over _DiploidBlock
// (pipeline/gvcf.py; reference semantics:
// gvcf_block_site_record.{hh,cpp} testCanSiteJoinSampleBlock /
// joinSiteToSampleBlock — sites join a block while the packed state
// key matches exactly (filters, GT code, caller ploidy, coverage
// states, GQX definedness) and gqx/dp/dpf stay within
// check_block_tolerance; gqx is only banded while its defined bit is
// set). Processes one hom-ref run [i0, i1) for one sample and emits
// row tuples the Python side formats into text.

#include <algorithm>
#include <cstdint>

namespace {

// key bit 14 = "GQX defined" (pipeline/gvcf.py _KEY_GQXDEF_BIT)
constexpr int64_t kGqxDefinedBit = int64_t(1) << 14;

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

// Row layout (int64 x 7): start_i, count, key, gqx_min, dp_sum,
// dpf_sum, dp_min. Returns the number of rows written (<= i1-i0).
int64_t block_compress_run2(
    const int64_t* key, const int32_t* gqx, const int32_t* dp,
    const int32_t* dpf,
    int64_t i0, int64_t i1,
    int32_t abs_tol, double frac_tol,
    int64_t* out)
{
    int64_t n_rows = 0;
    bool open = false;
    int64_t start = 0, count = 0, dp_sum = 0, dpf_sum = 0;
    int64_t cur_key = 0;
    Band bq{}, bd{}, bf{};

    auto flush = [&]()
    {
        if (!open) return;
        int64_t* r = out + 7 * n_rows++;
        r[0] = start;
        r[1] = count;
        r[2] = cur_key;
        r[3] = bq.lo;
        r[4] = dp_sum;
        r[5] = dpf_sum;
        r[6] = bd.lo;
        open = false;
    };

    for (int64_t i = i0; i < i1; ++i)
    {
        const int64_t k = key[i];
        const int32_t g = gqx[i], d = dp[i], f = dpf[i];
        if (open && (k != cur_key ||
                     ((k & kGqxDefinedBit) &&
                      !bq.fits(g, abs_tol, frac_tol)) ||
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
            cur_key = k;
            bq.reset(g);
            bd.reset(d);
            bf.reset(f);
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
