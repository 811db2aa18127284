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
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

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


// Serialize compressed block rows to gVCF lines (gvcf.py _block_line
// exactly: gvcf_writer write_site_record(block) semantics). The FILTER
// string for key&0xFF comes from a caller-built 256-entry table so the
// filter-name order/merging logic stays in one place (gvcf._key_fstr).
// Lines are '\n'-terminated; returns bytes written, or -1 if cap is
// too small (caller re-tries with a bigger buffer).
extern "C" int64_t block_format_lines(
    const int64_t* rows, int64_t n, int64_t begin,
    const uint8_t* ref_list, const char* chrom, const char* label,
    const char* fstr_blob, const int32_t* fstr_off,
    char* out, int64_t cap)
{
    static const char BASES[6] = "ACGTN";
    static const char* GT[3] = {"0/0", "0", "."};
    const size_t chrom_len = strlen(chrom);
    char* o = out;
    char* end = out + cap;
    for (int64_t i = 0; i < n; ++i)
    {
        const int64_t* r = rows + i * 7;
        const int64_t st = r[0], cnt = r[1], key = r[2], gqx_min = r[3];
        const int64_t dp_sum = r[4], dpf_sum = r[5], dp_min = r[6];
        const int32_t kf = (int32_t)(key & 0xff);
        if (end - o < 128 + (int64_t)chrom_len + strlen(label)
                      + (fstr_off[kf + 1] - fstr_off[kf])) return -1;
        memcpy(o, chrom, chrom_len); o += chrom_len;
        o += sprintf(o, "\t%lld\t.\t%c\t.\t.\t",
                     (long long)(begin + st + 1),
                     BASES[ref_list[st] > 4 ? 4 : ref_list[st]]);
        const int32_t k8 = (int32_t)(key & 0xff);
        const int32_t f0 = fstr_off[k8], f1 = fstr_off[k8 + 1];
        memcpy(o, fstr_blob + f0, f1 - f0); o += f1 - f0;
        if (cnt == 1)
            o += sprintf(o, "\t.\t");
        else
            o += sprintf(o, "\tEND=%lld;%s\t",
                         (long long)(begin + st + cnt), label);
        o += sprintf(o, "GT:GQX:DP:DPF:MIN_DP\t%s:",
                     GT[(key >> 8) & 3]);
        if (key & (1 << 14))
            o += sprintf(o, "%lld:", (long long)gqx_min);
        else
            { *o++ = '.'; *o++ = ':'; }
        // floor(x + 0.5) == gvcf._round_half (half away from zero for
        // the non-negative means here)
        const long long dpr = (long long)floor(dp_sum / (double)cnt + 0.5);
        const long long dfr = (long long)floor(dpf_sum / (double)cnt + 0.5);
        o += sprintf(o, "%lld:%lld:%lld\n", dpr, dfr, (long long)dp_min);
    }
    return o - out;
}

}  // extern "C"

