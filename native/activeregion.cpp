// strelka_tpu native active-region primitives:
//  - anchor_spans: STR-repeat coverage -> per-position anchor mask
//    (reference: blt_util/ReferenceRepeatFinder.cpp updateRepeatSpan;
//    semantics match pipeline/active_region.py anchor_mask exactly)
//  - active_regions: the region state machine over candidate/anchor
//    positions (reference: starling_common/ActiveRegionDetector.cpp
//    SampleActiveRegionDetector::updateEndPosition :337-410; matches
//    pipeline/active_region.py find_active_regions exactly)

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

constexpr int kMaxRepeatUnit = 50;
constexpr int kMinRepeatSpan = 3;
constexpr int64_t kMinVariantsPerPos = 9;
constexpr double kMinAltFrac = 0.2;
constexpr double kMinAltFracLowDepth = 0.35;
constexpr int64_t kMaxDistBetweenVariants = 13;
constexpr int64_t kMinVariantsPerRegion = 2;

}  // namespace

extern "C" {

// anchor[i] = 1 iff position i is not inside any STR (unit <= 50)
// whose span >= max(2*unit, 3).
void anchor_spans(const uint8_t* ref, int64_t L, uint8_t* anchor)
{
    // diff array over all units: covered[i] > 0 -> non-anchor
    std::vector<int32_t> diff(L + 1, 0);
    for (int64_t u = 1; u <= kMaxRepeatUnit; ++u)
    {
        if (u >= L) break;
        int64_t run = 0;
        for (int64_t i = u; i < L; ++i)
        {
            const bool m = (ref[i] == ref[i - u]) && (ref[i - u] != 4);
            run = m ? run + 1 : 0;
            const int64_t span = u + run;
            if (run > 0 && span >= 2 * u && span >= kMinRepeatSpan)
            {
                const int64_t s = std::max<int64_t>(i - span + 1, 0);
                diff[s] += 1;
                diff[i + 1] -= 1;
            }
        }
    }
    int64_t cov = 0;
    for (int64_t i = 0; i < L; ++i)
    {
        cov += diff[i];
        anchor[i] = (cov > 0) ? 0 : 1;
    }
}

// Region state machine. Writes up to L/2 (begin, end) pairs into
// out_begin/out_end (absolute coordinates, end half-open); returns the
// region count.
int64_t active_regions(
    const int64_t* counts, const int64_t* depth, const uint8_t* anchors,
    const uint8_t* ref, int64_t L, int64_t region_begin,
    int64_t* out_begin, int64_t* out_end)
{
    int64_t n_out = 0;
    int64_t start_pos = region_begin;
    int64_t prev_anchor = region_begin;
    int64_t aapv = region_begin;  // anchor_after_prev_variant
    bool has_aapv = true;
    int64_t prev_variant_pos = region_begin - 10000;
    int64_t num_variants = 0;

    for (int64_t i = 0; i < L; ++i)
    {
        const bool is_cand =
            (ref[i] != 4) &&
            (((counts[i] >= kMinVariantsPerPos) &&
              ((double)counts[i] >= kMinAltFrac * (double)depth[i])) ||
             ((double)counts[i] >=
              kMinAltFracLowDepth * (double)std::max<int64_t>(depth[i], 1)));
        const bool is_anchor = anchors[i] && !is_cand;
        if (!is_cand && !is_anchor) continue;

        const int64_t pos = region_begin + i;
        bool cand = is_cand;
        if (cand && depth[i] == 0 && num_variants == 0)
        {
            // zero-depth candidate can't open a region; is_anchor is
            // necessarily false here (anchor excludes candidates)
            continue;
        }
        const bool anchor = is_anchor && !cand;
        const int64_t dist = pos - prev_variant_pos;
        if (dist > kMaxDistBetweenVariants && has_aapv)
        {
            if (num_variants >= kMinVariantsPerRegion)
            {
                out_begin[n_out] = start_pos;
                out_end[n_out] = aapv + 1;
                ++n_out;
            }
            num_variants = 0;
        }
        if (anchor)
        {
            if (num_variants == 0) start_pos = pos;
            if (!has_aapv) { aapv = pos; has_aapv = true; }
            prev_anchor = pos;
        }
        if (cand)
        {
            if (num_variants == 0) start_pos = prev_anchor;
            ++num_variants;
            prev_variant_pos = pos;
            has_aapv = false;
        }
    }
    if (num_variants >= kMinVariantsPerRegion)
    {
        const int64_t end = has_aapv ? aapv : region_begin + L - 1;
        out_begin[n_out] = start_pos;
        out_end[n_out] = end + 1;
        ++n_out;
    }
    return n_out;
}

// Affine-gap global alignment of query onto ref, exact port of
// ops/aligner.py align_global (reference: alignment/GlobalAligner.hh,
// GlobalAlignerImpl.hh) including every tie-break: previous-state
// preference M >= D >= I, gap-open >= gap-extend, and final-state
// argmax order (M, D, I). Emits run-length CIGAR (ops 0=M 1=I 2=D).
// Returns the alignment score; n_ops via out param. Caller provides
// ops/lens arrays of capacity n+m.
int64_t align_affine(
    const uint8_t* query, int64_t n, const uint8_t* ref, int64_t m,
    int64_t s_match, int64_t s_mismatch, int64_t s_open, int64_t s_extend,
    int8_t* out_ops, int32_t* out_lens, int64_t* n_ops_out)
{
    constexpr int64_t NEG = -1000000000LL;
    constexpr int8_t MS = 0, DS = 1, IS = 2;  // state codes
    const int64_t W = m + 1;
    thread_local std::vector<int64_t> bufM, bufD, bufI;
    thread_local std::vector<int8_t> bufPM, bufPD, bufPI;
    const size_t cells = (size_t)(n + 1) * W;
    if (bufM.size() < cells)
    {
        bufM.resize(cells); bufD.resize(cells); bufI.resize(cells);
        bufPM.resize(cells); bufPD.resize(cells); bufPI.resize(cells);
    }
    int64_t* M = bufM.data();
    int64_t* D = bufD.data();
    int64_t* I = bufI.data();
    int8_t* pM = bufPM.data();
    int8_t* pD = bufPD.data();
    int8_t* pI = bufPI.data();

    for (int64_t j = 0; j <= m; ++j)
    {
        M[j] = NEG; I[j] = NEG; pM[j] = 0; pD[j] = 0; pI[j] = 0;
        D[j] = (j == 0) ? NEG : s_open + s_extend * j;
        if (j > 0) pD[j] = DS;
    }
    M[0] = 0;

    for (int64_t i = 1; i <= n; ++i)
    {
        const uint8_t qb = query[i - 1];
        int64_t* Mr = M + i * W; const int64_t* Mp = M + (i - 1) * W;
        int64_t* Dr = D + i * W; const int64_t* Dp = D + (i - 1) * W;
        int64_t* Ir = I + i * W; const int64_t* Ip = I + (i - 1) * W;
        int8_t* pMr = pM + i * W;
        int8_t* pDr = pD + i * W;
        int8_t* pIr = pI + i * W;

        // j == 0 column: M/D are NEG; I follows the leading-gap chain
        Mr[0] = NEG; pMr[0] = 0;
        Dr[0] = NEG; pDr[0] = 0;
        {
            const int64_t a = Mp[0] + s_open + s_extend;
            const int64_t b = Ip[0] + s_extend;
            Ir[0] = std::max(std::max(a, b),
                             s_open + s_extend * i);  // init value (equal)
            pIr[0] = (a >= b) ? MS : IS;
        }
        for (int64_t j = 1; j <= m; ++j)
        {
            const int64_t sub =
                (ref[j - 1] == qb) ? s_match : s_mismatch;
            const int64_t pm = Mp[j - 1], pd = Dp[j - 1], pi = Ip[j - 1];
            int64_t best; int8_t from;
            if (pm >= std::max(pd, pi)) { best = pm; from = MS; }
            else if (pd >= pi) { best = pd; from = DS; }
            else { best = pi; from = IS; }
            Mr[j] = best + sub;
            pMr[j] = from;

            const int64_t ia = Mp[j] + s_open + s_extend;
            const int64_t ib = Ip[j] + s_extend;
            Ir[j] = std::max(ia, ib);
            pIr[j] = (ia >= ib) ? MS : IS;

            const int64_t da = Mr[j - 1] + s_open + s_extend;
            const int64_t db = Dr[j - 1] + s_extend;
            if (da >= db) { Dr[j] = da; pDr[j] = MS; }
            else { Dr[j] = db; pDr[j] = DS; }
        }
    }

    const int64_t fM = M[n * W + m], fD = D[n * W + m], fI = I[n * W + m];
    int8_t state;
    int64_t score;
    if (fM >= fD && fM >= fI) { state = MS; score = fM; }
    else if (fD >= fI) { state = DS; score = fD; }
    else { state = IS; score = fI; }

    // traceback into a reversed op buffer, then run-length encode
    thread_local std::vector<int8_t> rev;
    rev.clear();
    int64_t i = n, j = m;
    while (i > 0 || j > 0)
    {
        if (state == MS)
        {
            if (i == 0 || j == 0) break;
            const int8_t prev = pM[i * W + j];
            rev.push_back(0);  // cg.MATCH
            --i; --j;
            state = prev;
        }
        else if (state == DS)
        {
            const int8_t prev = pD[i * W + j];
            rev.push_back(2);  // cg.DELETE
            --j;
            state = prev;
        }
        else
        {
            const int8_t prev = pI[i * W + j];
            rev.push_back(1);  // cg.INSERT
            --i;
            state = prev;
        }
    }
    int64_t n_ops = 0;
    for (int64_t k = (int64_t)rev.size() - 1; k >= 0; --k)
    {
        const int8_t o = rev[k];
        if (n_ops > 0 && out_ops[n_ops - 1] == o) out_lens[n_ops - 1] += 1;
        else { out_ops[n_ops] = o; out_lens[n_ops] = 1; ++n_ops; }
    }
    *n_ops_out = n_ops;
    return score;
}

// Per spanning read: locate the read-offset window aligned to
// [begin, end-1] from the match tables (rows [row_lo, row_hi) per
// read, refpos ascending within a read), and validate it (both
// boundary bases aligned, no N in the covered read bases).
// Matches pipeline/active_region.py read_segments_for_region exactly.
void region_segments(
    const int32_t* match_refpos, const int32_t* match_readoff,
    const int64_t* row_lo, const int64_t* row_hi, int64_t n_spanning,
    const int64_t* read_idx, const uint8_t* seq, const int64_t* seq_off,
    int64_t begin, int64_t end,
    int64_t* o0_out, int64_t* o1_out, uint8_t* valid_out)
{
    for (int64_t k = 0; k < n_spanning; ++k)
    {
        valid_out[k] = 0;
        const int32_t* lo = match_refpos + row_lo[k];
        const int32_t* hi = match_refpos + row_hi[k];
        if (lo >= hi) continue;
        const int32_t* p0 = std::lower_bound(lo, hi, (int32_t)begin);
        if (p0 == hi || *p0 != (int32_t)begin) continue;
        const int32_t* p1 = std::upper_bound(lo, hi, (int32_t)(end - 1));
        if (p1 == lo || *(p1 - 1) != (int32_t)(end - 1)) continue;
        const int64_t o0 = match_readoff[p0 - match_refpos];
        const int64_t o1 = match_readoff[(p1 - 1) - match_refpos];
        const uint8_t* s = seq + seq_off[read_idx[k]];
        bool has_n = false;
        for (int64_t j = o0; j <= o1; ++j)
            if (s[j] >= 4) { has_n = true; break; }
        if (has_n) continue;
        o0_out[k] = o0;
        o1_out[k] = o1;
        valid_out[k] = 1;
    }
}

// Whole-batch per-base scoring cache in one pass: per-base delta
// (lut_delta[q] at called bases, 0 at N) and per-read sequential-f32
// lnmis sums / called-base counts. LUT values come from Python so the
// f32 entries match the numpy path bitwise; the only arithmetic here
// is the same sequential f32 accumulation as np.add.at.
void base_cache(
    const uint8_t* seq, const uint8_t* qual, const int64_t* seq_off,
    int64_t n_reads, const float* lut_delta, const float* lut_lmis,
    float* delta_out /* [nbases] */, float* lnmis_out /* [n_reads] */,
    int32_t* nvalid_out /* [n_reads] */)
{
    for (int64_t r = 0; r < n_reads; ++r)
    {
        float s = 0.0f;
        int32_t nv = 0;
        for (int64_t i = seq_off[r]; i < seq_off[r + 1]; ++i)
        {
            if (seq[i] < 4)
            {
                const int q = std::min<int>(qual[i], 127);
                delta_out[i] = lut_delta[q];
                s += lut_lmis[q];
                ++nv;
            }
            else
            {
                delta_out[i] = 0.0f;
            }
        }
        lnmis_out[r] = s;
        nvalid_out[r] = nv;
    }
}

}  // extern "C"
