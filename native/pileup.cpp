// strelka_tpu native pileup: one pass over reads builds the dense
// [positions, depth] basecall tile with integrated mismatch-density
// filtering and per-position counters.
//
// Replaces the numpy scatter pipeline (pipeline/pileup.py +
// pipeline/reads.py mismatch_density_filter) for the host-side hot
// path; semantics match the Python implementation exactly (which in
// turn mirrors the reference's pileup_read_segment +
// create_mismatch_filter_map).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kTier1 = 0;
constexpr int kTier2 = 1;
constexpr int kSubMapped = 2;

constexpr int8_t OP_M = 0, OP_I = 1, OP_D = 2, OP_N = 3, OP_S = 4,
                 OP_H = 5, OP_EQ = 7, OP_X = 8;

inline bool op_is_match(int8_t o) { return o == OP_M || o == OP_EQ || o == OP_X; }
inline bool op_reads(int8_t o) { return op_is_match(o) || o == OP_I || o == OP_S; }
inline bool op_refs(int8_t o) { return op_is_match(o) || o == OP_D || o == OP_N; }

// phred -> error prob table
struct Tables
{
    double eprob[128];
    Tables()
    {
        for (int q = 0; q < 128; ++q) eprob[q] = std::pow(10.0, -q / 10.0);
    }
};
const Tables kTab;

// (rawq, amq) -> adjusted q, precomputed: the pow/log10 pair per
// basecall otherwise dominates the fill pass
struct AdjQTable
{
    int16_t t[81 * 128];
    AdjQTable()
    {
        for (int amq = 0; amq <= 80; ++amq)
            for (int rawq = 0; rawq < 128; ++rawq)
            {
                const double be = kTab.eprob[rawq];
                const double me = kTab.eprob[amq];
                const double e = (1.0 - me) * be + me * 0.75;
                const double q = -10.0 * std::log10(std::max(e, 1e-300));
                t[amq * 128 + rawq] =
                    (int16_t)std::lround(std::min(q, 999.0));
            }
    }
};
const AdjQTable kAdj;

inline int mapq_adjusted_q(int rawq, int mapq)
{
    const int amq = std::max(mapq, 5);
    if (amq > 80) return rawq;
    return kAdj.t[amq * 128 + std::min(rawq, 127)];
}

struct ReadView
{
    const int64_t* pos;
    const uint8_t* mapq;
    const uint16_t* flag;
    const int8_t* level;
    const int64_t* seq_off;
    const uint8_t* seq;
    const uint8_t* qual;
    const int64_t* cig_off;
    const int8_t* cig_ops;
    const int32_t* cig_lens;
    int64_t n;
};

// N-run trim (getReadAmbiguousEndLength semantics)
inline void ambiguous_trim(const ReadView& rv, int64_t r, int64_t& rb, int64_t& re)
{
    const int64_t s0 = rv.seq_off[r], s1 = rv.seq_off[r + 1];
    rb = 0;
    re = s1 - s0;
    if (re == 0) return;
    const bool rev = (rv.flag[r] & 0x10) != 0;
    if (rev)
    {
        while (rb < re && rv.seq[s0 + rb] == 4) ++rb;
    }
    else
    {
        while (re > rb && rv.seq[s0 + re - 1] == 4) --re;
    }
}

// per-read MMDF: returns per-base filter flags in mmf/t2f (len = read len)
void mmdf_read(const ReadView& rv, int64_t r,
               const uint8_t* ref, int64_t ref_off, int64_t ref_len,
               int flank, int max_mm, int t2_max_mm,
               const int64_t* exempt_keys, int64_t n_exempt,
               int64_t rb, int64_t re,
               std::vector<int32_t>& delta, std::vector<uint8_t>& mmf,
               std::vector<uint8_t>& t2f, std::vector<uint8_t>& nbm)
{
    const int64_t S = rv.seq_off[r + 1] - rv.seq_off[r];
    const int F = flank, F2 = 2 * flank;
    const int64_t DL = std::max<int64_t>(1 + F2, S) - F2;
    delta.assign(DL, 0);
    mmf.assign(S, 0);
    t2f.assign(S, 0);
    nbm.assign(S, 0);  // doubles as the per-pos self-mismatch marker

    auto inc = [&](int64_t start, int64_t length)
    {
        delta[std::max<int64_t>(F2, start) - F2] += 1;
        if (start + length < DL) delta[start + length] -= 1;
    };

    // find match edge segments (leading/trailing non-match are "edge")
    const int64_t c0 = rv.cig_off[r], c1 = rv.cig_off[r + 1];
    int64_t first_m = -1, last_m = -1;
    for (int64_t c = c0; c < c1; ++c)
        if (op_is_match(rv.cig_ops[c])) { if (first_m < 0) first_m = c; last_m = c; }

    int64_t read_p = 0;
    int64_t ref_p = rv.pos[r];
    const int64_t s0 = rv.seq_off[r];
    for (int64_t c = c0; c < c1; ++c)
    {
        const int8_t op = rv.cig_ops[c];
        const int32_t ln = rv.cig_lens[c];
        const bool edge = (c < first_m) || (c > last_m);
        if (op_is_match(op))
        {
            for (int32_t j = 0; j < ln; ++j)
            {
                const int64_t rp = read_p + j;
                if (rp < rb || rp >= re) continue;
                const int64_t gp = ref_p + j - ref_off;
                if (gp < 0 || gp >= ref_len) continue;
                // NOTE: N read bases DO count as mismatches (the
                // reference compares chars, create_mismatch_filter_map)
                const uint8_t b = rv.seq[s0 + rp];
                const uint8_t fb = ref[gp];
                if (b != fb && fb < 4)
                {
                    if (n_exempt)
                    {
                        const int64_t key = (ref_p + j) * 4 + b;
                        if (std::binary_search(exempt_keys,
                                               exempt_keys + n_exempt, key))
                            continue;
                    }
                    inc(rp, 1);
                    nbm[rp] = 1;  // rmi[].is_mismatch
                }
            }
        }
        else if (op == OP_I)
        {
            if (!edge) inc(read_p, ln);
        }
        else if (op == OP_D)
        {
            if (!edge) inc(read_p, 0);
        }
        if (op_reads(op)) read_p += ln;
        if (op_refs(op)) ref_p += ln;
    }
    for (int64_t i = 1; i < DL; ++i) delta[i] += delta[i - 1];
    for (int64_t p = 0; p < S; ++p)
    {
        const int64_t samp = std::min(DL - 1, std::max<int64_t>(F, p) - F);
        const int32_t cnt = delta[samp];
        mmf[p] = cnt > max_mm;
        t2f[p] = (t2_max_mm >= 0) ? (cnt > t2_max_mm) : mmf[p];
        // neighbor mismatch: windowed count excluding this position's
        // own mismatch (mismatch_count_ns, starling_read_util.cpp:211;
        // feeds adjust_joint_eprob's vexp_frac weighting)
        nbm[p] = (cnt - (int32_t)nbm[p]) > 0;
    }
}

}  // namespace

extern "C" {

// Pass 1: per-position tier1/2 aligned-base depth. Returns max depth.
int64_t pileup_scan(
    const int64_t* pos, const uint8_t* mapq, const uint16_t* flag,
    const int8_t* level, const int64_t* seq_off, const uint8_t* seq,
    const uint8_t* qual, const int64_t* cig_off, const int8_t* cig_ops,
    const int32_t* cig_lens, int64_t n_reads,
    int64_t region_begin, int64_t region_end,
    int32_t* depth /* L */)
{
    ReadView rv{pos, mapq, flag, level, seq_off, seq, qual, cig_off,
                cig_ops, cig_lens, n_reads};
    const int64_t L = region_end - region_begin;
    std::memset(depth, 0, sizeof(int32_t) * L);
    for (int64_t r = 0; r < n_reads; ++r)
    {
        if (level[r] != kTier1 && level[r] != kTier2) continue;
        int64_t rb, re;
        ambiguous_trim(rv, r, rb, re);
        int64_t read_p = 0, ref_p = pos[r];
        for (int64_t c = cig_off[r]; c < cig_off[r + 1]; ++c)
        {
            const int8_t op = cig_ops[c];
            const int32_t ln = cig_lens[c];
            if (op_is_match(op))
            {
                const int64_t lo = std::max(ref_p, region_begin);
                const int64_t hi = std::min<int64_t>(ref_p + ln, region_end);
                for (int64_t g = lo; g < hi; ++g)
                {
                    const int64_t rp = read_p + (g - ref_p);
                    if (rp >= rb && rp < re) depth[g - region_begin]++;
                }
            }
            if (op_reads(op)) read_p += ln;
            if (op_refs(op)) ref_p += ln;
        }
    }
    int64_t mx = 0;
    for (int64_t i = 0; i < L; ++i) mx = std::max<int64_t>(mx, depth[i]);
    return mx;
}

}  // extern "C"

namespace {

// The fill body over reads [r_lo, r_hi), writing only positions in
// [stripe_begin, stripe_end). Column outputs are indexed relative to
// region_begin; stripes partition the region so column writes are
// disjoint across threads, and each thread walks reads in global
// order, preserving the exact per-column stacking order of the
// single-thread pass.
int32_t fill_stripe(
    const ReadView& rv,
    const uint8_t* ref, int64_t ref_off, int64_t ref_len,
    int64_t region_begin, int64_t region_end,
    int64_t stripe_begin, int64_t stripe_end,
    int64_t r_lo, int64_t r_hi,
    int32_t min_qscore, int32_t mapq_adjust,
    int32_t mm_flank, int32_t mm_max, int32_t t2_mm_max,
    const int64_t* exempt_keys, int64_t n_exempt,
    int32_t D, int32_t* slot,
    int8_t* t_base, int16_t* t_qual, int16_t* t_rawq, uint8_t* t_fwd,
    int32_t* t_ridx, int32_t* t_roff, uint8_t* t_valid, uint8_t* t_used,
    uint8_t* t_t2used, uint8_t* t_nbmm,
    int32_t* spandel, int32_t* submapped, int32_t* mapq_n,
    double* mapq_sumsq, int32_t* mapq_zero,
    int32_t* used_counts, int32_t* used_fwd_counts,
    int64_t* edge_dist_sum)
{
    const int64_t* pos = rv.pos;
    const uint8_t* mapq = rv.mapq;
    const uint16_t* flag = rv.flag;
    const int8_t* level = rv.level;
    const int64_t* seq_off = rv.seq_off;
    const uint8_t* seq = rv.seq;
    const uint8_t* qual = rv.qual;
    const int64_t* cig_off = rv.cig_off;
    const int8_t* cig_ops = rv.cig_ops;
    const int32_t* cig_lens = rv.cig_lens;
    (void)region_end;  // column indexing is region_begin-relative
    std::vector<int32_t> delta;
    std::vector<uint8_t> mmf, t2f, nbm;

    for (int64_t r = r_lo; r < r_hi; ++r)
    {
        const int lvl = level[r];
        if (lvl != kTier1 && lvl != kTier2 && lvl != kSubMapped) continue;
        int64_t rb, re;
        ambiguous_trim(rv, r, rb, re);
        const bool submap = (lvl == kSubMapped);
        const bool is_t1 = (lvl == kTier1);
        const bool fwd = (flag[r] & 0x10) == 0;
        const int mq = mapq[r];

        const bool use_mmdf = !submap && mm_flank > 0;
        if (use_mmdf)
            mmdf_read(rv, r, ref, ref_off, ref_len, mm_flank, mm_max,
                      t2_mm_max, exempt_keys, n_exempt, rb, re, delta,
                      mmf, t2f, nbm);

        int64_t read_p = 0, ref_p = pos[r];
        const int64_t s0 = seq_off[r];
        const int64_t c0 = cig_off[r], c1 = cig_off[r + 1];
        int64_t first_m = -1, last_m = -1;
        for (int64_t c = c0; c < c1; ++c)
            if (op_is_match(cig_ops[c])) { if (first_m < 0) first_m = c; last_m = c; }

        for (int64_t c = c0; c < c1; ++c)
        {
            const int8_t op = cig_ops[c];
            const int32_t ln = cig_lens[c];
            if (op_is_match(op))
            {
                for (int32_t j = 0; j < ln; ++j)
                {
                    const int64_t g = ref_p + j;
                    if (g < stripe_begin || g >= stripe_end) continue;
                    const int64_t rp = read_p + j;
                    if (rp < rb || rp >= re) continue;
                    const int64_t li = g - region_begin;
                    // mapq stats over all mapped levels
                    mapq_n[li]++;
                    mapq_sumsq[li] += (double)mq * mq;
                    if (mq == 0) mapq_zero[li]++;
                    if (submap)
                    {
                        submapped[li]++;
                        continue;
                    }
                    const int32_t d = slot[li]++;
                    if (d >= D) return 1;  // depth overflow
                    const uint8_t b = seq[s0 + rp];
                    const int rawq = qual[s0 + rp];
                    const int adjq = mapq_adjust ? mapq_adjusted_q(rawq, mq) : rawq;
                    const int64_t ti = (int64_t)li * D + d;
                    t_base[ti] = (int8_t)b;
                    t_qual[ti] = (int16_t)adjq;
                    t_rawq[ti] = (int16_t)rawq;
                    t_fwd[ti] = fwd;
                    t_ridx[ti] = (int32_t)r;
                    t_roff[ti] = (int32_t)rp;
                    t_valid[ti] = 1;
                    t_nbmm[ti] = use_mmdf ? nbm[rp] : 0;
                    bool filt = (b == 4) || (rawq < min_qscore);
                    bool t2filt = filt;
                    if (!filt && use_mmdf)
                    {
                        filt = mmf[rp] != 0;
                        t2filt = (t2_mm_max >= 0) ? (t2f[rp] != 0) : filt;
                    }
                    const bool used = is_t1 && !filt;
                    t_used[ti] = used;
                    t_t2used[ti] = !t2filt;
                    if (used && b < 4)
                    {
                        used_counts[li * 4 + b]++;
                        if (fwd) used_fwd_counts[li * 4 + b]++;
                    }
                    if (used && edge_dist_sum)
                    {
                        const int64_t rsize = seq_off[r + 1] - seq_off[r];
                        const int64_t tail = rsize - 1 - rp;
                        edge_dist_sum[li] +=
                            std::min(rp, std::max<int64_t>(tail, 0));
                    }
                }
            }
            else if (op == OP_D)
            {
                const bool edge = (c < first_m) || (c > last_m);
                if (!edge)
                {
                    for (int32_t j = 0; j < ln; ++j)
                    {
                        const int64_t g = ref_p + j;
                        if (g < stripe_begin || g >= stripe_end) continue;
                        if (!submap) spandel[g - region_begin]++;
                    }
                }
            }
            if (op_reads(op)) read_p += ln;
            if (op_refs(op)) ref_p += ln;
        }
    }

    // Zero the unfilled tail lanes of every tile row in this stripe
    // (t_ridx tail reads as -1 for callers that index read arrays
    // through the tile). The caller hands the tiles over UNINITIALIZED
    // — zeroing here instead of a Python-side whole-arena fill touches
    // only the tail bytes, threaded, with the row's pages already warm
    // from the fill above (the arena memset was the single largest
    // cost of indel-dense host profiles: ~3s per fresh 400kb region on
    // a page-fault-bound VM).
    for (int64_t g = stripe_begin; g < stripe_end; ++g)
    {
        const int64_t li = g - region_begin;
        const int32_t s = slot[li];
        if (s >= D) continue;
        const int64_t off = li * (int64_t)D + s;
        const int64_t n = D - s;
        std::memset(t_base + off, 0, n);
        std::memset(t_qual + off, 0, n * sizeof(int16_t));
        std::memset(t_rawq + off, 0, n * sizeof(int16_t));
        std::memset(t_fwd + off, 0, n);
        std::memset(t_roff + off, 0, n * sizeof(int32_t));
        std::memset(t_valid + off, 0, n);
        std::memset(t_used + off, 0, n);
        std::memset(t_t2used + off, 0, n);
        std::memset(t_nbmm + off, 0, n);
        for (int64_t d = 0; d < n; ++d) t_ridx[off + d] = -1;
    }
    return 0;
}

}  // namespace

extern "C" {

// Pass 2: fill the dense tile + counters. slot[] is scratch of L int32
// (zeroed by caller). Returns 0 on success, 1 on depth overflow.
// Parallelized over disjoint position stripes; per-column output order
// is identical to a single-thread pass.
int32_t pileup_fill(
    const int64_t* pos, const uint8_t* mapq, const uint16_t* flag,
    const int8_t* level, const int64_t* seq_off, const uint8_t* seq,
    const uint8_t* qual, const int64_t* cig_off, const int8_t* cig_ops,
    const int32_t* cig_lens, int64_t n_reads,
    const uint8_t* ref, int64_t ref_off, int64_t ref_len,
    int64_t region_begin, int64_t region_end,
    int32_t min_qscore, int32_t mapq_adjust,
    int32_t mm_flank, int32_t mm_max, int32_t t2_mm_max,
    const int64_t* exempt_keys, int64_t n_exempt,
    int32_t D,
    int32_t* slot,
    // tile outputs [L, D] (narrow dtypes: the tiles dominate memory
    // traffic at whole-region scale)
    int8_t* t_base, int16_t* t_qual, int16_t* t_rawq, uint8_t* t_fwd,
    int32_t* t_ridx, int32_t* t_roff, uint8_t* t_valid, uint8_t* t_used,
    uint8_t* t_t2used, uint8_t* t_nbmm,
    // per-position outputs [L] (+ [L,4] counts)
    int32_t* spandel, int32_t* submapped, int32_t* mapq_n,
    double* mapq_sumsq, int32_t* mapq_zero,
    int32_t* used_counts, int32_t* used_fwd_counts,
    int64_t* edge_dist_sum /* [L], sum of min-dist-from-read-edge over
                              used calls; may be null */)
{
    ReadView rv{pos, mapq, flag, level, seq_off, seq, qual, cig_off,
                cig_ops, cig_lens, n_reads};
    const int64_t L = region_end - region_begin;

    const unsigned hw = std::thread::hardware_concurrency();
    int64_t T = std::min<int64_t>(hw ? hw : 1, 8);
    T = std::min(T, std::max<int64_t>(L / 65536, 1));
    if (n_reads < 4096) T = 1;

    // stripe read windows need pos sorted ascending; post-realignment
    // batches can carry locally moved (unsorted) positions, in which
    // case every stripe walks all reads (the position test inside
    // fill_stripe keeps writes correct)
    bool pos_sorted = true;
    if (T > 1)
        for (int64_t r = 1; r < n_reads; ++r)
            if (pos[r] < pos[r - 1]) { pos_sorted = false; break; }

    // max ref span over reads bounds the halo a stripe's read window
    // needs (only used when stripes can window reads at all)
    int64_t max_span = 1;
    if (T > 1 && pos_sorted)
        for (int64_t r = 0; r < n_reads; ++r)
        {
            int64_t span = 0;
            for (int64_t c = cig_off[r]; c < cig_off[r + 1]; ++c)
                if (op_refs(cig_ops[c])) span += cig_lens[c];
            max_span = std::max(max_span, span);
        }

    auto r_window = [&](int64_t sb, int64_t se, int64_t& lo, int64_t& hi)
    {
        if (!pos_sorted) { lo = 0; hi = n_reads; return; }
        lo = std::lower_bound(pos, pos + n_reads, sb - max_span) - pos;
        hi = std::lower_bound(pos, pos + n_reads, se) - pos;
    };

    int32_t rc = 0;
    if (T <= 1)
    {
        rc = fill_stripe(rv, ref, ref_off, ref_len, region_begin,
                         region_end, region_begin, region_end, 0,
                         n_reads, min_qscore, mapq_adjust, mm_flank,
                         mm_max, t2_mm_max, exempt_keys, n_exempt, D,
                         slot, t_base, t_qual, t_rawq, t_fwd, t_ridx,
                         t_roff, t_valid, t_used, t_t2used, t_nbmm,
                         spandel, submapped, mapq_n, mapq_sumsq,
                         mapq_zero, used_counts, used_fwd_counts,
                         edge_dist_sum);
    }
    else
    {
        std::vector<int32_t> rcs(T, 0);
        std::vector<std::thread> ths;
        for (int64_t t = 0; t < T; ++t)
        {
            const int64_t sb = region_begin + L * t / T;
            const int64_t se = region_begin + L * (t + 1) / T;
            int64_t lo, hi;
            r_window(sb, se, lo, hi);
            ths.emplace_back([&, t, sb, se, lo, hi]() {
                rcs[t] = fill_stripe(
                    rv, ref, ref_off, ref_len, region_begin, region_end,
                    sb, se, lo, hi, min_qscore, mapq_adjust, mm_flank,
                    mm_max, t2_mm_max, exempt_keys, n_exempt, D, slot,
                    t_base, t_qual, t_rawq, t_fwd, t_ridx, t_roff,
                    t_valid, t_used, t_t2used, t_nbmm, spandel,
                    submapped, mapq_n, mapq_sumsq, mapq_zero,
                    used_counts, used_fwd_counts, edge_dist_sum);
            });
        }
        for (auto& th : ths) th.join();
        for (int32_t c : rcs) rc |= c;
    }
    if (rc) return rc;
    // tail lanes (valid=0 masks, read_idx=-1, zeroed data lanes) are
    // written per stripe inside fill_stripe
    return 0;
}

}  // extern "C"
