// strelka_tpu native alignment expansion: one pass over reads builds
// the flat per-base/per-event tables consumed by the host pipeline
// (candidates, active-region evidence, depth estimation).
//
// Semantics match pipeline/reads.py expand_alignments exactly.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int8_t OP_M = 0, OP_I = 1, OP_D = 2, OP_N = 3, OP_S = 4,
                 OP_H = 5, OP_EQ = 7, OP_X = 8;

inline bool op_is_match(int8_t o) { return o == OP_M || o == OP_EQ || o == OP_X; }
inline bool op_reads(int8_t o) { return op_is_match(o) || o == OP_I || o == OP_S; }
inline bool op_refs(int8_t o) { return op_is_match(o) || o == OP_D || o == OP_N; }

}  // namespace

extern "C" {

// Pass 1: table sizes. counts = [n_match_bases, n_del_bases,
// n_ins_events, n_del_events]
void expand_count(
    const int64_t* cig_off, const int8_t* cig_ops, const int32_t* cig_lens,
    int64_t n_reads, int64_t* counts)
{
    int64_t nm = 0, nd = 0, ni = 0, nde = 0;
    for (int64_t r = 0; r < n_reads; ++r)
    {
        for (int64_t c = cig_off[r]; c < cig_off[r + 1]; ++c)
        {
            const int8_t op = cig_ops[c];
            if (op_is_match(op)) nm += cig_lens[c];
            else if (op == OP_D) { nd += cig_lens[c]; nde++; }
            else if (op == OP_I) ni++;
        }
    }
    counts[0] = nm;
    counts[1] = nd;
    counts[2] = ni;
    counts[3] = nde;
}

// Pass 2: fill all tables (preallocated by the caller at the pass-1
// sizes).
static void expand_fill_range(
    const int64_t* pos, const uint16_t* flag, const int64_t* seq_off,
    const uint8_t* seq,
    const int64_t* cig_off, const int8_t* cig_ops, const int32_t* cig_lens,
    int64_t n_reads,
    // aligned match bases (int32: read count and contig length both
    // fit; halves the table footprint, which dominates expansion cost)
    int32_t* match_read, int32_t* match_refpos, int32_t* match_readoff,
    // spanning deletions per deleted ref base
    int32_t* del_read, int32_t* del_refpos, uint8_t* del_is_edge,
    // insertion events
    int32_t* ins_read, int32_t* ins_refpos, int32_t* ins_readoff,
    int32_t* ins_len, uint8_t* ins_is_edge,
    // deletion events
    int32_t* devent_read, int32_t* devent_refpos, int32_t* devent_readoff,
    int32_t* devent_len, uint8_t* devent_is_edge,
    // per-read summaries
    int64_t* ref_begin, int64_t* ref_end,
    int64_t* read_begin, int64_t* read_end,
    int64_t r_first, int64_t r_last,
    int64_t mi, int64_t di, int64_t ii, int64_t dei)
{
    (void)n_reads;
    for (int64_t r = r_first; r < r_last; ++r)
    {
        const int64_t c0 = cig_off[r], c1 = cig_off[r + 1];
        // edge flags: segments before the first / after the last match
        int64_t first_m = -1, last_m = -1;
        for (int64_t c = c0; c < c1; ++c)
            if (op_is_match(cig_ops[c])) { if (first_m < 0) first_m = c; last_m = c; }

        int64_t rb = INT64_MAX, re = -1;
        int64_t read_p = 0, ref_p = pos[r];
        for (int64_t c = c0; c < c1; ++c)
        {
            const int8_t op = cig_ops[c];
            const int32_t ln = cig_lens[c];
            const bool edge = (c < first_m) || (c > last_m);
            if (op_is_match(op))
            {
                for (int32_t j = 0; j < ln; ++j)
                {
                    match_read[mi] = r;
                    match_refpos[mi] = ref_p + j;
                    match_readoff[mi] = read_p + j;
                    ++mi;
                }
                if (ln)
                {
                    rb = std::min(rb, ref_p);
                    re = std::max(re, ref_p + ln - 1);
                }
            }
            else if (op == OP_D)
            {
                for (int32_t j = 0; j < ln; ++j)
                {
                    del_read[di] = r;
                    del_refpos[di] = ref_p + j;
                    del_is_edge[di] = edge;
                    ++di;
                }
                devent_read[dei] = r;
                devent_refpos[dei] = ref_p;
                devent_readoff[dei] = read_p;
                devent_len[dei] = ln;
                devent_is_edge[dei] = edge;
                ++dei;
            }
            else if (op == OP_I)
            {
                ins_read[ii] = r;
                ins_refpos[ii] = ref_p;
                ins_readoff[ii] = read_p;
                ins_len[ii] = ln;
                ins_is_edge[ii] = edge;
                ++ii;
            }
            if (op_reads(op)) read_p += ln;
            if (op_refs(op)) ref_p += ln;
        }
        ref_begin[r] = (re >= 0) ? rb : INT64_MAX;
        ref_end[r] = re + 1;

        // ambiguous (N-run) end trim at the sequencing tail
        const int64_t S = seq_off[r + 1] - seq_off[r];
        int64_t b = 0, e = S;
        const uint8_t* sq = seq + seq_off[r];
        if (S > 0)
        {
            if (flag[r] & 0x10)
            {
                while (b < S && sq[b] == 4) ++b;
            }
            else
            {
                while (e > 0 && sq[e - 1] == 4) --e;
            }
        }
        read_begin[r] = b;
        read_end[r] = e;
    }
}

#define EXPAND_ARGS pos, flag, seq_off, seq, cig_off, cig_ops, cig_lens, \
    n_reads, match_read, match_refpos, match_readoff, del_read, \
    del_refpos, del_is_edge, ins_read, ins_refpos, ins_readoff, ins_len, \
    ins_is_edge, devent_read, devent_refpos, devent_readoff, devent_len, \
    devent_is_edge, ref_begin, ref_end, read_begin, read_end

void expand_fill(
    const int64_t* pos, const uint16_t* flag, const int64_t* seq_off,
    const uint8_t* seq,
    const int64_t* cig_off, const int8_t* cig_ops, const int32_t* cig_lens,
    int64_t n_reads,
    int32_t* match_read, int32_t* match_refpos, int32_t* match_readoff,
    int32_t* del_read, int32_t* del_refpos, uint8_t* del_is_edge,
    int32_t* ins_read, int32_t* ins_refpos, int32_t* ins_readoff,
    int32_t* ins_len, uint8_t* ins_is_edge,
    int32_t* devent_read, int32_t* devent_refpos, int32_t* devent_readoff,
    int32_t* devent_len, uint8_t* devent_is_edge,
    int64_t* ref_begin, int64_t* ref_end,
    int64_t* read_begin, int64_t* read_end)
{
    expand_fill_range(EXPAND_ARGS, 0, n_reads, 0, 0, 0, 0);
}

// Threaded fill: contiguous read chunks with per-chunk table offsets
// from a light counting pre-pass.
void expand_fill_mt(
    const int64_t* pos, const uint16_t* flag, const int64_t* seq_off,
    const uint8_t* seq,
    const int64_t* cig_off, const int8_t* cig_ops, const int32_t* cig_lens,
    int64_t n_reads,
    int32_t* match_read, int32_t* match_refpos, int32_t* match_readoff,
    int32_t* del_read, int32_t* del_refpos, uint8_t* del_is_edge,
    int32_t* ins_read, int32_t* ins_refpos, int32_t* ins_readoff,
    int32_t* ins_len, uint8_t* ins_is_edge,
    int32_t* devent_read, int32_t* devent_refpos, int32_t* devent_readoff,
    int32_t* devent_len, uint8_t* devent_is_edge,
    int64_t* ref_begin, int64_t* ref_end,
    int64_t* read_begin, int64_t* read_end,
    int32_t n_threads)
{
    int64_t T = n_threads;
    if (T < 1) T = 1;
    if (T > n_reads) T = n_reads ? n_reads : 1;
    if (T == 1)
    {
        expand_fill_range(EXPAND_ARGS, 0, n_reads, 0, 0, 0, 0);
        return;
    }
    const int64_t per = (n_reads + T - 1) / T;
    std::vector<int64_t> r0(T), r1(T), cm(T, 0), cd(T, 0), ci(T, 0),
        cde(T, 0);
    for (int64_t t = 0; t < T; ++t)
    {
        r0[t] = std::min(t * per, n_reads);
        r1[t] = std::min((t + 1) * per, n_reads);
    }
    {
        std::vector<std::thread> th;
        for (int64_t t = 0; t < T; ++t)
            th.emplace_back([&, t] {
                int64_t nm = 0, nd = 0, ni = 0, nde = 0;
                for (int64_t r = r0[t]; r < r1[t]; ++r)
                    for (int64_t c = cig_off[r]; c < cig_off[r + 1]; ++c)
                    {
                        const int8_t op = cig_ops[c];
                        if (op_is_match(op)) nm += cig_lens[c];
                        else if (op == OP_D) { nd += cig_lens[c]; nde++; }
                        else if (op == OP_I) ni++;
                    }
                cm[t] = nm; cd[t] = nd; ci[t] = ni; cde[t] = nde;
            });
        for (auto& x : th) x.join();
    }
    std::vector<int64_t> om(T, 0), od(T, 0), oi(T, 0), ode(T, 0);
    for (int64_t t = 1; t < T; ++t)
    {
        om[t] = om[t - 1] + cm[t - 1];
        od[t] = od[t - 1] + cd[t - 1];
        oi[t] = oi[t - 1] + ci[t - 1];
        ode[t] = ode[t - 1] + cde[t - 1];
    }
    std::vector<std::thread> th;
    for (int64_t t = 0; t < T; ++t)
        th.emplace_back([&, t] {
            expand_fill_range(EXPAND_ARGS, r0[t], r1[t],
                              om[t], od[t], oi[t], ode[t]);
        });
    for (auto& x : th) x.join();
}

}  // extern "C"

extern "C" {

// Active-region variant evidence + depth
// (ActiveRegionReadBuffer::insert* weights; every variant-count call
// also increments depth). Mirrors
// pipeline/active_region.py variant_evidence exactly.
void ar_evidence(
    const int64_t* pos, const int8_t* level, const int64_t* seq_off,
    const uint8_t* seq,
    const int64_t* cig_off, const int8_t* cig_ops, const int32_t* cig_lens,
    int64_t n_reads,
    const uint8_t* ref, int64_t ref_len,
    int64_t region_begin, int64_t region_end,
    int64_t* counts, int64_t* depth)
{
    const int64_t L = region_end - region_begin;
    std::memset(counts, 0, sizeof(int64_t) * L);
    std::memset(depth, 0, sizeof(int64_t) * L);
    constexpr int kMismatchWeight = 1;
    constexpr int kIndelWeight = 4;

    auto add = [&](int64_t g, int w)
    {
        const int64_t i = g - region_begin;
        if (i < 0 || i >= L) return;
        counts[i] += w;
        depth[i] += 1;
    };

    for (int64_t r = 0; r < n_reads; ++r)
    {
        if (level[r] != 0 && level[r] != 1) continue;
        const int64_t c0 = cig_off[r], c1 = cig_off[r + 1];
        int64_t first_m = -1, last_m = -1;
        for (int64_t c = c0; c < c1; ++c)
            if (op_is_match(cig_ops[c])) { if (first_m < 0) first_m = c; last_m = c; }

        int64_t read_p = 0, ref_p = pos[r];
        const int64_t s0 = seq_off[r];
        for (int64_t c = c0; c < c1; ++c)
        {
            const int8_t op = cig_ops[c];
            const int32_t ln = cig_lens[c];
            const bool edge = (c < first_m) || (c > last_m);
            if (op_is_match(op))
            {
                for (int32_t j = 0; j < ln; ++j)
                {
                    const int64_t g = ref_p + j;
                    const int64_t i = g - region_begin;
                    if (i < 0 || i >= L) continue;
                    depth[i] += 1;
                    const uint8_t b = std::min<uint8_t>(seq[s0 + read_p + j], 4);
                    const uint8_t fb =
                        (i >= 0 && i < ref_len) ? std::min<uint8_t>(ref[i], 4) : 4;
                    if (b != fb) counts[i] += kMismatchWeight;
                }
            }
            else if (op == OP_I)
            {
                if (!edge)
                {
                    add(ref_p - 1, kIndelWeight);
                    add(ref_p, kIndelWeight);
                }
            }
            else if (op == OP_D)
            {
                if (!edge)
                {
                    for (int32_t j = 0; j < ln; ++j) add(ref_p + j, kIndelWeight);
                    add(ref_p - 1, kIndelWeight);
                }
            }
            if (op_reads(op)) read_p += ln;
            if (op_refs(op)) ref_p += ln;
        }

        // soft clips at the read edges
        if (c1 > c0)
        {
            if (cig_ops[c0] == OP_S) add(pos[r] - 1, kIndelWeight);
            if (cig_ops[c1 - 1] == OP_S)
            {
                // trailing clip sits at one past the last aligned ref pos
                // (matches ExpandedAlignments.ref_end)
                int64_t aligned_end = pos[r];
                int64_t rp = pos[r];
                for (int64_t c = c0; c < c1; ++c)
                {
                    if (op_is_match(cig_ops[c])) aligned_end = rp + cig_lens[c];
                    if (op_refs(cig_ops[c])) rp += cig_lens[c];
                }
                add(aligned_end, kIndelWeight);
            }
        }
    }
}

}  // extern "C"
