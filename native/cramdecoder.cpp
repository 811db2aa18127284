// strelka_tpu native IO: CRAM 3.0 slice decoder + rANS 4x8 codec.
//
// Native fast path behind strelka_tpu/io/cram.py (reference analog:
// htslib cram/cram_decode.c + cram/rANS_static.c behind
// htsapi/bam_streamer). Python parses the container/compression/slice
// headers (cheap, per-slice) and hands this decoder the core/external
// block bytes plus a serialized encoding table; records are decoded in
// one pass into struct-of-arrays buffers exported to numpy. Any
// encoding/feature outside the supported set makes the call fail
// cleanly so Python can fall back to its own decoder for that slice.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

// ------------------------------------------------------------- rANS 4x8

constexpr uint32_t kRansByteL = 1u << 23;

struct RansTable
{
    // 12-bit normalized freq table
    uint8_t sym[4096];
    uint16_t freq[256];
    uint16_t cum[256];
};

struct ByteCursor
{
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;

    uint8_t byte()
    {
        if (p >= end) { ok = false; return 0; }
        return *p++;
    }
    int64_t itf8()
    {
        const uint8_t b = byte();
        if (!ok) return 0;
        uint32_t v;
        if (b < 0x80) v = b;
        else if (b < 0xC0) v = ((b & 0x3F) << 8) | byte();
        else if (b < 0xE0)
        {
            v = (uint32_t)(b & 0x1F) << 16; v |= (uint32_t)byte() << 8; v |= byte();
        }
        else if (b < 0xF0)
        {
            v = (uint32_t)(b & 0x0F) << 24; v |= (uint32_t)byte() << 16;
            v |= (uint32_t)byte() << 8; v |= byte();
        }
        else
        {
            v = (uint32_t)(b & 0x0F) << 28; v |= (uint32_t)byte() << 20;
            v |= (uint32_t)byte() << 12; v |= (uint32_t)byte() << 4;
            v |= byte() & 0x0F;
        }
        return (int64_t)(int32_t)v;
    }
};

// run-length (symbol, freq) table shared by order-0/1
bool rans_read_freqs(ByteCursor& c, uint16_t* F)
{
    std::memset(F, 0, 256 * sizeof(uint16_t));
    int sym = c.byte();
    int rle = 0;
    while (c.ok)
    {
        uint32_t f = c.byte();
        if (f >= 0x80) f = ((f & 0x7F) << 8) | c.byte();
        if (sym < 0 || sym > 255) return false;
        F[sym] = (uint16_t)f;
        if (rle > 0) { --rle; ++sym; }
        else
        {
            const int nxt = c.byte();
            if (!c.ok) return false;
            if (nxt == sym + 1) { rle = c.byte(); sym = nxt; }
            else if (nxt == 0) return true;
            else sym = nxt;
        }
    }
    return false;
}

void rans_build(const uint16_t* F, RansTable& t)
{
    uint32_t cum = 0;
    for (int s = 0; s < 256; ++s)
    {
        t.freq[s] = F[s];
        t.cum[s] = (uint16_t)cum;
        for (uint32_t k = 0; k < F[s] && cum + k < 4096; ++k) t.sym[cum + k] = (uint8_t)s;
        cum += F[s];
    }
}

}  // namespace

extern "C" {

// rANS 4x8 static decoder (CRAM codec 4). Returns 0 ok, -1 error.
int32_t rans_decode_4x8(const uint8_t* in, int64_t in_len,
                        uint8_t* out, int64_t n_out_expect)
{
    ByteCursor c{in, in + in_len};
    const int order = c.byte();
    // compressed size (4) + uncompressed size (4), little endian
    if (c.p + 8 > c.end) return -1;
    uint32_t n_out;
    std::memcpy(&n_out, c.p + 4, 4);
    c.p += 8;
    if ((int64_t)n_out != n_out_expect) return -1;
    if (n_out == 0) return 0;

    if (order == 0)
    {
        uint16_t F[256];
        if (!rans_read_freqs(c, F)) return -1;
        auto* tab = new RansTable;
        rans_build(F, *tab);
        if (c.p + 16 > c.end) { delete tab; return -1; }
        uint32_t R[4];
        std::memcpy(R, c.p, 16);
        c.p += 16;
        const uint8_t* bp = c.p;
        const uint8_t* bend = c.end;
        for (int64_t i = 0; i < (int64_t)n_out; ++i)
        {
            const int j = i & 3;
            uint32_t r = R[j];
            const uint32_t m = r & 0xFFF;
            const uint8_t s = tab->sym[m];
            out[i] = s;
            r = tab->freq[s] * (r >> 12) + m - tab->cum[s];
            while (r < kRansByteL && bp < bend) r = (r << 8) | *bp++;
            R[j] = r;
        }
        delete tab;
        return 0;
    }
    if (order != 1) return -1;

    // order-1: per-context tables, contexts run-length coded like syms
    std::vector<RansTable> tabs(256);
    std::vector<char> have(256, 0);
    int sym = c.byte();
    int rle = 0;
    while (c.ok)
    {
        uint16_t F[256];
        if (!rans_read_freqs(c, F)) return -1;
        if (sym < 0 || sym > 255) return -1;
        rans_build(F, tabs[sym]);
        have[sym] = 1;
        if (rle > 0) { --rle; ++sym; }
        else
        {
            const int nxt = c.byte();
            if (!c.ok) return -1;
            if (nxt == sym + 1) { rle = c.byte(); sym = nxt; }
            else if (nxt == 0) break;
            else sym = nxt;
        }
    }
    if (c.p + 16 > c.end) return -1;
    uint32_t R[4];
    std::memcpy(R, c.p, 16);
    c.p += 16;
    const uint8_t* bp = c.p;
    const uint8_t* bend = c.end;
    const int64_t isz4 = (int64_t)n_out >> 2;
    int64_t i4[4] = {0, isz4, 2 * isz4, 3 * isz4};
    uint8_t last[4] = {0, 0, 0, 0};
    for (int64_t step = 0; step < isz4; ++step)
    {
        for (int j = 0; j < 4; ++j)
        {
            uint32_t r = R[j];
            const uint32_t m = r & 0xFFF;
            const RansTable& t = have[last[j]] ? tabs[last[j]] : tabs[0];
            const uint8_t s = t.sym[m];
            out[i4[j]] = s;
            r = t.freq[s] * (r >> 12) + m - t.cum[s];
            while (r < kRansByteL && bp < bend) r = (r << 8) | *bp++;
            R[j] = r;
            last[j] = s;
            ++i4[j];
        }
    }
    while (i4[3] < (int64_t)n_out)
    {
        uint32_t r = R[3];
        const uint32_t m = r & 0xFFF;
        const RansTable& t = have[last[3]] ? tabs[last[3]] : tabs[0];
        const uint8_t s = t.sym[m];
        out[i4[3]] = s;
        r = t.freq[s] * (r >> 12) + m - t.cum[s];
        while (r < kRansByteL && bp < bend) r = (r << 8) | *bp++;
        R[3] = r;
        last[3] = s;
        ++i4[3];
    }
    return 0;
}

}  // extern "C"

// ----------------------------------------------------------- encodings

namespace {

struct BitCursor
{
    const uint8_t* p;
    const uint8_t* end;
    int bit = 7;
    bool ok = true;

    int read_bit()
    {
        if (p >= end) { ok = false; return 0; }
        const int v = (*p >> bit) & 1;
        if (bit == 0) { bit = 7; ++p; }
        else --bit;
        return v;
    }
    int64_t read_bits(int n)
    {
        int64_t v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
        return v;
    }
};

struct ExtStreams
{
    std::map<int32_t, ByteCursor> cur;

    ByteCursor* get(int32_t cid)
    {
        auto it = cur.find(cid);
        return it == cur.end() ? nullptr : &it->second;
    }
};

struct Encoding
{
    int32_t codec = 0;
    int32_t cid = -1;            // EXTERNAL / BYTE_ARRAY_STOP
    int32_t stop = 0;            // BYTE_ARRAY_STOP
    int32_t offset = 0, nbits = 0;  // BETA / GAMMA
    // HUFFMAN canonical: (len, code) -> value, plus constant shortcut
    bool huff_const = false;
    int64_t const_val = 0;
    int max_len = 0;
    std::map<std::pair<int, int64_t>, int64_t> codes;
    // BYTE_ARRAY_LEN nests
    std::vector<Encoding> nested;  // [len_enc, val_enc]
    bool valid = false;

    bool read_int(BitCursor& core, ExtStreams& ext, int64_t& out) const
    {
        switch (codec)
        {
        case 1:
        {
            ByteCursor* s = ext.get(cid);
            if (!s) return false;
            out = s->itf8();
            return s->ok;
        }
        case 3:
            if (huff_const) { out = const_val; return true; }
            {
                int ln = 0;
                int64_t code = 0;
                while (ln < max_len && core.ok)
                {
                    code = (code << 1) | core.read_bit();
                    ++ln;
                    auto it = codes.find({ln, code});
                    if (it != codes.end()) { out = it->second; return true; }
                }
                return false;
            }
        case 6:
            out = core.read_bits(nbits) - offset;
            return core.ok;
        case 9:
        {
            int n = 0;
            while (core.ok && core.read_bit() == 0) ++n;
            int64_t v = 1;
            for (int i = 0; i < n; ++i) v = (v << 1) | core.read_bit();
            out = v - offset;
            return core.ok;
        }
        default:
            return false;
        }
    }

    bool read_byte(BitCursor& core, ExtStreams& ext, uint8_t& out) const
    {
        if (codec == 1)
        {
            ByteCursor* s = ext.get(cid);
            if (!s) return false;
            out = s->byte();
            return s->ok;
        }
        int64_t v;
        if (!read_int(core, ext, v)) return false;
        out = (uint8_t)v;
        return true;
    }

    // byte arrays: appends to out, returns false on failure
    bool read_bytes(BitCursor& core, ExtStreams& ext,
                    std::vector<uint8_t>& out) const
    {
        if (codec == 5)
        {
            ByteCursor* s = ext.get(cid);
            if (!s) return false;
            while (s->p < s->end && *s->p != (uint8_t)stop) out.push_back(*s->p++);
            if (s->p >= s->end) return false;
            ++s->p;  // consume stop byte
            return true;
        }
        if (codec == 4)
        {
            int64_t n;
            if (!nested[0].read_int(core, ext, n) || n < 0) return false;
            return nested[1].read_n_bytes(core, ext, n, out);
        }
        return false;
    }

    bool read_n_bytes(BitCursor& core, ExtStreams& ext, int64_t n,
                      std::vector<uint8_t>& out) const
    {
        if (codec == 1)
        {
            ByteCursor* s = ext.get(cid);
            if (!s || s->p + n > s->end) return false;
            out.insert(out.end(), s->p, s->p + n);
            s->p += n;
            return true;
        }
        for (int64_t i = 0; i < n; ++i)
        {
            uint8_t b;
            if (!read_byte(core, ext, b)) return false;
            out.push_back(b);
        }
        return true;
    }
};

struct BlobCursor
{
    const uint8_t* p;
    const uint8_t* end;
    bool ok = true;

    int32_t i32()
    {
        if (p + 4 > end) { ok = false; return 0; }
        int32_t v;
        std::memcpy(&v, p, 4);
        p += 4;
        return v;
    }
};

bool parse_encoding(BlobCursor& b, Encoding& e)
{
    e.codec = b.i32();
    if (!b.ok) return false;
    switch (e.codec)
    {
    case 0:
        break;
    case 1:
        e.cid = b.i32();
        break;
    case 3:
    {
        const int32_t n = b.i32();
        if (!b.ok || n < 0 || n > 100000) return false;
        std::vector<int64_t> alpha(n);
        for (int32_t i = 0; i < n; ++i) alpha[i] = b.i32();
        const int32_t n2 = b.i32();
        if (!b.ok || n2 != n) return false;
        std::vector<int> lens(n);
        for (int32_t i = 0; i < n; ++i) lens[i] = b.i32();
        if (n == 1 && lens[0] == 0)
        {
            e.huff_const = true;
            e.const_val = alpha[0];
            break;
        }
        // canonical: stable sort by length, ascending code values
        std::vector<int> order(n);
        for (int i = 0; i < n; ++i) order[i] = i;
        std::stable_sort(order.begin(), order.end(),
                         [&](int a, int c) { return lens[a] < lens[c]; });
        int64_t code = 0;
        int prev_len = lens[order[0]];
        for (int k = 0; k < n; ++k)
        {
            const int i = order[k];
            code <<= (lens[i] - prev_len);
            prev_len = lens[i];
            e.codes[{lens[i], code}] = alpha[i];
            ++code;
        }
        e.max_len = prev_len;
        break;
    }
    case 4:
        e.nested.resize(2);
        if (!parse_encoding(b, e.nested[0])) return false;
        if (!parse_encoding(b, e.nested[1])) return false;
        break;
    case 5:
        e.stop = b.i32();
        e.cid = b.i32();
        break;
    case 6:
        e.offset = b.i32();
        e.nbits = b.i32();
        break;
    case 9:
        e.offset = b.i32();
        break;
    default:
        return false;
    }
    e.valid = b.ok;
    return b.ok;
}

// data series indices (fixed order shared with Python)
enum Series
{
    S_BF, S_CF, S_RI, S_RL, S_AP, S_RG, S_RN, S_MF, S_NS, S_NP, S_TS,
    S_NF, S_TL, S_FN, S_FC, S_FP, S_DL, S_BB, S_QQ, S_BS, S_IN, S_RS,
    S_PD, S_HC, S_SC, S_MQ, S_BA, S_QS, S_COUNT
};

constexpr int kFlagPaired = 0x1, kFlagUnmap = 0x4, kFlagMUnmap = 0x8,
              kFlagRev = 0x10, kFlagMRev = 0x20;

struct SliceResult
{
    int64_t n = 0;
    std::vector<int32_t> tid;
    std::vector<int64_t> pos;  // 0-based
    std::vector<uint8_t> mapq;
    std::vector<uint16_t> flag;
    std::vector<int32_t> mate_tid;
    std::vector<int64_t> mate_pos;  // 0-based
    std::vector<int64_t> tlen;
    std::vector<uint8_t> seq;   // engine codes A0 C1 G2 T3 N4
    std::vector<uint8_t> qual;
    std::vector<int64_t> seq_off{0};
    std::vector<int8_t> cig_ops;
    std::vector<int32_t> cig_lens;
    std::vector<int64_t> cig_off{0};
    std::vector<uint8_t> names;  // nul-terminated
    std::vector<int64_t> name_off{0};
    // transient, for mate resolution
    std::vector<int64_t> mate_link;
    std::vector<int32_t> cflags;
};

inline uint8_t base_code(uint8_t c)
{
    switch (c)
    {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return 4;
    }
}

int64_t ref_span_of(const SliceResult& r, int64_t i)
{
    int64_t span = 0;
    for (int64_t k = r.cig_off[i]; k < r.cig_off[i + 1]; ++k)
    {
        const int op = r.cig_ops[k];
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            span += r.cig_lens[k];
    }
    return span;
}

void resolve_mates(SliceResult& r)
{
    const int64_t n = r.n;
    for (int64_t i = 0; i < n; ++i)
    {
        const int64_t m = r.mate_link[i];
        if (m < 0 || m >= n) continue;
        r.mate_tid[i] = r.tid[m];
        r.mate_pos[i] = r.pos[m];
        if (r.flag[m] & kFlagRev) r.flag[i] |= kFlagMRev;
        if (r.flag[m] & kFlagUnmap) r.flag[i] |= kFlagMUnmap;
    }
    std::vector<char> seen(n, 0);
    std::vector<int64_t> chain;
    for (int64_t i = 0; i < n; ++i)
    {
        if (seen[i] || r.mate_link[i] < 0) continue;
        chain.clear();
        chain.push_back(i);
        int64_t j = r.mate_link[i];
        auto in_chain = [&](int64_t x) {
            for (int64_t c : chain) if (c == x) return true;
            return false;
        };
        while (j >= 0 && j < n && r.mate_link[j] >= 0 && !in_chain(j))
        {
            chain.push_back(j);
            j = r.mate_link[j];
        }
        if (j >= 0 && j < n) chain.push_back(j);
        for (int64_t c : chain) seen[c] = 1;
        const int64_t lastI = chain.back();
        const int64_t firstI = chain.front();
        if (r.mate_link[lastI] < 0)
        {
            r.mate_tid[lastI] = r.tid[firstI];
            r.mate_pos[lastI] = r.pos[firstI];
            if (r.flag[firstI] & kFlagRev) r.flag[lastI] |= kFlagMRev;
            if (r.flag[firstI] & kFlagUnmap) r.flag[lastI] |= kFlagMUnmap;
        }
        bool same_tid = true;
        for (int64_t c : chain) same_tid &= (r.tid[c] == r.tid[firstI]);
        if (same_tid)
        {
            int64_t lo = INT64_MAX, hi = INT64_MIN, lo_k = chain[0];
            for (int64_t c : chain)
            {
                const int64_t s = r.pos[c];
                int64_t span = ref_span_of(r, c);
                if (span < 1) span = 1;
                const int64_t e = s + span - 1;
                if (s < lo) lo = s;
                if (e > hi) hi = e;
            }
            // leftmost by (pos, index)
            for (int64_t c : chain)
                if (r.pos[c] < r.pos[lo_k] ||
                    (r.pos[c] == r.pos[lo_k] && c < lo_k))
                    lo_k = c;
            const int64_t tl = hi - lo + 1;
            for (int64_t c : chain) r.tlen[c] = (c == lo_k) ? tl : -tl;
            if (chain.size() == 1) r.tlen[chain[0]] = 0;
        }
    }
}

}  // namespace

extern "C" {

// Decode one CRAM slice. Returns a handle (or nullptr on any
// unsupported structure — caller falls back to the Python decoder).
//
// enc_blob layout (int32 stream): S_COUNT series encodings in enum
// order, then n_tag_lines, per line n_tags x encoding (tag values are
// consumed and discarded).
// sub_tab: 5x4 chars, row = ref base (ACGTN rank), col = 2-bit BS code.
// ref_seg: ASCII reference bases; ref_seg[0] is 1-based position
// ref_start on the slice contig.
void* cram_slice_decode(
    const uint8_t* core_buf, int64_t core_len,
    const uint8_t* ext_buf, const int64_t* ext_offs, const int64_t* ext_lens,
    const int32_t* ext_ids, int32_t n_ext,
    const uint8_t* enc_blob, int64_t enc_len,
    const uint8_t* ref_seg, int64_t ref_len, int64_t ref_start,
    const uint8_t* sub_tab,
    int32_t n_rec, int32_t slice_ref_id, int64_t slice_start,
    int32_t ap_delta, int32_t has_read_names, int64_t counter_base)
{
    BlobCursor bc{enc_blob, enc_blob + enc_len};
    std::vector<Encoding> S(S_COUNT);
    for (int i = 0; i < S_COUNT; ++i)
        if (!parse_encoding(bc, S[i])) return nullptr;
    const int32_t n_tag_lines = bc.i32();
    if (!bc.ok || n_tag_lines < 0 || n_tag_lines > 1000000) return nullptr;
    std::vector<std::vector<Encoding>> tag_lines(n_tag_lines);
    for (int32_t l = 0; l < n_tag_lines; ++l)
    {
        const int32_t nt = bc.i32();
        if (!bc.ok || nt < 0 || nt > 10000) return nullptr;
        tag_lines[l].resize(nt);
        for (int32_t t = 0; t < nt; ++t)
            if (!parse_encoding(bc, tag_lines[l][t])) return nullptr;
    }

    BitCursor core{core_buf, core_buf + core_len};
    ExtStreams ext;
    for (int32_t i = 0; i < n_ext; ++i)
        ext.cur[ext_ids[i]] = ByteCursor{ext_buf + ext_offs[i],
                                         ext_buf + ext_offs[i] + ext_lens[i]};

    auto refbase = [&](int64_t pos1) -> uint8_t {
        const int64_t i = pos1 - ref_start;
        if (i < 0 || i >= ref_len) return 'N';
        return ref_seg[i];
    };
    auto sub_row = [&](uint8_t rb) -> const uint8_t* {
        switch (rb)
        {
        case 'A': case 'a': return sub_tab + 0;
        case 'C': case 'c': return sub_tab + 4;
        case 'G': case 'g': return sub_tab + 8;
        case 'T': case 't': return sub_tab + 12;
        default: return sub_tab + 16;
        }
    };

    auto* res = new SliceResult;
    SliceResult& r = *res;
    r.n = n_rec;
    r.tid.resize(n_rec);
    r.pos.resize(n_rec);
    r.mapq.assign(n_rec, 0);
    r.flag.resize(n_rec);
    r.mate_tid.assign(n_rec, -1);
    r.mate_pos.assign(n_rec, -1);
    r.tlen.assign(n_rec, 0);
    r.mate_link.assign(n_rec, -1);
    r.cflags.resize(n_rec);

    std::vector<uint8_t> tmp;
    std::vector<std::pair<int64_t, std::pair<char, int64_t>>> feats;
    std::vector<uint8_t> featbytes;  // payload bytes for I/S/b/q features
    std::vector<std::pair<int64_t, int64_t>> featspans;  // into featbytes

    int64_t last_pos = slice_start;
    bool fail = false;
    for (int32_t ri = 0; ri < n_rec && !fail; ++ri)
    {
        int64_t bf, cf, rl, ap, rg, tl;
        if (!S[S_BF].read_int(core, ext, bf) ||
            !S[S_CF].read_int(core, ext, cf)) { fail = true; break; }
        int64_t tid = slice_ref_id;
        if (slice_ref_id == -2 &&
            !S[S_RI].read_int(core, ext, tid)) { fail = true; break; }
        if (!S[S_RL].read_int(core, ext, rl) ||
            !S[S_AP].read_int(core, ext, ap) ||
            !S[S_RG].read_int(core, ext, rg)) { fail = true; break; }
        int64_t pos1;
        if (ap_delta) { pos1 = last_pos + ap; last_pos = pos1; }
        else pos1 = ap;
        r.tid[ri] = (int32_t)tid;
        r.pos[ri] = pos1 - 1;
        r.flag[ri] = (uint16_t)bf;
        r.cflags[ri] = (int32_t)cf;

        if (has_read_names)
        {
            tmp.clear();
            if (!S[S_RN].read_bytes(core, ext, tmp)) { fail = true; break; }
            r.names.insert(r.names.end(), tmp.begin(), tmp.end());
        }
        else
        {
            char buf[32];
            const int ln = snprintf(buf, sizeof buf, "cram.%lld",
                                    (long long)(counter_base + ri));
            r.names.insert(r.names.end(), buf, buf + ln);
        }
        if (cf & 0x2)  // detached mate
        {
            int64_t mf, ns, np, ts;
            if (!S[S_MF].read_int(core, ext, mf)) { fail = true; break; }
            if (!has_read_names)
            {
                tmp.clear();
                if (!S[S_RN].read_bytes(core, ext, tmp)) { fail = true; break; }
                // detached names replace the generated one
                r.names.resize(r.name_off.back());
                r.names.insert(r.names.end(), tmp.begin(), tmp.end());
            }
            if (!S[S_NS].read_int(core, ext, ns) ||
                !S[S_NP].read_int(core, ext, np) ||
                !S[S_TS].read_int(core, ext, ts)) { fail = true; break; }
            r.mate_tid[ri] = (int32_t)ns;
            r.mate_pos[ri] = np - 1;
            r.tlen[ri] = ts;
            if (mf & 1) r.flag[ri] |= kFlagMRev;
            if (mf & 2) r.flag[ri] |= kFlagMUnmap;
        }
        else if (cf & 0x4)  // mate downstream
        {
            int64_t nf;
            if (!S[S_NF].read_int(core, ext, nf)) { fail = true; break; }
            r.mate_link[ri] = ri + 1 + nf;
        }
        r.names.push_back(0);
        r.name_off.push_back((int64_t)r.names.size());

        if (!S[S_TL].read_int(core, ext, tl) || tl < 0 ||
            tl >= n_tag_lines) { fail = true; break; }
        for (const Encoding& te : tag_lines[tl])
        {
            tmp.clear();
            if (!te.read_bytes(core, ext, tmp)) { fail = true; break; }
        }
        if (fail) break;

        const bool mapped = !(bf & kFlagUnmap);
        if (mapped)
        {
            int64_t nfeat;
            if (!S[S_FN].read_int(core, ext, nfeat) || nfeat < 0 ||
                nfeat > (1 << 20)) { fail = true; break; }
            feats.clear();
            featspans.clear();
            featbytes.clear();
            int64_t fpos = 0;
            for (int64_t f = 0; f < nfeat && !fail; ++f)
            {
                uint8_t fc;
                int64_t fp;
                if (!S[S_FC].read_byte(core, ext, fc) ||
                    !S[S_FP].read_int(core, ext, fp)) { fail = true; break; }
                fpos += fp;
                int64_t payload = -1;
                switch (fc)
                {
                case 'B':
                {
                    uint8_t b0, q0;
                    if (!S[S_BA].read_byte(core, ext, b0) ||
                        !S[S_QS].read_byte(core, ext, q0)) { fail = true; break; }
                    payload = ((int64_t)b0 << 8) | q0;
                    break;
                }
                case 'X':
                {
                    uint8_t b0;
                    if (!S[S_BS].read_byte(core, ext, b0)) { fail = true; break; }
                    payload = b0;
                    break;
                }
                case 'I': case 'S': case 'b': case 'q':
                {
                    tmp.clear();
                    const Encoding& e = (fc == 'I') ? S[S_IN]
                                        : (fc == 'S') ? S[S_SC]
                                        : (fc == 'b') ? S[S_BB] : S[S_QQ];
                    if (!e.read_bytes(core, ext, tmp)) { fail = true; break; }
                    payload = (int64_t)featspans.size();
                    featspans.emplace_back((int64_t)featbytes.size(),
                                           (int64_t)tmp.size());
                    featbytes.insert(featbytes.end(), tmp.begin(), tmp.end());
                    break;
                }
                case 'D':
                    if (!S[S_DL].read_int(core, ext, payload)) fail = true;
                    break;
                case 'N':
                    if (!S[S_RS].read_int(core, ext, payload)) fail = true;
                    break;
                case 'P':
                    if (!S[S_PD].read_int(core, ext, payload)) fail = true;
                    break;
                case 'H':
                    if (!S[S_HC].read_int(core, ext, payload)) fail = true;
                    break;
                case 'i':
                {
                    uint8_t b0;
                    if (!S[S_BA].read_byte(core, ext, b0)) { fail = true; break; }
                    payload = b0;
                    break;
                }
                case 'Q':
                {
                    uint8_t q0;
                    if (!S[S_QS].read_byte(core, ext, q0)) { fail = true; break; }
                    payload = q0;
                    break;
                }
                default:
                    fail = true;
                }
                if (!fail) feats.emplace_back(fpos, std::make_pair((char)fc, payload));
            }
            if (fail) break;
            int64_t mq;
            if (!S[S_MQ].read_int(core, ext, mq)) { fail = true; break; }
            r.mapq[ri] = (uint8_t)mq;

            // reconstruct sequence + cigar
            const int64_t soff0 = (int64_t)r.seq.size();
            r.seq.resize(soff0 + rl);
            r.qual.resize(soff0 + rl, 0);
            uint8_t* sq = r.seq.data() + soff0;
            uint8_t* qu = r.qual.data() + soff0;
            const int64_t coff0 = (int64_t)r.cig_ops.size();
            auto add_op = [&](int8_t op, int64_t ln) {
                if (ln <= 0) return;
                if ((int64_t)r.cig_ops.size() > coff0 &&
                    r.cig_ops.back() == op)
                    r.cig_lens.back() += (int32_t)ln;
                else
                {
                    r.cig_ops.push_back(op);
                    r.cig_lens.push_back((int32_t)ln);
                }
            };
            int64_t rp = 0, gp = pos1;
            for (auto& fe : feats)
            {
                const int64_t fpos1 = fe.first;
                const char code = fe.second.first;
                const int64_t val = fe.second.second;
                const int64_t gap = (fpos1 - 1) - rp;
                if (gap > 0)
                {
                    if (rp + gap > rl) { fail = true; break; }
                    for (int64_t k = 0; k < gap; ++k)
                        sq[rp + k] = base_code(refbase(gp + k));
                    add_op(0, gap);
                    rp += gap;
                    gp += gap;
                }
                switch (code)
                {
                case 'B':
                    if (rp >= rl) { fail = true; break; }
                    sq[rp] = base_code((uint8_t)(val >> 8));
                    qu[rp] = (uint8_t)(val & 0xFF);
                    add_op(0, 1);
                    ++rp; ++gp;
                    break;
                case 'X':
                {
                    if (rp >= rl) { fail = true; break; }
                    const uint8_t* row = sub_row(refbase(gp));
                    sq[rp] = base_code(row[val & 3]);
                    add_op(0, 1);
                    ++rp; ++gp;
                    break;
                }
                case 'I': case 'S': case 'b':
                {
                    const auto& sp = featspans[val];
                    if (rp + sp.second > rl) { fail = true; break; }
                    for (int64_t k = 0; k < sp.second; ++k)
                        sq[rp + k] = base_code(featbytes[sp.first + k]);
                    add_op(code == 'I' ? 1 : code == 'S' ? 4 : 0, sp.second);
                    rp += sp.second;
                    if (code == 'b') gp += sp.second;
                    break;
                }
                case 'q':
                {
                    const auto& sp = featspans[val];
                    if (rp + sp.second > rl) { fail = true; break; }
                    for (int64_t k = 0; k < sp.second; ++k)
                        qu[rp + k] = featbytes[sp.first + k];
                    break;
                }
                case 'i':
                    if (rp >= rl) { fail = true; break; }
                    sq[rp] = base_code((uint8_t)val);
                    add_op(1, 1);
                    ++rp;
                    break;
                case 'D':
                    add_op(2, val);
                    gp += val;
                    break;
                case 'N':
                    add_op(3, val);
                    gp += val;
                    break;
                case 'P':
                    add_op(6, val);
                    break;
                case 'H':
                    add_op(5, val);
                    break;
                case 'Q':
                    if (rp >= rl) { fail = true; break; }
                    qu[rp] = (uint8_t)val;
                    break;
                }
                if (fail) break;
            }
            if (fail) break;
            const int64_t tail = rl - rp;
            if (tail > 0)
            {
                for (int64_t k = 0; k < tail; ++k)
                    sq[rp + k] = base_code(refbase(gp + k));
                add_op(0, tail);
            }
            if ((int64_t)r.cig_ops.size() == coff0) add_op(0, rl);
            if (cf & 0x1)
            {
                for (int64_t k = 0; k < rl; ++k)
                    if (!S[S_QS].read_byte(core, ext, qu[k])) { fail = true; break; }
            }
        }
        else  // unmapped
        {
            const int64_t soff0 = (int64_t)r.seq.size();
            r.seq.resize(soff0 + rl);
            r.qual.resize(soff0 + rl, 0xFF);
            uint8_t* sq = r.seq.data() + soff0;
            if (cf & 0x8)
                std::memset(sq, 4, rl);
            else
                for (int64_t k = 0; k < rl; ++k)
                {
                    uint8_t b0;
                    if (!S[S_BA].read_byte(core, ext, b0)) { fail = true; break; }
                    sq[k] = base_code(b0);
                }
            if (!fail && (cf & 0x1))
            {
                uint8_t* qu = r.qual.data() + soff0;
                for (int64_t k = 0; k < rl; ++k)
                    if (!S[S_QS].read_byte(core, ext, qu[k])) { fail = true; break; }
            }
        }
        if (fail) break;
        r.seq_off.push_back((int64_t)r.seq.size());
        r.cig_off.push_back((int64_t)r.cig_ops.size());
    }

    if (fail)
    {
        delete res;
        return nullptr;
    }
    resolve_mates(r);
    return res;
}

int64_t cram_slice_sizes(void* h, int64_t* sizes)
{
    auto* r = (SliceResult*)h;
    sizes[0] = (int64_t)r->seq.size();
    sizes[1] = (int64_t)r->cig_ops.size();
    sizes[2] = (int64_t)r->names.size();
    return r->n;
}

int32_t cram_slice_export(void* h,
    int32_t* tid, int64_t* pos, uint8_t* mapq, uint16_t* flag,
    int32_t* mate_tid, int64_t* mate_pos, int64_t* tlen,
    uint8_t* seq, uint8_t* qual, int64_t* seq_off,
    int8_t* cig_ops, int32_t* cig_lens, int64_t* cig_off,
    uint8_t* names, int64_t* name_off)
{
    auto* r = (SliceResult*)h;
    const int64_t n = r->n;
    std::memcpy(tid, r->tid.data(), n * 4);
    std::memcpy(pos, r->pos.data(), n * 8);
    std::memcpy(mapq, r->mapq.data(), n);
    std::memcpy(flag, r->flag.data(), n * 2);
    std::memcpy(mate_tid, r->mate_tid.data(), n * 4);
    std::memcpy(mate_pos, r->mate_pos.data(), n * 8);
    std::memcpy(tlen, r->tlen.data(), n * 8);
    std::memcpy(seq, r->seq.data(), r->seq.size());
    std::memcpy(qual, r->qual.data(), r->qual.size());
    std::memcpy(seq_off, r->seq_off.data(), (n + 1) * 8);
    std::memcpy(cig_ops, r->cig_ops.data(), r->cig_ops.size());
    std::memcpy(cig_lens, r->cig_lens.data(), r->cig_lens.size() * 4);
    std::memcpy(cig_off, r->cig_off.data(), (n + 1) * 8);
    std::memcpy(names, r->names.data(), r->names.size());
    std::memcpy(name_off, r->name_off.data(), (n + 1) * 8);
    return 0;
}

void cram_slice_free(void* h)
{
    delete (SliceResult*)h;
}

}  // extern "C"
