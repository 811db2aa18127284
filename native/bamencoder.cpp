// BAM record serialization (the hot loop of realigned-BAM output).
//
// Mirrors io/bam_writer.py _record_bytes exactly: per read, the BAM
// alignment record layout (SAMv1 spec §4.2) with 4-bit packed sequence
// and reg2bin over the alignment span. Two-pass API: size, then fill
// into a caller-allocated buffer in the given order.
//
// Reference analog: htsapi/bam_dumper.hh (htslib bam_write1).

#include <cstdint>
#include <cstring>

namespace
{

const uint8_t CODE_TO_NIB[5] = {1, 2, 4, 8, 15};  // A C G T N

// per-op reference-advance flags for M/I/D/N/S/H/P/=/X
const int OP_REF_ADVANCE[9] = {1, 0, 1, 1, 0, 0, 0, 1, 1};

int reg2bin(int64_t beg, int64_t end)
{
    --end;
    if (beg >> 14 == end >> 14) return (int)(((1 << 15) - 1) / 7 + (beg >> 14));
    if (beg >> 17 == end >> 17) return (int)(((1 << 12) - 1) / 7 + (beg >> 17));
    if (beg >> 20 == end >> 20) return (int)(((1 << 9) - 1) / 7 + (beg >> 20));
    if (beg >> 23 == end >> 23) return (int)(((1 << 6) - 1) / 7 + (beg >> 23));
    if (beg >> 26 == end >> 26) return (int)(((1 << 3) - 1) / 7 + (beg >> 26));
    return 0;
}

}  // namespace

extern "C" {

// Pass 1: total serialized size of the records in `order`.
int64_t bam_encode_size(
    const int64_t* seq_off, const int64_t* cig_off,
    const int64_t* name_off,
    const int64_t* order, int64_t n)
{
    int64_t total = 0;
    for (int64_t k = 0; k < n; ++k)
    {
        const int64_t i = order[k];
        const int64_t l_seq = seq_off[i + 1] - seq_off[i];
        const int64_t n_cig = cig_off[i + 1] - cig_off[i];
        const int64_t l_name = name_off[i + 1] - name_off[i];  // excl NUL
        total += 4 + 32 + (l_name + 1) + 4 * n_cig
                 + (l_seq + 1) / 2 + l_seq;
    }
    return total;
}

// Pass 2: serialize records into out (sized by pass 1).
void bam_encode_fill(
    const int32_t* tid, const int64_t* pos, const uint8_t* mapq,
    const uint16_t* flag, const int32_t* mate_tid, const int64_t* mate_pos,
    const int64_t* tlen,
    const uint8_t* seq, const uint8_t* qual, const int64_t* seq_off,
    const int8_t* cig_ops, const int32_t* cig_lens, const int64_t* cig_off,
    const char* names, const int64_t* name_off,
    const int64_t* order, int64_t n,
    uint8_t* out)
{
    uint8_t* p = out;
    for (int64_t k = 0; k < n; ++k)
    {
        const int64_t i = order[k];
        const int64_t l_seq = seq_off[i + 1] - seq_off[i];
        const int64_t n_cig = cig_off[i + 1] - cig_off[i];
        const int64_t l_name = name_off[i + 1] - name_off[i];

        int64_t span = 0;
        for (int64_t c = cig_off[i]; c < cig_off[i + 1]; ++c)
        {
            const int8_t op = cig_ops[c];
            if (op >= 0 && op < 9 && OP_REF_ADVANCE[op]) span += cig_lens[c];
        }
        if (n_cig == 0) span = 1;
        const int64_t p0 = pos[i] > 0 ? pos[i] : 0;
        int64_t p1 = pos[i] + (span > 1 ? span : 1);
        if (p1 < 1) p1 = 1;
        const uint16_t bin = (uint16_t)reg2bin(p0, p1);

        const int32_t block =
            (int32_t)(32 + (l_name + 1) + 4 * n_cig + (l_seq + 1) / 2 + l_seq);
        memcpy(p, &block, 4); p += 4;
        const int32_t tid_v = tid[i];
        const int32_t pos_v = (int32_t)pos[i];
        memcpy(p, &tid_v, 4); p += 4;
        memcpy(p, &pos_v, 4); p += 4;
        *p++ = (uint8_t)(l_name + 1);
        *p++ = mapq[i];
        memcpy(p, &bin, 2); p += 2;
        const uint16_t ncig16 = (uint16_t)n_cig;
        memcpy(p, &ncig16, 2); p += 2;
        memcpy(p, &flag[i], 2); p += 2;
        const int32_t lseq32 = (int32_t)l_seq;
        memcpy(p, &lseq32, 4); p += 4;
        const int32_t mtid = mate_tid[i];
        const int32_t mpos = (int32_t)mate_pos[i];
        const int32_t tln = (int32_t)tlen[i];
        memcpy(p, &mtid, 4); p += 4;
        memcpy(p, &mpos, 4); p += 4;
        memcpy(p, &tln, 4); p += 4;

        memcpy(p, names + name_off[i], l_name); p += l_name;
        *p++ = 0;

        for (int64_t c = cig_off[i]; c < cig_off[i + 1]; ++c)
        {
            const uint32_t v = ((uint32_t)cig_lens[c] << 4)
                               | (uint32_t)(uint8_t)cig_ops[c];
            memcpy(p, &v, 4); p += 4;
        }

        const uint8_t* s = seq + seq_off[i];
        for (int64_t j = 0; j + 1 < l_seq; j += 2)
        {
            const uint8_t a = CODE_TO_NIB[s[j] > 4 ? 4 : s[j]];
            const uint8_t b = CODE_TO_NIB[s[j + 1] > 4 ? 4 : s[j + 1]];
            *p++ = (uint8_t)((a << 4) | b);
        }
        if (l_seq & 1)
        {
            const uint8_t a = CODE_TO_NIB[s[l_seq - 1] > 4 ? 4 : s[l_seq - 1]];
            *p++ = (uint8_t)(a << 4);
        }

        memcpy(p, qual + seq_off[i], l_seq); p += l_seq;
    }
}

}  // extern "C"
