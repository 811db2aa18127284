// strelka_tpu native IO: multithreaded BGZF inflate + BAM record parse.
//
// Replaces the reference's htslib-backed read path (htsapi/bam_streamer)
// with a batch-oriented decoder: BGZF blocks are independent deflate
// streams, so they decompress in parallel across a thread pool; BAM
// records are then parsed in one linear pass into struct-of-arrays
// buffers provided by the Python caller (zero-copy into numpy).
//
// Exposed via a C ABI consumed through ctypes (strelka_tpu/io/native.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// Scan BGZF block headers. Returns number of blocks, filling
// block_offsets (compressed) and block_isizes (uncompressed size).
// Returns -1 on format error.
int64_t bgzf_scan(const uint8_t* data, int64_t len,
                  int64_t* block_offsets, int64_t* block_csizes,
                  int64_t* block_isizes, int64_t max_blocks)
{
    int64_t pos = 0;
    int64_t n = 0;
    while (pos + 18 <= len && n < max_blocks)
    {
        if (data[pos] != 0x1f || data[pos + 1] != 0x8b) return -1;
        const uint16_t xlen = (uint16_t)(data[pos + 10] | (data[pos + 11] << 8));
        // find BC subfield
        int64_t xp = pos + 12;
        const int64_t xend = xp + xlen;
        int64_t bsize = -1;
        while (xp + 4 <= xend)
        {
            const uint8_t si1 = data[xp], si2 = data[xp + 1];
            const uint16_t slen = (uint16_t)(data[xp + 2] | (data[xp + 3] << 8));
            if (si1 == 'B' && si2 == 'C' && slen == 2)
            {
                bsize = (int64_t)(data[xp + 4] | (data[xp + 5] << 8)) + 1;
                break;
            }
            xp += 4 + slen;
        }
        if (bsize < 0) return -1;
        const int64_t isize_off = pos + bsize - 4;
        if (isize_off + 4 > len) return -1;
        uint32_t isize;
        std::memcpy(&isize, data + isize_off, 4);
        block_offsets[n] = pos;
        block_csizes[n] = bsize;
        block_isizes[n] = isize;
        ++n;
        pos += bsize;
    }
    return n;
}

// Inflate all scanned blocks in parallel into `out` at the prefix-sum
// destinations given by out_offsets. Returns 0 on success.
int32_t bgzf_inflate_blocks(const uint8_t* data,
                            const int64_t* block_offsets,
                            const int64_t* block_csizes,
                            const int64_t* out_offsets,
                            const int64_t* block_isizes,
                            int64_t n_blocks,
                            uint8_t* out,
                            int32_t n_threads)
{
    if (n_threads < 1) n_threads = 1;
    std::vector<int32_t> rc(n_threads, 0);
    auto worker = [&](int32_t t)
    {
        for (int64_t b = t; b < n_blocks; b += n_threads)
        {
            const int64_t in_off = block_offsets[b];
            const uint16_t xlen = (uint16_t)(data[in_off + 10] | (data[in_off + 11] << 8));
            const int64_t payload = in_off + 12 + xlen;
            const int64_t payload_len = block_csizes[b] - 12 - xlen - 8;
            z_stream zs;
            std::memset(&zs, 0, sizeof(zs));
            if (inflateInit2(&zs, -15) != Z_OK) { rc[t] = 1; return; }
            zs.next_in = const_cast<Bytef*>(data + payload);
            zs.avail_in = (uInt)payload_len;
            zs.next_out = out + out_offsets[b];
            zs.avail_out = (uInt)block_isizes[b];
            const int zret = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (zret != Z_STREAM_END && !(zret == Z_BUF_ERROR && block_isizes[b] == 0))
            {
                rc[t] = 2;
                return;
            }
        }
    };
    std::vector<std::thread> threads;
    for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
    for (const int32_t r : rc) if (r != 0) return r;
    return 0;
}

// Pass 1 over decoded BAM alignment section: count records and total
// seq/cigar/name sizes. data points at the first alignment record.
// Returns number of records, or -1 on truncation.
int64_t bam_count_records(const uint8_t* data, int64_t len,
                          int64_t* total_seq, int64_t* total_cigar,
                          int64_t* total_name)
{
    int64_t pos = 0, n = 0;
    int64_t seq_sum = 0, cig_sum = 0, name_sum = 0;
    while (pos + 4 <= len)
    {
        int32_t block_size;
        std::memcpy(&block_size, data + pos, 4);
        if (block_size < 32 || pos + 4 + block_size > len) return -1;
        const uint8_t* r = data + pos + 4;
        const uint8_t l_read_name = r[8];
        uint16_t n_cigar;
        std::memcpy(&n_cigar, r + 12, 2);
        int32_t l_seq;
        std::memcpy(&l_seq, r + 16, 4);
        seq_sum += l_seq;
        cig_sum += n_cigar;
        name_sum += l_read_name;  // includes NUL
        pos += 4 + block_size;
        ++n;
    }
    *total_seq = seq_sum;
    *total_cigar = cig_sum;
    *total_name = name_sum;
    return n;
}

static const uint8_t kNibToCode[16] = {
    4, 0, 1, 4, 2, 4, 4, 4, 3, 4, 4, 4, 4, 4, 4, 4};

// Pass 2: fill struct-of-arrays outputs (all preallocated by caller).
int32_t bam_parse_records(const uint8_t* data, int64_t len,
                          int32_t* tid, int64_t* posv, uint8_t* mapq,
                          uint16_t* flag, int32_t* mate_tid,
                          int64_t* mate_pos, int64_t* tlen,
                          uint8_t* seq, uint8_t* qual, int64_t* seq_off,
                          int8_t* cig_ops, int32_t* cig_lens,
                          int64_t* cig_off,
                          uint8_t* names, int64_t* name_off)
{
    int64_t pos = 0, n = 0;
    int64_t sq = 0, cg = 0, nm = 0;
    seq_off[0] = 0;
    cig_off[0] = 0;
    name_off[0] = 0;
    while (pos + 4 <= len)
    {
        int32_t block_size;
        std::memcpy(&block_size, data + pos, 4);
        if (block_size < 32 || pos + 4 + block_size > len) return 1;
        const uint8_t* r = data + pos + 4;
        int32_t v32;
        std::memcpy(&v32, r, 4);       tid[n] = v32;
        std::memcpy(&v32, r + 4, 4);   posv[n] = v32;
        const uint8_t l_read_name = r[8];
        mapq[n] = r[9];
        uint16_t n_cigar, fl;
        std::memcpy(&n_cigar, r + 12, 2);
        std::memcpy(&fl, r + 14, 2);   flag[n] = fl;
        int32_t l_seq;
        std::memcpy(&l_seq, r + 16, 4);
        std::memcpy(&v32, r + 20, 4);  mate_tid[n] = v32;
        std::memcpy(&v32, r + 24, 4);  mate_pos[n] = v32;
        std::memcpy(&v32, r + 28, 4);  tlen[n] = v32;

        const uint8_t* p = r + 32;
        std::memcpy(names + nm, p, l_read_name);
        nm += l_read_name;
        p += l_read_name;
        for (uint16_t c = 0; c < n_cigar; ++c)
        {
            uint32_t cv;
            std::memcpy(&cv, p + 4 * c, 4);
            cig_ops[cg + c] = (int8_t)(cv & 0xF);
            cig_lens[cg + c] = (int32_t)(cv >> 4);
        }
        cg += n_cigar;
        p += 4 * (int64_t)n_cigar;
        for (int32_t i = 0; i < l_seq; ++i)
        {
            const uint8_t nib = (i & 1) ? (p[i >> 1] & 0xF) : (p[i >> 1] >> 4);
            seq[sq + i] = kNibToCode[nib];
        }
        p += (l_seq + 1) / 2;
        std::memcpy(qual + sq, p, l_seq);
        sq += l_seq;

        ++n;
        seq_off[n] = sq;
        cig_off[n] = cg;
        name_off[n] = nm;
        pos += 4 + block_size;
    }
    return 0;
}

}  // extern "C"
