// Sanitizer smoke harness for the native library (SURVEY §5 "race
// detection / sanitizers": the reference wires ASan build types and
// cppcheck-as-error into its build, docs/developerGuide/README.md).
//
// Built standalone by `make -C native check` with
// -fsanitize=address,undefined and run immediately: it exercises every
// exported compute entry point on synthetic data sized to hit the
// interesting paths (multi-threaded stripes, group loops, formatter
// buffer bounds). Any out-of-bounds access, leak, UB or data race the
// sanitizers can see fails the build. tests/test_native.py runs it as
// part of the suite when the toolchain supports sanitizers.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int32_t snv_hist(const int8_t*, const int16_t*, const uint8_t*, int64_t,
                 int64_t, int32_t, int8_t*);
int32_t exact_score_best_offsets(const int8_t*, const float*, const float*,
                                 const int8_t*, int64_t, int64_t, int64_t,
                                 int64_t, float*, int32_t*);
int32_t dependent_eprob_delta(const int8_t*, const int16_t*, const uint8_t*,
                              const uint8_t*, const uint8_t*, int64_t,
                              int64_t, float, float, float*, float*);
int64_t block_compress_run2(const int64_t*, const int32_t*, const int32_t*,
                            const int32_t*, int64_t, int64_t, int32_t,
                            double, int64_t*);
int64_t block_format_lines(const int64_t*, int64_t, int64_t, const uint8_t*,
                           const char*, const char*, const char*,
                           const int32_t*, char*, int64_t);
}

static uint64_t rng_state = 0x9e3779b97f4a7c15ull;
static uint32_t rnd()
{
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return (uint32_t)(rng_state >> 32);
}

int main()
{
    const int64_t L = 20000, D = 40;
    std::vector<int8_t> base(L * D);
    std::vector<int16_t> qual(L * D);
    std::vector<uint8_t> used(L * D), fwd(L * D), nbmm(L * D);
    for (int64_t i = 0; i < L * D; ++i) {
        base[i] = (int8_t)(rnd() % 5);
        qual[i] = (int16_t)(rnd() % 64);
        used[i] = rnd() % 4 != 0;
        fwd[i] = rnd() % 2;
        nbmm[i] = rnd() % 3 == 0;
    }

    std::vector<int8_t> hist(L * 128 * 4, 0);
    if (snv_hist(base.data(), qual.data(), used.data(), L, D, 128,
                 hist.data()) != 0)
        return 1;

    std::vector<float> s_delta(L * 4);
    std::vector<float> plane(L * D);
    if (dependent_eprob_delta(base.data(), qual.data(), used.data(),
                              fwd.data(), nbmm.data(), L, D, 0.35f, 0.6f,
                              s_delta.data(), plane.data()) != 0)
        return 1;

    const int64_t B = 16, R = 32, SL = 100, W = 48;
    std::vector<int8_t> codes(B * R * SL);
    std::vector<float> delta(B * R * SL);
    std::vector<float> lnmis(B * R);
    std::vector<int8_t> win(B * SL * W);
    for (auto& c : codes) c = (int8_t)(rnd() % 5);
    for (auto& d : delta) d = (float)((rnd() % (1 << 16)) / 2048.0);
    for (auto& m : lnmis) m = -(float)(rnd() % 1000);
    for (auto& w : win) w = (int8_t)(rnd() % 5);
    std::vector<float> best(B * R);
    std::vector<int32_t> off(B * R);
    if (exact_score_best_offsets(codes.data(), delta.data(), lnmis.data(),
                                 win.data(), B, R, SL, W, best.data(),
                                 off.data()) != 0)
        return 1;

    const int64_t N = 5000;
    std::vector<int64_t> key(N);
    std::vector<int32_t> gqx(N), dp(N), dpf(N);
    for (int64_t i = 0; i < N; ++i) {
        key[i] = (int64_t)(rnd() % 4) * 37 + ((int64_t)(rnd() % 2) << 14)
                 + ((int64_t)(rnd() % 3) << 8);
        gqx[i] = rnd() % 60;
        dp[i] = rnd() % 50;
        dpf[i] = rnd() % 8;
    }
    std::vector<int64_t> rows(N * 7);
    const int64_t n_rows = block_compress_run2(key.data(), gqx.data(),
                                               dp.data(), dpf.data(), 0, N,
                                               3, 0.3, rows.data());
    if (n_rows < 0) return 1;

    // 256-entry FILTER table: "F<k>;" per key
    std::vector<char> fblob;
    std::vector<int32_t> foff(257, 0);
    for (int k = 0; k < 256; ++k) {
        char tmp[16];
        const int m = snprintf(tmp, sizeof tmp, "F%d", k);
        fblob.insert(fblob.end(), tmp, tmp + m);
        foff[k + 1] = (int32_t)fblob.size();
    }
    std::vector<uint8_t> ref(N);
    for (auto& r : ref) r = (uint8_t)(rnd() % 5);
    std::vector<char> out(n_rows * 200 + 256);
    const int64_t m = block_format_lines(
        rows.data(), n_rows, 1000, ref.data(), "chrS", "LBL",
        fblob.data(), foff.data(), out.data(), (int64_t)out.size());
    if (m < 0) return 1;

    std::printf("sancheck ok: hist+depeprob+score+blocks "
                "(%lld rows, %lld fmt bytes)\n",
                (long long)n_rows, (long long)m);
    return 0;
}
