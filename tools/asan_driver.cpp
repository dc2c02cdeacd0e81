// Memory-safety harness for the native codec: exercises the full exported
// lz4r API under AddressSanitizer + UBSan. Build & run:
//
//   g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
//       -o /tmp/lz4r_asan tools/asan_driver.cpp plz4_tpu/native/lz4r.cpp
//   /tmp/lz4r_asan
//
// Exercised: compress/decompress at all levels (1-12) on varied corpora
// (text-ish, zeros, periodic, random, tiny, empty), window compress,
// dictionary contexts (greedy + HC + opt, first-call path included —
// regression for the insert_upto 3-byte overread), streaming contexts
// (chained blocks, dict preload, window slide), streaming decode, xxh32
// one-shot + streaming, batch entry points, and a corrupt-input fuzz of
// the decoder (bit flips + truncations must return -1 or valid length,
// never touch memory out of bounds).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int lz4r_compress_bound(int);
int lz4r_compress(const uint8_t*, int, uint8_t*, int, int, const uint8_t*,
                  int);
int lz4r_decompress(const uint8_t*, int, uint8_t*, int, const uint8_t*, int);
struct Lz4rDictCtx;
Lz4rDictCtx* lz4r_dict_create(const uint8_t*, int);
int lz4r_dict_compress(Lz4rDictCtx*, const uint8_t*, int, uint8_t*, int, int);
void lz4r_dict_free(Lz4rDictCtx*);
struct Lz4rStream;
Lz4rStream* lz4r_stream_create(int);
void lz4r_stream_load_dict(Lz4rStream*, const uint8_t*, int);
int lz4r_stream_compress(Lz4rStream*, const uint8_t*, int, uint8_t*, int);
void lz4r_stream_free(Lz4rStream*);
struct Lz4rDStream;
Lz4rDStream* lz4r_dstream_create(void);
void lz4r_dstream_load_dict(Lz4rDStream*, const uint8_t*, int);
int lz4r_dstream_decompress(Lz4rDStream*, const uint8_t*, int, int,
                            const uint8_t**);
void lz4r_dstream_append(Lz4rDStream*, const uint8_t*, int);
void lz4r_dstream_free(Lz4rDStream*);
int64_t lz4r_stitch_chunks(const uint8_t*, int64_t, int32_t,
                           const uint8_t*, const int64_t*, const int32_t*,
                           int, uint8_t*, int64_t);
int lz4r_chunk_split(const uint8_t*, int64_t, int32_t, int64_t*, int);
uint32_t lz4r_xxh32(const uint8_t*, size_t, uint32_t);
struct Lz4rXxh32State;
Lz4rXxh32State* lz4r_xxh32_create(uint32_t);
void lz4r_xxh32_update(Lz4rXxh32State*, const uint8_t*, size_t);
uint32_t lz4r_xxh32_digest(const Lz4rXxh32State*);
void lz4r_xxh32_free(Lz4rXxh32State*);
}

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint32_t rnd() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return (uint32_t)(rng_state >> 32);
}

static int fails = 0;
#define CHECK(cond, ...)                                                   \
    do {                                                                   \
        if (!(cond)) {                                                     \
            ++fails;                                                       \
            std::fprintf(stderr, "CHECK failed %s:%d: ", __FILE__,         \
                         __LINE__);                                        \
            std::fprintf(stderr, __VA_ARGS__);                             \
            std::fprintf(stderr, "\n");                                    \
        }                                                                  \
    } while (0)

static std::vector<uint8_t> corpus_text(size_t n) {
    static const char* words[] = {"the",  "quick", "brown", "fox",
                                  "jump", "lazy",  "dog",   "stream"};
    std::vector<uint8_t> v;
    while (v.size() < n) {
        const char* w = words[rnd() % 8];
        v.insert(v.end(), w, w + std::strlen(w));
        v.push_back(' ');
    }
    v.resize(n);
    return v;
}

static std::vector<uint8_t> corpus_random(size_t n) {
    std::vector<uint8_t> v(n);
    for (auto& b : v) b = (uint8_t)rnd();
    return v;
}

static std::vector<uint8_t> corpus_periodic(size_t n, size_t period) {
    std::vector<uint8_t> pat = corpus_random(period);
    std::vector<uint8_t> v;
    while (v.size() < n) v.insert(v.end(), pat.begin(), pat.end());
    v.resize(n);
    return v;
}

static void roundtrip(const std::vector<uint8_t>& data, int level,
                      const std::vector<uint8_t>* dict) {
    int cap = lz4r_compress_bound((int)data.size());
    std::vector<uint8_t> comp(cap > 0 ? cap : 1);
    const uint8_t* dptr = dict ? dict->data() : nullptr;
    int dlen = dict ? (int)dict->size() : 0;
    // window-compress API: dict passed as window prefix
    std::vector<uint8_t> buf;
    int n;
    if (dict) {
        buf.insert(buf.end(), dict->begin(), dict->end());
        buf.insert(buf.end(), data.begin(), data.end());
        n = lz4r_compress(buf.data() + dlen, (int)data.size(), comp.data(),
                          cap, level, buf.data(), dlen);
    } else {
        n = lz4r_compress(data.data(), (int)data.size(), comp.data(), cap,
                          level, nullptr, 0);
    }
    if (n <= 0) return;  // incompressible signal is fine
    std::vector<uint8_t> out(data.size() ? data.size() : 1);
    int m = lz4r_decompress(comp.data(), n, out.data(), (int)data.size(),
                            dptr, dlen);
    CHECK(m == (int)data.size(), "roundtrip size level=%d n=%zu m=%d", level,
          data.size(), m);
    CHECK(data.empty() ||
              std::memcmp(out.data(), data.data(), data.size()) == 0,
          "roundtrip bytes level=%d n=%zu", level, data.size());

    // corrupt-input fuzz: decoder must never read/write OOB (ASAN checks),
    // return value may be -1 or any length <= cap
    for (int t = 0; t < 24; ++t) {
        std::vector<uint8_t> bad(comp.begin(), comp.begin() + n);
        switch (t % 3) {
            case 0: bad[rnd() % n] ^= (uint8_t)(1 + rnd() % 255); break;
            case 1: bad.resize(rnd() % n); break;
            default:
                bad[rnd() % n] = (uint8_t)rnd();
                bad[rnd() % n] ^= 0xFF;
        }
        if (bad.empty()) continue;
        lz4r_decompress(bad.data(), (int)bad.size(), out.data(),
                        (int)data.size(), dptr, dlen);
    }
}

int main() {
    std::vector<std::vector<uint8_t>> corpora = {
        corpus_text(70000), corpus_text(1024),
        std::vector<uint8_t>(50000, 0), corpus_periodic(50000, 5),
        corpus_periodic(50000, 37),     corpus_random(32768),
        corpus_text(12),                {},
    };
    std::vector<uint8_t> dict = corpus_text(65536);
    std::vector<uint8_t> small_dict = corpus_text(300);

    for (auto& data : corpora) {
        for (int level = 1; level <= 12; ++level) {
            roundtrip(data, level, nullptr);
            roundtrip(data, level, &dict);
            roundtrip(data, level, &small_dict);
        }
    }

    // dictionary context: FIRST compress call at an HC level hits the
    // prebuilt-chain path (regression: insert_upto read 3 bytes past the
    // scratch vector before the first resize)
    for (int level : {1, 2, 6, 8, 9, 12}) {
        for (auto* d : {&dict, &small_dict}) {
            Lz4rDictCtx* c = lz4r_dict_create(d->data(), (int)d->size());
            auto rec = corpus_text(1024);
            std::vector<uint8_t> comp(lz4r_compress_bound(1024));
            int n = lz4r_dict_compress(c, rec.data(), (int)rec.size(),
                                       comp.data(), (int)comp.size(), level);
            if (n > 0) {
                std::vector<uint8_t> out(rec.size());
                int m = lz4r_decompress(comp.data(), n, out.data(),
                                        (int)rec.size(), d->data(),
                                        (int)d->size());
                CHECK(m == (int)rec.size() && out == rec,
                      "dictctx roundtrip level=%d", level);
            }
            // several more records through the shared state
            for (int r = 0; r < 8; ++r) {
                auto rec2 = corpus_text(256 + rnd() % 2048);
                std::vector<uint8_t> c2(lz4r_compress_bound(4096));
                lz4r_dict_compress(c, rec2.data(), (int)rec2.size(),
                                   c2.data(), (int)c2.size(), level);
            }
            lz4r_dict_free(c);
        }
    }

    // streaming contexts: chained blocks with/without dict preload, block
    // sizes that force the window slide
    for (int level : {1, 4, 6, 9, 12}) {
        for (int with_dict = 0; with_dict < 2; ++with_dict) {
            Lz4rStream* s = lz4r_stream_create(level);
            Lz4rDStream* ds = lz4r_dstream_create();
            if (with_dict) {
                lz4r_stream_load_dict(s, dict.data(), (int)dict.size());
                lz4r_dstream_load_dict(ds, dict.data(), (int)dict.size());
            }
            std::vector<uint8_t> history;
            for (int b = 0; b < 24; ++b) {
                auto blk = corpus_text(1000 + rnd() % 30000);
                std::vector<uint8_t> comp(
                    lz4r_compress_bound((int)blk.size()));
                int n = lz4r_stream_compress(s, blk.data(), (int)blk.size(),
                                             comp.data(), (int)comp.size());
                if (n > 0) {
                    const uint8_t* out = nullptr;
                    int m = lz4r_dstream_decompress(ds, comp.data(), n,
                                                    (int)blk.size(), &out);
                    CHECK(m == (int)blk.size() &&
                              std::memcmp(out, blk.data(), m) == 0,
                          "stream roundtrip level=%d blk=%d", level, b);
                } else {
                    lz4r_dstream_append(ds, blk.data(), (int)blk.size());
                }
            }
            lz4r_stream_free(s);
            lz4r_dstream_free(ds);
        }
    }

    // large-block control plane: chunked window-prefix encode -> stitch
    // -> decode + split -> reference record replay, plus adversarial
    // truncations of both entry points (bounds under ASAN)
    {
        const int CH = 4096;
        auto big = corpus_text(3 * CH + 1234);
        std::vector<uint8_t> streams;
        std::vector<int64_t> offs;
        std::vector<int32_t> slens;
        for (size_t i = 0; i < big.size(); i += CH) {
            size_t n = std::min((size_t)CH, big.size() - i);
            const uint8_t* d = i ? big.data() + i - CH : nullptr;
            int dn = i ? CH : 0;
            std::vector<uint8_t> out(lz4r_compress_bound((int)n));
            int m = lz4r_compress(big.data() + i, (int)n, out.data(),
                                  (int)out.size(), 6, d, dn);
            CHECK(m > 0, "chunk compress");
            offs.push_back((int64_t)streams.size());
            slens.push_back(m);
            streams.insert(streams.end(), out.begin(), out.begin() + m);
        }
        std::vector<uint8_t> dst(big.size() + big.size() / 255 + 64);
        int64_t st = lz4r_stitch_chunks(big.data(), (int64_t)big.size(), CH,
                                        streams.data(), offs.data(),
                                        slens.data(), (int)offs.size(),
                                        dst.data(), (int64_t)dst.size());
        CHECK(st > 0, "stitch");
        std::vector<uint8_t> back(big.size());
        int bm = lz4r_decompress(dst.data(), (int)st, back.data(),
                                 (int)back.size(), nullptr, 0);
        CHECK(bm == (int)big.size() && back == big, "stitch roundtrip");
        // split the stitched stream and replay the records
        std::vector<int64_t> recs(8 * (big.size() / CH + 2));
        int nr = lz4r_chunk_split(dst.data(), st, CH, recs.data(),
                                  (int)(recs.size() / 8));
        CHECK(nr > 0, "split");
        // truncation sweeps: every prefix must be rejected or in-bounds
        for (int64_t cut = 0; cut < st; cut += 7) {
            lz4r_chunk_split(dst.data(), cut, CH, recs.data(),
                             (int)(recs.size() / 8));
            uint8_t tmp[512];
            int64_t o2[4] = {0};
            int32_t s2[4] = {(int32_t)std::min<int64_t>(cut, 512)};
            lz4r_stitch_chunks(big.data(), std::min<int64_t>(cut, 400), CH,
                               dst.data(), o2, s2, 1, tmp, sizeof tmp);
        }
        // random garbage through split (bounds only; result irrelevant)
        for (int t = 0; t < 200; ++t) {
            std::vector<uint8_t> junk(1 + rnd() % 300);
            for (auto& b : junk) b = (uint8_t)rnd();
            lz4r_chunk_split(junk.data(), (int64_t)junk.size(), CH,
                             recs.data(), (int)(recs.size() / 8));
        }
    }

    // xxh32: one-shot == streaming over odd-sized updates
    auto data = corpus_text(100000);
    uint32_t h1 = lz4r_xxh32(data.data(), data.size(), 0);
    Lz4rXxh32State* st = lz4r_xxh32_create(0);
    size_t off = 0;
    while (off < data.size()) {
        size_t step = 1 + rnd() % 8192;
        if (off + step > data.size()) step = data.size() - off;
        lz4r_xxh32_update(st, data.data() + off, step);
        off += step;
    }
    CHECK(lz4r_xxh32_digest(st) == h1, "xxh32 stream mismatch");
    lz4r_xxh32_free(st);

    if (fails == 0) std::puts("ASAN harness: all checks passed");
    return fails == 0 ? 0 : 1;
}
