// Standalone match-finder/DP profiling harness for the host codec's
// optimal-parse levels (9-12). Includes lz4r.cpp directly and compiles
// with -DPLZ4_STATS to expose walk counters and per-pass timings that are
// ifdef'd out of the production .so.
//
// Build:  g++ -O2 -g -std=c++17 -DPLZ4_STATS tools/prof_opt.cpp -o /tmp/prof_opt
// Run:    /tmp/prof_opt <level> <mb> <text|boiler|runs> [reps]
//
// Corpora mirror tools/bench_host_levels.py's classes (natural-ish text,
// templated rows, byte runs) but are generated in C++ — absolute sizes
// differ from the Python corpora; use for RELATIVE pass/walk analysis only.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <random>
#include <chrono>

#include "../plz4_tpu/native/lz4r.cpp"

static std::vector<uint8_t> gen_boiler(size_t n, unsigned seed) {
    std::mt19937 rng(seed);
    std::vector<uint8_t> out;
    char buf[256];
    while (out.size() < n) {
        int len = snprintf(buf, sizeof buf,
            "<row id=\"%06u\" class=\"item item-%u\" state=\"ok\">"
            "<name>unit %05u</name><value>%u.%03u</value></row>\n",
            rng() % 1000, rng() % 1000, rng() % 1000, rng() % 1000,
            rng() % 1000);
        out.insert(out.end(), buf, buf + len);
    }
    out.resize(n);
    return out;
}

static std::vector<uint8_t> gen_runs(size_t n, unsigned seed) {
    std::mt19937 rng(seed);
    std::vector<uint8_t> out;
    while (out.size() < n) {
        out.insert(out.end(), 64 + rng() % 8128, (uint8_t)(rng() % 4));
        int t = 20 + rng() % 180;
        for (int i = 0; i < t; ++i) out.push_back(32 + rng() % 95);
    }
    out.resize(n);
    return out;
}

static std::vector<uint8_t> gen_textzero(size_t n, unsigned seed) {
    // silesia-like weak cell: word-soup text with interleaved zero runs
    // (~25% zeros) — the slice class measured at 0.4-1.3 MB/s at L11/12
    std::mt19937 rng(seed);
    static const char* words[] = {"the", "quick", "brown", "fox", "jumps",
                                  "over", "lazy", "dog", "compression",
                                  "hash", "match", "token", "stream"};
    std::vector<uint8_t> out;
    while (out.size() < n) {
        for (int w = 0, e = 8 + rng() % 40; w < e; ++w) {
            const char* s = words[rng() % 13];
            out.insert(out.end(), s, s + strlen(s));
            out.push_back(' ');
        }
        out.insert(out.end(), 16 + rng() % 512, 0);
    }
    out.resize(n);
    return out;
}

static std::vector<uint8_t> gen_text(size_t n, unsigned seed) {
    // zipf-ish word soup approximating natural-text match statistics
    std::mt19937 rng(seed);
    std::vector<std::string> words;
    static const char* syl[] = {"an", "ter", "ma", "con", "re", "in", "de",
                                "pro", "sta", "tion", "al", "is", "en", "ly"};
    for (int i = 0; i < 4096; ++i) {
        std::string w;
        int k = 1 + rng() % 4;
        for (int j = 0; j < k; ++j) w += syl[rng() % 14];
        words.push_back(w);
    }
    std::vector<uint8_t> out;
    while (out.size() < n) {
        double u = (double)rng() / 4294967296.0;
        int r = (int)(u * u * 4096);
        const std::string& w = words[r];
        out.insert(out.end(), w.begin(), w.end());
        out.push_back(rng() % 12 ? ' ' : '\n');
    }
    out.resize(n);
    return out;
}

int main(int argc, char** argv) {
    int level = argc > 1 ? atoi(argv[1]) : 12;
    size_t mb = argc > 2 ? (size_t)atoi(argv[2]) : 4;
    const char* which = argc > 3 ? argv[3] : "text";
    int reps = argc > 4 ? atoi(argv[4]) : 2;
    if (argc > 7)
        lz4r_set_opt_params(level, atoi(argv[5]), atoi(argv[6]),
                            atoi(argv[7]),
                            argc > 8 ? atoi(argv[8]) : atoi(argv[5]),
                            argc > 9 ? atoi(argv[9]) : 0);
    size_t n = mb << 20;
    std::vector<uint8_t> data =
        strcmp(which, "boiler") == 0 ? gen_boiler(n, 7)
        : strcmp(which, "runs") == 0 ? gen_runs(n, 7)
        : strcmp(which, "textzero") == 0 ? gen_textzero(n, 7)
                                         : gen_text(n, 7);
    std::vector<uint8_t> dst(n + n / 128 + 64);
    int out = 0;
    // warm-up (page faults, scratch growth)
    compress_opt(data.data(), data.data(), (int)n, dst.data(),
                 (int)dst.size(), level);
    g_cfstats = CfStats{};
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r)
        out = compress_opt(data.data(), data.data(), (int)n, dst.data(),
                           (int)dst.size(), level);
    double el = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    double mbs = (double)n * reps / el / 1e6;
    printf("level=%d corpus=%s n=%zu out=%d  %.2f MB/s\n", level, which, n,
           out, mbs);
    printf("pass1=%.3fs pass2=%.3fs (per rep: %.3f / %.3f)\n",
           g_cfstats.pass1_s, g_cfstats.pass2_s, g_cfstats.pass1_s / reps,
           g_cfstats.pass2_s / reps);
    printf("finds=%llu steps=%llu (%.1f steps/find, %.1f finds/KB) "
           "pa_segs=%llu swaps=%llu\n",
           (unsigned long long)g_cfstats.finds,
           (unsigned long long)g_cfstats.steps,
           g_cfstats.finds ? (double)g_cfstats.steps / g_cfstats.finds : 0.0,
           (double)g_cfstats.finds / reps / ((double)n / 1024),
           (unsigned long long)g_cfstats.pa_segs,
           (unsigned long long)g_cfstats.swaps);
    printf("gl_iters=%llu (%.2f/pos) tail_q=%llu (%.3f/pos)\n",
           (unsigned long long)g_cfstats.gl_iters,
           (double)g_cfstats.gl_iters / reps / n,
           (unsigned long long)g_cfstats.tail_q,
           (double)g_cfstats.tail_q / reps / n);
    printf("pa_builds=%llu pa_bsteps=%llu (%.1f/build)\n",
           (unsigned long long)g_cfstats.pa_builds,
           (unsigned long long)g_cfstats.pa_bsteps,
           g_cfstats.pa_builds
               ? (double)g_cfstats.pa_bsteps / g_cfstats.pa_builds : 0.0);
    printf("span_reads=%llu (%.1f/find) ladder=%llu (%.2f/find) "
           "seeded=%llu (%.2f of finds)\n",
           (unsigned long long)g_cfstats.span_reads,
           g_cfstats.finds ? (double)g_cfstats.span_reads / g_cfstats.finds
                           : 0.0,
           (unsigned long long)g_cfstats.ladder,
           g_cfstats.finds ? (double)g_cfstats.ladder / g_cfstats.finds : 0.0,
           (unsigned long long)g_cfstats.seeded,
           g_cfstats.finds ? (double)g_cfstats.seeded / g_cfstats.finds
                           : 0.0);
    uint64_t tot_cnt = 0, tot_gain = 0;
    for (int b = 0; b < 32; ++b) {
        tot_cnt += g_cfstats.imp_d_cnt[b];
        tot_gain += g_cfstats.imp_d_gain[b];
    }
    if (tot_cnt) {
        printf("improvements at covered positions by d from anchor "
               "(cnt/gain, %% of total gain):\n");
        for (int b = 1; b < 32; ++b) {
            if (!g_cfstats.imp_d_cnt[b]) continue;
            if (b <= 15)
                printf("  d=%-5d", b);
            else
                printf("  d>=%-4d", 1 << (b - 16));
            printf("%9llu /%10llu  (%5.1f%%)\n",
                   (unsigned long long)g_cfstats.imp_d_cnt[b],
                   (unsigned long long)g_cfstats.imp_d_gain[b],
                   100.0 * g_cfstats.imp_d_gain[b] / tot_gain);
        }
    }
    return 0;
}
