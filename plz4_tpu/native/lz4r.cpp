// lz4r.cpp — from-scratch LZ4 block codec + xxHash-32 for the TPU-native
// plz4 framework's host path (oracle, sync mode, and frame machinery).
//
// Implements the LZ4 block format (spec: lz4_Block_format; see also the
// vendored frame spec docs) with:
//   * greedy hash-table compressor          (levels 1, reference analog:
//     clz4.CompressFast -> LZ4_compress_fast, lz4.c:930)
//   * chain-match 3-probe compressor        (levels 2-8, reference analog:
//     clz4.CompressHC -> LZ4HC_compress_generic, lz4hc.c:1374)
//   * safe decompressor with external-dict support (reference analog:
//     clz4.DecompressSafe[WithDict], lz4.c:2016)
//   * xxHash-32 one-shot + streaming        (reference analog: xxh32 pkg)
//
// This file is written from the public LZ4 format specification; it is NOT
// a copy of the upstream lz4 sources. Window layout: callers may provide a
// dictionary that is contiguous *immediately before* src (compress) — the
// Python layer arranges that copy — or as a detached buffer (decompress).
//
// All functions are exported with C linkage for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#ifdef PLZ4_STATS
#include <chrono>
#endif

#define LZ4R_API extern "C" __attribute__((visibility("default")))

namespace {

constexpr int MINMATCH = 4;
constexpr int MFLIMIT = 12;       // last match must start >= 12 bytes from end
constexpr int LASTLITERALS = 5;   // last 5 bytes are always literals
constexpr uint32_t MAX_DISTANCE = 65535;

// Lab-only instrumentation for the match-finder tuning harness
// (tools/prof_opt); compiled out of the production .so. Counters live on
// the walk hot path, so they are behind an ifdef rather than a runtime
// flag.
#ifdef PLZ4_STATS
struct CfStats {
    uint64_t finds = 0;       // find() calls
    uint64_t steps = 0;       // candidates examined
    uint64_t pa_segs = 0;     // pattern-analysis segment skips
    uint64_t swaps = 0;       // chain-swap re-picks taken
    uint64_t gl_iters = 0;    // DP: match-cost g-loop iterations
    uint64_t tail_q = 0;      // DP: ResTree query pairs actually run
    uint64_t pa_builds = 0;   // PaSum builds (one per summarized run)
    uint64_t pa_bsteps = 0;   // PaSum build walk steps (segments + collisions)
    uint64_t span_reads = 0;  // chain-swap span-scan chain[] reads
    uint64_t ladder = 0;      // 5/4-gram recovery-ladder probes
    uint64_t seeded = 0;      // find() calls entered with a carried seed
    uint64_t hc_finds = 0;    // chain-level search() calls (levels 2-8)
    uint64_t hc_steps = 0;    // search() candidates visited
    uint64_t hc_exts = 0;     // search() full extensions run
    uint64_t hc_ext_bytes = 0;  // bytes counted by those extensions
    double pass1_s = 0.0;     // opt parse: match-finder pass seconds
    double pass2_s = 0.0;     // opt parse: DP pass seconds
    // dense pass-1 diagnostics for the sparse schedule: improvements
    // (l > seed) at covered positions, bucketed by distance from the
    // carry anchor (exact 1..15, then log2), with the length gained
    uint64_t imp_d_cnt[32] = {};
    uint64_t imp_d_gain[32] = {};
};
inline CfStats g_cfstats;
#define PLZ4_STAT(expr) (void)(expr)
#else
#define PLZ4_STAT(expr) (void)0
#endif

inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

inline uint16_t read16(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}

inline void write16(uint8_t* p, uint16_t v) { std::memcpy(p, &v, 2); }

inline uint32_t hash4(uint32_t v, int hashlog) {
    return (v * 2654435761u) >> (32 - hashlog);
}

inline uint64_t read64(const uint8_t* p) {
    uint64_t v;
    std::memcpy(&v, p, 8);
    return v;
}

// 5-byte hash for the greedy match finder on large inputs: candidates
// guarantee 5 bytes of agreement, which skips marginal 4-byte matches and
// lifts ratio substantially on >=64 KiB blocks (reference analog:
// LZ4_hash5 selection in LZ4_hashPosition, lz4.c:785-799).
inline uint32_t hash5(const uint8_t* p, int hashlog) {
    uint64_t v = read64(p) << 24;  // low 40 bits selected
    return (uint32_t)((v * 889523592379ULL) >> (64 - hashlog));
}

inline uint32_t hash6(const uint8_t* p, int hashlog) {
    uint64_t v = read64(p) << 16;  // low 48 bits selected
    return (uint32_t)((v * 889523592379ULL) >> (64 - hashlog));
}

inline uint32_t hash7(const uint8_t* p, int hashlog) {
    uint64_t v = read64(p) << 8;  // low 56 bits selected
    return (uint32_t)((v * 889523592379ULL) >> (64 - hashlog));
}

// Forward run length of byte `b` starting at p, up to limit.
inline int count_run_fwd(const uint8_t* p, const uint8_t* limit, uint8_t b) {
    const uint8_t* const s = p;
    const uint64_t pat = 0x0101010101010101ull * b;
    while (p + 8 <= limit) {
        uint64_t v;
        std::memcpy(&v, p, 8);
        uint64_t diff = v ^ pat;
        if (diff) return (int)(p - s) + (__builtin_ctzll(diff) >> 3);
        p += 8;
    }
    while (p < limit && *p == b) ++p;
    return (int)(p - s);
}

// Backward run length of byte `b` ending just before p, down to low.
inline int count_run_bwd(const uint8_t* p, const uint8_t* low, uint8_t b) {
    const uint8_t* const s = p;
    const uint64_t pat = 0x0101010101010101ull * b;
    while (p - 8 >= low) {
        uint64_t v;
        std::memcpy(&v, p - 8, 8);
        if (v != pat) break;
        p -= 8;
    }
    while (p > low && p[-1] == b) --p;
    return (int)(s - p);
}

// Count matching bytes between [pa, limit) and pb (pb behind pa).
inline int count_match(const uint8_t* pa, const uint8_t* pb, const uint8_t* limit) {
    const uint8_t* const start = pa;
    while (pa + 8 <= limit) {
        uint64_t va, vb;
        std::memcpy(&va, pa, 8);
        std::memcpy(&vb, pb, 8);
        uint64_t diff = va ^ vb;
        if (diff) return (int)(pa - start) + (__builtin_ctzll(diff) >> 3);
        pa += 8;
        pb += 8;
    }
    while (pa < limit && *pa == *pb) {
        ++pa;
        ++pb;
    }
    return (int)(pa - start);
}

// Emit one sequence; returns new op or nullptr on dst overflow.
inline uint8_t* emit_sequence(uint8_t* op, uint8_t* const oend,
                              const uint8_t* anchor, int lit_len,
                              uint32_t offset, int match_len /* full, >=4 */) {
    // worst case bytes: token + litlen ext + literals + 2 + mlen ext
    // (shift-based upper bound avoids integer division in the hot path)
    size_t worst = 1 + ((size_t)lit_len >> 8) + ((size_t)lit_len >> 16) + 2 +
                   (size_t)lit_len + 2 + ((size_t)(match_len - MINMATCH) >> 8) +
                   ((size_t)(match_len - MINMATCH) >> 16) + 2 + 8;
    if ((size_t)(oend - op) < worst) return nullptr;
    uint8_t* token = op++;
    if (lit_len >= 15) {
        *token = 15 << 4;
        int rem = lit_len - 15;
        while (rem >= 255) {
            *op++ = 255;
            rem -= 255;
        }
        *op++ = (uint8_t)rem;
    } else {
        *token = (uint8_t)(lit_len << 4);
    }
    {   // wild 8-byte literal copy (slack reserved in `worst`)
        uint8_t* o = op;
        const uint8_t* s = anchor;
        int left = lit_len;
        while (left > 0) {
            std::memcpy(o, s, 8);
            o += 8;
            s += 8;
            left -= 8;
        }
    }
    op += lit_len;
    write16(op, (uint16_t)offset);
    op += 2;
    int mval = match_len - MINMATCH;
    if (mval >= 15) {
        *token |= 15;
        int rem = mval - 15;
        while (rem >= 255) {
            *op++ = 255;
            rem -= 255;
        }
        *op++ = (uint8_t)rem;
    } else {
        *token |= (uint8_t)mval;
    }
    return op;
}

inline uint8_t* emit_last_literals(uint8_t* op, uint8_t* const oend,
                                   const uint8_t* anchor, int lit_len) {
    size_t worst = 1 + ((size_t)lit_len >> 8) + ((size_t)lit_len >> 16) + 2 +
                   (size_t)lit_len;
    if ((size_t)(oend - op) < worst) return nullptr;
    uint8_t* token = op++;
    if (lit_len >= 15) {
        *token = 15 << 4;
        int rem = lit_len - 15;
        while (rem >= 255) {
            *op++ = 255;
            rem -= 255;
        }
        *op++ = (uint8_t)rem;
    } else {
        *token = (uint8_t)(lit_len << 4);
    }
    std::memcpy(op, anchor, lit_len);
    op += lit_len;
    return op;
}

// ---------------------------------------------------------------------------
// Greedy (level 1) compressor.
// wbase <= src: bytes [wbase, src) are dictionary content contiguous in
// memory. Emits only for positions >= src. Returns compressed size, or 0 if
// output would exceed dst_cap (incompressible signal), or -1 on bad args.
// ---------------------------------------------------------------------------
// The hash table is accessed through a policy object so the dictionary
// context can layer a per-record overlay on a shared read-only dict table
// (reference analog: LZ4_attach_dictionary, lz4.c:1658 — sharing the dict's
// match state across records without copying it).
struct FlatTab {
    uint32_t* t;
    uint32_t get(uint32_t h) const { return t[h]; }
    void put(uint32_t h, uint32_t v) { t[h] = v; }
};

// Epoch-tagged overlay: put() marks the slot for the current record; get()
// falls through to the prebuilt dict table for untouched slots. No per-
// record table copy or clear (the epoch bump invalidates the overlay).
struct OverlayTab {
    const uint32_t* base;
    uint32_t* pos;
    uint16_t* ep;
    uint16_t cur;
    uint32_t get(uint32_t h) const { return ep[h] == cur ? pos[h] : base[h]; }
    void put(uint32_t h, uint32_t v) { pos[h] = v; ep[h] = cur; }
};

// preloaded==false inserts window-prefix positions first (reference analog:
// LZ4_loadDict); preloaded==true means the table already covers the window.
// h5_mode: -1 = auto by src_size, else forced (streams must keep one hash
// width across blocks of varying size).
template <class TAB>
int compress_greedy_t(const uint8_t* wbase, const uint8_t* src,
                      int src_size, uint8_t* dst, int dst_cap, int accel,
                      TAB tab, bool preloaded, int h5_mode = -1) {
    if (src_size < 0 || dst_cap <= 0) return -1;
    uint8_t* op = dst;
    uint8_t* const oend = dst + dst_cap;
    if (src_size == 0) {
        // a valid LZ4 block cannot be empty per frame usage; emit empty
        // token (checked before deriving iend-offset pointers: src may be
        // null here and non-zero offsets from null are UB)
        if (dst_cap < 1) return 0;
        *op++ = 0;
        return (int)(op - dst);
    }
    const uint8_t* ip = src;
    const uint8_t* anchor = src;
    const uint8_t* const iend = src + src_size;
    const uint8_t* const mflimit = iend - MFLIMIT;
    const uint8_t* const matchlimit = iend - LASTLITERALS;

    const int hashlog = 16;

    if (src_size >= MFLIMIT + 1) {
        if (accel < 1) accel = 1;
        const int skip_strength = 6;
        // 5-byte hashing on large inputs (see hash5); 4-byte below 64 KiB,
        // where marginal 4-byte matches at long offsets are instead rejected
        // explicitly (they cost 3 wire bytes and often split better parses)
        const bool h5 = h5_mode < 0 ? src_size >= 65536 : h5_mode != 0;
        if (!preloaded) {
            for (const uint8_t* dp = wbase; dp < src; ++dp) {
                uint32_t h = h5 ? hash5(dp, hashlog)
                                : hash4(read32(dp), hashlog);
                tab.put(h, (uint32_t)(dp - wbase));
            }
        }
        // seed first position
        tab.put(h5 ? hash5(ip, hashlog) : hash4(read32(ip), hashlog),
                (uint32_t)(ip - wbase));
        ++ip;

        for (;;) {
            // --- search for a match, accelerating step on failures ---
            uint32_t search_nb = (uint32_t)accel << skip_strength;
            const uint8_t* match;
            for (;;) {
                if (ip > mflimit) goto last_literals;
                uint32_t h = h5 ? hash5(ip, hashlog)
                                : hash4(read32(ip), hashlog);
                match = wbase + tab.get(h);
                tab.put(h, (uint32_t)(ip - wbase));
                if (match < ip && (uint32_t)(ip - match) <= MAX_DISTANCE &&
                    read32(match) == read32(ip)) {
                    if (!h5 && (uint32_t)(ip - match) > 512 &&
                        match[MINMATCH] != ip[MINMATCH] &&
                        !(ip > anchor && match > wbase &&
                          ip[-1] == match[-1]))
                        ;  // bare 4-byte match far away: not worth 3 bytes
                    else
                        break;
                }
                ip += search_nb++ >> skip_strength;
            }
            // --- extend match backwards over pending literals ---
            while (ip > anchor && match > wbase && ip[-1] == match[-1]) {
                --ip;
                --match;
            }
            {
                int mlen = MINMATCH + count_match(ip + MINMATCH, match + MINMATCH,
                                                 matchlimit);
                uint32_t offset = (uint32_t)(ip - match);
                op = emit_sequence(op, oend, anchor, (int)(ip - anchor), offset,
                                   mlen);
                if (!op) return 0;
                ip += mlen;
                anchor = ip;
            }
            if (ip > mflimit) goto last_literals;
            // seed intermediate position for better future matches
            tab.put(h5 ? hash5(ip - 2, hashlog)
                       : hash4(read32(ip - 2), hashlog),
                    (uint32_t)(ip - 2 - wbase));
        }
    }

last_literals:
    op = emit_last_literals(op, oend, anchor, (int)(iend - anchor));
    if (!op) return 0;
    return (int)(op - dst);
}

int compress_greedy(const uint8_t* wbase, const uint8_t* src, int src_size,
                    uint8_t* dst, int dst_cap, int accel) {
    // reused per thread; preloaded=false always re-inserts the window, so
    // stale entries only cost wasted candidate checks (each candidate is
    // byte-verified) — but positions from a previous, longer buffer could
    // alias into unrelated bytes, so the table is zeroed per call
    static thread_local std::vector<uint32_t> tab;
    tab.assign((size_t)1 << 16, 0);
    return compress_greedy_t(wbase, src, src_size, dst, dst_cap, accel,
                             FlatTab{tab.data()}, false);
}

// ---------------------------------------------------------------------------
// HC: hash-chain match finder with 3-match arbitration (levels 2-8).
// ---------------------------------------------------------------------------
struct ChainFinder {
    // Positions are monotonically increasing across attach() calls so the
    // tables never need clearing between blocks: entries below `floor_pos`
    // are stale (they belong to a previous buffer) and every lookup rejects
    // them. `wbase` is a VIRTUAL base — position p lives at wbase + p, and
    // only [low_base, ...) is dereferenceable.
    const uint8_t* wbase;
    const uint8_t* low_base;      // first valid byte (= wbase + floor_pos)
    int hashlog;
    std::vector<uint32_t> head;   // last position+1 for hash, 0 = empty
    // Back-step DELTA to the previous occurrence of the 4-gram at position
    // p, keyed by p & 0xFFFF; 0 = none. Deltas > 65535 are outside the
    // match window, so saturating them to 0 terminates walks exactly where
    // the old absolute-position check did (reference analog: the u16
    // DELTANEXTU16 chainTable, lz4hc.c:77). Half the footprint of the
    // previous u32 absolute table = the walk's dependent load stays in a
    // smaller, hotter cache slice, and the chain-swap span scan reads the
    // back-step directly instead of deriving it.
    std::vector<uint16_t> chain;
    uint32_t next_insert;         // next position to insert
    uint32_t floor_pos;           // positions below this are invalid
    // 5-gram mode (opt-parse finders only): chains are keyed on 5-byte
    // grams, splitting text-class buckets 10-26x finer, plus a chainless
    // 4-gram head table. EXACT by construction: every match of length
    // >= 5 contains the probe's 5-gram (so the 5-gram bucket enumerates
    // all possible beaters), and a length-4 match costs the same wire
    // bytes at ANY offset, so the NEAREST 4-gram occurrence — the head4
    // entry — is as good as any deeper one. HC's widest-match search
    // (levels 2-8) scores back+forward and must stay on 4-gram chains
    // (a candidate with 4 forward bytes + back extension need not share
    // the 5th byte).
    // Gram length of the primary chain (4 = classic HC mode; the opt
    // finder uses 6). For every length below the primary gram, an exact
    // recovery ladder of head+delta-ring structures finds the NEAREST
    // verified occurrence (as good as any at equal length; anything
    // longer is the primary walk's job).
    int gram = 4;
    std::vector<uint32_t> head4;  // last 4-gram BUCKET entry+1
    // 4-gram bucket delta ring: a bare head table loses the nearest
    // occurrence to hash collisions (a later colliding gram shadows it —
    // measured 37 lost length-4 matches per 64 KiB on templated rows);
    // the ring lets the length-4 recovery walk to the first VERIFIED
    // occurrence. Touched only on insert + the rare recovery walk.
    std::vector<uint16_t> chain4;
    std::vector<uint32_t> head5;  // gram >= 6: the length-5 ladder
    std::vector<uint16_t> chain5;
    std::vector<uint32_t> head6;  // gram == 7: the length-6 ladder
    std::vector<uint16_t> chain6;

    // Single-byte-run segment cache for pattern analysis: consecutive
    // find() calls walk the same dense segments; measuring a multi-KB run
    // with count_run_fwd/bwd at every position made repeat-heavy blocks
    // O(n * runlen). A segment [s, e) of byte b is content-static for the
    // life of the buffer, so a tiny round-robin cache turns re-measures
    // into O(1) lookups. Invalidated on attach()/reset().
    struct Seg {
        uint32_t s = 1, e = 0;  // run positions [s, e); empty = invalid
        uint8_t b = 0;
    };
    Seg segcache[4];
    int seg_rr = 0;

    // Mid-run pattern-fit cache: when a pa probe at a run-entry position
    // finds a fit match (source run aligned to a candidate segment's end,
    // extending `tail` bytes past it), the SAME candidate gives an exact
    // match of (re - p) + tail at EVERY later position p inside the
    // source run, at the CONSTANT offset re - estar (the tail comparison
    // is position-independent). The RLE carry-skip consults this so
    // skipped positions keep the run/text-boundary-crossing option the
    // pure inheritance loses (the main residual of the KNOWN
    // APPROXIMATION on run-dense text).
    struct Fit {
        uint32_t re = 0;     // source run end (absolute position)
        uint32_t estar = 0;  // candidate segment end (absolute position)
        int tail = -1;       // verified match bytes past the run end
        uint8_t b = 0;
    };
    Fit fit;

    // Coverage-extension scan (the sparse pass-1 scheduler's one find
    // primitive; see compress_opt_t). Every match that starts at or
    // before j and ends PAST the coverage end E = j + gram - 1 contains
    // the primary gram at j, so one budgeted newest-first walk of j's
    // hash chain enumerates every longer-ending candidate family for the
    // whole coverage region at once. Occurrences are byte-verified, then
    // extended backward (b) and forward (f): the family is the match
    // [j-b, j+gram+f) at offset j - q, valid at every start position in
    // [j-b, j). Returns the best family by b + f coverage, or false.
    // Original design — no reference analog: upstream reaches covered
    // positions from inside its forward price-table loop instead
    // (lz4hc.c:1929-1935).
    // A family is the maximal match [j - b, j + gram + f) at offset
    // j - q. At any start position the covering family with the largest
    // END dominates (LZ4 offsets price flat), so only the Pareto frontier
    // over (b, f) matters — kept small and sorted by descending f.
    struct ExtFam {
        uint32_t q;
        int32_t b, f;
    };
    static constexpr int EXT_FAMS = 4;
    int extend_scan(uint32_t j, const uint8_t* matchlimit, int budget,
                    uint32_t inserted_upto, ExtFam* out) const {
        const uint8_t* jp = wbase + j;
        uint32_t lowest = j > MAX_DISTANCE ? j - MAX_DISTANCE : 0;
        if (lowest < floor_pos) lowest = floor_pos;
        int nf = 0;
        // The zone [inserted_upto, j) is ahead of the chain inserts, so
        // small-offset occurrences (log-like near repeats — the dominant
        // beater class on mixed corpora) are invisible to the chain walk.
        // Sweep it linearly, nearest-first; it is bounded by the carry
        // (< skip_len) so this is a few hundred word compares at most.
        if (inserted_upto < j) {
            uint32_t zlo = std::max(inserted_upto, lowest);
            // Iteration cap (advisor r4): the zone is normally < skip_len,
            // but repeated small coverage re-extensions over a wide
            // uninserted span would re-sweep ~carry_len positions per end
            // (superlinear pass-1 worst case). The sweep is nearest-first
            // and its value (small-offset near repeats) concentrates close
            // to j, so clamp the scanned span — read32s, not just verified
            // hits, are now bounded per call. The floor is sized by the
            // 2000-seed adversarial sweep: 512 cost L10 up to 89 B / 2.1%
            // on 5 seeds (beyond the documented max(10 B, 1%) bound);
            // 8192 restores the r4 residual profile while still bounding
            // the adversarial re-sweep at ~8 µs/call.
            uint32_t zspan = (uint32_t)std::max(8192, budget * 32);
            if (j - zlo > zspan) zlo = j - zspan;
            uint32_t first4 = read32(jp);
            int zbudget = budget;
            for (uint32_t q = j; q-- > zlo && zbudget > 0;) {
                if (read32(wbase + q) != first4 ||
                    std::memcmp(wbase + q + 4, jp + 4,
                                (size_t)(gram - 4)) != 0)
                    continue;
                --zbudget;
                PLZ4_STAT(++g_cfstats.steps);
                int f = count_match(jp + gram, wbase + q + gram,
                                    matchlimit);
                int bcap = (int)std::min(q - lowest, j - floor_pos);
                int b = 0;
                while (b < bcap && jp[-b - 1] == wbase[q - (uint32_t)b - 1])
                    ++b;
                bool dominated = false;
                for (int k = 0; k < nf; ++k)
                    if (out[k].f >= f && out[k].b >= b) {
                        dominated = true;
                        break;
                    }
                if (!dominated) {
                    int w = 0;
                    for (int k = 0; k < nf; ++k)
                        if (!(out[k].f <= f && out[k].b <= b))
                            out[w++] = out[k];
                    nf = w;
                    int k = 0;
                    while (k < nf && out[k].f > f) ++k;
                    if (nf < EXT_FAMS) {
                        for (int r = nf; r > k; --r) out[r] = out[r - 1];
                        out[k] = ExtFam{q, b, f};
                        ++nf;
                    } else if (k < EXT_FAMS) {
                        for (int r = EXT_FAMS - 1; r > k; --r)
                            out[r] = out[r - 1];
                        out[k] = ExtFam{q, b, f};
                    }
                }
            }
        }
        uint32_t cand = head[hashp(jp)];
        while (cand > lowest && budget-- > 0) {
            uint32_t q = cand - 1;
            if (q < j && j - q <= MAX_DISTANCE &&
                std::memcmp(wbase + q, jp, (size_t)gram) == 0) {
                PLZ4_STAT(++g_cfstats.steps);
                int f = count_match(jp + gram, wbase + q + gram,
                                    matchlimit);
                int bcap = (int)std::min(q - lowest, j - floor_pos);
                int b = 0;
                while (b < bcap && jp[-b - 1] == wbase[q - (uint32_t)b - 1])
                    ++b;
                // Pareto insert, sorted by f descending. Newest-first
                // walk => an equal (b, f) already held has the nearer
                // offset; treat it as dominating.
                bool dominated = false;
                for (int k = 0; k < nf; ++k)
                    if (out[k].f >= f && out[k].b >= b) {
                        dominated = true;
                        break;
                    }
                if (!dominated) {
                    int w = 0;  // drop entries the new family dominates
                    for (int k = 0; k < nf; ++k)
                        if (!(out[k].f <= f && out[k].b <= b))
                            out[w++] = out[k];
                    nf = w;
                    int k = 0;
                    while (k < nf && out[k].f > f) ++k;
                    if (nf < EXT_FAMS) {
                        for (int r = nf; r > k; --r) out[r] = out[r - 1];
                        out[k] = ExtFam{q, b, f};
                        ++nf;
                    } else if (k < EXT_FAMS) {
                        // full: keep the larger-f prefix, drop the tail
                        for (int r = EXT_FAMS - 1; r > k; --r)
                            out[r] = out[r - 1];
                        out[k] = ExtFam{q, b, f};
                    }
                }
            }
            uint16_t d = chain[q & 0xFFFF];
            if (!d) break;
            cand -= d;
        }
        return nf;
    }

    // Exact pattern-fit option at position p (0 = none). Bounds hold by
    // construction: re + tail <= matchlimit was established by the probe
    // that cached it, and the constant offset only moves the source
    // FORWARD relative to the original in-window probe.
    int fit_at(uint32_t p, int* off_out) const {
        if (fit.tail < 0 || p >= fit.re || fit.estar >= fit.re) return 0;
        uint32_t off = fit.re - fit.estar;
        if (off > MAX_DISTANCE) return 0;
        *off_out = (int)off;
        return (int)(fit.re - p) + fit.tail;
    }

    // ------------------------------------------------------------------
    // Per-source-run pattern-analysis summary (EXACT). For a probe whose
    // whole gram is byte-uniform (so every candidate match start lies
    // inside some in-window b-segment [s, e)), the in-segment maximum at
    // remaining source-run length r = src_end - pos is exactly
    //     clamped_len >= r :  r + tail(e)      (fit alignment q = e - r)
    //     clamped_len <  r :  clamped_len      (q = max(s, lowest))
    // with clamped_len = e - max(s, lowest) and
    // tail(e) = count_match(src_run_end, e, matchlimit), which is
    // POSITION-INDEPENDENT across the run (the source side of the tail
    // comparison always starts at the run end). Positions inside the
    // source run itself contribute exactly r (the RLE self-match). So a
    // SINGLE segment walk answers every position of the run: static
    // segments (never clamped while this run is live) go into a
    // len-desc-sorted array with a prefix-max of tails, queried in
    // O(log); the few segments the sliding window can still clamp
    // (s < lowest_at_build + r0) stay on a per-query loop. This replaces
    // the old per-position segment walk — measured 93 segment visits per
    // find (1.16e9 total) on the silesia-like text+zero-run class at L12
    // — with one walk per RUN. Reference analog: upstream's
    // LZ4HC_countPattern/rotatePattern (lz4hc.c:811-859) price periodic
    // candidates in O(1); this is the exact generalization the
    // size-<=-upstream contract needs (no approximation anywhere).
    struct PaSeg {
        uint32_t len;   // static: e - s (never clamped); boundary: unused
        uint32_t s, e;  // run positions [s, e)
        int32_t tail;   // static (post-sort): PREFIX-MAX tail, e = argmax
    };
    struct PaSum {
        bool valid = false;
        uint8_t b = 0;
        uint32_t src_start = 0, src_end = 0;  // absolute source run span
        uint32_t static_floor = 0;  // s >= this => never clamped this run
        std::vector<PaSeg> st;      // sorted len desc; tail/e prefix-maxed
        std::vector<PaSeg> bd;      // s < static_floor: clamp per query
    };
    PaSum pasum;

    // One-shot segment enumeration for the source run [src_start,
    // src_end) of byte pb at probe ip. Walks the gram chain exactly like
    // the per-position walk did (same u16-delta saturation concession),
    // hopping whole segments via the chain entry at each segment start.
    void pa_build(const uint8_t* ip, const uint8_t* matchlimit, uint8_t pb,
                  uint32_t lowest, uint32_t src_start, uint32_t src_end) {
        pasum.valid = true;
        pasum.b = pb;
        pasum.src_start = src_start;
        pasum.src_end = src_end;
        uint32_t pos = (uint32_t)(ip - wbase);
        pasum.static_floor = lowest + (src_end - pos);
        pasum.st.clear();
        pasum.bd.clear();
        PLZ4_STAT(++g_cfstats.pa_builds);
        const uint8_t* const send = wbase + src_end;
        const uint32_t pat = 0x01010101u * pb;
        uint32_t cand = head[hashp(ip)];
        while (cand != 0 && cand - 1 >= lowest) {
            PLZ4_STAT(++g_cfstats.pa_bsteps);
            uint32_t cpos = cand - 1;
            const uint8_t* mp = wbase + cpos;
            if (read32(mp) == pat && (gram < 5 || mp[4] == pb) &&
                (gram < 6 || mp[5] == pb) && (gram < 7 || mp[6] == pb)) {
                // uniform gram: measure its whole segment once
                int fwd0 = count_run_fwd(mp, matchlimit + LASTLITERALS, pb);
                int back0 = count_run_bwd(mp, low_base, pb);
                uint32_t s = cpos - (uint32_t)back0;
                uint32_t e = cpos + (uint32_t)fwd0;
                if (s < src_start) {  // a PREVIOUS run (maximal runs are
                                      // disjoint; the own run is the
                                      // caller's self-match case)
                    PLZ4_STAT(++g_cfstats.pa_segs);
                    int tail = count_match(send, wbase + e, matchlimit);
                    if (s < pasum.static_floor) {
                        pasum.bd.push_back(PaSeg{0, s, e, tail});
                    } else {
                        pasum.st.push_back(PaSeg{e - s, s, e, tail});
                    }
                }
                // hop below the segment: chain entry at its first
                // position (uniform gram since seg >= gram here — shorter
                // segments never enter this bucket and cannot host
                // matches >= gram; the recovery ladder owns those)
                if (s <= lowest) break;
                uint32_t dseg = chain[s & 0xFFFF];
                if (dseg == 0 || s - dseg < floor_pos) break;
                cand = s - dseg + 1;
                continue;
            }
            // hash collision (non-uniform gram — cannot match a uniform
            // probe): step singly
            uint32_t d = chain[cpos & 0xFFFF];
            if (d == 0) break;
            cand -= d;
        }
        std::sort(pasum.st.begin(), pasum.st.end(),
                  [](const PaSeg& a, const PaSeg& b) { return a.len > b.len; });
        int32_t mt = INT32_MIN;
        uint32_t me = 0;
        for (PaSeg& sg : pasum.st) {
            if (sg.tail > mt) {
                mt = sg.tail;
                me = sg.e;
            }
            sg.tail = mt;
            sg.e = me;
        }
    }

    // Exact best run-match option at `pos` inside the summarized run.
    // Returns length (0 = none) and the match position via *q_out; also
    // refreshes the mid-run fit cache for the RLE carry-skip path.
    int pa_query(uint32_t pos, uint32_t lowest, const uint8_t** q_out) {
        const uint32_t r = pasum.src_end - pos;
        int best = 0;
        uint32_t bq = 0;
        std::vector<PaSeg>& st = pasum.st;
        size_t cnt = std::partition_point(
                         st.begin(), st.end(),
                         [r](const PaSeg& sg) { return sg.len >= r; }) -
                     st.begin();
        if (cnt > 0) {
            // fit: q1 = e - r >= s >= static_floor >= lowest by selection
            best = (int)r + st[cnt - 1].tail;
            bq = st[cnt - 1].e - r;
            if (fit.b != pasum.b || fit.re != pasum.src_end ||
                st[cnt - 1].tail > fit.tail)
                fit = Fit{pasum.src_end, st[cnt - 1].e, st[cnt - 1].tail,
                          pasum.b};
        }
        if (cnt < st.size() && (int)st[cnt].len > best) {
            // longest too-short segment: contributes its own length
            best = (int)st[cnt].len;
            bq = st[cnt].s;
        }
        if (pos > pasum.src_start && (int)r >= best) {
            // self-match: exactly r at any in-run q; prefer it on ties —
            // offset 1 keeps the RLE carry-skip armed downstream
            best = (int)r;
            bq = pos - 1;
        }
        for (const PaSeg& sg : pasum.bd) {
            uint32_t cs = sg.s < lowest ? lowest : sg.s;
            if (cs >= sg.e) continue;  // slid fully out of the window
            uint32_t cl = sg.e - cs;
            if (cl >= r) {
                if ((int)r + sg.tail > best) {
                    best = (int)r + sg.tail;
                    bq = sg.e - r;
                }
                if (fit.b != pasum.b || fit.re != pasum.src_end ||
                    sg.tail > fit.tail)
                    fit = Fit{pasum.src_end, sg.e, sg.tail, pasum.b};
            } else if ((int)cl > best) {
                best = (int)cl;
                bq = cs;
            }
        }
        *q_out = wbase + bq;
        return best;
    }

    // Rebase this (prebuilt, fully-inserted) finder's state onto `work`
    // for an independent record appended after the window at `new_wbase`
    // — the dict-record path's per-record cost becomes a handful of
    // memcpy-fast vector copies instead of a full window re-insert.
    void copy_into(ChainFinder& work, const uint8_t* new_wbase) const {
        work.set_gram(gram);
        work.hashlog = hashlog;
        work.head = head;
        work.chain = chain;
        work.head4 = head4;
        work.chain4 = chain4;
        work.head5 = head5;
        work.chain5 = chain5;
        work.head6 = head6;
        work.chain6 = chain6;
        work.next_insert = next_insert;
        work.floor_pos = 0;
        work.wbase = work.low_base = new_wbase;
        for (Seg& sg : work.segcache) sg = Seg{};
        work.fit = Fit{};
        work.pasum.valid = false;
    }

    ChainFinder()
        : wbase(nullptr),
          low_base(nullptr),
          hashlog(15),
          head((size_t)1 << 15, 0),
          chain(1 << 16, 0),
          next_insert(0),
          floor_pos(0) {}

    ChainFinder(const uint8_t* wb, size_t total, int use_gram = 4)
        : ChainFinder() {
        (void)total;
        wbase = wb;
        low_base = wb;
        set_gram(use_gram);
    }

    void set_gram(int g) {
        gram = g;
        if (gram >= 5 && head4.empty()) {
            head4.assign((size_t)1 << 15, 0);
            chain4.assign(1 << 16, 0);
        }
        if (gram >= 6 && head5.empty()) {
            head5.assign((size_t)1 << 15, 0);
            chain5.assign(1 << 16, 0);
        }
        if (gram >= 7 && head6.empty()) {
            head6.assign((size_t)1 << 15, 0);
            chain6.assign(1 << 16, 0);
        }
    }

    // gram hash at position p. gram >= 5 reads 8 bytes: callers guarantee
    // 8 bytes of tail slack past every inserted/probed position (inserts
    // stop at mflimit-class bounds, blocks below MFLIMIT+1 never build a
    // finder).
    uint32_t hashp(const uint8_t* p) const {
        if (gram == 7) return hash7(p, hashlog);
        if (gram == 6) return hash6(p, hashlog);
        if (gram == 5) return hash5(p, hashlog);
        return hash4(read32(p), hashlog);
    }

    void reset() {
        std::fill(head.begin(), head.end(), 0);
        std::fill(chain.begin(), chain.end(), 0);
        std::fill(head4.begin(), head4.end(), 0);
        std::fill(chain4.begin(), chain4.end(), 0);
        std::fill(head5.begin(), head5.end(), 0);
        std::fill(chain5.begin(), chain5.end(), 0);
        std::fill(head6.begin(), head6.end(), 0);
        std::fill(chain6.begin(), chain6.end(), 0);
        next_insert = 0;
        floor_pos = 0;
        wbase = low_base = nullptr;
        for (Seg& sg : segcache) sg = Seg{};
        fit = Fit{};
        pasum.valid = false;
    }

    // Begin a fresh buffer: prior positions become unreachable without any
    // table clearing (they fall below floor_pos). Resets on the rare u32
    // position-space exhaustion.
    void attach(const uint8_t* buf_start) {
        if (next_insert > 0xF0000000u) reset();
        floor_pos = next_insert;
        low_base = buf_start;
        wbase = buf_start - next_insert;
        for (Seg& sg : segcache) sg = Seg{};  // positions re-alias content
        fit = Fit{};
        pasum.valid = false;
    }

    void insert_upto(const uint8_t* p) {
        uint32_t target = (uint32_t)(p - wbase);
        if (target <= next_insert) return;
        uint32_t i = next_insert;
        // prefetch the head bucket a few positions ahead: the random head
        // access is the insert loop's only cache-unfriendly touch
        for (; i + 8 < target; ++i) {
            __builtin_prefetch(&head[hashp(wbase + i + 8)], 1);
            uint32_t h = hashp(wbase + i);
            uint32_t d = head[h] ? i + 1 - head[h] : 0;
            chain[i & 0xFFFF] = d > 65535 ? 0 : (uint16_t)d;
            head[h] = i + 1;
            if (gram >= 5) {
                uint32_t h4 = hash4(read32(wbase + i), hashlog);
                uint32_t d4 = head4[h4] ? i + 1 - head4[h4] : 0;
                chain4[i & 0xFFFF] = d4 > 65535 ? 0 : (uint16_t)d4;
                head4[h4] = i + 1;
                if (gram >= 6) {
                    uint32_t h5 = hash5(wbase + i, hashlog);
                    uint32_t d5 = head5[h5] ? i + 1 - head5[h5] : 0;
                    chain5[i & 0xFFFF] = d5 > 65535 ? 0 : (uint16_t)d5;
                    head5[h5] = i + 1;
                    if (gram >= 7) {
                        uint32_t h6 = hash6(wbase + i, hashlog);
                        uint32_t d6 = head6[h6] ? i + 1 - head6[h6] : 0;
                        chain6[i & 0xFFFF] = d6 > 65535 ? 0 : (uint16_t)d6;
                        head6[h6] = i + 1;
                    }
                }
            }
        }
        for (; i < target; ++i) {
            uint32_t h = hashp(wbase + i);
            uint32_t d = head[h] ? i + 1 - head[h] : 0;
            chain[i & 0xFFFF] = d > 65535 ? 0 : (uint16_t)d;
            head[h] = i + 1;
            if (gram >= 5) {
                uint32_t h4 = hash4(read32(wbase + i), hashlog);
                uint32_t d4 = head4[h4] ? i + 1 - head4[h4] : 0;
                chain4[i & 0xFFFF] = d4 > 65535 ? 0 : (uint16_t)d4;
                head4[h4] = i + 1;
                if (gram >= 6) {
                    uint32_t h5 = hash5(wbase + i, hashlog);
                    uint32_t d5 = head5[h5] ? i + 1 - head5[h5] : 0;
                    chain5[i & 0xFFFF] = d5 > 65535 ? 0 : (uint16_t)d5;
                    head5[h5] = i + 1;
                    if (gram >= 7) {
                        uint32_t h6 = hash6(wbase + i, hashlog);
                        uint32_t d6 = head6[h6] ? i + 1 - head6[h6] : 0;
                        chain6[i & 0xFFFF] = d6 > 65535 ? 0 : (uint16_t)d6;
                        head6[h6] = i + 1;
                    }
                }
            }
        }
        next_insert = target;
    }

    // "good enough" match length: stop the chain walk once reached
    // (reference analog: lz4hc sufficient_len) — large speed win on
    // repetitive data for a negligible ratio cost.
    static constexpr int SUFFICIENT_LEN = 192;

    // Longest match for position ip; returns length (0 if < MINMATCH) and
    // sets *mpos. Prefers longer; on ties the later candidate in chain order
    // (nearer offset) is kept only if strictly longer.
    // seed_len/seed_off preload a known match (the carried tail of a match
    // found at an earlier position): the boundary filter then rejects all
    // non-improving candidates in ~2 loads, making a full re-search at
    // carried positions cheap while still discovering longer fresh matches.
    //
    // Two chain-acceleration devices (reference analogs in
    // LZ4HC_InsertAndGetWiderMatch, lz4hc.c:885):
    //
    // * CHAIN SWAP (lz4hc.c:964 "select a better chain"): any candidate c
    //   that can beat the current best of length L must reproduce ip's
    //   content over [0, L), so c+k lies in the hash bucket of the 4-gram
    //   at ip+k for every k <= L-4. After a new best, scan the best match's
    //   span for the gram whose chain has the LARGEST back-step and follow
    //   that chain instead — candidates that cannot beat L are skipped
    //   geometrically, and a gram with no earlier occurrence proves no
    //   beater exists at all. Stepping from a bucket member keeps bucket
    //   membership inductively, so no potential beater (with offset >
    //   chosen k; shorter-offset periodic beaters are the same concession
    //   upstream makes) is ever skipped.
    //
    // * PATTERN ANALYSIS (lz4hc.c:987-1059): inside single-byte runs every
    //   position hashes to one bucket, so chains are dense (delta == 1)
    //   and a plain walk is O(run) per candidate. When the probe gram is
    //   byte-uniform and the chain is dense, measure the candidate's run
    //   segment once; the in-segment maximum is attained either at the
    //   pattern-fit position (source run aligned to the segment's run end,
    //   which may extend past the run) or at the segment start — evaluate
    //   both exactly and jump the walk to before the whole segment.
    int find(const uint8_t* ip, const uint8_t* matchlimit, int nb_attempts,
             const uint8_t** mpos, int sufficient = SUFFICIENT_LEN,
             int seed_len = 0, int seed_off = 0, int pa_cap = 1 << 30) {
        insert_upto(ip);
        PLZ4_STAT(++g_cfstats.finds);
        uint32_t pos = (uint32_t)(ip - wbase);
        uint32_t cand = head[hashp(ip)];
        int best = 0;
        if (seed_len >= MINMATCH) {
            PLZ4_STAT(++g_cfstats.seeded);
            best = seed_len;
            *mpos = ip - seed_off;
            // the carried match already satisfies the good-enough policy:
            // searching further could only trade it for another >=
            // sufficient match, which the policy treats as equivalent
            if (best >= sufficient) return best;
        }
        uint32_t lowest = pos > MAX_DISTANCE ? pos - MAX_DISTANCE : 0;
        if (lowest < floor_pos) lowest = floor_pos;
        // a seed whose end touches matchlimit cannot be beaten (ties are
        // not taken) — skip the walk entirely
        if (best >= MINMATCH && ip + best >= matchlimit) return best;
        uint32_t first4 = read32(ip);
        const bool pa_ok = first4 == 0x01010101u * (uint8_t)first4;
        const uint8_t pb = (uint8_t)first4;
        // Run-summary fast path (see PaSum): when the probe's whole gram
        // is byte-uniform, ONE segment walk per source run answers every
        // in-run position exactly — the chain walk below is skipped.
        bool walk = true;
        if (pa_ok) {
            const uint32_t mlpos = (uint32_t)(matchlimit - wbase);
            if (!(pasum.valid && pasum.b == pb && pasum.src_start <= pos &&
                  pos < pasum.src_end) &&
                (gram < 5 || ip[4] == pb) && (gram < 6 || ip[5] == pb) &&
                (gram < 7 || ip[6] == pb)) {
                int fwd0 = MINMATCH + count_run_fwd(ip + MINMATCH,
                                                    matchlimit + LASTLITERALS,
                                                    pb);
                int back0 = count_run_bwd(ip, low_base, pb);
                uint32_t s_end = pos + (uint32_t)fwd0;
                // runs crossing matchlimit (block-tail region) keep the
                // old per-position path: the fit alignment there is
                // against the CAPPED source end, which the summary's
                // position-independent tails cannot express
                if (s_end <= mlpos)
                    pa_build(ip, matchlimit, pb, lowest,
                             pos - (uint32_t)back0, s_end);
            }
            if (pasum.valid && pasum.b == pb && pasum.src_start <= pos &&
                pos < pasum.src_end &&
                pasum.src_end - pos >= (uint32_t)gram) {
                const uint8_t* q;
                int l = pa_query(pos, lowest, &q);
                if (l > best) {
                    best = l;
                    *mpos = q;
                }
                walk = false;  // exact: nothing the chain walk could add
            }
        }
        if (walk) {
        uint32_t mcp = 0;                       // chain-swap gram offset
        bool need_swap = best >= MINMATCH;      // seed arms a swap
        int src_run = -1;                       // lazily measured
        // Per-find cap on pattern-analysis segment visits (see OptParams
        // .pa_budget; part of the KNOWN APPROXIMATION budget, validated
        // by the conformance corpora + 500-seed adversarial sweep)
        int pa_budget = pa_cap;
        if (gram >= 5 && best < MINMATCH) {
            // length-4 entry probe: the NEAREST 4-gram occurrence is as
            // good as any (offsets cost 2 bytes at any distance), and
            // longer matches are the primary walk's / ladder's job
            uint32_t c4 = head4[hash4(first4, hashlog)];
            if (c4 != 0 && c4 - 1 >= lowest) {
                const uint8_t* mp4 = wbase + (c4 - 1);
                if (read32(mp4) == first4) {
                    int len = count_match(ip, mp4, matchlimit);
                    if (len >= MINMATCH) {
                        best = len;
                        *mpos = mp4;
                        if (ip + best >= matchlimit) return best;
                        if (best >= sufficient) return best;
                        need_swap = true;
                    }
                }
            }
        }
        // hoisted boundary probe (src side): refreshed on improvement.
        // Inside the loop ip + best < matchlimit is invariant (guarded at
        // entry and re-checked on every improvement), so pip + 4 is in
        // bounds whenever best >= MINMATCH.
        const uint8_t* pip = ip + best - 3;
        uint32_t pat4 = best >= MINMATCH ? read32(pip) : 0;
        while (cand != 0 && cand - 1 >= lowest && nb_attempts--) {
            PLZ4_STAT(++g_cfstats.steps);
            uint32_t cpos = cand - 1;
            const uint8_t* mp = wbase + cpos;
            // software pipelining: the successor comes from a dependent
            // chain load — issue it before evaluating the current
            // candidate, and prefetch the successor's boundary probe line
            // so its evaluation doesn't stall either. mcp only changes on
            // paths that continue/break, so d_pre stays valid wherever it
            // is consumed (step + pattern-density check).
            uint32_t d_pre = chain[(cpos + mcp) & 0xFFFF];
            if (d_pre)
                __builtin_prefetch(wbase + (cpos - d_pre) + (best - 3),
                                   0, 0);
            if (best >= MINMATCH) {
                // extension-first evaluation: count from the best-so-far
                // boundary — candidates that merely TIE stop in O(1), and
                // the O(best) head verification runs only on candidates
                // that actually extend past the boundary
                if (read32(mp + best - 3) == pat4) {
                    int c1 = count_match(pip, mp + best - 3, matchlimit);
                    if (c1 >= 4) {
                        int head = count_match(ip, mp, pip);
                        if (head == best - 3) {
                            best = best - 3 + c1;
                            *mpos = mp;
                            if (ip + best >= matchlimit) break;
                            if (best >= sufficient) break;
                            need_swap = true;
                            pip = ip + best - 3;
                            pat4 = read32(pip);
                        }
                    }
                }
            } else if (mp[0] == ip[0] && read32(mp) == first4) {
                int len = count_match(ip, mp, matchlimit);
                if (len > best) {
                    best = len;
                    *mpos = mp;
                    if (ip + best >= matchlimit) break;  // cannot improve
                    if (best >= sufficient) break;       // good enough
                    need_swap = true;
                    pip = ip + best - 3;
                    pat4 = read32(pip);
                }
            }
            // --- pattern analysis: dense chain inside a single-byte run ---
            if (pa_ok && mcp == 0 && d_pre == 1 &&
                read32(mp) == first4) {
                // The run segment [rs, re) containing the candidate is
                // content-static: serve it from the cache (consecutive
                // finds walk the same segments; re-measuring multi-KB runs
                // per position made repeat-heavy blocks O(n * runlen)).
                // Candidate runs may legitimately extend past matchlimit
                // (the last 5 bytes exist; they just can't host a match
                // START) — segments span to the true buffer end.
                uint32_t rs = 0, re = 0;
                bool seg_hit = false;
                for (const Seg& sg : segcache)
                    if (sg.b == pb && sg.s <= cpos && cpos < sg.e) {
                        rs = sg.s;
                        re = sg.e;
                        seg_hit = true;
                        break;
                    }
                if (!seg_hit) {
                    int fwd0 = MINMATCH +
                               count_run_fwd(mp + MINMATCH,
                                             matchlimit + LASTLITERALS, pb);
                    int back0 = count_run_bwd(mp, low_base, pb);
                    rs = cpos - (uint32_t)back0;
                    re = cpos + (uint32_t)fwd0;
                    segcache[seg_rr] = Seg{rs, re, pb};
                    seg_rr = (seg_rr + 1) & 3;
                }
                if (src_run < 0) {
                    // ip sits in a pb-run too (pa_ok): src side caps at
                    // matchlimit, matching count_run_fwd(ip+4, matchlimit)
                    uint32_t mlpos = (uint32_t)(matchlimit - wbase);
                    uint32_t se = pos, cap = 0;
                    for (const Seg& sg : segcache)
                        if (sg.b == pb && sg.s <= pos && pos < sg.e) {
                            se = sg.e;
                            cap = 1;
                            break;
                        }
                    if (!cap)
                        se = pos + MINMATCH +
                             (uint32_t)count_run_fwd(
                                 ip + MINMATCH, matchlimit + LASTLITERALS,
                                 pb);
                    src_run = (int)((se < mlpos ? se : mlpos) - pos);
                }
                int fwd = (int)(re - cpos);
                uint32_t s = rs;
                if (s < lowest) s = lowest;
                int seg = (int)(re - s);
                const bool fit_case = seg >= src_run && fwd <= src_run;
                uint32_t q1 = fit_case ? s + (uint32_t)(seg - src_run) : s;
                const uint32_t probes[2] = {q1, s};
                for (uint32_t qp : probes) {
                    if (qp >= pos) continue;
                    const uint8_t* qptr = wbase + qp;
                    int len;
                    if (best >= MINMATCH) {
                        // extension-first (exact): candidates that cannot
                        // reproduce the boundary exit in 1 load; ties in
                        // O(1); only true extenders pay the head check —
                        // self-similar run boundaries made full
                        // count_match probes O(best) each
                        if (read32(qptr + best - 3) != pat4)
                            continue;
                        int c1 = count_match(pip, qptr + best - 3,
                                             matchlimit);
                        if (c1 < 4)
                            continue;
                        if (count_match(ip, qptr, pip) != best - 3)
                            continue;
                        len = best - 3 + c1;
                    } else {
                        len = count_match(ip, qptr, matchlimit);
                    }
                    if (qp == q1 && fit_case && len >= src_run) {
                        // cache the fit for mid-run reuse (see Fit): the
                        // tail comparison is position-independent, so
                        // every later position inside the source run
                        // gets an exact (re_src - p) + tail option
                        uint32_t re_src = pos + (uint32_t)src_run;
                        int tl = len - src_run;
                        if (fit.b != pb || fit.re != re_src
                            || tl > fit.tail)
                            fit = Fit{re_src, re, tl, pb};
                    }
                    if (len > best) {
                        best = len;
                        *mpos = qptr;
                        need_swap = true;
                        if (ip + best >= matchlimit)
                            break;  // unbeatable; the walk break follows
                        // refresh before the next probe uses them
                        pip = ip + best - 3;
                        pat4 = read32(pip);
                    }
                }
                if (best >= MINMATCH &&
                    (ip + best >= matchlimit || best >= sufficient))
                    break;
                // skip the whole dense segment (beaters below s only);
                // a swap inside the span would just re-walk the run.
                // (A swap handoff once best extends past the source run
                // was tried and measured WORSE on text+zero-run data:
                // run/text boundary grams repeat across runs there, so
                // the swapped bucket is dense too and the span scans
                // cost more than the segment jumps they replaced.)
                PLZ4_STAT(++g_cfstats.pa_segs);
                if (--pa_budget < 0) break;
                need_swap = false;
                uint32_t dseg = chain[s & 0xFFFF];
                if (dseg == 0 || s - dseg < floor_pos) break;
                cand = s - dseg + 1;
                continue;
            }
            // --- chain swap: re-pick the sparsest gram chain in the span ---
            if (need_swap) {
                uint32_t bpos = (uint32_t)(*mpos - wbase);
                need_swap = false;
                if (best > MINMATCH && bpos + (uint32_t)best <= pos) {
                    // span gram offsets [0, end]: a gram at offset k lies
                    // inside the match span iff k + gramlen <= best
                    int end = best - (gram > MINMATCH ? gram : MINMATCH);
                    uint32_t bestd = 0, bmcp = 0;
                    bool dead = false;
                    int accel = 1 << 4;  // accelerating scan on long spans
                    for (int p2 = 0; p2 <= end;) {
                        PLZ4_STAT(++g_cfstats.span_reads);
                        uint32_t q = bpos + (uint32_t)p2;
                        uint32_t d = chain[q & 0xFFFF];
                        if (d == 0 || q - d < floor_pos) {
                            // a span gram with NO occurrence below bpos:
                            // no beater exists below bpos at all, and the
                            // only possible beaters — candidates in
                            // (bpos, cpos) containing this gram — are
                            // enumerated by jumping to this gram's bucket
                            // (its chain ends at bpos+p2, bounding the
                            // walk). For an improvement swap bpos == cpos
                            // and the jump terminates immediately.
                            dead = true;
                            bmcp = (uint32_t)p2;
                            break;
                        }
                        if (d > bestd) {
                            bestd = d;
                            bmcp = (uint32_t)p2;
                            accel = 1 << 4;
                        }
                        p2 += (accel++ >> 4);
                    }
                    if ((dead || bestd > 1) && cpos + bmcp >= pos) {
                        // Overlap zone of the chosen gram: a beater q with
                        // q + bmcp >= pos has its bmcp-gram not yet in the
                        // table, so the bucket walk below would miss it —
                        // but every beater is a member of the MAIN bucket,
                        // which the singles walk is already enumerating.
                        // Keep walking singles and retry the swap once the
                        // walk leaves the zone (at most bmcp more steps).
                        need_swap = true;
                    } else if (dead || bestd > 1) {
                        PLZ4_STAT(++g_cfstats.swaps);
                        mcp = bmcp;
                        // Enter the sparse gram's bucket FROM ITS HEAD and
                        // catch up to the walk point: members above
                        // cpos+mcp map to candidates >= cpos (already
                        // enumerated or overlapping-periodic — the same
                        // concession as above) and are skipped without
                        // evaluation; every candidate BELOW cpos stays
                        // reachable because a beater must be a bucket
                        // member. This lets a far-offset carried seed swap
                        // immediately instead of walking the dense head
                        // bucket singly down to the seed position.
                        uint32_t m2 = head[hashp(ip + (int)mcp)];
                        for (;;) {
                            if (m2 == 0) break;
                            uint32_t mem = m2 - 1;
                            if (mem < floor_pos || mem < mcp) {
                                m2 = 0;
                                break;
                            }
                            if (mem - mcp < cpos) break;  // fresh candidate
                            PLZ4_STAT(++g_cfstats.steps);
                            if (--nb_attempts < 0) {
                                m2 = 0;
                                break;
                            }
                            uint32_t dd = chain[mem & 0xFFFF];
                            if (dd == 0) {
                                m2 = 0;
                                break;
                            }
                            m2 = mem - dd + 1;
                        }
                        // bucket exhausted above the walk point: no member
                        // below cpos exists, so no beater exists either
                        if (m2 == 0) break;
                        cand = (m2 - 1) - mcp + 1;
                        continue;
                    }
                }
            }
            // --- step within the current gram bucket ---
            {
                if (d_pre == 0) break;
                uint32_t member = cpos + mcp - d_pre;
                if (member < floor_pos || member < mcp) break;
                cand = member - mcp + 1;
            }
        }
        }  // if (walk)
        // Recovery ladder: for each length below the primary gram, walk
        // that length's ring to the first VERIFIED occurrence (nearest is
        // as good as any at equal length; anything longer would have been
        // found by the primary walk). Runs only when the walk came up
        // short, bounded by the remaining budget (floor 16).
        if (gram >= 7 && best < 6) {
            uint32_t c6 = head6[hash6(ip, hashlog)];
            int rb = nb_attempts > 16 ? nb_attempts : 16;
            while (c6 != 0 && c6 - 1 >= lowest && rb-- > 0) {
                PLZ4_STAT(++g_cfstats.ladder);
                const uint8_t* mp6 = wbase + (c6 - 1);
                if (read32(mp6) == first4 && mp6[4] == ip[4] &&
                    mp6[5] == ip[5]) {
                    int len = count_match(ip, mp6, matchlimit);
                    if (len > best) {
                        best = len;
                        *mpos = mp6;
                    }
                    break;
                }
                uint32_t d6 = chain6[(c6 - 1) & 0xFFFF];
                if (d6 == 0) break;
                c6 -= d6;
            }
        }
        if (gram >= 6 && best < 5) {
            uint32_t c5 = head5[hash5(ip, hashlog)];
            int rb = nb_attempts > 16 ? nb_attempts : 16;
            while (c5 != 0 && c5 - 1 >= lowest && rb-- > 0) {
                PLZ4_STAT(++g_cfstats.ladder);
                const uint8_t* mp5 = wbase + (c5 - 1);
                if (read32(mp5) == first4 && mp5[4] == ip[4]) {
                    int len = count_match(ip, mp5, matchlimit);
                    if (len > best) {
                        best = len;
                        *mpos = mp5;
                    }
                    break;
                }
                uint32_t d5 = chain5[(c5 - 1) & 0xFFFF];
                if (d5 == 0) break;
                c5 -= d5;
            }
        }
        if (gram >= 5 && best < MINMATCH) {
            uint32_t c4 = head4[hash4(first4, hashlog)];
            int rb = nb_attempts > 16 ? nb_attempts : 16;
            while (c4 != 0 && c4 - 1 >= lowest && rb-- > 0) {
                PLZ4_STAT(++g_cfstats.ladder);
                const uint8_t* mp4 = wbase + (c4 - 1);
                if (read32(mp4) == first4) {
                    best = count_match(ip, mp4, matchlimit);
                    *mpos = mp4;
                    break;
                }
                uint32_t d4 = chain4[(c4 - 1) & 0xFFFF];
                if (d4 == 0) break;
                c4 -= d4;
            }
        }
        return best >= MINMATCH ? best : 0;
    }

    struct Match {
        int len;   // total length including back extension
        int off;   // distance (0 = no match found above min_len)
        int back;  // bytes the match start lies BEFORE the probe position
    };

    // Widest match covering probe position ip: candidates are chained on
    // hash(ip) but a match may extend BACKWARD over pending bytes down to
    // `low`, and only candidates whose total (back+forward) length beats
    // `min_len` are accepted — scoring back+forward together is the
    // per-attempt quality edge of the upstream HC match finder (reference
    // analog: LZ4HC_InsertAndGetWiderMatch, lz4hc.c:885). Returns
    // {min_len, 0, 0} when nothing better exists.
    Match search(const uint8_t* ip, const uint8_t* low,
                 const uint8_t* matchlimit, int nb_attempts, int min_len,
                 int sufficient = SUFFICIENT_LEN) {
        insert_upto(ip);
        PLZ4_STAT(++g_cfstats.hc_finds);
        uint32_t pos = (uint32_t)(ip - wbase);
        uint32_t h = hash4(read32(ip), hashlog);
        uint32_t cand = head[h];
        Match best{min_len, 0, 0};
        uint32_t lowest = pos > MAX_DISTANCE ? pos - MAX_DISTANCE : 0;
        if (lowest < floor_pos) lowest = floor_pos;
        uint32_t first4 = read32(ip);
        int lookback = (int)(ip - low);
        // Run-summary fast path (find()'s PaSum device; reference analog:
        // LZ4HC_countPattern/rotatePattern, lz4hc.c:811-859): for pure-
        // forward probes (lookback == 0 — the parse's m1 calls) inside
        // byte-uniform runs, ONE summary walk per source run answers
        // every in-run position exactly; the chain walk is skipped.
        // Back-widened probes (m2/m3) keep the walk: the summary's
        // forward-only answer cannot price their back extension.
        if (lookback == 0 && first4 == 0x01010101u * (uint8_t)first4) {
            const uint8_t pb = (uint8_t)first4;
            const uint32_t mlpos = (uint32_t)(matchlimit - wbase);
            if (!(pasum.valid && pasum.b == pb && pasum.src_start <= pos &&
                  pos < pasum.src_end) &&
                read32(ip + 4) == first4) {
                // the build is gated on an 8-byte uniform prefix: short
                // digit runs ("000123" ids in templated rows) fire the
                // 4-byte test constantly and their builds cost more than
                // the 1-3-step walks they replace (measured: boiler
                // 30-35 -> 27 MB/s ungated); real runs pass trivially
                int fwd0 = MINMATCH + count_run_fwd(ip + MINMATCH,
                                                    matchlimit + LASTLITERALS,
                                                    pb);
                int back0 = count_run_bwd(ip, low_base, pb);
                uint32_t s_end = pos + (uint32_t)fwd0;
                // runs crossing matchlimit keep the walk (see find())
                if (s_end <= mlpos)
                    pa_build(ip, matchlimit, pb, lowest,
                             pos - (uint32_t)back0, s_end);
            }
            if (pasum.valid && pasum.b == pb && pasum.src_start <= pos &&
                pos < pasum.src_end &&
                pasum.src_end - pos >= (uint32_t)gram) {
                const uint8_t* q;
                int l = pa_query(pos, lowest, &q);
                if (l > best.len) {
                    best.len = l;
                    best.off = (int)(ip - q);
                    best.back = 0;
                }
                return best;  // exact: nothing the chain walk could add
            }
        }
        // chain-swap state (the find() device, adapted to back-widened
        // scoring): after an improvement, re-pick the sparsest gram chain
        // inside the best match's GUARANTEED-COVERED span. A beater's
        // forward reach is >= best.len + 1 - lookback (its back part is
        // capped by the pending bytes), so gram offsets
        // j <= best.len - lookback - 4 lie inside every beater — for the
        // dominant lookback == 0 probes this is exactly find()'s bound.
        // DEFAULT OFF — measured net-negative on the real corpora
        // (boiler +360..+616 B, runs 364 -> 187-278 MB/s) despite
        // enwik/silesia -200 B; the span scans cost more than the skipped
        // steps save at chain levels, unlike find() where PaSum absorbs
        // the dense cases first (docs/perf_notes.md round-4 HC session)
        static const bool s_do_swap = [] {
            const char* s = getenv("PLZ4_HC_SWAP");
            return s && atoi(s);
        }();
        uint32_t mcp = 0;
        bool need_swap = false;
        int wasted = 0;  // steps since the last improvement: the swap only
                         // pays on walks that are provably deep (shallow
                         // walks — run boundaries, sparse buckets — end
                         // before the span scan could amortize)
        // hoisted src-side boundary probe (find()'s pat4 device):
        // refreshed only on improvement
        uint16_t pat2 = read16(low + best.len - 1);
        while (cand != 0 && cand - 1 >= lowest && nb_attempts--) {
            PLZ4_STAT(++g_cfstats.hc_steps);
            ++wasted;
            uint32_t cpos = cand - 1;
            const uint8_t* mp = wbase + cpos;
            // software pipelining (the find() device): the successor is a
            // dependent chain load — issue it now and prefetch its head
            // and boundary-probe lines so the next step's two scattered
            // reads overlap this step's evaluation
            uint32_t d_pre = chain[(cpos + mcp) & 0xFFFF];
            if (d_pre) {
                const uint8_t* nmp = mp - d_pre;
                __builtin_prefetch(nmp, 0, 0);
                __builtin_prefetch(nmp - lookback + best.len - 1, 0, 0);
            }
            // boundary filter: a match beating best.len (assuming maximal
            // back extension) must agree on the 4 bytes ending one past
            // that boundary (skipped when the hypothetical back-extended
            // source would fall before the window base)
            // NOTE: a 4-byte probe (read32 at best.len - 3) was measured
            // STRICTLY WORSE on size (+4.5 KB enwik, +3.9 KB silesia):
            // the maximal-back hypothesis is wrong often enough that the
            // wider probe rejects real beaters the 2-byte probe admits.
            if ((mp - low_base < lookback ||
                 pat2 == read16(mp - lookback + best.len - 1)) &&
                read32(mp) == first4) {
                PLZ4_STAT(++g_cfstats.hc_exts);
                int fwd = MINMATCH + count_match(ip + MINMATCH, mp + MINMATCH,
                                                matchlimit);
                PLZ4_STAT(g_cfstats.hc_ext_bytes += fwd);
                // back extension can add at most min(lookback, window
                // headroom) — skip the byte loop when even that ceiling
                // cannot beat best (exact; no quality change)
                int back_cap = (int)(mp - low_base) < lookback
                                   ? (int)(mp - low_base) : lookback;
                if (fwd + back_cap > best.len) {
                    int back = 0;
                    while (ip - back > low && mp - back > low_base &&
                           ip[-back - 1] == mp[-back - 1])
                        ++back;
                    int total = fwd + back;
                    if (total > best.len) {
                        best.len = total;
                        best.off = (int)(ip - mp);
                        best.back = back;
                        if (ip + fwd >= matchlimit) break;
                        if (total >= sufficient) break;
                        need_swap = true;
                        wasted = 0;
                        pat2 = read16(low + best.len - 1);
                    }
                }
            }
            // --- chain swap: re-pick the sparsest gram chain in the
            // guaranteed-covered span (see find() for the full argument;
            // identical walk mechanics, span bound shrunk by lookback).
            // Deferred until the walk has wasted >= 16 steps since the
            // last improvement: shallow walks (run boundaries, sparse
            // buckets) end before a span scan could amortize, and the
            // deferral also shrinks the swap's skipped-candidate
            // concession (measured: boiler -360 B, runs 187 -> 345 MB/s
            // vs the immediate swap) ---
            if (need_swap && s_do_swap && wasted >= 16) {
                need_swap = false;
                uint32_t bpos = pos - (uint32_t)best.off;  // fwd-aligned src
                int end = best.len - lookback - MINMATCH;
                if (end >= 0 && bpos + (uint32_t)(best.len - best.back)
                                    <= pos) {
                    uint32_t bestd = 0, bmcp = 0;
                    bool dead = false;
                    int accel = 1 << 4;
                    for (int p2 = 0; p2 <= end;) {
                        PLZ4_STAT(++g_cfstats.span_reads);
                        uint32_t q = bpos + (uint32_t)p2;
                        uint32_t d = chain[q & 0xFFFF];
                        if (d == 0 || q - d < floor_pos) {
                            dead = true;
                            bmcp = (uint32_t)p2;
                            break;
                        }
                        if (d > bestd) {
                            bestd = d;
                            bmcp = (uint32_t)p2;
                            accel = 1 << 4;
                        }
                        p2 += (accel++ >> 4);
                    }
                    if ((dead || bestd > 1) && cpos + bmcp >= pos) {
                        // overlap zone: beaters here are main-bucket
                        // members the singles walk already enumerates —
                        // retry the swap once the walk leaves the zone
                        need_swap = true;
                    } else if (dead || bestd > 1) {
                        PLZ4_STAT(++g_cfstats.swaps);
                        mcp = bmcp;
                        uint32_t m2 = head[hashp(ip + (int)mcp)];
                        for (;;) {
                            if (m2 == 0) break;
                            uint32_t mem = m2 - 1;
                            if (mem < floor_pos || mem < mcp) {
                                m2 = 0;
                                break;
                            }
                            if (mem - mcp < cpos) break;  // fresh candidate
                            PLZ4_STAT(++g_cfstats.hc_steps);
                            if (--nb_attempts < 0) {
                                m2 = 0;
                                break;
                            }
                            uint32_t dd = chain[mem & 0xFFFF];
                            if (dd == 0) {
                                m2 = 0;
                                break;
                            }
                            m2 = mem - dd + 1;
                        }
                        if (m2 == 0) break;  // bucket exhausted: no beater
                        cand = (m2 - 1) - mcp + 1;
                        continue;
                    }
                }
            }
            // --- step within the current gram bucket ---
            if (d_pre == 0) break;
            {
                uint32_t member = cpos + mcp - d_pre;
                if (member < floor_pos || member < mcp) break;
                cand = member - mcp + 1;
            }
        }
        return best;
    }
};

int hc_attempts_for_level(int level) {
    switch (level) {
        case 2: return 4;
        case 3: return 8;
        case 4: return 16;
        case 5: return 32;
        case 6: return 64;
        case 7: return 128;
        case 8: return 256;
        case 9: return 256;
        case 10: return 512;   // opt parser: attempts per position
        case 11: return 65536;
        default: return 65536;  // 12+
    }
}

// ---------------------------------------------------------------------------
// Optimal parse (levels 9-12): backward dynamic program over SEQUENCE
// starts with exact wire pricing — token, literal-length extension bytes,
// offset, match-length extension bytes — so literal-run/extension interplay
// is part of the objective (reference analog: LZ4HC_compress_optimal,
// lz4hc.c:1823, whose price table also models both length fields).
//
// Formulation: g[j] = cheapest match-part cost starting at j
//                   = min over l in [4..mlen[j]] of 2 + mlext(l) + dp[j+l];
//             dp[i] = cost of the suffix given a sequence starts at i
//                   = min( final-literal run, min over run length r of
//                          1 + llext(r) + r + g[i+r] ).
// The llext step function is constant on ranges of r ([0,14]=0, [15,269]=1,
// [270,524]=2, approximated as 3 beyond), so the minimisation over r
// reduces to sliding-window minima of (g[j] + j) per range — O(n) total.
// ---------------------------------------------------------------------------
inline int mlext_price(int l) {  // match-length extension bytes
    int v = l - MINMATCH;
    return v >= 15 ? 1 + (v - 15) / 255 : 0;
}

inline int llext_price(int r) {  // literal-length extension bytes
    return r >= 15 ? 1 + (r - 15) / 255 : 0;
}

// Exact tail pricing for literal runs r >= 525. llext grows by one byte
// every 255 run bytes, so a single suffix-min of (g[j] + j) underprices
// long runs (a 15 KiB run costs 62 extension bytes, not 3) — which made
// the DP prefer one giant literal run over splitting at a profitable
// match (observed: +1..+3 bytes vs upstream on mixed corpora). The floor
// term (r-15)/255 is linear within each residue class j mod 255:
//   cost(i,j) = 2 + C(j) - i - K,  C(j) = g[j] + j + j/255,
//   K = Q + (t < R),  where i+15 = 255Q + R and t = j mod 255.
// A 256-leaf segment tree over the classes gives O(log) point-min inserts
// (as j enters the r >= 525 region) and the two range-min queries per i.
template <typename CostT>
struct ResTree {
    // Flat per-residue-class minima. Keys C(j) = g[j] + j + j/255 are
    // inserted for every matched position, but the range queries run only
    // when the guard in compress_opt passes — measured ZERO times per
    // position on all profiled corpora (text/boiler/runs, tools/prof_opt).
    // A segment tree was tried first: since C(j) falls as j falls, nearly
    // every insert improved its class and paid the full O(log) update path
    // (~40 cycles/position); the flat array inserts in ~4 ops and accepts
    // an O(255) scan on the (rare) queries.
    //
    // NONE must dominate every real key (<= ~2.01n + n/255); int32
    // instantiations are only used for n < 2^28 (see compress_opt).
    static constexpr CostT NONE = sizeof(CostT) == 8
                                      ? (CostT)((int64_t)1 << 50)
                                      : (CostT)((int64_t)1 << 30);
    CostT cls[255];
    int32_t arg[255];
    CostT gmin;  // min over cls (the guard's lower bound)

    void reset() {
        for (int k = 0; k < 255; ++k) {
            cls[k] = NONE;
            arg[k] = -1;
        }
        gmin = NONE;
    }

    void insert(int t, CostT val, int32_t j) {
        if (val < cls[t]) {
            cls[t] = val;
            arg[t] = j;
            if (val < gmin) gmin = val;
        }
    }

    void query(int lo, int hi, CostT& bv, int32_t& bj) const {
        bv = NONE;
        bj = -1;
        for (int t = lo; t <= hi; ++t)
            if (cls[t] < bv) { bv = cls[t]; bj = arg[t]; }
    }
};

// Monotone deque for a backward-sliding window minimum of (g[j] + j).
template <typename CostT>
struct WinMin {
    std::vector<CostT> val;
    std::vector<int32_t> pos;
    int head = 0, tail = 0;  // [head, tail)

    void reset(size_t n) {
        if (val.size() < n) {
            val.resize(n);
            pos.resize(n);
        }
        head = tail = 0;
    }

    void push(int32_t j, CostT v) {  // j strictly decreasing
        while (tail > head && val[tail - 1] >= v) --tail;
        val[tail] = v;
        pos[tail] = j;
        ++tail;
    }

    void drop_above(int32_t jmax) {  // expire entries with j > jmax
        while (tail > head && pos[head] > jmax) ++head;
    }

    bool empty() const { return head == tail; }
    CostT min() const { return val[head]; }
    int32_t argmin() const { return pos[head]; }
};

// Per-level search parameters for the optimal parse (levels 9-12):
// chain-walk attempt budget, good-enough valve (reference analog:
// nbSearches / targetLength columns of k_clTable, lz4hc.c:92-106), and the
// pure-inheritance skip threshold. Runtime-settable via lz4r_set_opt_params
// for the lab budget sweeps (tools/sweep_opt_budget.py); production code
// never calls the setter, so shipped behavior is this table.
struct OptParams {
    int attempts;       // chain-walk budget at fresh positions
    int sufficient;     // good-enough valve
    int skip_len;       // pure-inheritance skip threshold
    int seed_attempts;  // walk budget at carried (seeded) positions — the
                        // seed's boundary filter rejects most candidates in
                        // ~2 loads, but a full-budget walk there still
                        // dominates pass-1 time; a small budget keeps
                        // fresh-match discovery at a fraction of the cost
                        // (analog of upstream's price-plateau search skip,
                        // lz4hc.c:1929-1935, which prunes searches at
                        // positions already covered by a priced match)
    int pa_budget;      // pattern-analysis segment visits per find: text
                        // interleaved with many short same-byte runs
                        // otherwise enumerates every run segment in the
                        // window at every run-adjacent position
    int scan_budget;    // sparse pass-1: extend_scan candidates per
                        // coverage end (L11's thin margins need deeper
                        // walks; L9-10's +3-27 KB margins do not) —
                        // PLZ4_SPARSE_SCANB overrides for lab sweeps
};
// Defaults picked by tools/sweep_opt_budget.py (2026-08-18, post
// head-entry-swap walk): the fastest config per level whose size deltas
// vs upstream stayed non-negative on every conformance corpus — L11's
// budget cut to 2048 and L12's to 16384/skip-1024 measured BYTE-IDENTICAL
// to the exhaustive configs there, L9/L10's trade a slice of their
// +20-27 KB margins for 1.7x speed.
inline OptParams g_opt_params[13] = {
    // levels 0-8 route to greedy/HC, entries unused but keep indexing flat
    {0, 0, 0, 0, 0, 0}, {0, 0, 0, 0, 0, 0}, {0, 0, 0, 0, 0, 0},
    {0, 0, 0, 0, 0, 0}, {0, 0, 0, 0, 0, 0}, {0, 0, 0, 0, 0, 0},
    {0, 0, 0, 0, 0, 0}, {0, 0, 0, 0, 0, 0}, {0, 0, 0, 0, 0, 0},
    // pa_budget: capped at 9-10 (margins absorb the approximation, and
    // run-dense text otherwise enumerates every window segment per
    // find); UNCAPPED at 11-12 where silesia-class margins are 0-629
    // bytes (a 192/1024 cap measured -538/-612 there)
    // 9-10 run the sparse pass-1 probe schedule (run-dense blocks route
    // to the dense scan in the dispatcher); suff 512 keeps more matches
    // below the valve so their full lengths reach the DP
    {96, 512, 256, 96, 32, 48},             // 9
    {96, 512, 256, 96, 192, 64},            // 10
    {2048, 512, 256, 2048, 1 << 30, 256},   // 11
    {16384, 4095, 1024, 16384, 1 << 30, 0},  // 12 (dense everywhere)
};

// test-only introspection sink for the optimal parse (lz4r_opt_debug)
struct OptDbgSink {
    int32_t* mlen = nullptr;
    int32_t* moff = nullptr;
    int64_t* dp = nullptr;
    int n = 0;
};
static thread_local OptDbgSink g_optdbg;

// Shared thread-local finder for the optimal-parse levels (both the
// forward plateau parse and the backward-exact DP). Constructing fresh
// tables per call paid ~640 KiB of zeroing + first-touch faults per
// block; the floor_pos epoch makes stale entries self-rejecting (the
// same scheme compress_hc uses).
inline int opt_gram() {
    static const int g = [] {
        const char* e = std::getenv("PLZ4_OPT_GRAM");
        int v = e ? std::atoi(e) : 6;
        return v < 4 ? 4 : v > 7 ? 7 : v;
    }();
    return g;
}

// Span-keyed gram choice for the SPARSE levels: at engine block spans
// (block + window <= 160 KiB) the 4-gram single-table finder measured
// byte-identical to the 6-gram ladder stack at 1.3x speed — short
// windows keep the denser 4-gram chains walkable, and the ladder
// inserts (3 tables per position, ~2/3 of pass-1 insert cost) vanish.
// Large spans keep the configured gram (denser text buckets need the
// split). PLZ4_OPT_GRAM, when set, overrides BOTH (lab sweeps).
inline int opt_gram_small() {
    static const int g = [] {
        const char* e = std::getenv("PLZ4_OPT_GRAM");
        int v = e ? std::atoi(e) : 4;
        return v < 4 ? 4 : v > 7 ? 7 : v;
    }();
    return g;
}
constexpr size_t OPT_SMALL_SPAN = 160 << 10;

inline ChainFinder& acquire_opt_finder(const uint8_t* wbase,
                                       const uint8_t* src,
                                       const uint8_t* iend,
                                       bool small_span = false) {
    // two finders so alternating small/large calls never thrash a
    // shared table (set_gram forces a full reset)
    static thread_local ChainFinder tl_cf_opt;
    static thread_local ChainFinder tl_cf_opt_small;
    ChainFinder& cf = small_span ? tl_cf_opt_small : tl_cf_opt;
    const int OPT_GRAM = small_span ? opt_gram_small() : opt_gram();
    if (cf.gram != OPT_GRAM) {
        cf.set_gram(OPT_GRAM);
        cf.reset();
    }
    // attach()'s own overflow reset fires at 0xF0000000 with one block of
    // headroom assumed; a giant raw-API input could wrap next_insert
    // MID-CALL — reset eagerly when this call could exhaust the u32
    // position space
    if ((uint64_t)cf.next_insert + (uint64_t)(iend - wbase) + 65536 >
        0xFFFFFF00ull)
        cf.reset();
    cf.attach(wbase);
    if (src > wbase) cf.insert_upto(src);
    return cf;
}

// ---------------------------------------------------------------------------
// Sparse-probe scheduling for the optimal parse's match scan — levels 9-10
// (and large-block 11).
//
// The DP below is exact over whatever candidate set pass 1 hands it, and
// at L9-10 pass 1's one-find-per-position scan IS the cost (measured
// 0.77 s/rep vs pass 2's 0.24 on 4 MiB text; budget knobs don't move it
// because walks end structurally far below every budget). The fix is to
// search at FEWER positions, chosen from this codec's own cost model:
//
//   LZ4 prices every offset at a flat 2 bytes, so a candidate match is
//   characterized for pricing purely by its length — and the DP's g-loop
//   already prices every sub-length of each candidate. A position i
//   covered by a known match M = (start a, len L, off o) therefore
//   inherits the candidate (L - (i-a), o), whose sub-lengths span every
//   match-shaped edge a fresh find could add UNLESS the fresh match ends
//   beyond M's end. Searching at a covered position is useful exactly
//   when it would discover a longer-ending match.
//
// And that event CAN be detected without per-position searching: every
// match that ends past the coverage end E contains the primary gram
// ending at E + 1 (unless it starts within the last gram-1 bytes of
// coverage). So the schedule is event-driven on coverage ends:
//   * uncovered positions (no inherited candidate) — full finds;
//   * per coverage-end value, ONE budgeted walk of the END-GRAM's hash
//     chain (ChainFinder::extend_scan) enumerates every longer-ending
//     candidate family — at any interior start position, any offset —
//     back/forward-extending each byte-verified occurrence;
//   * a TAIL WINDOW of width gram-5 covers the only start positions the
//     end-gram cannot witness.
// Covered positions themselves record the inherited candidate and cost
// one chain insert. Relative to the dense scan this loses only what the
// scan budget or the u16 chain-delta saturation hides — the same
// concessions find() itself makes. Levels 11-12 at engine block sizes
// keep the dense scan: their margins vs upstream are 0-629 bytes and
// exactness wins them.
//
// Reference analog (to match, not mirror): upstream reaches a similar
// find-count reduction from inside its forward price-table search via a
// price-plateau test (LZ4HC_compress_optimal, lz4hc.c:1823). This
// schedule has no price table and no forward table at all: it keys on
// coverage geometry, discovers interior candidates through the end-gram
// index, and leaves all pricing to the backward DP, whose window-minima
// machinery this codec already owns.
// ---------------------------------------------------------------------------
// Schedule parameters (lab-tunable via env for tools/sweep_opt_budget.py
// style A/Bs; production never sets them, so shipped behavior is the
// defaults):
//   SPARSE_TAIL  — tail-window width: full probes while the remaining
//                  carry is below MINMATCH + TAIL. Completeness needs
//                  TAIL >= gram - 5 (a match starting within the last
//                  gram-1 bytes of coverage can end past E without
//                  containing the end-gram); 1 for the default 6-gram.
//   SPARSE_SCANB — extend_scan candidate budget per coverage end.
inline int sparse_env(const char* name, int dflt, int lo, int hi) {
    const char* e = std::getenv(name);
    if (!e) return dflt;
    int v = std::atoi(e);
    return v < lo ? lo : v > hi ? hi : v;
}
inline int sparse_tail() {
    // -1 = auto: the completeness requirement is gram - 5 (see the
    // schedule comment), resolved against the finder actually in use
    static const int v = sparse_env("PLZ4_SPARSE_TAIL", -1, -1, 64);
    return v;
}
inline int sparse_scanb() {
    // -1 = use the per-level OptParams::scan_budget default
    static const int v = sparse_env("PLZ4_SPARSE_SCANB", -1, -1, 1 << 20);
    return v;
}

// CostT: int32 for blocks under 2^28 (the engine's blocks are <= 4 MiB) —
// halves the DP arrays' memory traffic; int64 keeps arbitrary raw-API
// sizes exact. Costs are bounded by n + n/255 + O(1), and every derived
// key (g+j, g+j+j/255) by ~2.01n + n/255, so int32 holds them for
// n < 2^28 with INF = 2^30 headroom.
template <typename CostT, bool SPARSE = false>
int compress_opt_t(const uint8_t* wbase, const uint8_t* src, int src_size,
                   uint8_t* dst, int dst_cap, int level,
                   ChainFinder* ext = nullptr) {
    if (src_size < 0 || dst_cap <= 0) return -1;
    uint8_t* op = dst;
    uint8_t* const oend = dst + dst_cap;
    if (src_size == 0) {
        // before deriving iend-offset pointers: src may be null here
        if (dst_cap < 1) return 0;
        *op++ = 0;
        return (int)(op - dst);
    }
    const uint8_t* const iend = src + src_size;
    const uint8_t* const matchlimit = iend - LASTLITERALS;
    const int attempts = g_opt_params[level > 12 ? 12 : level].attempts;
    const int seed_att = g_opt_params[level > 12 ? 12 : level].seed_attempts;
    // Good-enough valve per level, mirroring upstream's targetLength
    // ladder (lz4hc.c:103-105). KNOWN APPROXIMATION: the valve, the
    // carried-seed shortcut, the carry-skip inheritance below, and the
    // pa segment budget can each leave mlen[] below the true longest
    // match at a position. Measured effect: (a) ~1% of ADVERSARIAL
    // randomized mixed payloads lose 1-10 bytes to upstream at SOME
    // level; (b) the worst CONSTRUCTED class found — word-soup text
    // interleaved with many short zero runs — loses up to ~0.8% at
    // L10-11 (the RLE carry-skip inherits only the in-run self-match,
    // missing pattern-fit matches that cross the run/text boundary from
    // mid-run positions; knob sweeps on attempts/sufficient/skip/pa
    // recover <135 bytes of it). Every realistic conformance corpus
    // holds at <= upstream, usually with margins of hundreds to
    // thousands of bytes; both residuals are pinned by the
    // PLZ4_FUZZ_FULL sweep. Remedies prototyped and rejected: an exact
    // two-phase scan (first nbSearches candidates unconditional) still
    // loses through the seed shortcut and costs 2-10x on repeat-heavy
    // data; a 16-candidate linger after the valve changes nothing;
    // denser carry re-search costs 11% ratio elsewhere; mid-run
    // pattern-fit re-probes belong to round 4 if the class matters.
    const OptParams& prm = g_opt_params[level > 12 ? 12 : level];
    const int sufficient = prm.sufficient;
    // pure-inheritance skip threshold for pass 1 (see below): inside a
    // carried match this long, skip the re-search entirely
    const int skip_len = prm.skip_len;

    if (src_size < MFLIMIT + 1) {
        op = emit_last_literals(op, oend, src, src_size);
        return op ? (int)(op - dst) : 0;
    }

    const int n = src_size;

    // DP scratch is reused per thread: fresh multi-MB allocations pay
    // hundreds of ms of first-touch page faults on this VM class (see
    // docs/perf_notes.md), which would dwarf the parse itself at 4 MiB
    // blocks. assign() keeps capacity; only the first block per thread
    // faults.
    struct OptScratch {
        std::vector<int32_t> mlen, moff, g_len, run_of, len_of;
        std::vector<CostT> dp, g;
    };
    static thread_local OptScratch sc;

    // --- pass 1: longest match per position --------------------------------
    // DESIGN NOTE — why pass 1 searches unbounded even though
    // boilerplate-heavy data (medium-length repeats at thousands of
    // offsets, e.g. templated rows) then runs at ~0.1 MB/s at L11-12:
    // the measured size margin over upstream lz4-HC at L10-12 is 0-72
    // bytes on the conformance corpora (exactly 0 at L12 on enwik- and
    // silesia-like), and silesia-like corpora contain exactly the
    // repetitive sections a search budget would starve (avg chain walk
    // 1807 at L11 vs ~160 on text). Every budget scheme tried in round 2
    // (fixed depth caps, failure-hysteresis, productivity-refunded leaky
    // buckets, 1-in-4 full-probe sampling) lost 26-7488 bytes on some
    // corpus/level; the only safe bound (well above text's average walk)
    // no longer speeds up the pathological case. Slow L11-12 on
    // repeat-heavy data is the price of the "size <= upstream at every
    // level" contract; the carry-skip above already handles the periodic
    // (period <= 8 / ultra-long-match) cases.
    std::vector<int32_t>& mlen = sc.mlen;
    std::vector<int32_t>& moff = sc.moff;
    mlen.assign(n, 0);
    moff.assign(n, 0);
#ifdef PLZ4_STATS
    auto t_p1 = std::chrono::steady_clock::now();
#endif
    {
        // Long-gram chains + exact recovery ladder: same match lengths
        // by construction (see ChainFinder::gram), text-class buckets
        // split finer at every gram step (measured steps/find on text:
        // 55 at gram 4, 29 at gram 5 — tools/prof_opt). Sparse levels at
        // engine block spans take the single-table 4-gram finder instead
        // (see opt_gram_small).
        // windowless only: windowed calls must stay byte-consistent with
        // the prebuilt dict-context chains (built at the default gram)
        ChainFinder& cf =
            ext ? *ext
                : acquire_opt_finder(
                      wbase, src, iend,
                      SPARSE && wbase == src &&
                          (size_t)(iend - wbase) <= OPT_SMALL_SPAN);
        // long-match inheritance: inside a long match, position i+1 has at
        // least (len-1, same offset) — skip the chain walk there. Keeps the
        // scan near-linear on RLE/periodic data. (A denser skip was tried
        // and cost 11% ratio: the DP needs fresh matches at most positions.)
        int carry_len = 0, carry_off = 0;
        // Adaptive seeded-walk budget: full budget wherever seeded walks
        // have recently produced fresh matches (boiler-like data, where
        // overlapping templates beat the carried offset constantly), decay
        // toward seed_att where they don't (text-like data, where the
        // carry already is the best and walks are pure overhead). The
        // productivity signal makes the pruning self-calibrating per
        // region, unlike a static seeded budget, which the budget sweep
        // showed cannot satisfy text and boiler simultaneously.
        int cur_sat = attempts;
        // O(1) remaining-run lookup for the far-carry probe below: the
        // probe used to re-scan the rest of the run with count_run_fwd at
        // EVERY far-carried in-run position — O(run^2) per run, the
        // dominant pass-1 cost on run-dense data once the summary made
        // the finds themselves cheap. A run's end is content-static, so
        // one measurement serves every later position inside it
        // (count_run_fwd's matchlimit cap agrees: if the first measure
        // was capped, run_end = mlpos and later remainders still come out
        // exactly mlpos - pos).
        int prun_end = -1;
        uint8_t prun_b = 0;
#ifdef PLZ4_STATS
        // dense-mode diagnostic: distance from the last improvement
        int anchor = -(1 << 30);
#endif
        const int sp_tail =
            SPARSE ? (sparse_tail() >= 0 ? sparse_tail()
                                         : std::max(0, cf.gram - 5))
                   : 0;
        const int sp_scanb =
            SPARSE ? (sparse_scanb() > 0 ? sparse_scanb() : prm.scan_budget)
                   : 0;
        // coverage end already served by extend_scan (one scan per E)
        uint32_t escan_E = 0;
        const uint32_t src_pos0 = (uint32_t)(src - cf.wbase);
        const uint32_t end_pos = (uint32_t)(iend - cf.wbase);
        for (int i = 0; i + MFLIMIT <= n; ++i) {
            const uint8_t* ip = src + i;
            if constexpr (SPARSE) {
                // adopt a staged family start (written by an extend_scan
                // whose family began ahead of the position that ran it)
                if (mlen[i] > carry_len) {
                    carry_len = mlen[i];
                    carry_off = moff[i];
                }
            }
            if (carry_len > 64 && carry_off > 8) {
                // A fresh byte-run can START under a carried far match, and
                // its off=1 self-match (spanning the whole run, including
                // not-yet-encoded bytes — the LZ4 RLE idiom upstream emits
                // via its pattern analysis) can be much longer than the
                // carried tail. Probe it before trusting the carry: without
                // this, run-heavy payloads lost ~1% size to upstream at
                // L9-12 (the skip glides over the run start and the DP
                // never sees the long cheap match).
                const uint8_t b0 = *ip;
                if (ip[-1] == b0 && read32(ip) == 0x01010101u * b0) {
                    int rl;
                    if (prun_b == b0 && i < prun_end) {
                        rl = prun_end - i;
                    } else {
                        rl = count_run_fwd(ip, matchlimit, b0);
                        prun_b = b0;
                        prun_end = i + rl;
                    }
                    if (rl > carry_len) {
                        carry_len = rl;
                        carry_off = 1;
                    }
                }
            }
            if ((carry_len > 64 && carry_off <= 8) || carry_len >= skip_len) {
                // RLE-ish region (period <= 8): a full search would count
                // the whole run per candidate — keep the pure inheritance
                // skip, upgraded by the O(1) pattern-fit cache (the match
                // that crosses the run/text boundary, which inheritance
                // alone loses — the run-dense residual).
                // carry >= skip_len at ANY period: deep inside a long
                // match a fresh search can only improve the last few
                // positions before the region ends (re-search resumes once
                // the carry drops below skip_len); without this, periodic
                // data with period > 8 walks the full chain (65536
                // attempts at L11-12) at EVERY position — 0.1 MB/s
                // measured on period-37 data
                cf.insert_upto(ip + 1);
                mlen[i] = carry_len;
                moff[i] = carry_off;
                if (carry_off <= 8) {
                    int off2;
                    int l2 = cf.fit_at((uint32_t)(ip - cf.wbase), &off2);
                    if (l2 > carry_len) {
                        mlen[i] = l2;
                        moff[i] = off2;
                    }
                }
                --carry_len;
                continue;
            }
            if constexpr (SPARSE) {
                // Coverage-extension scheduling (see the block comment
                // above this function). Covered positions do NO per-
                // position finds: one extend_scan per coverage-end value
                // enumerates every longer-ending candidate for the whole
                // region; a tail window of width gram-5 keeps the only
                // start positions the end-gram cannot witness.
                // Run-entry probe: a fresh byte-run can start under a
                // SHORT carry too (the far-carry probe above requires
                // carry > 64), and a run-start position covered by a
                // dying 4-5 byte tail otherwise never sees a find — the
                // far in-window run match (PaSum answers it in O(1)) was
                // the dominant residual vs the dense scan on silesia-like
                // mixed corpora. One read32 per covered position, fires
                // once per run.
                bool run_entry =
                    carry_len >= MINMATCH + sp_tail && i > 0 &&
                    read32(ip) == 0x01010101u * ip[0] && ip[-1] != ip[0];
                if (!run_entry && carry_len >= MINMATCH + sp_tail) {
                    uint32_t pos = (uint32_t)(ip - cf.wbase);
                    uint32_t E = pos + (uint32_t)carry_len;  // coverage end
                    if (E != escan_E) {
                        escan_E = E;
                        uint32_t j = E + 1 - (uint32_t)cf.gram;
                        // A byte-uniform end-gram means E+1 sits inside a
                        // byte run: redirect the scan to the RUN-ENTRY
                        // gram (last text byte + run prefix) — every
                        // text->run crossing match that ends past E
                        // contains it. Pure in-run starts stay with the
                        // run machinery above. Without this redirect the
                        // dominant silesia-class beaters (matches
                        // extending deep into zero runs) were invisible
                        // (measured -3.7 KB at L11 on silesia-like 4 MiB).
                        if (j + 8 <= end_pos) {
                            const uint8_t* jp0 = cf.wbase + j;
                            uint32_t g4 = read32(jp0);
                            if (g4 == 0x01010101u * (uint8_t)g4 &&
                                jp0[4] == (uint8_t)g4 &&
                                (cf.gram < 6 || jp0[5] == (uint8_t)g4) &&
                                (cf.gram < 7 || jp0[6] == (uint8_t)g4)) {
                                const uint8_t* lb2 =
                                    cf.low_base < jp0 - 65536 ? jp0 - 65536
                                                              : cf.low_base;
                                int rb = count_run_bwd(jp0, lb2,
                                                       (uint8_t)g4);
                                // j - rb = run start; the boundary gram
                                // starts one text byte before it
                                if ((uint32_t)rb + 1 <= j - cf.floor_pos)
                                    j = j - (uint32_t)rb - 1;
                                else
                                    j = 0;  // no in-window text byte
                            }
                        }
                        if (j > 0 && j + 8 <= end_pos) {
                            const uint8_t* jp = cf.wbase + j;
                            uint32_t g4 = read32(jp);
                            if (g4 != 0x01010101u * (uint8_t)g4) {
                                ChainFinder::ExtFam
                                    fams[ChainFinder::EXT_FAMS];
                                int nf = cf.extend_scan(j, matchlimit,
                                                        sp_scanb,
                                                        cf.next_insert,
                                                        fams);
                                const int64_t ml_pos =
                                    (int64_t)(matchlimit - cf.wbase);
                                for (int k = 0; k < nf; ++k) {
                                    int off = (int)(j - fams[k].q);
                                    int b = fams[k].b;
                                    // j + gram = E + 1 may sit one past
                                    // the matchlimit (E is itself bounded
                                    // by it); clamp so no emitted match
                                    // can end in the LASTLITERALS region
                                    int64_t endp =
                                        (int64_t)j + cf.gram + fams[k].f;
                                    if (endp > ml_pos) endp = ml_pos;
                                    if (endp <= (int64_t)E &&
                                        (int64_t)j - b > (int64_t)pos)
                                        continue;  // fully dominated
                                    if (pos >= j - (uint32_t)b &&
                                        j >= (uint32_t)b) {
                                        // family covers the cursor: extend
                                        // the carry (inheritance fills
                                        // onward) and upgrade positions
                                        // already passed
                                        int Lh =
                                            (int)(endp - (int64_t)pos);
                                        if (Lh > carry_len) {
                                            carry_len = Lh;
                                            carry_off = off;
                                        }
                                        int t0 = (int)((int64_t)j - b -
                                                       (int64_t)src_pos0);
                                        if (t0 < 0) t0 = 0;
                                        int t1 = i;
                                        int64_t tcap = endp - MINMATCH -
                                                       (int64_t)src_pos0 + 1;
                                        if (t1 > tcap) t1 = (int)tcap;
                                        for (int t = t0; t < t1; ++t) {
                                            int32_t L = (int32_t)(
                                                endp -
                                                (int64_t)(src_pos0 +
                                                          (uint32_t)t));
                                            if (L > mlen[t]) {
                                                mlen[t] = L;
                                                moff[t] = off;
                                            }
                                        }
                                    } else {
                                        // future-only family: stage its
                                        // first start for the adopt step.
                                        // Match starts are only legal at
                                        // i <= n - MFLIMIT (the pass-1
                                        // loop bound pass 2 relies on).
                                        int tf = (int)((int64_t)(j - b) -
                                                       (int64_t)src_pos0);
                                        int32_t L = (int32_t)(
                                            endp - (int64_t)(j - b));
                                        if (tf >= 0 && tf + MFLIMIT <= n &&
                                            L >= MINMATCH &&
                                            L > mlen[tf]) {
                                            mlen[tf] = L;
                                            moff[tf] = off;
                                        }
                                    }
                                }
                            }
                        }
                    }
                    if (carry_len >= MINMATCH + sp_tail) {
                        cf.insert_upto(ip + 1);
                        mlen[i] = carry_len;
                        moff[i] = carry_off;
                        --carry_len;
                        continue;
                    }
                }
            }
            const uint8_t* match = nullptr;
            // carried tail seeds the search: the boundary filter rejects
            // non-improving candidates in ~2 loads, so re-searching inside
            // long matches is cheap yet still finds longer fresh matches
            // (a pure skip missed matches worth ~0.2% on mixed corpora);
            // seeded positions get the (usually smaller) seed budget
            bool seeded = carry_len >= MINMATCH;
            int l = cf.find(ip, matchlimit, seeded ? cur_sat : attempts,
                            &match, sufficient, seeded ? carry_len : 0,
                            carry_off, prm.pa_budget);
            if (seeded && carry_len < sufficient)
                cur_sat = l > carry_len ? attempts
                                        : std::max(seed_att, cur_sat >> 1);
            if (l >= MINMATCH) {
#ifdef PLZ4_STATS
                if (!SPARSE && seeded && l > carry_len) {
                    int d = i - anchor;
                    int b = d >= 1 && d <= 15
                                ? d
                                : 16 + (31 - __builtin_clz(d > 0 ? d : 1));
                    if (b > 31) b = 31;
                    ++g_cfstats.imp_d_cnt[b];
                    g_cfstats.imp_d_gain[b] += (uint64_t)(l - carry_len);
                }
                if (!SPARSE && l > carry_len)
                    anchor = i;  // keep d meaningful for the dense histogram
#endif
                mlen[i] = l;
                moff[i] = (int32_t)(ip - match);
                carry_len = l - 1;
                carry_off = moff[i];
            } else {
                carry_len = 0;
            }
        }
    }
    if (g_optdbg.mlen && g_optdbg.n >= n) {
        std::memcpy(g_optdbg.mlen, mlen.data(), (size_t)n * 4);
        std::memcpy(g_optdbg.moff, moff.data(), (size_t)n * 4);
    }
#ifdef PLZ4_STATS
    auto t_p2 = std::chrono::steady_clock::now();
    g_cfstats.pass1_s += std::chrono::duration<double>(t_p2 - t_p1).count();
#endif

    // --- pass 2: backward DP over sequence starts --------------------------
    constexpr CostT INF = ResTree<CostT>::NONE;
    std::vector<CostT>& dp_v = sc.dp;
    std::vector<int32_t>& g_len_v = sc.g_len;
    std::vector<CostT>& g_v = sc.g;
    std::vector<int32_t>& run_of_v = sc.run_of;
    std::vector<int32_t>& len_of_v = sc.len_of;
    // No INF/zero pre-fills: the descending i-loop WRITES dp[i], g[i],
    // g_len[i], run_of[i], len_of[i] at every position before anything
    // reads them (all reads are of indices > i), and g[i] is written INF
    // explicitly when no match exists. The fills were 20 bytes of memory
    // traffic per input byte and dominated pass 2 on 64 KiB engine
    // blocks (0.29 s / 8 MiB measured round 4). Only dp[n] needs a
    // value. assign() was also the capacity keeper — grow explicitly.
    auto grow = [](auto& v, size_t m) {
        if (v.size() < m) v.resize(m);
    };
    grow(dp_v, (size_t)n + 1);
    grow(g_len_v, (size_t)n);
    grow(g_v, (size_t)n);
    grow(run_of_v, (size_t)n);
    grow(len_of_v, (size_t)n);
    CostT* const dp = dp_v.data();
    int32_t* const g_len = g_len_v.data();
    CostT* const g = g_v.data();
    int32_t* const run_of = run_of_v.data();
    int32_t* const len_of = len_of_v.data();
    // r in [0,14], [15,269], [270,524]
    static thread_local WinMin<CostT> w0, w1, w2;
    w0.reset(n + 1);
    w1.reset(n + 1);
    w2.reset(n + 1);
    // match-length windows for the g-loop below: within l in [4,18]
    // (mlext 0) and [19,36] (mlext 1) the price term is constant, so the
    // min over dp[i+l] alone decides — two sliding window-minima replace
    // the 33-iteration scan wherever ml >= 36 (RLE-dense data has ml in
    // the thousands at nearly every position; the scan was the dominant
    // pass-2 cost there). Exact: same candidate set, same ascending-l
    // tie-break (WinMin's >= pop keeps the latest = smallest j on ties).
    static thread_local WinMin<CostT> m0, m1;
    m0.reset(n + 1);
    m1.reset(n + 1);
    static thread_local ResTree<CostT> rtree;  // exact pricing for r >= 525
    rtree.reset();
    dp[n] = INF;  // a sequence cannot start at n (handled by final run)

    int m_next = -2;  // windows are advanceable at step i iff m_next == i
    // lazy long-run machinery (see the bookkeeping comment below):
    // pushes performed for positions >= lazy_i. The lower bound on
    // long-run options is kept in FOUR aging buckets of min(g[j] + j),
    // rotated every 255 steps so a stale strong entry loosens the bound
    // by at most one llext band instead of forever: entries in b0/b1 are
    // (or may still be) in the llext=1 band, b2's are all llext >= 2,
    // older ones llext >= 3. A single rolling min (no aging) kept
    // triggering catch-ups for the entire block after each strong entry.
    int lazy_i = n;
    CostT lr_b0 = INF, lr_b1 = INF, lr_b2 = INF, lr_rest = INF;
    int lr_phase = 0;
    for (int i = n - 1; i >= 0; --i) {
        // match-part cost g[i]: short lengths exhaustively, the maximal
        // length, and the lengths just below each extension-byte bump
        int ml = mlen[i];
        if (ml >= MINMATCH) {
            CostT best = INF;
            int best_l = 0;
            if (ml >= 36) {
                if (m_next != i) {
                    // prime the windows here (33 pushes ~= one scan);
                    // they then advance in O(1) while the ml>=36 stretch
                    // lasts, and lapse for free where it doesn't — so
                    // text-class blocks (ml < 36 nearly everywhere) pay
                    // nothing for the window machinery
                    m0.reset(0);
                    m1.reset(0);
                    for (int j = i + 18; j >= i + MINMATCH; --j)
                        m0.push(j, dp[j]);
                    for (int j = i + 36; j >= i + 19; --j)
                        m1.push(j, dp[j]);
                } else {
                    m0.push(i + MINMATCH, dp[i + MINMATCH]);
                    m1.push(i + 19, dp[i + 19]);
                    m0.drop_above(i + 18);
                    m1.drop_above(i + 36);
                }
                m_next = i - 1;
                PLZ4_STAT(g_cfstats.gl_iters += 2);
                if (!m0.empty() && m0.min() < INF) {
                    best = 2 + 0 + m0.min();
                    best_l = m0.argmin() - i;
                }
                if (!m1.empty() && m1.min() < INF) {
                    CostT c = 2 + 1 + m1.min();
                    if (c < best) {
                        best = c;
                        best_l = m1.argmin() - i;
                    }
                }
            } else {
                PLZ4_STAT(g_cfstats.gl_iters += ml - MINMATCH + 1);
                for (int l = MINMATCH; l <= ml; ++l) {
                    if (dp[i + l] >= INF) continue;
                    CostT c = 2 + mlext_price(l) + dp[i + l];
                    if (c < best) { best = c; best_l = l; }
                }
            }
            if (ml > 36) {
                // probe the length just below EVERY extension-byte bump
                // (l = 273, 528, 783, ... — mlext steps at 274+255k), up
                // to the 4095 sufficient_len cap: beyond it the finder
                // already takes maximal matches, and bounding the probe
                // count keeps RLE blocks (ml ~ n at every position) O(n)
                for (int l = 273; l <= ml && l < 4351; l += 255) {
                    if (dp[i + l] >= INF) continue;
                    CostT c = 2 + mlext_price(l) + dp[i + l];
                    if (c < best) { best = c; best_l = l; }
                }
                for (int l = ml > 38 ? ml - 2 : 37; l <= ml; ++l) {
                    if (dp[i + l] >= INF) continue;
                    CostT c = 2 + mlext_price(l) + dp[i + l];
                    if (c < best) { best = c; best_l = l; }
                }
            }
            g[i] = best;
            g_len[i] = best_l;
        } else {
            g[i] = INF;  // no pre-fill: see the pass-2 header comment
        }
        // window bookkeeping: as i decreases, a match start j's run length
        // r = j - i grows, so j migrates bucket0 -> bucket1 -> bucket2 ->
        // tail. Bucket 0 (r <= 14, the hot common case) is maintained
        // eagerly; the LONG-RUN machinery (w1/w2/rtree) is maintained
        // LAZILY: a rolling suffix-min of g[j] + j over j >= i + 15 gives
        // an O(1) sound lower bound on EVERY long-run option
        // (1 + llext(r>=15) + g[j] + j - i >= 2 + lr_min - i), and the
        // windows/tree only catch up (performing the skipped pushes in
        // descending order) when that bound beats the short options.
        // Eager maintenance measured 22 ns/pos — 2/3 of pass 2 — while
        // long-literal-run wins are rare on compressible data (round 4).
        if (g[i] < INF) w0.push(i, g[i] + i);
        if (i + 15 < n && g[i + 15] < INF) {
            CostT v = g[i + 15] + (i + 15);
            if (v < lr_b0) lr_b0 = v;
        }
        if (++lr_phase == 255) {
            lr_phase = 0;
            if (lr_b2 < lr_rest) lr_rest = lr_b2;
            lr_b2 = lr_b1;
            lr_b1 = lr_b0;
            lr_b0 = INF;
        }
        // dp[i]: final-literal-run option, then one option per llext range
        int fin_r = n - i;
        CostT best = 1 + llext_price(fin_r) + fin_r;
        int best_r = -1;  // -1 = final literals
        int32_t best_j = -1;
        w0.drop_above(i + 14);
        if (!w0.empty()) {
            CostT c = 1 + 0 + (w0.min() - i);
            if (c < best) { best = c; best_j = w0.argmin(); }
        }
        CostT lr_lb = std::min(
            std::min(2 + lr_b0, 2 + lr_b1),
            std::min(3 + lr_b2, 4 + lr_rest));
        if (lr_lb - i < best) {
            PLZ4_STAT(++g_cfstats.tail_q);
            // a long-run option may win: catch the lazy structures up
            for (int p = lazy_i - 1; p >= i; --p) {
                if (p + 15 < n && g[p + 15] < INF)
                    w1.push(p + 15, g[p + 15] + (p + 15));
                if (p + 270 < n && g[p + 270] < INF)
                    w2.push(p + 270, g[p + 270] + (p + 270));
                if (p + 525 < n && g[p + 525] < INF) {
                    int32_t j = p + 525;
                    rtree.insert(j % 255, g[j] + j + j / 255, j);
                }
            }
            if (lazy_i > i) lazy_i = i;
            w1.drop_above(i + 269);
            if (!w1.empty() && w1.argmin() >= i + 15) {
                CostT c = 1 + 1 + (w1.min() - i);
                if (c < best) { best = c; best_j = w1.argmin(); }
            }
            w2.drop_above(i + 524);
            if (!w2.empty() && w2.argmin() >= i + 270) {
                CostT c = 1 + 2 + (w2.min() - i);
                if (c < best) { best = c; best_j = w2.argmin(); }
            }
            if (i + 525 <= n - 1) {
                // tail: exact per-residue-class pricing (see ResTree).
                // The root of the tree lower-bounds every tail candidate,
                // so the two range queries only run when the tail can
                // actually beat the short-run options
                int aa = i + 15;
                int Q = aa / 255, R = aa % 255;
                if (2 + rtree.gmin - i - Q - 1 < best) {
                    PLZ4_STAT(++g_cfstats.tail_q);
                    CostT v1, v2;
                    int32_t j1, j2;
                    rtree.query(R, 254, v1, j1);
                    rtree.query(0, R - 1, v2, j2);
                    CostT cand;
                    int32_t cj;
                    if (v2 - 1 < v1) { cand = v2 - 1; cj = j2; }
                    else { cand = v1; cj = j1; }
                    if (cand < ResTree<CostT>::NONE - 1) {
                        CostT c = 2 + cand - i - Q;
                        if (c < best) { best = c; best_j = cj; }
                    }
                }
            }
        }
        if (best_j >= 0) best_r = (int)(best_j - i);
        dp[i] = best;
        run_of[i] = best_r;
        len_of[i] = best_r >= 0 ? g_len[i + best_r] : 0;
    }

    if (g_optdbg.dp && g_optdbg.n >= n)
        for (int k = 0; k <= n; ++k)  // widen (CostT may be int32)
            g_optdbg.dp[k] = dp[k] >= INF ? (int64_t(1) << 50) : dp[k];
#ifdef PLZ4_STATS
    g_cfstats.pass2_s += std::chrono::duration<double>(
                             std::chrono::steady_clock::now() - t_p2)
                             .count();
#endif

    // --- pass 3: reconstruct + emit ---------------------------------------
    int i = 0;
    while (i < n) {
        int r = run_of[i];
        if (r < 0) break;  // final literal run to the end
        int j = i + r;
        int l = len_of[i];
        op = emit_sequence(op, oend, src + i, r, (uint32_t)moff[j], l);
        if (!op) return 0;
        i = j + l;
    }
    op = emit_last_literals(op, oend, src + i, n - i);
    return op ? (int)(op - dst) : 0;
}

int compress_hc(const uint8_t* wbase, const uint8_t* src, int src_size,
                uint8_t* dst, int dst_cap, int level,
                ChainFinder* ext);

int compress_opt(const uint8_t* wbase, const uint8_t* src, int src_size,
                 uint8_t* dst, int dst_cap, int level) {
    // Levels 9-10 (and L11 blocks > 1 MiB): the DP with SPARSE pass-1
    // probe scheduling — the speed/ratio point between the HC chain
    // parse (<= 8) and the dense-scan DP (11-12). Small L11 blocks and
    // L12 keep the dense scan: their margins vs upstream are 0-629 bytes
    // and the full per-position scan is what wins them.
    // PLZ4_OPT_FWD: "0" = dense scan at every level (sweeps, A/Bs);
    // otherwise the highest level the sparse schedule serves (default 11;
    // the historical name is kept — it has always meant "fast-parse
    // ceiling" to the lab tools).
    static const int sparse_max = [] {
        const char* e = std::getenv("PLZ4_OPT_FWD");
        if (!e) return 11;
        int v = std::atoi(e);
        return v <= 0 ? 0 : v > 11 ? 11 : v;
    }();
    const bool sparse_ok =
        level <= sparse_max && (level <= 10 || src_size > (1 << 20));
    if (sparse_ok && src_size < (1 << 28)) {
        // Run-dominated AND tiny-alphabet blocks take the dense scan:
        // PaSum answers in-run finds in O(1) (the scan is NOT the
        // bottleneck there), and on small alphabets (<= 16 distinct
        // bytes: 4-symbol soup, DNA-like data) every 4-gram bucket is
        // dense, the coverage-extension schedule degenerates, and the
        // dense DP measured BOTH smaller (-7.2 KB on a 162 KB 4-symbol
        // block, beating upstream L9 by 3.5 KB where sparse LOST 3.7 KB)
        // and 2.5x faster. 128 sampled read32s estimate both signals; a
        // wrong guess only trades speed between two contract-safe parses.
        if (src_size >= 4096) {
            int uniform = 0;
            uint64_t seen[4] = {0, 0, 0, 0};
            int laghit[17] = {};  // short-lag 4-gram autocorrelation
            int stride = src_size / 128;
            for (int t = 0; t < 128; ++t) {
                const uint8_t* p = src + (size_t)t * stride;
                uint32_t v = read32(p);
                uniform += (v == 0x01010101u * (uint8_t)v);
                for (int b = 0; b < 4; ++b) {
                    uint8_t c = (uint8_t)(v >> (8 * b));
                    seen[c >> 6] |= 1ull << (c & 63);
                }
                for (int lag = 2; lag <= 16; ++lag)
                    laghit[lag] += (read32(p + lag) == v);
            }
            int distinct = __builtin_popcountll(seen[0]) +
                           __builtin_popcountll(seen[1]) +
                           __builtin_popcountll(seen[2]) +
                           __builtin_popcountll(seen[3]);
            int maxlag = 0;
            for (int lag = 2; lag <= 16; ++lag)
                if (laghit[lag] > maxlag) maxlag = laghit[lag];
            if (uniform > 64) {
                // run-dominated: dense at the SAME level (PaSum + the
                // level's own params already win here at full margin)
                return compress_opt_t<int32_t>(wbase, src, src_size, dst,
                                               dst_cap, level);
            }
            // uniform < 16 separates the true pathology (period-2-16
            // TILES with mutations: non-constant bytes, so near-zero
            // uniform samples) from text + zero-run mixes, which also
            // trip maxlag (runs hit every lag) but take the dense DP at
            // 6-8 MB/s and tie upstream where hc-8 lost 17-89 B
            // (2000-seed sweep, round 5)
            if (maxlag > 96 && uniform < 16 && level <= 10) {
                // Mutated short-period blocks (period 2-16 tiles with
                // scattered mutations — their SAMPLED alphabet is tiny
                // too, so this arm must run before the distinct check):
                // matches are period-truncated at every mutation and
                // every 4-gram bucket holds a candidate each period, so
                // BOTH DP modes degenerate — the sparse schedule lost
                // 1.3-6.5 KB to upstream L9 at ~2 MB/s and every
                // deep-walk param set crawls at 0.05-0.06 MB/s (param
                // bisect, docs/perf_notes.md). The CHAIN parse with the
                // good-enough valve is the right tool: seed 2015516,
                // 448 KB: 34622 B at 26 MB/s vs sparse-DP 41002 at
                // 2 MB/s and upstream-L9 34536 at 32 (level 8 explicitly:
                // level >= 9 would lift the valve and re-enter the
                // pathology). L12's exact ties are never rerouted.
                return compress_hc(wbase, src, src_size, dst, dst_cap, 8,
                                   nullptr);
            }
            if (distinct <= 16) {
                // tiny alphabet (4-symbol soup, DNA-like): 4-gram
                // buckets are dense and the coverage-extension schedule
                // degenerates — the dense scan at the level's own params
                // measured both smaller AND 2.5x faster
                return compress_opt_t<int32_t>(wbase, src, src_size, dst,
                                               dst_cap, level);
            }
        }
        return compress_opt_t<int32_t, /*SPARSE=*/true>(
            wbase, src, src_size, dst, dst_cap, level);
    }
    // int32 costs for every realistic block; exact int64 fallback for
    // giant raw-API inputs (>= 2^28, where int32 keys could overflow).
    // PLZ4_FORCE_COST64 exercises the int64 instantiation in tests
    // without a 256 MB payload (checked once per process).
    static const bool force64 = std::getenv("PLZ4_FORCE_COST64") != nullptr;
    if (src_size < (1 << 28) && !force64)
        return compress_opt_t<int32_t>(wbase, src, src_size, dst, dst_cap,
                                       level);
    return compress_opt_t<int64_t>(wbase, src, src_size, dst, dst_cap,
                                   level);
}

// `ext`: an already-synced finder whose history covers [window, src) — the
// streaming path's amortization (no per-block window re-insert). When null,
// a thread-local finder is attached fresh and the window is inserted here
// (tables are never cleared between calls; see ChainFinder::attach).
int compress_hc(const uint8_t* wbase, const uint8_t* src, int src_size,
                uint8_t* dst, int dst_cap, int level,
                ChainFinder* ext = nullptr) {
    if (src_size < 0 || dst_cap <= 0) return -1;
    uint8_t* op = dst;
    uint8_t* const oend = dst + dst_cap;
    if (src_size == 0) {
        // before deriving iend-offset pointers: src may be null here
        if (dst_cap < 1) return 0;
        *op++ = 0;
        return (int)(op - dst);
    }
    const uint8_t* ip = src;
    const uint8_t* anchor = src;
    const uint8_t* const iend = src + src_size;
    const uint8_t* const mflimit = iend - MFLIMIT;
    const uint8_t* const matchlimit = iend - LASTLITERALS;
    // Tiny-alphabet bump (round-5 soak finding): upstream's level 2 is
    // LZ4MID (dual 4+8-byte hash, k_clTable lz4hc.c:92-107); on <= 16
    // distinct bytes (4-symbol soup, DNA-like) its 8-gram selectivity
    // beat our 4-gram 2-attempt chain by up to 24% — the flooded 4-gram
    // buckets need a deeper walk. Level-6 chain params win the class
    // back (-4% vs upstream L2 on the 522 KB worst case) at a speed
    // trade confined to this one adversarial class; 128 sampled read32s
    // elsewhere.
    if (level == 2 && src_size >= 4096) {
        // windowed: a tiny-alphabet REGION inside a mixed payload floods
        // its buckets just the same (soak found an 11.5% loss on a
        // 4-symbol + random concat whose global sample saw 256 distinct)
        int stride = src_size / 128;
        for (int w = 0; w < 8; ++w) {
            uint64_t seen[4] = {0, 0, 0, 0};
            for (int t = w * 16; t < (w + 1) * 16; ++t) {
                uint32_t v = read32(src + (size_t)t * stride);
                for (int b = 0; b < 4; ++b) {
                    uint8_t c = (uint8_t)(v >> (8 * b));
                    seen[c >> 6] |= 1ull << (c & 63);
                }
            }
            int distinct = __builtin_popcountll(seen[0]) +
                           __builtin_popcountll(seen[1]) +
                           __builtin_popcountll(seen[2]) +
                           __builtin_popcountll(seen[3]);
            if (distinct <= 16) {
                level = 6;
                break;
            }
        }
    }
    const int attempts = hc_attempts_for_level(level);

    // Parse strategy (reference analog: LZ4HC_compress_hashChain,
    // lz4hc.c:1178-1330): hold up to three overlapping candidate matches
    // m1/m2/m3 — m2 probed near m1's tail, m3 near m2's tail, each probe a
    // fresh hash bucket with back-widening — and resolve overlaps so the
    // emitted parse keeps the longest usable spans. OPTIMAL_ML caps how
    // much of m1 is worth keeping when m2 must start inside it.
    if (src_size >= MFLIMIT + 1) {
        constexpr int OPTIMAL_ML = 18;  // (ML_MASK-1) + MINMATCH
        // level 9 walks chains without the good-enough cutoff (the cutoff
        // trades a sliver of ratio for speed at the middle levels).
        // PLZ4_HC_SUFF / PLZ4_HC_ATT are lab knobs for sweeping the
        // chain-level (2-8) ladder; 0/unset = the shipped params.
        static const int hc_suff_env = [] {
            const char* s = getenv("PLZ4_HC_SUFF");
            return s ? atoi(s) : 0;
        }();
        static const int hc_att_env = [] {
            const char* s = getenv("PLZ4_HC_ATT");
            return s ? atoi(s) : 0;
        }();
        const int sufficient =
            level >= 9 ? 0x7FFFFFFF
                       : (hc_suff_env > 0 ? hc_suff_env
                                          : ChainFinder::SUFFICIENT_LEN);
        const int eff_attempts = (level <= 8 && hc_att_env > 0)
                                     ? hc_att_env : attempts;
        using Match = ChainFinder::Match;
        static thread_local ChainFinder tl_cf;
        ChainFinder& cf = ext ? *ext : tl_cf;
        if (!ext) {
            cf.attach(wbase);
            // preload dictionary into chains
            if (src > wbase) cf.insert_upto(src);
        }

        while (ip <= mflimit) {
            Match m1 = cf.search(ip, ip, matchlimit, eff_attempts,
                                 MINMATCH - 1,
                                 sufficient);
            if (m1.off == 0) {
                ++ip;
                continue;
            }
            const uint8_t* start0 = ip;  // in case skipping m1 was a mistake
            Match m0 = m1;
            const uint8_t* start2;
            Match m2;

        search2:
            if (ip + m1.len <= mflimit) {
                start2 = ip + m1.len - 2;
                m2 = cf.search(start2, ip, matchlimit, eff_attempts, m1.len,
                               sufficient);
                start2 -= m2.back;
            } else {
                m2 = Match{0, 0, 0};
                start2 = nullptr;
            }
            if (m2.off == 0 || m2.len <= m1.len) {
                // no better overlapping match: emit m1 as-is
                op = emit_sequence(op, oend, anchor, (int)(ip - anchor),
                                   (uint32_t)m1.off, m1.len);
                if (!op) return 0;
                ip += m1.len;
                anchor = ip;
                continue;
            }
            if (start0 < ip && start2 < ip + m0.len) {
                // m1 had replaced the original match but m2 now squeezes
                // into the original's span: restore the original
                ip = start0;
                m1 = m0;
            }
            if (start2 - ip < 3) {
                // m1 too small to be worth keeping: m2 takes its place
                ip = start2;
                m1 = m2;
                goto search2;
            }

        search3:
            // if m2 starts inside m1's optimal span, shift m2 forward so a
            // useful chunk of m1 (<= OPTIMAL_ML) can still be emitted
            if (start2 - ip < OPTIMAL_ML) {
                int keep = m1.len;
                if (keep > OPTIMAL_ML) keep = OPTIMAL_ML;
                if (ip + keep > start2 + m2.len - MINMATCH)
                    keep = (int)(start2 - ip) + m2.len - MINMATCH;
                int corr = keep - (int)(start2 - ip);
                if (corr > 0) {
                    start2 += corr;
                    m2.len -= corr;
                }
            }
            {
                const uint8_t* start3;
                Match m3;
                if (start2 + m2.len <= mflimit) {
                    start3 = start2 + m2.len - 3;
                    m3 = cf.search(start3, start2, matchlimit, eff_attempts,
                                   m2.len, sufficient);
                    start3 -= m3.back;
                } else {
                    m3 = Match{0, 0, 0};
                    start3 = nullptr;
                }
                if (m3.off == 0 || m3.len <= m2.len) {
                    // encode m1 (truncated at m2's start) then m2
                    if (start2 < ip + m1.len) m1.len = (int)(start2 - ip);
                    op = emit_sequence(op, oend, anchor, (int)(ip - anchor),
                                       (uint32_t)m1.off, m1.len);
                    if (!op) return 0;
                    anchor = ip + m1.len;
                    op = emit_sequence(op, oend, anchor,
                                       (int)(start2 - anchor),
                                       (uint32_t)m2.off, m2.len);
                    if (!op) return 0;
                    ip = start2 + m2.len;
                    anchor = ip;
                    continue;
                }
                if (start3 < ip + m1.len + 3) {
                    // m3 leaves no room for m2
                    if (start3 >= ip + m1.len) {
                        // m1 can be emitted whole; m2 is squeezed out and
                        // m3 becomes the new m1
                        if (start2 < ip + m1.len) {
                            int corr = (int)(ip + m1.len - start2);
                            start2 += corr;
                            m2.len -= corr;
                            if (m2.len < MINMATCH) {
                                start2 = start3;
                                m2 = m3;
                            }
                        }
                        op = emit_sequence(op, oend, anchor,
                                           (int)(ip - anchor),
                                           (uint32_t)m1.off, m1.len);
                        if (!op) return 0;
                        anchor = ip + m1.len;
                        ip = start3;
                        m1 = m3;
                        start0 = start2;
                        m0 = m2;
                        goto search2;
                    }
                    start2 = start3;
                    m2 = m3;
                    goto search3;
                }
                // three ascending matches: emit m1 (bounded by m2), then
                // slide the window: m2->m1, m3->m2
                if (start2 < ip + m1.len) {
                    if (start2 - ip < OPTIMAL_ML) {
                        if (m1.len > OPTIMAL_ML) m1.len = OPTIMAL_ML;
                        if (ip + m1.len > start2 + m2.len - MINMATCH)
                            m1.len = (int)(start2 - ip) + m2.len - MINMATCH;
                        int corr = m1.len - (int)(start2 - ip);
                        if (corr > 0) {
                            start2 += corr;
                            m2.len -= corr;
                        }
                    } else {
                        m1.len = (int)(start2 - ip);
                    }
                }
                op = emit_sequence(op, oend, anchor, (int)(ip - anchor),
                                   (uint32_t)m1.off, m1.len);
                if (!op) return 0;
                anchor = ip + m1.len;
                ip = start2;
                m1 = m2;
                start2 = start3;
                m2 = m3;
                goto search3;
            }
        }
    }

    op = emit_last_literals(op, oend, anchor, (int)(iend - anchor));
    if (!op) return 0;
    return (int)(op - dst);
}

}  // namespace

// ---------------------------------------------------------------------------
// Public C API
// ---------------------------------------------------------------------------

// Test-only: run the optimal parse capturing pass-1 match table and the
// DP cost vector (dp_out needs n+1 entries). Returns compressed size.
LZ4R_API int lz4r_opt_debug(const uint8_t* src, int src_size, uint8_t* dst,
                            int dst_cap, int level, int32_t* mlen_out,
                            int32_t* moff_out, int64_t* dp_out);

LZ4R_API int lz4r_compress_bound(int src_size) {
    if (src_size < 0) return 0;
    return src_size + src_size / 255 + 16;
}

// Lab-only: override the optimal-parse search parameters for a level
// (tools/sweep_opt_budget.py). Values <= 0 leave the field unchanged.
// NOT part of the stable API; production paths never call this.
LZ4R_API void lz4r_set_opt_params(int level, int attempts, int sufficient,
                                  int skip_len, int seed_attempts,
                                  int pa_budget) {
    if (level < 9 || level > 12) return;
    OptParams& p = g_opt_params[level];
    if (attempts > 0) p.attempts = attempts;
    if (sufficient > 0) p.sufficient = sufficient;
    if (skip_len > 0) p.skip_len = skip_len;
    if (seed_attempts > 0) p.seed_attempts = seed_attempts;
    if (pa_budget > 0) p.pa_budget = pa_budget;
}

// dict (may be null) must be the window content; it is copied so that it sits
// contiguously before src in a scratch buffer when present.
LZ4R_API int lz4r_compress(const uint8_t* src, int src_size, uint8_t* dst,
                           int dst_cap, int level, const uint8_t* dict,
                           int dict_size) {
    if (dict_size > 65536) {  // window is the last 64 KiB only
        dict += dict_size - 65536;
        dict_size = 65536;
    }
    if (dict && dict_size > 0) {
        std::vector<uint8_t> scratch((size_t)dict_size + (size_t)src_size);
        std::memcpy(scratch.data(), dict, dict_size);
        std::memcpy(scratch.data() + dict_size, src, src_size);
        const uint8_t* wbase = scratch.data();
        const uint8_t* s = scratch.data() + dict_size;
        if (level <= 1) return compress_greedy(wbase, s, src_size, dst, dst_cap, 1);
        if (level >= 9) return compress_opt(wbase, s, src_size, dst, dst_cap, level);
        return compress_hc(wbase, s, src_size, dst, dst_cap, level);
    }
    if (level <= 1) return compress_greedy(src, src, src_size, dst, dst_cap, 1);
    if (level >= 9) return compress_opt(src, src, src_size, dst, dst_cap, level);
    return compress_hc(src, src, src_size, dst, dst_cap, level);
}

// Decode core. `base` is the output buffer whose first `prefix` bytes are
// ALREADY-DECODED history (a contiguous window — the streaming decoder's
// amortization); decoding starts at base+prefix with `cap` bytes available
// after the prefix. Matches reach the prefix naturally and fall through to
// the optional DETACHED dict beyond it. Returns bytes decoded (excluding
// the prefix), or -1 on corrupt input / overflow.
static int decompress_core(const uint8_t* src, int src_size, uint8_t* base,
                           size_t prefix, int cap, const uint8_t* dict,
                           int dict_size) {
    if (src_size < 0 || cap < 0) return -1;
    const uint8_t* ip = src;
    const uint8_t* const iend = src + src_size;
    uint8_t* const dst = base;
    uint8_t* op = base + prefix;
    uint8_t* const oend = op + cap;
    if (dict_size > 65536) {
        dict += dict_size - 65536;
        dict_size = 65536;
    }

    if (src_size == 0) return -1;

    // Fast-path margins: inside these bounds the common sequence shape
    // (literals <= 14, match <= 18) runs straight-line with fixed-size wild
    // copies and no per-byte checks; everything else (extensions, buffer
    // tails, dict reaches, short offsets) takes the careful path below.
    const uint8_t* const iend_fast = src_size >= 20 ? iend - 18 : src;
    uint8_t* const oend_fast = (oend - dst) >= 40 ? oend - 36 : dst;

    for (;;) {
        if (ip >= iend) return -1;
        uint32_t token = *ip++;
        uint32_t lit_len = token >> 4;
        uint32_t mlen = token & 15;

        // --- fast path -------------------------------------------------
        if (lit_len <= 14 && ip < iend_fast && op < oend_fast) {
            std::memcpy(op, ip, 16);  // wild: margins guarantee the slack
            op += lit_len;
            ip += lit_len;
            if (ip == iend) break;    // literals-only final sequence
            uint32_t offset = read16(ip);
            ip += 2;
            if (mlen <= 14 && offset >= 18 &&
                offset <= (size_t)(op - dst)) {
                std::memcpy(op, op - offset, 8);
                std::memcpy(op + 8, op - offset + 8, 8);
                std::memcpy(op + 16, op - offset + 16, 2);
                op += mlen + MINMATCH;
                continue;
            }
            ip -= 2;  // re-parse the match on the careful path
            goto careful_match;
        }

        // --- careful path: literals ------------------------------------
        if (lit_len == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                lit_len += b;
                if (lit_len > (uint32_t)0x7FFFFFFF) return -1;
            } while (b == 255);
        }
        if ((size_t)(iend - ip) < lit_len) return -1;
        if ((size_t)(oend - op) < lit_len) return -1;
        if ((size_t)(oend - op) >= lit_len + 32 &&
            (size_t)(iend - ip) >= lit_len + 16) {
            // wild 8-byte strides when slack allows
            uint8_t* o = op;
            const uint8_t* s = ip;
            size_t left = lit_len;
            while (left > 0) {
                std::memcpy(o, s, 8);
                o += 8;
                s += 8;
                left = left > 8 ? left - 8 : 0;
            }
        } else {
            std::memcpy(op, ip, lit_len);
        }
        ip += lit_len;
        op += lit_len;
        if (ip == iend) break;  // last sequence: literals only

    careful_match:
        if (iend - ip < 2) return -1;
        {
            uint32_t offset = read16(ip);
            ip += 2;
            if (offset == 0) return -1;
            mlen = token & 15;
            if (mlen == 15) {
                uint8_t b;
                do {
                    if (ip >= iend) return -1;
                    b = *ip++;
                    mlen += b;
                    if (mlen > (uint32_t)0x7FFFFFFF) return -1;
                } while (b == 255);
            }
            mlen += MINMATCH;
            if ((size_t)(oend - op) < mlen) return -1;

            size_t out_so_far = (size_t)(op - dst);
            if (offset > out_so_far) {
                // reaches into the external dictionary
                size_t into_dict = offset - out_so_far;
                if (dict == nullptr || into_dict > (size_t)dict_size)
                    return -1;
                const uint8_t* dp = dict + dict_size - into_dict;
                size_t n1 = mlen < into_dict ? mlen : into_dict;
                std::memcpy(op, dp, n1);
                op += n1;
                mlen -= (uint32_t)n1;
                if (mlen) {
                    // continues at start of the output buffer (overlap-safe)
                    const uint8_t* mp = dst;
                    while (mlen--) *op++ = *mp++;
                }
            } else if (offset >= 8) {
                const uint8_t* mp = op - offset;
                if ((size_t)(oend - op) >= (size_t)mlen + 8) {
                    // overlap-safe wild copy (offset >= 8 keeps the source
                    // behind the write cursor at 8-byte strides)
                    uint8_t* o = op;
                    const uint8_t* s = mp;
                    int left = (int)mlen;
                    do {
                        std::memcpy(o, s, 8);
                        o += 8;
                        s += 8;
                        left -= 8;
                    } while (left > 0);
                    op += mlen;
                } else {
                    std::memcpy(op, mp, mlen > offset ? offset : mlen);
                    if (mlen > offset) {
                        uint8_t* o = op + offset;
                        const uint8_t* s = op;
                        uint32_t left = mlen - offset;
                        while (left--) *o++ = *s++;
                    }
                    op += mlen;
                }
            } else {
                // short offset (1-7): the output repeats with period
                // `offset` — seed one period byte-wise, then double the
                // copied span (each memcpy's source stays fully written)
                const uint8_t* start = op - offset;
                if ((size_t)(oend - op) >= (size_t)mlen + 8) {
                    for (uint32_t k = 0; k < offset; ++k) op[k] = start[k];
                    size_t done = offset >= mlen ? mlen : offset;
                    while (done < mlen) {
                        size_t n = done + offset;  // span available behind
                        if (n > mlen - done) n = mlen - done;
                        std::memcpy(op + done, start, n);
                        done += n;
                    }
                    op += mlen;
                } else {
                    const uint8_t* mp = start;
                    while (mlen--) *op++ = *mp++;  // overlapping copy
                }
            }
        }
    }
    return (int)(op - dst - prefix);
}

// Safe decompress with optional detached dictionary. Returns decompressed
// size, or -1 on corrupt input / overflow.
LZ4R_API int lz4r_opt_debug(const uint8_t* src, int src_size, uint8_t* dst,
                            int dst_cap, int level, int32_t* mlen_out,
                            int32_t* moff_out, int64_t* dp_out) {
    g_optdbg.mlen = mlen_out;
    g_optdbg.moff = moff_out;
    g_optdbg.dp = dp_out;
    g_optdbg.n = src_size;
    int r = compress_opt(src, src, src_size, dst, dst_cap,
                         level < 9 ? 9 : level);
    g_optdbg = OptDbgSink{};
    return r;
}

LZ4R_API int lz4r_decompress(const uint8_t* src, int src_size, uint8_t* dst,
                             int dst_cap, const uint8_t* dict, int dict_size) {
    return decompress_core(src, src_size, dst, 0, dst_cap, dict, dict_size);
}

// ---------------------------------------------------------------------------
// Reusable dictionary context (reference analog: LZ4_attach_dictionary /
// DictCtx, clz4/clz4.go:96-149): the window's match state is built once and
// shared across records — the greedy path reads it through an epoch-tagged
// overlay (zero per-record copy), the HC path memcpys the prebuilt chains
// (vs re-inserting 64K window positions per record). Not thread-safe; use
// one context per thread (same contract as the reference's DictCtx).
// ---------------------------------------------------------------------------

struct Lz4rDictCtx {
    std::vector<uint8_t> scratch;   // [window | src workspace]
    size_t window_size;
    std::vector<uint32_t> tab;      // prebuilt greedy table (hash4) over dict
    ChainFinder hc;                 // prebuilt HC chains over dict (lazy)
    bool hc_built = false;
    ChainFinder opt;                // prebuilt opt-gram chains (lazy)
    bool opt_built = false;
    std::vector<uint32_t> ov_pos;   // greedy overlay (epoch-tagged)
    std::vector<uint16_t> ov_ep;
    uint16_t epoch = 0;
};

LZ4R_API Lz4rDictCtx* lz4r_dict_create(const uint8_t* dict, int dict_size) {
    auto* c = new Lz4rDictCtx();
    if (dict_size > 65536) {
        dict += dict_size - 65536;
        dict_size = 65536;
    }
    if (dict_size < 0) dict_size = 0;
    c->window_size = (size_t)dict_size;
    c->scratch.assign(dict, dict + dict_size);
    c->tab.assign((size_t)1 << 16, 0);
    for (size_t i = 0; i + 4 <= c->window_size; ++i) {
        c->tab[hash4(read32(c->scratch.data() + i), 16)] = (uint32_t)i;
    }
    c->ov_pos.assign((size_t)1 << 16, 0);
    c->ov_ep.assign((size_t)1 << 16, 0);
    return c;
}

LZ4R_API int lz4r_dict_compress(Lz4rDictCtx* c, const uint8_t* src,
                                int src_size, uint8_t* dst, int dst_cap,
                                int level) {
    if (src_size >= 65536) {
        // >=64 KiB blocks hash 5 bytes (the prebuilt table is 4-byte-
        // hashed) and the rebuild cost amortizes
        return lz4r_compress(src, src_size, dst, dst_cap, level,
                             c->scratch.data(), (int)c->window_size);
    }
    if (level >= 9) {
        // Opt levels: prebuilt opt-gram chains rebased per record (the
        // old per-record window re-insert measured 1.6-1.8 MB/s on 1 KiB
        // records). Routing mirrors compress_opt's dispatcher: sparse
        // pass-1 scheduling at 9-10 off run-dense records, dense scan
        // otherwise.
        if (!c->opt_built) {
            c->opt.set_gram(opt_gram());
            c->opt.reset();
            c->opt.attach(c->scratch.data());
            // stop 8 short: gram hashing reads 8 bytes at each inserted
            // position; the tail positions are inserted by the working
            // finder once the record bytes are appended
            if (c->window_size > 8)
                c->opt.insert_upto(c->scratch.data() + c->window_size - 8);
            c->opt_built = true;
        }
        c->scratch.resize(c->window_size + (size_t)src_size);
        std::memcpy(c->scratch.data() + c->window_size, src, src_size);
        const uint8_t* wbase = c->scratch.data();
        const uint8_t* s = wbase + c->window_size;
        // per-record working finder = prebuilt state rebased to the
        // current scratch address (vector copies stay memcpy-fast:
        // capacity is retained). An in-place undo-log variant measured
        // NO gain — per-record cost is find-bound, not copy-bound.
        static thread_local ChainFinder workopt;
        c->opt.copy_into(workopt, wbase);
        // full sampled classification, mirroring compress_opt's
        // dispatcher (advisor r4: the maxlag/tiny-alphabet pathology
        // classes — mutated short-period tiles, 4-symbol soup — crawl
        // under the sparse schedule and must reroute here too)
        bool rundense = false, shortlag = false, tiny_alpha = false;
        if (src_size >= 4096) {
            int uniform = 0;
            uint64_t seen[4] = {0, 0, 0, 0};
            int laghit[17] = {};
            int stride = src_size / 128;
            for (int t = 0; t < 128; ++t) {
                const uint8_t* p = s + (size_t)t * stride;
                uint32_t v = read32(p);
                uniform += (v == 0x01010101u * (uint8_t)v);
                for (int b = 0; b < 4; ++b) {
                    uint8_t ch = (uint8_t)(v >> (8 * b));
                    seen[ch >> 6] |= 1ull << (ch & 63);
                }
                for (int lag = 2; lag <= 16; ++lag)
                    laghit[lag] += (read32(p + lag) == v);
            }
            int distinct = __builtin_popcountll(seen[0]) +
                           __builtin_popcountll(seen[1]) +
                           __builtin_popcountll(seen[2]) +
                           __builtin_popcountll(seen[3]);
            int maxlag = 0;
            for (int lag = 2; lag <= 16; ++lag)
                if (laghit[lag] > maxlag) maxlag = laghit[lag];
            rundense = uniform > 64;
            shortlag = maxlag > 96 && uniform < 16;  // see compress_opt
            tiny_alpha = distinct <= 16;
        }
        if (level <= 10 && !rundense) {
            if (shortlag) {
                // mutated short-period records: both DP modes degenerate
                // (see compress_opt's dispatcher); the chain parse with
                // the good-enough valve is the right tool. Build the hc
                // chain state lazily — most dict contexts at opt levels
                // never see this class.
                if (!c->hc_built) {
                    c->hc.reset();
                    c->hc.attach(c->scratch.data());
                    if (c->window_size > 3)
                        c->hc.insert_upto(
                            c->scratch.data() + c->window_size - 3);
                    c->hc_built = true;
                }
                static thread_local ChainFinder workhc;
                workhc.head = c->hc.head;
                workhc.chain = c->hc.chain;
                workhc.next_insert = c->hc.next_insert;
                workhc.floor_pos = 0;
                workhc.wbase = workhc.low_base = wbase;
                return compress_hc(wbase, wbase + c->window_size, src_size,
                                   dst, dst_cap, 8, &workhc);
            }
            if (!tiny_alpha)
                return compress_opt_t<int32_t, /*SPARSE=*/true>(
                    wbase, s, src_size, dst, dst_cap, level, &workopt);
        }
        return compress_opt_t<int32_t>(wbase, s, src_size, dst, dst_cap,
                                       level, &workopt);
    }
    if (!c->hc_built && level > 1) {
        c->hc.reset();
        c->hc.attach(c->scratch.data());
        // stop 3 short of the end: insert_upto does read32(wbase + i), so
        // inserting position window_size-1 would read 3 bytes past the
        // scratch vector (it holds exactly the window before the first
        // resize). The last 3 positions are inserted by the finder's own
        // insert_upto(ip) once the record bytes are appended — same
        // discipline as upstream LZ4_loadDict stopping at dictEnd-HASH_UNIT
        // (clz4/lz4.c:1565).
        if (c->window_size > 3)
            c->hc.insert_upto(c->scratch.data() + c->window_size - 3);
        c->hc_built = true;
    }
    c->scratch.resize(c->window_size + (size_t)src_size);
    std::memcpy(c->scratch.data() + c->window_size, src, src_size);
    const uint8_t* wbase = c->scratch.data();
    if (level > 1) {
        // working finder = prebuilt chains rebased to the current scratch
        // address (vector copies stay memcpy-fast: capacity is retained)
        static thread_local ChainFinder work;
        work.head = c->hc.head;
        work.chain = c->hc.chain;
        work.next_insert = c->hc.next_insert;
        work.floor_pos = 0;
        work.wbase = work.low_base = wbase;
        return compress_hc(wbase, wbase + c->window_size, src_size, dst,
                           dst_cap, level, &work);
    }
    if (++c->epoch == 0) {  // epoch wrap: invalidate all overlay slots
        std::fill(c->ov_ep.begin(), c->ov_ep.end(), (uint16_t)0);
        c->epoch = 1;
    }
    OverlayTab tab{c->tab.data(), c->ov_pos.data(), c->ov_ep.data(),
                   c->epoch};
    return compress_greedy_t(wbase, wbase + c->window_size, src_size, dst,
                             dst_cap, 1, tab, true, 0);
}

LZ4R_API void lz4r_dict_free(Lz4rDictCtx* c) { delete c; }

// ---------------------------------------------------------------------------
// Streaming compression context (reference analog: LZ4_loadDict +
// LZ4_compress_fast_continue / LZ4_compress_HC_continue via
// clz4/clz4.go:211-286 and compress/linked.go:309-331). Unlike the
// reference's per-block loadDict, this carries match state ACROSS blocks:
// appended blocks extend the table/chain history, so a linked chain pays
// zero per-block window loading. History lives in one growing buffer that
// slides (keeping the trailing 64 KiB window) when it exceeds its capacity;
// tables rebuild only on a slide — amortized to noise.
// ---------------------------------------------------------------------------

struct Lz4rStream {
    int level;
    std::vector<uint8_t> buf;    // [history | appended blocks]
    size_t len = 0;              // valid bytes
    // greedy state
    std::vector<uint32_t> tab;
    int h5_mode = -1;            // fixed at first block for consistency
    size_t tab_done = 0;         // positions [0, tab_done) are in the table
    // HC state
    ChainFinder cf;
    bool cf_attached = false;
};

namespace {

void stream_rebuild(Lz4rStream* s) {
    // (re)index the current history [0, len) from scratch
    if (s->level > 1) {
        s->cf.reset();
        s->cf.attach(s->buf.data());
        s->cf.insert_upto(s->buf.data() + s->len);
        s->cf_attached = true;
    } else {
        std::fill(s->tab.begin(), s->tab.end(), 0);
        const bool h5 = s->h5_mode == 1;
        const uint8_t* b = s->buf.data();
        size_t n = s->len >= 8 ? s->len - 8 : 0;  // hash5 reads 8 bytes
        for (size_t i = 0; i < n; ++i) {
            uint32_t h = h5 ? hash5(b + i, 16) : hash4(read32(b + i), 16);
            s->tab[h] = (uint32_t)i;
        }
        s->tab_done = s->len;
    }
}

void stream_reserve(Lz4rStream* s, int src_size) {
    size_t need = s->len + (size_t)src_size;
    if (need <= s->buf.size()) return;
    size_t window = s->len > 65536 ? 65536 : s->len;
    size_t cap = 65536 + (size_t)src_size * 8;
    if (cap < (1u << 20)) cap = 1u << 20;
    if (cap < window + (size_t)src_size) cap = window + (size_t)src_size;
    if (window < s->len) {
        // slide: keep the trailing window, drop older history
        std::memmove(s->buf.data(), s->buf.data() + s->len - window, window);
        s->len = window;
    }
    if (s->buf.size() < cap) s->buf.resize(cap);
    stream_rebuild(s);
}

}  // namespace

LZ4R_API Lz4rStream* lz4r_stream_create(int level) {
    auto* s = new Lz4rStream();
    s->level = level;
    if (level <= 1) s->tab.assign((size_t)1 << 16, 0);
    return s;
}

LZ4R_API void lz4r_stream_load_dict(Lz4rStream* s, const uint8_t* dict,
                                    int dict_size) {
    if (dict_size > 65536) {
        dict += dict_size - 65536;
        dict_size = 65536;
    }
    if (dict_size < 0) dict_size = 0;
    if (s->buf.size() < (size_t)dict_size) s->buf.resize(1u << 20);
    std::memcpy(s->buf.data(), dict, dict_size);
    s->len = (size_t)dict_size;
    // table build is deferred: h5_mode is unknown until the first block
}

// Compress the next block of the chain. Returns compressed size, 0 when the
// output doesn't fit in dst_cap (incompressible signal — the caller stores
// the block raw; state stays consistent either way), -1 on bad args.
LZ4R_API int lz4r_stream_compress(Lz4rStream* s, const uint8_t* src,
                                  int src_size, uint8_t* dst, int dst_cap) {
    if (src_size < 0) return -1;
    if (s->level <= 1 && s->h5_mode < 0) {
        s->h5_mode = src_size >= 65536 ? 1 : 0;
        if (s->len) stream_rebuild(s);  // index the pre-loaded dict
    }
    stream_reserve(s, src_size);
    uint8_t* base = s->buf.data();
    uint8_t* at = base + s->len;
    std::memcpy(at, src, src_size);
    s->len += (size_t)src_size;
    int r;
    if (s->level >= 9) {
        // the optimal parser is stateless per block: window = the trailing
        // 64 KiB of history (it rebuilds its finder per block anyway)
        size_t w = (size_t)(at - base) > 65536 ? 65536 : (size_t)(at - base);
        r = compress_opt(at - w, at, src_size, dst, dst_cap, s->level);
    } else if (s->level > 1) {
        if (!s->cf_attached) {
            s->cf.reset();
            s->cf.attach(base);
            s->cf.insert_upto(at);
            s->cf_attached = true;
        }
        r = compress_hc(base, at, src_size, dst, dst_cap, s->level, &s->cf);
        // keep the chain index synced through the block's tail for the
        // next call (compress never inserts the last few positions)
        if (s->len >= 8) s->cf.insert_upto(base + s->len - 8);
    } else {
        FlatTab tab{s->tab.data()};
        r = compress_greedy_t(base, at, src_size, dst, dst_cap, 1, tab,
                              /*preloaded=*/true, s->h5_mode);
        s->tab_done = s->len;
    }
    return r;
}

LZ4R_API void lz4r_stream_free(Lz4rStream* s) { delete s; }

// ---------------------------------------------------------------------------
// Streaming decompression context: decoded history stays in one contiguous
// C-side buffer, so linked-block decode pays no per-block window copies
// (reference analog: the rolling DictT update, compress/decompress.go:
// 127-143 + dict.go:171-184 — but without re-materializing the window).
// ---------------------------------------------------------------------------

struct Lz4rDStream {
    std::vector<uint8_t> buf;
    size_t len = 0;
};

LZ4R_API Lz4rDStream* lz4r_dstream_create(void) { return new Lz4rDStream(); }

LZ4R_API void lz4r_dstream_load_dict(Lz4rDStream* s, const uint8_t* dict,
                                     int dict_size) {
    if (dict_size > 65536) {
        dict += dict_size - 65536;
        dict_size = 65536;
    }
    if (dict_size < 0) dict_size = 0;
    if (s->buf.size() < (size_t)dict_size) s->buf.resize(1u << 20);
    std::memcpy(s->buf.data(), dict, dict_size);
    s->len = (size_t)dict_size;
}

namespace {
void dstream_reserve(Lz4rDStream* s, int out_cap) {
    size_t need = s->len + (size_t)out_cap;
    if (need <= s->buf.size()) return;
    size_t window = s->len > 65536 ? 65536 : s->len;
    if (window < s->len) {
        std::memmove(s->buf.data(), s->buf.data() + s->len - window, window);
        s->len = window;
    }
    size_t cap = 65536 + (size_t)out_cap * 8;
    if (cap < (1u << 20)) cap = 1u << 20;
    if (cap < s->len + (size_t)out_cap) cap = s->len + (size_t)out_cap;
    if (s->buf.size() < cap) s->buf.resize(cap);
}
}  // namespace

// Decompress the next chained block (window = decoded history). On success
// returns the decoded size and points *out at the decoded bytes (valid
// until the next call). Returns -1 on corrupt input.
LZ4R_API int lz4r_dstream_decompress(Lz4rDStream* s, const uint8_t* src,
                                     int src_size, int out_cap,
                                     const uint8_t** out) {
    dstream_reserve(s, out_cap);
    int n = decompress_core(src, src_size, s->buf.data(), s->len, out_cap,
                            nullptr, 0);
    if (n < 0) return -1;
    *out = s->buf.data() + s->len;
    s->len += (size_t)n;
    return n;
}

// Append already-plain bytes to the history (uncompressed blocks in a
// linked frame still extend the window).
LZ4R_API void lz4r_dstream_append(Lz4rDStream* s, const uint8_t* data,
                                  int size) {
    dstream_reserve(s, size);
    std::memcpy(s->buf.data() + s->len, data, size);
    s->len += (size_t)size;
}

LZ4R_API void lz4r_dstream_free(Lz4rDStream* s) { delete s; }

// ---------------------------------------------------------------------------
// xxHash-32
// ---------------------------------------------------------------------------

namespace {
constexpr uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                   P4 = 668265263u, P5 = 374761393u;

inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

inline uint32_t xxh_round(uint32_t acc, uint32_t lane) {
    return rotl32(acc + lane * P2, 13) * P1;
}

inline uint32_t xxh_avalanche(uint32_t h) {
    h ^= h >> 15;
    h *= P2;
    h ^= h >> 13;
    h *= P3;
    h ^= h >> 16;
    return h;
}

inline uint32_t xxh_finalize(uint32_t h, const uint8_t* p, size_t len) {
    while (len >= 4) {
        h = rotl32(h + read32(p) * P3, 17) * P4;
        p += 4;
        len -= 4;
    }
    while (len--) {
        h = rotl32(h + (*p++) * P5, 11) * P1;
    }
    return xxh_avalanche(h);
}
}  // namespace

LZ4R_API uint32_t lz4r_xxh32(const uint8_t* data, size_t len, uint32_t seed) {
    const uint8_t* p = data;
    const uint8_t* const end = data + len;
    uint32_t h;
    if (len >= 16) {
        uint32_t a1 = seed + P1 + P2, a2 = seed + P2, a3 = seed, a4 = seed - P1;
        const uint8_t* const limit = end - 16;
        do {
            a1 = xxh_round(a1, read32(p));
            a2 = xxh_round(a2, read32(p + 4));
            a3 = xxh_round(a3, read32(p + 8));
            a4 = xxh_round(a4, read32(p + 12));
            p += 16;
        } while (p <= limit);
        h = rotl32(a1, 1) + rotl32(a2, 7) + rotl32(a3, 12) + rotl32(a4, 18);
    } else {
        h = seed + P5;
    }
    h += (uint32_t)len;
    return xxh_finalize(h, p, (size_t)(end - p));
}

struct Lz4rXxh32State {
    uint32_t acc[4];
    uint8_t buf[16];
    uint32_t buf_len;
    uint64_t total;
    uint32_t seed;
};

LZ4R_API Lz4rXxh32State* lz4r_xxh32_create(uint32_t seed) {
    auto* s = new Lz4rXxh32State();
    s->acc[0] = seed + P1 + P2;
    s->acc[1] = seed + P2;
    s->acc[2] = seed;
    s->acc[3] = seed - P1;
    s->buf_len = 0;
    s->total = 0;
    s->seed = seed;
    return s;
}

LZ4R_API void lz4r_xxh32_reset(Lz4rXxh32State* s) {
    uint32_t seed = s->seed;
    s->acc[0] = seed + P1 + P2;
    s->acc[1] = seed + P2;
    s->acc[2] = seed;
    s->acc[3] = seed - P1;
    s->buf_len = 0;
    s->total = 0;
}

LZ4R_API void lz4r_xxh32_update(Lz4rXxh32State* s, const uint8_t* data,
                                size_t len) {
    s->total += len;
    if (s->buf_len) {
        uint32_t need = 16 - s->buf_len;
        uint32_t take = len < need ? (uint32_t)len : need;
        std::memcpy(s->buf + s->buf_len, data, take);
        s->buf_len += take;
        data += take;
        len -= take;
        if (s->buf_len < 16) return;
        s->acc[0] = xxh_round(s->acc[0], read32(s->buf));
        s->acc[1] = xxh_round(s->acc[1], read32(s->buf + 4));
        s->acc[2] = xxh_round(s->acc[2], read32(s->buf + 8));
        s->acc[3] = xxh_round(s->acc[3], read32(s->buf + 12));
        s->buf_len = 0;
    }
    while (len >= 16) {
        s->acc[0] = xxh_round(s->acc[0], read32(data));
        s->acc[1] = xxh_round(s->acc[1], read32(data + 4));
        s->acc[2] = xxh_round(s->acc[2], read32(data + 8));
        s->acc[3] = xxh_round(s->acc[3], read32(data + 12));
        data += 16;
        len -= 16;
    }
    if (len) {
        std::memcpy(s->buf, data, len);
        s->buf_len = (uint32_t)len;
    }
}

LZ4R_API uint32_t lz4r_xxh32_digest(const Lz4rXxh32State* s) {
    uint32_t h;
    if (s->total >= 16) {
        h = rotl32(s->acc[0], 1) + rotl32(s->acc[1], 7) + rotl32(s->acc[2], 12) +
            rotl32(s->acc[3], 18);
    } else {
        h = s->seed + P5;
    }
    h += (uint32_t)s->total;
    return xxh_finalize(h, s->buf, s->buf_len);
}

LZ4R_API void lz4r_xxh32_free(Lz4rXxh32State* s) { delete s; }

// ---------------------------------------------------------------------------
// Batched block APIs — host-parallel fan-out lives in Python threads; these
// entry points release the GIL naturally (pure C, no Python).
// ---------------------------------------------------------------------------

LZ4R_API void lz4r_compress_batch(const uint8_t* src, const int64_t* offsets,
                                  const int32_t* sizes, int n_blocks,
                                  uint8_t* dst, const int64_t* dst_offsets,
                                  int32_t dst_cap_each, int32_t* out_sizes,
                                  int level) {
    for (int i = 0; i < n_blocks; ++i) {
        out_sizes[i] = lz4r_compress(src + offsets[i], sizes[i],
                                     dst + dst_offsets[i], dst_cap_each, level,
                                     nullptr, 0);
    }
}

LZ4R_API void lz4r_decompress_batch(const uint8_t* src, const int64_t* offsets,
                                    const int32_t* sizes, int n_blocks,
                                    uint8_t* dst, const int64_t* dst_offsets,
                                    int32_t dst_cap_each, int32_t* out_sizes) {
    for (int i = 0; i < n_blocks; ++i) {
        out_sizes[i] = lz4r_decompress(src + offsets[i], sizes[i],
                                       dst + dst_offsets[i], dst_cap_each,
                                       nullptr, 0);
    }
}

// Pointer-array variants: sources stay in place (no host-side join copy).
LZ4R_API void lz4r_decompress_batch_ptrs(const uint8_t** srcs,
                                         const int32_t* sizes, int n_blocks,
                                         uint8_t* dst,
                                         const int64_t* dst_offsets,
                                         int32_t dst_cap_each,
                                         int32_t* out_sizes) {
    for (int i = 0; i < n_blocks; ++i) {
        out_sizes[i] = lz4r_decompress(srcs[i], sizes[i],
                                       dst + dst_offsets[i], dst_cap_each,
                                       nullptr, 0);
    }
}

LZ4R_API void lz4r_compress_batch_ptrs(const uint8_t** srcs,
                                       const int32_t* sizes, int n_blocks,
                                       uint8_t* dst,
                                       const int64_t* dst_offsets,
                                       int32_t dst_cap_each,
                                       int32_t* out_sizes, int level) {
    for (int i = 0; i < n_blocks; ++i) {
        out_sizes[i] = lz4r_compress(srcs[i], sizes[i], dst + dst_offsets[i],
                                     dst_cap_each, level, nullptr, 0);
    }
}

// ---------------------------------------------------------------------------
// Device large-block support (host control plane).
//
// The TPU encode/decode kernels are SMEM-resident and sized for <= 64 KiB
// chunks, but the frame format's block-size classes go to 4 MiB
// (reference: internal/pkg/descriptor/index.go:92-125, default 4 MiB
// plz4_opts.go:238-255). A large block is handled as K chunks of `chunk`
// bytes of OUTPUT each:
//
//   * encode: every chunk is encoded INDEPENDENTLY (in parallel on device)
//     through the window-prefix kernel with the previous chunk as window —
//     for chunk >= 64 KiB the true LZ4 window of every position is fully
//     contained in [prev chunk | current chunk], so per-chunk streams carry
//     exactly the matches a monolithic encoder could reach.
//     lz4r_stitch_chunks then merges the K per-chunk streams into ONE
//     standard LZ4 block stream: a chunk stream ends with a literals-only
//     sequence (not representable mid-block), so each chunk's trailing
//     literal run is carried into the next chunk's first sequence token.
//
//   * decode: lz4r_chunk_split walks the sequence structure of a compressed
//     block (control-plane only: it skips literal bytes, ~10x cheaper than
//     decoding) and cuts it into records each producing <= chunk bytes of
//     output, with carry metadata for sequences that cross a cut: pending
//     literal bytes at the slice start, header bytes to skip, and a pending
//     match (offset kept, length split). The device then decodes the
//     records sequentially in one dispatch (lax.scan carrying the 64 KiB
//     window); bulk byte movement stays on device.
// ---------------------------------------------------------------------------

// Merge K chunk streams into one LZ4 block stream for src[0..src_len).
// streams+offs[i]..+slens[i] is chunk i's stream (a complete block stream
// of src[i*chunk .. min((i+1)*chunk, src_len))). Returns the stitched
// length, or -1 on malformed input / insufficient dst_cap.
LZ4R_API int64_t lz4r_stitch_chunks(const uint8_t* src, int64_t src_len,
                                    int32_t chunk, const uint8_t* streams,
                                    const int64_t* offs, const int32_t* slens,
                                    int k, uint8_t* dst, int64_t dst_cap) {
    uint8_t* op = dst;
    uint8_t* const oend = dst + dst_cap;
    int64_t pending = 0;  // literal bytes pending, ending at i*chunk
    for (int i = 0; i < k; ++i) {
        const uint8_t* s = streams + offs[i];
        const uint8_t* const send = s + slens[i];
        const int64_t cstart = (int64_t)i * chunk;
        int64_t clen_i = src_len - cstart;
        if (clen_i > chunk) clen_i = chunk;
        if (clen_i <= 0) break;
        // one forward parse: first sequence shape + final literal run
        const uint8_t* ip = s;
        const uint8_t* first_tok = nullptr;   // first sequence WITH a match
        int64_t first_lit = 0;
        const uint8_t* first_match = nullptr; // its offset/matchext bytes
        const uint8_t* last_tok = nullptr;    // final literals-only sequence
        int64_t last_lit = 0;
        while (ip < send) {
            const uint8_t* tok = ip;
            uint32_t t = *ip++;
            int64_t lit = t >> 4;
            if (lit == 15) {
                uint8_t b;
                do {
                    if (ip >= send) return -1;
                    b = *ip++;
                    lit += b;
                } while (b == 255);
            }
            if (ip + lit > send) return -1;
            const uint8_t* litp = ip;
            ip += lit;
            if (ip == send) {  // final sequence: literals only
                last_tok = tok;
                last_lit = lit;
                break;
            }
            if (!first_tok) {
                first_tok = tok;
                first_lit = lit;
                first_match = ip;
            }
            if (ip + 2 > send) return -1;
            ip += 2;  // match offset
            if ((t & 15) == 15) {
                uint8_t b;
                do {
                    if (ip >= send) return -1;
                    b = *ip++;
                } while (b == 255);
            }
        }
        if (!last_tok) return -1;  // stream did not end in literals
        if (!first_tok) {
            // pure-literal chunk: the whole chunk joins the pending run
            if (last_lit != clen_i) return -1;
            pending += clen_i;
            continue;
        }
        // rewritten first sequence: pending + first_lit literals (the
        // bytes are contiguous in src, ending at cstart + first_lit)
        int64_t newlit = pending + first_lit;
        int64_t hdr = 1 + (newlit >= 15 ? 1 + (newlit - 15) / 255 : 0);
        if (op + hdr + newlit > oend) return -1;
        uint8_t mt = first_tok[0] & 0x0F;
        if (newlit >= 15) {
            *op++ = (uint8_t)(0xF0 | mt);
            int64_t v = newlit - 15;
            while (v >= 255) {
                *op++ = 255;
                v -= 255;
            }
            *op++ = (uint8_t)v;
        } else {
            *op++ = (uint8_t)((newlit << 4) | mt);
        }
        memcpy(op, src + cstart - pending, (size_t)newlit);
        op += newlit;
        // middle of the stream verbatim: first seq's match fields through
        // the byte before the final literals-only token
        int64_t mid = last_tok - first_match;
        if (op + mid > oend) return -1;
        memcpy(op, first_match, (size_t)mid);
        op += mid;
        pending = last_lit;  // ends at cstart + clen_i
    }
    // single final literals-only sequence for the whole block
    int64_t hdr = 1 + (pending >= 15 ? 1 + (pending - 15) / 255 : 0);
    if (op + hdr + pending > oend) return -1;
    if (pending >= 15) {
        *op++ = 0xF0;
        int64_t v = pending - 15;
        while (v >= 255) {
            *op++ = 255;
            v -= 255;
        }
        *op++ = (uint8_t)v;
    } else {
        *op++ = (uint8_t)(pending << 4);
    }
    memcpy(op, src + src_len - pending, (size_t)pending);
    op += pending;
    return op - dst;
}

// Record layout (8 int64 per record, numpy-friendly):
//   [0] in_off   offset of the record's input slice in the block stream
//   [1] in_len   slice length
//   [2] pre_lit  literal bytes at slice start copied verbatim to output
//   [3] pre_skip header bytes after them to skip (the crossing sequence's
//                match offset + length-extension bytes, already parsed)
//   [4] pre_moff pending match offset (0 = none)
//   [5] pre_mlen pending match length (executed before the main loop)
//   [6] out_len  decoded bytes this record must produce (== chunk except
//                the final record)
//   [7] reserved (0)
//
// Record kernel semantics (ops/decode_pallas carry variant): copy pre_lit
// bytes from the slice start, skip pre_skip bytes, execute the pre-match,
// then run the normal sequence loop with literal/match copies CLAMPED at
// out_len (a clamped copy ends the record; the remainder is the next
// record's carry). A record is valid iff it consumes exactly in_len input
// and produces exactly out_len output.
//
// Returns the record count, or -1 on malformed input / > max_recs records.
LZ4R_API int lz4r_chunk_split(const uint8_t* comp, int64_t clen,
                              int32_t chunk, int64_t* recs, int max_recs) {
    const uint8_t* ip = comp;
    const uint8_t* const iend = comp + clen;
    int nrec = 0;
    int64_t op = 0;        // global output position
    int64_t rec_out0 = 0;  // output position where the current record began
    int64_t pre_lit = 0, pre_skip = 0, pre_moff = 0, pre_mlen = 0;
    const uint8_t* rec_in = ip;
    auto emit = [&](const uint8_t* in_end) -> bool {
        if (nrec >= max_recs) return false;
        int64_t* r = recs + (int64_t)nrec * 8;
        r[0] = rec_in - comp;
        r[1] = in_end - rec_in;
        r[2] = pre_lit;
        r[3] = pre_skip;
        r[4] = pre_moff;
        r[5] = pre_mlen;
        r[6] = op - rec_out0;
        r[7] = 0;
        ++nrec;
        return true;
    };
    while (ip < iend) {
        const uint8_t* tok = ip;
        if (op == rec_out0 + chunk) {
            // boundary falls exactly on a sequence start: clean cut, the
            // next record begins at this token with no carries
            if (!emit(tok)) return -1;
            rec_out0 = op;
            rec_in = tok;
            pre_lit = pre_skip = pre_moff = pre_mlen = 0;
        }
        uint32_t t = *ip++;
        int64_t lit = t >> 4;
        if (lit == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                lit += b;
            } while (b == 255);
        }
        if (ip + lit > iend) return -1;
        const uint8_t* litp = ip;
        ip += lit;
        // match header (parsed up front so a literal-cut record can carry
        // the match without re-parsing)
        int64_t moff = 0, mlen = 0;
        const uint8_t* hdrp = ip;
        if (ip < iend) {  // not the final literals-only sequence
            if (ip + 2 > iend) return -1;
            moff = ip[0] | ((int64_t)ip[1] << 8);
            ip += 2;
            mlen = (t & 15) + 4;
            if ((t & 15) == 15) {
                uint8_t b;
                do {
                    if (ip >= iend) return -1;
                    b = *ip++;
                    mlen += b;
                } while (b == 255);
            }
            // validity bound includes the 64 KiB pre-block window (frame
            // dictionary / linked predecessor); the record decoder still
            // rejects offsets beyond the ACTUAL window it was given
            if (moff == 0 || moff > op + lit + 65536) return -1;
        }
        const int64_t hdr_len = ip - hdrp;
        // place the literals, cutting as needed (each intermediate record
        // is pure carried literals)
        bool cut_in_lits = false;
        int64_t done_lit = 0;
        while (op + (lit - done_lit) > rec_out0 + chunk) {
            int64_t take = rec_out0 + chunk - op;
            op += take;
            done_lit += take;
            if (!emit(litp + done_lit)) return -1;
            rec_out0 = op;
            rec_in = litp + done_lit;
            int64_t rem = lit - done_lit;
            pre_lit = rem < chunk ? rem : chunk;
            pre_skip = pre_moff = pre_mlen = 0;
            cut_in_lits = true;
        }
        op += lit - done_lit;
        // place the match
        if (mlen > 0) {
            int64_t room = rec_out0 + chunk - op;
            int64_t place = mlen < room ? mlen : room;
            if (cut_in_lits) {
                // the current record's prologue owns this sequence: it
                // consumes the header via pre_skip and runs the match (or
                // its first part) from the carry fields
                pre_skip = hdr_len;
                pre_moff = moff;
                pre_mlen = place;
            }
            // else: the record's normal loop parses the sequence and
            // clamps the match copy at out_len itself
            op += place;
            mlen -= place;
            while (mlen > 0) {
                if (!emit(ip)) return -1;  // record full at the cut
                rec_out0 = op;
                rec_in = ip;
                int64_t part = mlen < chunk ? mlen : (int64_t)chunk;
                pre_lit = 0;
                pre_skip = 0;
                pre_moff = moff;
                pre_mlen = part;
                op += part;
                mlen -= part;
            }
        }
    }
    if (ip != iend) return -1;
    if (!emit(iend)) return -1;
    return nrec;
}
