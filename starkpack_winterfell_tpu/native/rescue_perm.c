/* Generic Rescue-Prime permutation over a <= 64-bit prime field.
 *
 * Host-side transcript/Merkle hashing for the algebraic hashers
 * (Rp64_256: crypto/src/hash/rescue/rp64_256/mod.rs, Rp62_248:
 * rp62_248/mod.rs, RpJive64_256: rp_jive64_256/mod.rs in the reference)
 * is inherently sequential python-int math (~2.4 ms per permutation: the
 * inverse s-box is a ~62-bit modexp per element).  This kernel runs the
 * identical round function in C (~2000 u128 mulmods per permutation), a
 * ~100x host-path speedup; the python implementations remain as the
 * fallback when no C compiler is available.
 *
 * A "slot" holds one parameterization (modulus, width, rounds, alpha,
 * inv_alpha, MDS, ARK1, ARK2); each hasher registers its own slot once.
 */

typedef unsigned long long u64;
typedef unsigned __int128 u128;

#define MAX_WIDTH 16
#define MAX_ROUNDS 16
#define MAX_SLOTS 8

typedef struct {
    u64 P;
    int width;
    int rounds;
    u64 alpha;
    u64 inv_alpha;
    u64 mds[MAX_WIDTH * MAX_WIDTH];
    u64 ark1[MAX_ROUNDS * MAX_WIDTH];
    u64 ark2[MAX_ROUNDS * MAX_WIDTH];
} PermCfg;

static PermCfg cfgs[MAX_SLOTS];

#define GOLDILOCKS 0xFFFFFFFF00000001ULL

/* 128->64 reduction for P = 2^64 - 2^32 + 1 using 2^64 = 2^32 - 1 and
 * 2^96 = -1 (mod P); returns a canonical (< P) value. */
static inline u64 gl_mulmod(u64 x, u64 y) {
    u128 xy = (u128)x * y;
    u64 lo = (u64)xy, hi = (u64)(xy >> 64);
    u64 a = hi & 0xFFFFFFFFULL, b = hi >> 32;
    u64 t1 = (a << 32) - a; /* a*(2^32-1) < 2^64 */
    u64 s = lo + t1;
    if (s < lo) s += 0xFFFFFFFFULL; /* wrap adds 2^64 = 2^32-1; no re-wrap */
    s = s >= b ? s - b : s - b + GOLDILOCKS;
    return s >= GOLDILOCKS ? s - GOLDILOCKS : s;
}

/* `gl` is a compile-time constant at every call site below (the permute
 * body is cloned for goldilocks/generic), so the branch vanishes. */
static inline u64 mulmod2(u64 a, u64 b, u64 P, const int gl) {
    return gl ? gl_mulmod(a, b) : (u64)(((u128)a * b) % P);
}

static inline u64 mulmod(u64 a, u64 b, u64 P) {
    return mulmod2(a, b, P, P == GOLDILOCKS);
}

static inline u64 powmod2(u64 a, u64 e, u64 P, const int gl) {
    u64 r = 1;
    while (e) {
        if (e & 1) r = mulmod2(r, a, P, gl);
        a = mulmod2(a, a, P, gl);
        e >>= 1;
    }
    return r;
}

void rp_init(int slot, u64 P, int width, int rounds, u64 alpha,
             u64 inv_alpha, const u64 *mds, const u64 *ark1,
             const u64 *ark2) {
    PermCfg *c = &cfgs[slot];
    c->P = P;
    c->width = width;
    c->rounds = rounds;
    c->alpha = alpha;
    c->inv_alpha = inv_alpha;
    for (int i = 0; i < width * width; i++) c->mds[i] = mds[i];
    for (int i = 0; i < rounds * width; i++) {
        c->ark1[i] = ark1[i];
        c->ark2[i] = ark2[i];
    }
}

static inline void mds_apply(const PermCfg *c, const u64 *in, u64 *out,
                             const int gl) {
    int w = c->width;
    u64 P = c->P;
    for (int i = 0; i < w; i++) {
        u128 acc = 0;
        const u64 *row = &c->mds[i * w];
        /* per-term reduction: a single product can be ~2^128 for a 64-bit
         * modulus, so products cannot be accumulated unreduced; the sum of
         * w <= 16 reduced terms stays < 2^68 */
        for (int j = 0; j < w; j++) acc += mulmod2(row[j], in[j], P, gl);
        out[i] = (u64)(acc % P);
    }
}

static inline void permute_one_impl(const PermCfg *c, u64 *s, const int gl) {
    int w = c->width;
    u64 P = c->P;
    u64 tmp[MAX_WIDTH];
    for (int r = 0; r < c->rounds; r++) {
        for (int i = 0; i < w; i++) s[i] = powmod2(s[i], c->alpha, P, gl);
        mds_apply(c, s, tmp, gl);
        for (int i = 0; i < w; i++) {
            u64 v = tmp[i] + c->ark1[r * w + i];
            /* v < 2P; a u64 wrap (P > 2^63) is detected by v < tmp[i] and
             * v - P is still correct mod 2^64 */
            s[i] = v >= P || v < tmp[i] ? v - P : v;
        }
        for (int i = 0; i < w; i++) s[i] = powmod2(s[i], c->inv_alpha, P, gl);
        mds_apply(c, s, tmp, gl);
        for (int i = 0; i < w; i++) {
            u64 v = tmp[i] + c->ark2[r * w + i];
            s[i] = v >= P || v < tmp[i] ? v - P : v;
        }
    }
}

static void permute_one(const PermCfg *c, u64 *s) {
    if (c->P == GOLDILOCKS)
        permute_one_impl(c, s, 1);
    else
        permute_one_impl(c, s, 0);
}

void rp_permute_batch(int slot, u64 *states, u64 n) {
    const PermCfg *c = &cfgs[slot];
#pragma omp parallel for schedule(static) if (n > 64)
    for (u64 k = 0; k < n; k++) permute_one(c, states + k * c->width);
}

/* Sponge helpers: absorb pre-chunked field elements rate-wide and squeeze
 * the first digest_size elements.  `elements` is n_rows x row_len (same
 * layout for every row — the Merkle/words batch case); the count tag and
 * rate/digest geometry are passed in so one entry point serves both the
 * capacity-first (Rp64_256/Jive) and legacy rate-first (Rp62_248)
 * layouts (tag_index selects the tag position). */
void rp_hash_elements_batch(int slot, const u64 *elements, u64 n_rows,
                            u64 row_len, int rate_start, int rate,
                            int tag_index, int digest_start, int digest_size,
                            u64 *out) {
    const PermCfg *c = &cfgs[slot];
    u64 P = c->P;
#pragma omp parallel for schedule(static) if (n_rows > 64)
    for (u64 r = 0; r < n_rows; r++) {
        u64 s[MAX_WIDTH] = {0};
        s[tag_index] = row_len % P;
        const u64 *row = elements + r * row_len;
        int i = 0;
        for (u64 k = 0; k < row_len; k++) {
            u64 v = s[rate_start + i] + row[k];
            if (v >= P || v < row[k]) v -= P;
            s[rate_start + i] = v;
            if (++i == rate) {
                permute_one(c, s);
                i = 0;
            }
        }
        if (i > 0) permute_one(c, s);
        for (int d = 0; d < digest_size; d++)
            out[r * digest_size + d] = s[digest_start + d];
    }
}

/* Two-digest merge: state = left || right placed at rate_start, tag = 2 *
 * digest_size, one permutation.  Matches Rp64_256::merge / Rp62_248::merge. */
void rp_merge_batch(int slot, const u64 *left, const u64 *right, u64 n,
                    int rate_start, int tag_index, int digest_start,
                    int digest_size, u64 *out) {
    const PermCfg *c = &cfgs[slot];
#pragma omp parallel for schedule(static) if (n > 64)
    for (u64 k = 0; k < n; k++) {
        u64 s[MAX_WIDTH] = {0};
        for (int d = 0; d < digest_size; d++) {
            s[rate_start + d] = left[k * digest_size + d];
            s[rate_start + digest_size + d] = right[k * digest_size + d];
        }
        s[tag_index] = 2 * digest_size;
        permute_one(c, s);
        for (int d = 0; d < digest_size; d++)
            out[k * digest_size + d] = s[digest_start + d];
    }
}
