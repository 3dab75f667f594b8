/* Goldilocks (p = 2^64 - 2^32 + 1) batch modular arithmetic on (lo, hi)
 * u32 plane pairs — the host-pipeline hot path (prover/pipeline.py numpy
 * tier).  The numpy formulation pays ~50 full-array passes per multiply
 * (16-bit partial products + carry chains, since the same code must trace
 * on the 32-bit TPU path); here a multiply is one __uint128_t product and
 * one EPS-fold per element, single pass, OpenMP over rows.
 *
 * The b operand may be a repeating pattern: nb == n for elementwise, or
 * any divisor of n to tile a suffix-broadcast row (NTT twiddle rows,
 * scalar constants via nb == 1) — callers guarantee nb | n.
 *
 * Reduction identity (same as ops/gl64.py _reduce128): with x = hi*2^64 +
 * lo, 2^64 === 2^32 - 1 (mod p), so x === lo - hi_hi + hi_lo*(2^32-1),
 * folded twice and canonicalized.
 */
#include <stddef.h>
#include <stdint.h>

#define P64 0xFFFFFFFF00000001ULL
#define EPS 0xFFFFFFFFULL /* 2^32 - 1 */

static inline uint64_t gl_reduce128(unsigned __int128 x) {
    uint64_t lo = (uint64_t)x;
    uint64_t hi = (uint64_t)(x >> 64);
    uint64_t hi_hi = hi >> 32;
    uint64_t hi_lo = hi & EPS;
    uint64_t t0 = lo - hi_hi;
    if (lo < hi_hi) t0 -= EPS; /* borrow: subtract 2^64 - p = EPS once */
    uint64_t t1 = hi_lo * EPS;
    uint64_t s = t0 + t1;
    if (s < t1) s += EPS; /* carry: add 2^64 - p; cannot re-carry */
    if (s >= P64) s -= P64;
    return s;
}

static inline uint64_t rd(const uint32_t *lo, const uint32_t *hi, size_t i) {
    return (uint64_t)lo[i] | ((uint64_t)hi[i] << 32);
}

static inline void wr(uint32_t *lo, uint32_t *hi, size_t i, uint64_t v) {
    lo[i] = (uint32_t)v;
    hi[i] = (uint32_t)(v >> 32);
}

void gl_mulmod(const uint32_t *alo, const uint32_t *ahi, const uint32_t *blo,
               const uint32_t *bhi, uint32_t *rlo, uint32_t *rhi, size_t n,
               size_t nb) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t i = 0; i < n; i++) {
        uint64_t a = rd(alo, ahi, i);
        uint64_t b = rd(blo, bhi, i % nb);
        wr(rlo, rhi, i, gl_reduce128((unsigned __int128)a * b));
    }
}

void gl_addmod(const uint32_t *alo, const uint32_t *ahi, const uint32_t *blo,
               const uint32_t *bhi, uint32_t *rlo, uint32_t *rhi, size_t n,
               size_t nb) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t i = 0; i < n; i++) {
        uint64_t a = rd(alo, ahi, i);
        uint64_t b = rd(blo, bhi, i % nb);
        uint64_t s = a + b;
        if (s < a) s += EPS; /* wrapped past 2^64: fold; cannot re-carry */
        if (s >= P64) s -= P64;
        wr(rlo, rhi, i, s);
    }
}

void gl_submod(const uint32_t *alo, const uint32_t *ahi, const uint32_t *blo,
               const uint32_t *bhi, uint32_t *rlo, uint32_t *rhi, size_t n,
               size_t nb) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t i = 0; i < n; i++) {
        uint64_t a = rd(alo, ahi, i);
        uint64_t b = rd(blo, bhi, i % nb);
        uint64_t d = a - b;
        if (a < b) d -= EPS; /* borrow: subtract 2^64 - p */
        wr(rlo, rhi, i, d);
    }
}

/* Synthetic division of each row by (x - z), p(z) == 0 (the DEEP
 * composition quotient): Horner from the top, sequential over the row,
 * parallel over rows.  out[i] = sum_{j>i} p[j] z^(j-i-1); out[n-1] = 0. */
void gl_syndiv(const uint32_t *plo, const uint32_t *phi, uint64_t z,
               uint32_t *olo, uint32_t *ohi, size_t rows, size_t n) {
#pragma omp parallel for schedule(static) if (rows * n >= 16384)
    for (size_t r = 0; r < rows; r++) {
        size_t base = r * n;
        uint64_t acc = 0;
        for (size_t i = n; i-- > 0;) {
            wr(olo, ohi, base + i, acc);
            uint64_t t = gl_reduce128((unsigned __int128)acc * z);
            uint64_t p = rd(plo, phi, base + i);
            acc = t + p;
            if (acc < p) acc += EPS;
            if (acc >= P64) acc -= P64;
        }
    }
}

static inline uint64_t gl_powmod(uint64_t a, uint64_t e) {
    uint64_t acc = 1;
    while (e) {
        if (e & 1) acc = gl_reduce128((unsigned __int128)acc * a);
        e >>= 1;
        if (e) a = gl_reduce128((unsigned __int128)a * a);
    }
    return acc;
}

/* Montgomery batch inversion over the flattened array: one modular
 * inversion total; zero entries produce zero outputs. */
void gl_batchinv(const uint32_t *alo, const uint32_t *ahi, uint32_t *rlo,
                 uint32_t *rhi, size_t n) {
    /* prefix products of the nonzero entries */
    uint64_t run = 1;
    for (size_t i = 0; i < n; i++) {
        uint64_t v = rd(alo, ahi, i);
        wr(rlo, rhi, i, run); /* stash prefix-before in the output */
        if (v) run = gl_reduce128((unsigned __int128)run * v);
    }
    uint64_t inv = gl_powmod(run, P64 - 2);
    for (size_t i = n; i-- > 0;) {
        uint64_t v = rd(alo, ahi, i);
        if (v) {
            uint64_t pre = rd(rlo, rhi, i);
            wr(rlo, rhi, i, gl_reduce128((unsigned __int128)inv * pre));
            inv = gl_reduce128((unsigned __int128)inv * v);
        } else {
            wr(rlo, rhi, i, 0);
        }
    }
}

/* Last-axis gather: out[r, j] = x[r, idx[j]] — the NTT bit-reversal
 * permute (numpy's take on a 64 MB plane runs single-threaded at <1 GB/s;
 * this is the same access pattern with all cores). */
void gl_gather(const uint32_t *xlo, const uint32_t *xhi, const int32_t *idx,
               uint32_t *olo, uint32_t *ohi, size_t rows, size_t n) {
#pragma omp parallel for schedule(static) if (rows * n >= 16384)
    for (size_t r = 0; r < rows; r++) {
        size_t base = r * n;
        for (size_t j = 0; j < n; j++) {
            size_t src = base + (size_t)idx[j];
            olo[base + j] = xlo[src];
            ohi[base + j] = xhi[src];
        }
    }
}

/* Fixed small exponent, single pass (the AIR-side x^7 / x^3 chains). */
void gl_expmod(const uint32_t *alo, const uint32_t *ahi, uint64_t e,
               uint32_t *rlo, uint32_t *rhi, size_t n) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t i = 0; i < n; i++) {
        uint64_t a = rd(alo, ahi, i);
        uint64_t base = a, acc = 0;
        int started = 0;
        uint64_t ee = e;
        while (ee) {
            if (ee & 1) {
                if (!started) {
                    acc = base;
                    started = 1;
                } else {
                    acc = gl_reduce128((unsigned __int128)acc * base);
                }
            }
            ee >>= 1;
            if (ee)
                base = gl_reduce128((unsigned __int128)base * base);
        }
        wr(rlo, rhi, i, started ? acc : 1);
    }
}

/* One radix-2 DIT butterfly stage, single pass: x viewed as rows of m
 * elements (n total, m | n), half = m/2, twiddles tw of length half:
 *   t            = x[r, half+j] * tw[j]
 *   out[r, j]    = x[r, j] + t
 *   out[r, h+j]  = x[r, j] - t
 * Replaces 3 full-array numpy ops + 2 slicing copies + 1 concatenate per
 * stage in ops/ntt.py ntt_components' host path. */
void gl_ntt_stage(const uint32_t *xlo, const uint32_t *xhi,
                  const uint32_t *twlo, const uint32_t *twhi, uint32_t *olo,
                  uint32_t *ohi, size_t n, size_t m) {
    size_t half = m / 2;
    size_t rows = n / m;
#pragma omp parallel for schedule(static) if (rows * n >= 16384)
    for (size_t r = 0; r < rows; r++) {
        size_t base = r * m;
        for (size_t j = 0; j < half; j++) {
            uint64_t e = rd(xlo, xhi, base + j);
            uint64_t o = rd(xlo, xhi, base + half + j);
            uint64_t w = rd(twlo, twhi, j);
            uint64_t t = gl_reduce128((unsigned __int128)o * w);
            uint64_t s = e + t;
            if (s < e) s += EPS;
            if (s >= P64) s -= P64;
            uint64_t d = e - t;
            if (e < t) d -= EPS;
            wr(olo, ohi, base + j, s);
            wr(olo, ohi, base + half + j, d);
        }
    }
}

/* Dense matrix-vector over the state axis, single pass: out_i[k] =
 * sum_j m[i*w + j] * state_j[k]  (mod p).  Serves the AIR-side MDS /
 * INV_MDS applications (constraint evaluation does two w x w applications
 * per domain point; the per-term numpy version is w*w full-array passes).
 * state/out are arrays of 2*w plane pointers: lo0, hi0, lo1, hi1, ... */
void gl_matvec(size_t w, const uint32_t **state, const uint64_t *m,
               uint32_t **out, size_t n) {
    /* small-constant matrices (Rescue's circulant MDS has entries < 2^5)
     * accumulate raw 64x32-bit products in a u128 — w*2^96 < 2^128 for
     * w <= 16 — and reduce ONCE per output */
    int small = 1;
    for (size_t i = 0; i < w * w; i++)
        if (m[i] >> 32) { small = 0; break; }
    if (small) {
#pragma omp parallel for schedule(static) if (n >= 16384)
        for (size_t k = 0; k < n; k++) {
            uint64_t s[16];
            for (size_t j = 0; j < w; j++)
                s[j] = (uint64_t)state[2 * j][k] |
                       ((uint64_t)state[2 * j + 1][k] << 32);
            for (size_t i = 0; i < w; i++) {
                unsigned __int128 acc = 0;
                const uint64_t *row = m + i * w;
                for (size_t j = 0; j < w; j++)
                    acc += (unsigned __int128)s[j] * row[j];
                uint64_t v = gl_reduce128(acc);
                out[2 * i][k] = (uint32_t)v;
                out[2 * i + 1][k] = (uint32_t)(v >> 32);
            }
        }
        return;
    }
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t k = 0; k < n; k++) {
        uint64_t s[16];
        for (size_t j = 0; j < w; j++)
            s[j] = (uint64_t)state[2 * j][k] |
                   ((uint64_t)state[2 * j + 1][k] << 32);
        for (size_t i = 0; i < w; i++) {
            uint64_t acc = 0;
            const uint64_t *row = m + i * w;
            for (size_t j = 0; j < w; j++) {
                uint64_t t = gl_reduce128((unsigned __int128)s[j] * row[j]);
                acc += t;
                if (acc < t) acc += EPS; /* fold the 2^64 wrap */
                if (acc >= P64) acc -= P64;
            }
            out[2 * i][k] = (uint32_t)acc;
            out[2 * i + 1][k] = (uint32_t)(acc >> 32);
        }
    }
}

/* Fused dot product along the column axis: out[k] = sum_j state_j[k] * v[j]
 * (mod p).  One pass over the data instead of w mul + (w-1) add full-array
 * passes — the DEEP composer's per-query column combination.  state is one
 * contiguous block shaped (w, 2, n): plane j's lo limbs at state + j*2n,
 * hi limbs at state + j*2n + n.  Reduced products are < 2^64, so the u128
 * accumulator is exact for w < 2^64. */
void gl_dot(size_t w, const uint32_t *state, const uint64_t *v,
            uint32_t *out_lo, uint32_t *out_hi, size_t n) {
#pragma omp parallel for schedule(static) if (n * w >= 16384)
    for (size_t k = 0; k < n; k++) {
        unsigned __int128 acc = 0;
        for (size_t j = 0; j < w; j++) {
            const uint32_t *pl = state + j * 2 * n;
            uint64_t s = (uint64_t)pl[k] | ((uint64_t)pl[n + k] << 32);
            acc += gl_reduce128((unsigned __int128)s * v[j]);
        }
        uint64_t r = gl_reduce128(acc);
        out_lo[k] = (uint32_t)r;
        out_hi[k] = (uint32_t)(r >> 32);
    }
}
