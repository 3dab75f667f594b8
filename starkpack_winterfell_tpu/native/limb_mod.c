/* Batch modular arithmetic for the limb fields on u32 plane tuples —
 * the host-pipeline hot path for f62 (p = 2^62 - 111*2^39 + 1, one u64)
 * and f128 (p = 2^128 - 45*2^40 + 1, a u64 pair).  The numpy formulation
 * (ops/limb_field.py _mul_limbs + _reduce) pays dozens of full-array
 * passes per multiply; here a multiply is one (u128) product chain + an
 * E-fold per element, single pass, OpenMP over elements/rows.
 *
 * b operands may repeat with period nb (nb | n): twiddle rows, scalars.
 * The fused NTT stage and the dense matvec mirror gl64_mod.c.
 */
#include <stddef.h>
#include <stdint.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

/* ---------------- f62 ---------------- */

#define P62 4611624995532046337ULL
static const u64 E62 = (u64)((((u128)1) << 64) % P62); /* 2^64 mod p */

static inline u64 f62_reduce(u128 x) {
    while (x >> 64)
        x = (u128)(u64)x + (u128)(u64)(x >> 64) * E62;
    u64 r = (u64)x;
    while (r >= P62) r -= P62;
    return r;
}

static inline u64 rd62(const u32 *lo, const u32 *hi, size_t i) {
    return (u64)lo[i] | ((u64)hi[i] << 32);
}

static inline void wr62(u32 *lo, u32 *hi, size_t i, u64 v) {
    lo[i] = (u32)v;
    hi[i] = (u32)(v >> 32);
}

void f62_mulmod(const u32 *alo, const u32 *ahi, const u32 *blo,
                const u32 *bhi, u32 *rlo, u32 *rhi, size_t n, size_t nb) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t i = 0; i < n; i++) {
        u64 a = rd62(alo, ahi, i), b = rd62(blo, bhi, i % nb);
        wr62(rlo, rhi, i, f62_reduce((u128)a * b));
    }
}

void f62_ntt_stage(const u32 *xlo, const u32 *xhi, const u32 *twlo,
                   const u32 *twhi, u32 *olo, u32 *ohi, size_t n, size_t m) {
    size_t half = m / 2, rows = n / m;
#pragma omp parallel for schedule(static) if (rows * n >= 16384)
    for (size_t r = 0; r < rows; r++) {
        size_t base = r * m;
        for (size_t j = 0; j < half; j++) {
            u64 e = rd62(xlo, xhi, base + j);
            u64 o = rd62(xlo, xhi, base + half + j);
            u64 w = rd62(twlo, twhi, j);
            u64 t = f62_reduce((u128)o * w);
            u64 s = e + t;
            if (s >= P62) s -= P62;
            u64 d = e >= t ? e - t : e + P62 - t;
            wr62(olo, ohi, base + j, s);
            wr62(olo, ohi, base + half + j, d);
        }
    }
}

/* m entries are u64 (< p); state/out are plane-pointer arrays lo0, hi0, ... */
void f62_matvec(size_t w, const u32 **state, const u64 *m, u32 **out,
                size_t n) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t k = 0; k < n; k++) {
        u64 s[16];
        for (size_t j = 0; j < w; j++)
            s[j] = rd62(state[2 * j], state[2 * j + 1], k);
        for (size_t i = 0; i < w; i++) {
            u128 acc = 0; /* sum of w values < p^2 < 2^124: w*p^2 < 2^128 */
            const u64 *row = m + i * w;
            for (size_t j = 0; j < w; j++) acc += (u128)s[j] * row[j];
            wr62(out[2 * i], out[2 * i + 1], k, f62_reduce(acc));
        }
    }
}

/* ---------------- f128 ---------------- */

static const u128 DELTA = ((u128)45 << 40) - 1; /* 2^128 mod p */
#define P128_LO 0xffffd30000000001ULL
#define P128_HI 0xffffffffffffffffULL

static inline u128 p128(void) { return ((u128)P128_HI << 64) | P128_LO; }

static inline u128 f128_reduce256(u128 hi, u128 lo) {
    const u128 P = p128();
    while (hi) {
        u64 h1 = (u64)(hi >> 64), h0 = (u64)hi;
        u128 t0 = (u128)h0 * DELTA;
        u128 t1 = (u128)h1 * DELTA;
        u128 t1lo = t1 << 64;
        u128 nlo = t0 + t1lo;
        u128 nhi = (t1 >> 64) + (nlo < t1lo ? 1 : 0);
        u128 s = lo + nlo;
        nhi += (s < nlo) ? 1 : 0;
        lo = s;
        hi = nhi;
    }
    if (lo >= P) lo -= P;
    return lo;
}

static inline u128 f128_mul(u128 a, u128 b) {
    u64 a0 = (u64)a, a1 = (u64)(a >> 64);
    u64 b0 = (u64)b, b1 = (u64)(b >> 64);
    u128 p00 = (u128)a0 * b0;
    u128 p01 = (u128)a0 * b1;
    u128 p10 = (u128)a1 * b0;
    u128 p11 = (u128)a1 * b1;
    u128 mid = p01 + p10;
    u128 mid_carry = (mid < p01) ? ((u128)1 << 64) : 0;
    u128 lo = p00 + (mid << 64);
    u128 hi = p11 + (mid >> 64) + mid_carry + ((lo < p00) ? 1 : 0);
    return f128_reduce256(hi, lo);
}

static inline u128 rd128(const u32 *const *pl, size_t i) {
    return (u128)pl[0][i] | ((u128)pl[1][i] << 32) | ((u128)pl[2][i] << 64) |
           ((u128)pl[3][i] << 96);
}

static inline void wr128(u32 *const *pl, size_t i, u128 v) {
    pl[0][i] = (u32)v;
    pl[1][i] = (u32)(v >> 32);
    pl[2][i] = (u32)(v >> 64);
    pl[3][i] = (u32)(v >> 96);
}

void f128_mulmod(const u32 **a, const u32 **b, u32 **r, size_t n, size_t nb) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t i = 0; i < n; i++)
        wr128((u32 *const *)r, i,
              f128_mul(rd128(a, i), rd128(b, i % nb)));
}

void f128_ntt_stage(const u32 **x, const u32 **tw, u32 **o, size_t n,
                    size_t m) {
    const u128 P = p128();
    size_t half = m / 2, rows = n / m;
#pragma omp parallel for schedule(static) if (rows * n >= 16384)
    for (size_t r = 0; r < rows; r++) {
        size_t base = r * m;
        for (size_t j = 0; j < half; j++) {
            u128 e = rd128(x, base + j);
            u128 oo = rd128(x, base + half + j);
            u128 w = rd128(tw, j);
            u128 t = f128_mul(oo, w);
            u128 s = e + t;
            if (s < e) s += DELTA; /* wrapped 2^128 */
            if (s >= P) s -= P;
            u128 d = e >= t ? e - t : e + (P - t);
            wr128((u32 *const *)o, base + j, s);
            wr128((u32 *const *)o, base + half + j, d);
        }
    }
}

/* m entries are u64 PAIRS (lo, hi) per element, row-major w*w */
void f128_matvec(size_t w, const u32 **state, const u64 *m, u32 **out,
                 size_t n) {
#pragma omp parallel for schedule(static) if (n >= 16384)
    for (size_t k = 0; k < n; k++) {
        u128 s[16];
        for (size_t j = 0; j < w; j++) s[j] = rd128(state + 4 * j, k);
        for (size_t i = 0; i < w; i++) {
            /* deferred reduction: fold each product's hi once so the
             * running high word stays < w * 2^47 (u128-safe for w <= 16) */
            u128 acc_lo = 0, acc_hi = 0;
            const u64 *row = m + i * 2 * w;
            for (size_t j = 0; j < w; j++) {
                u128 c = (u128)row[2 * j] | ((u128)row[2 * j + 1] << 64);
                u64 a0 = (u64)s[j], a1 = (u64)(s[j] >> 64);
                u64 b0 = (u64)c, b1 = (u64)(c >> 64);
                u128 p00 = (u128)a0 * b0;
                u128 p01 = (u128)a0 * b1;
                u128 p10 = (u128)a1 * b0;
                u128 p11 = (u128)a1 * b1;
                u128 mid = p01 + p10;
                u128 mid_carry = (mid < p01) ? ((u128)1 << 64) : 0;
                u128 lo = p00 + (mid << 64);
                u128 hi = p11 + (mid >> 64) + mid_carry + ((lo < p00) ? 1 : 0);
                /* one fold: hi*2^128 + lo == lo + hi*DELTA, new hi < 2^47 */
                u64 h1 = (u64)(hi >> 64), h0 = (u64)hi;
                u128 t0 = (u128)h0 * DELTA;
                u128 t1 = (u128)h1 * DELTA;
                u128 t1lo = t1 << 64;
                u128 nlo = t0 + t1lo;
                u128 nhi = (t1 >> 64) + (nlo < t1lo ? 1 : 0);
                u128 fl = lo + nlo;
                nhi += (fl < nlo) ? 1 : 0;
                acc_lo += fl;
                acc_hi += nhi + ((acc_lo < fl) ? 1 : 0);
            }
            wr128((u32 *const *)(out + 4 * i), k,
                  f128_reduce256(acc_hi, acc_lo));
        }
    }
}
