/* Batched BLAKE3 compression over contiguous u32 rows.
 *
 * The host Fiat-Shamir / Merkle-verification paths issue thousands of small
 * compressions; the numpy formulation in ops/blake3.py pays ~450 array-op
 * dispatches per call regardless of batch width.  This kernel is the native
 * tier for that hot path (the reference consumes the upstream `blake3`
 * Rust crate — crypto/src/hash/blake/mod.rs; there is no code to port, this
 * is written from the public spec).
 *
 * Build: cc -O3 -shared -fPIC blake3_compress.c -o libstarkb3.so
 */

#include <stddef.h>
#include <stdint.h>

static inline uint32_t rotr32(uint32_t x, int r) {
    return (x >> r) | (x << (32 - r));
}

#define G(a, b, c, d, mx, my)                                                  \
    do {                                                                       \
        v[a] = v[a] + v[b] + (mx);                                             \
        v[d] = rotr32(v[d] ^ v[a], 16);                                        \
        v[c] = v[c] + v[d];                                                    \
        v[b] = rotr32(v[b] ^ v[c], 12);                                        \
        v[a] = v[a] + v[b] + (my);                                             \
        v[d] = rotr32(v[d] ^ v[a], 8);                                         \
        v[c] = v[c] + v[d];                                                    \
        v[b] = rotr32(v[b] ^ v[c], 7);                                         \
    } while (0)

#define ROUND(m)                                                               \
    do {                                                                       \
        G(0, 4, 8, 12, m[0], m[1]);                                            \
        G(1, 5, 9, 13, m[2], m[3]);                                            \
        G(2, 6, 10, 14, m[4], m[5]);                                           \
        G(3, 7, 11, 15, m[6], m[7]);                                           \
        G(0, 5, 10, 15, m[8], m[9]);                                           \
        G(1, 6, 11, 12, m[10], m[11]);                                         \
        G(2, 7, 8, 13, m[12], m[13]);                                          \
        G(3, 4, 9, 14, m[14], m[15]);                                          \
    } while (0)

static const uint8_t PERM[16] = {2, 6,  3, 10, 7, 0,  4,  13,
                                 1, 11, 12, 5, 9, 14, 15, 8};

static const uint32_t IV[8] = {0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u,
                               0xA54FF53Au, 0x510E527Fu, 0x9B05688Cu,
                               0x1F83D9ABu, 0x5BE0CD19u};

/* cv: k x 8 rows, blocks: k x 16 rows, out: k x 8 rows (may alias cv). */
void b3_compress_batch(const uint32_t *cv, const uint32_t *blocks,
                       uint64_t counter, uint32_t block_len, uint32_t flags,
                       size_t k, uint32_t *out) {
    for (size_t row = 0; row < k; ++row) {
        const uint32_t *c = cv + row * 8;
        const uint32_t *b = blocks + row * 16;
        uint32_t v[16];
        uint32_t m[16], mp[16];
        for (int i = 0; i < 8; ++i) v[i] = c[i];
        v[8] = IV[0];
        v[9] = IV[1];
        v[10] = IV[2];
        v[11] = IV[3];
        v[12] = (uint32_t)(counter & 0xFFFFFFFFu);
        v[13] = (uint32_t)(counter >> 32);
        v[14] = block_len;
        v[15] = flags;
        for (int i = 0; i < 16; ++i) m[i] = b[i];
        for (int r = 0; r < 7; ++r) {
            ROUND(m);
            if (r < 6) {
                for (int i = 0; i < 16; ++i) mp[i] = m[PERM[i]];
                for (int i = 0; i < 16; ++i) m[i] = mp[i];
            }
        }
        uint32_t *o = out + row * 8;
        for (int i = 0; i < 8; ++i) o[i] = v[i] ^ v[i + 8];
    }
}
