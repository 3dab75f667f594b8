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
#pragma omp parallel for schedule(static) if (k >= 1024)
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

/* ---- one-shot full BLAKE3 hash (chunking + parent tree) ----------------- */

static void compress_one(const uint32_t *cv, const uint32_t *block,
                         uint64_t counter, uint32_t block_len, uint32_t flags,
                         uint32_t *out) {
    b3_compress_batch(cv, block, counter, block_len, flags, 1, out);
}

#define B3_CHUNK_START (1u << 0)
#define B3_CHUNK_END (1u << 1)
#define B3_PARENT (1u << 2)
#define B3_ROOT (1u << 3)

/* hash one <=1024-byte chunk into an 8-word CV */
static void chunk_cv(const uint8_t *data, size_t len, uint64_t counter,
                     int root_if_single, uint32_t *out) {
    uint32_t cv[8];
    for (int i = 0; i < 8; ++i) cv[i] = IV[i];
    size_t nblocks = (len + 63) / 64;
    if (nblocks == 0) nblocks = 1;
    for (size_t b = 0; b < nblocks; ++b) {
        uint32_t block[16];
        uint8_t buf[64];
        size_t off = b * 64;
        size_t blen = len > off ? (len - off > 64 ? 64 : len - off) : 0;
        for (size_t i = 0; i < 64; ++i) buf[i] = i < blen ? data[off + i] : 0;
        for (int i = 0; i < 16; ++i)
            block[i] = (uint32_t)buf[4 * i] | ((uint32_t)buf[4 * i + 1] << 8) |
                       ((uint32_t)buf[4 * i + 2] << 16) |
                       ((uint32_t)buf[4 * i + 3] << 24);
        uint32_t flags = 0;
        if (b == 0) flags |= B3_CHUNK_START;
        if (b == nblocks - 1) {
            flags |= B3_CHUNK_END;
            if (root_if_single) flags |= B3_ROOT;
        }
        compress_one(cv, block, counter, (uint32_t)blen, flags, cv);
    }
    for (int i = 0; i < 8; ++i) out[i] = cv[i];
}

/* subtree CV per the spec: left child spans the largest power-of-two
   number of chunks strictly less than the total. */
static void subtree_cv(const uint8_t *data, uint64_t len, uint64_t counter,
                       uint32_t *out) {
    if (len <= 1024) {
        chunk_cv(data, (size_t)len, counter, 0, out);
        return;
    }
    uint64_t nchunks = (len + 1023) / 1024;
    uint64_t left_chunks = 1;
    while (left_chunks * 2 < nchunks) left_chunks *= 2;
    uint64_t left_len = left_chunks * 1024;
    uint32_t l[8], r[8], block[16], pc[8];
    subtree_cv(data, left_len, counter, l);
    subtree_cv(data + left_len, len - left_len, counter + left_chunks, r);
    for (int i = 0; i < 8; ++i) block[i] = l[i];
    for (int i = 0; i < 8; ++i) block[8 + i] = r[i];
    for (int i = 0; i < 8; ++i) pc[i] = IV[i];
    compress_one(pc, block, 0, 64, B3_PARENT, out);
}

/* Full BLAKE3-256 of data[0..len) -> out (8 u32 words). */
void b3_hash_bytes(const uint8_t *data, uint64_t len, uint32_t *out) {
    if (len <= 1024) {
        chunk_cv(data, (size_t)len, 0, 1, out);
        return;
    }
    uint64_t nchunks = (len + 1023) / 1024;
    uint64_t left_chunks = 1;
    while (left_chunks * 2 < nchunks) left_chunks *= 2;
    uint64_t left_len = left_chunks * 1024;
    uint32_t l[8], r[8], block[16], pc[8];
    subtree_cv(data, left_len, 0, l);
    subtree_cv(data + left_len, len - left_len, left_chunks, r);
    for (int i = 0; i < 8; ++i) block[i] = l[i];
    for (int i = 0; i < 8; ++i) block[8 + i] = r[i];
    for (int i = 0; i < 8; ++i) pc[i] = IV[i];
    compress_one(pc, block, 0, 64, B3_PARENT | B3_ROOT, out);
}

/* k equal-length messages, rows of n bytes -> k x 8 u32 digests */
void b3_hash_bytes_many(const uint8_t *data, uint64_t n, uint64_t k,
                        uint32_t *out) {
#pragma omp parallel for schedule(static) if (k >= 1024)
    for (uint64_t i = 0; i < k; ++i)
        b3_hash_bytes(data + i * n, n, out + i * 8);
}

/* rows with a stride (bytes) larger than the hashed length: lets callers
 * hash u32-word rows in place without materializing a packed copy */
void b3_hash_rows_strided(const uint8_t *data, uint64_t stride, uint64_t n,
                          uint64_t k, uint32_t *out) {
#pragma omp parallel for schedule(static) if (k >= 1024)
    for (uint64_t i = 0; i < k; ++i)
        b3_hash_bytes(data + i * stride, n, out + i * 8);
}
