/* pvo_native — native runtime kernels for the host-side pipeline.
 *
 * TPU-native counterpart of the reference's host C++ extensions
 * (detectron2's cocoeval.cpp fast-eval path and the panopticapi codec
 * loops): the panoptic id<->rgb codecs and the intersection-area
 * counting that dominates PQ/VPQ evaluation (np.unique over
 * int-encoded maps in the reference tools, 4_eval_vpq.py:151-158).
 *
 * Plain C with a pointer ABI (loaded via ctypes; no Python.h/numpy
 * headers needed). Build: cc -O3 -shared -fPIC -o libpvo_native.so
 * pvo_native.c
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

void rgb2id(const uint8_t *rgb, uint32_t *out, long n) {
    for (long i = 0; i < n; i++) {
        out[i] = (uint32_t)rgb[3 * i] +
                 ((uint32_t)rgb[3 * i + 1] << 8) +
                 ((uint32_t)rgb[3 * i + 2] << 16);
    }
}

void id2rgb(const uint32_t *ids, uint8_t *out, long n) {
    for (long i = 0; i < n; i++) {
        uint32_t v = ids[i];
        out[3 * i] = (uint8_t)(v & 0xff);
        out[3 * i + 1] = (uint8_t)((v >> 8) & 0xff);
        out[3 * i + 2] = (uint8_t)((v >> 16) & 0xff);
    }
}

/* open-addressing hash map from 64-bit keys to counts */
typedef struct {
    int64_t *keys;
    int64_t *counts;
    uint8_t *used;
    long cap;  /* power of two */
} hmap;

static inline uint64_t mix64(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
}

static int hmap_init(hmap *m, long want) {
    long cap = 64;
    while (cap < 2 * want) cap <<= 1;
    m->keys = (int64_t *)malloc(cap * sizeof(int64_t));
    m->counts = (int64_t *)calloc(cap, sizeof(int64_t));
    m->used = (uint8_t *)calloc(cap, 1);
    m->cap = cap;
    return (m->keys && m->counts && m->used) ? 0 : -1;
}

static void hmap_free(hmap *m) {
    free(m->keys);
    free(m->counts);
    free(m->used);
}

/* returns 1 if a new key was inserted, 0 if an existing one bumped */
static inline int hmap_add(hmap *m, int64_t key, int64_t inc) {
    uint64_t h = mix64((uint64_t)key) & (uint64_t)(m->cap - 1);
    for (;;) {
        if (!m->used[h]) {
            m->used[h] = 1;
            m->keys[h] = key;
            m->counts[h] = inc;
            return 1;
        }
        if (m->keys[h] == key) {
            m->counts[h] += inc;
            return 0;
        }
        h = (h + 1) & (uint64_t)(m->cap - 1);
    }
}

static int hmap_grow(hmap *m) {
    hmap bigger;
    bigger.cap = m->cap << 1;
    bigger.keys = (int64_t *)malloc(bigger.cap * sizeof(int64_t));
    bigger.counts = (int64_t *)calloc(bigger.cap, sizeof(int64_t));
    bigger.used = (uint8_t *)calloc(bigger.cap, 1);
    if (!bigger.keys || !bigger.counts || !bigger.used) return -1;
    for (long h = 0; h < m->cap; h++) {
        if (m->used[h]) hmap_add(&bigger, m->keys[h], m->counts[h]);
    }
    hmap_free(m);
    *m = bigger;
    return 0;
}

/* Count occurrences of combined keys a[i]*offset + b[i].
 * Writes up to max_out (key, count) pairs; returns the number of
 * unique pairs (or -1 on allocation failure / overflow). */
long pair_counts(const int64_t *a, const int64_t *b, long n,
                 int64_t offset, int64_t *keys_out, int64_t *counts_out,
                 long max_out) {
    hmap m;
    /* heuristic: distinct pairs are far fewer than pixels */
    long want = n < 65536 ? n : 65536;
    if (hmap_init(&m, want) != 0) return -1;

    long fill = 0;
    for (long i = 0; i < n; i++) {
        int64_t key = a[i] * offset + b[i];
        fill += hmap_add(&m, key, 1);
        if (2 * fill > m.cap) {
            if (hmap_grow(&m) != 0) {
                hmap_free(&m);
                return -1;
            }
        }
    }

    long out = 0;
    for (long h = 0; h < m.cap; h++) {
        if (m.used[h]) {
            if (out >= max_out) {
                hmap_free(&m);
                return -1;
            }
            keys_out[out] = m.keys[h];
            counts_out[out] = m.counts[h];
            out++;
        }
    }
    hmap_free(&m);
    return out;
}

/* id histogram: unique ids + counts of an int64 map */
long id_counts(const int64_t *a, long n, int64_t *keys_out,
               int64_t *counts_out, long max_out) {
    static const int64_t ONE = 1;
    return pair_counts(a, a, n, 0 * ONE, keys_out, counts_out,
                       max_out);
}
