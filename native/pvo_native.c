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

/* RGB -> planar YUV420 frame packer (BT.601 full-range, 2x2 chroma
 * mean) — C twin of utils/yuv.py:rgb_to_yuv420, which costs ~5 ms of
 * numpy per 240x808 frame on the tracking loop's host thread. Same
 * float32 math and rounding as the numpy path. */
void rgb_to_yuv420(const uint8_t *rgb, uint8_t *out, long H, long W) {
    long hw = H * W;
    long q = (H / 2) * (W / 2);
    uint8_t *yp = out;
    uint8_t *cbp = out + hw;
    uint8_t *crp = out + hw + q;
    for (long i = 0; i < H; i += 2) {
        for (long j = 0; j < W; j += 2) {
            float cbs = 0.0f, crs = 0.0f;
            for (int di = 0; di < 2; di++) {
                for (int dj = 0; dj < 2; dj++) {
                    long p = (i + di) * W + (j + dj);
                    float r = (float)rgb[3 * p];
                    float g = (float)rgb[3 * p + 1];
                    float b = (float)rgb[3 * p + 2];
                    float y = 0.299f * r + 0.587f * g + 0.114f * b;
                    float yr = __builtin_rintf(y);
                    yp[p] = (uint8_t)(yr < 0.0f ? 0.0f :
                                      (yr > 255.0f ? 255.0f : yr));
                    cbs += 128.0f + (b - y) * (1.0f / 1.772f);
                    crs += 128.0f + (r - y) * (1.0f / 1.402f);
                }
            }
            long c = (i / 2) * (W / 2) + (j / 2);
            float cb = __builtin_rintf(cbs * 0.25f);
            float cr = __builtin_rintf(crs * 0.25f);
            cbp[c] = (uint8_t)(cb < 0.0f ? 0.0f :
                               (cb > 255.0f ? 255.0f : cb));
            crp[c] = (uint8_t)(cr < 0.0f ? 0.0f :
                               (cr > 255.0f ? 255.0f : cr));
        }
    }
}
