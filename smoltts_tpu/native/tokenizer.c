/* Native byte-level tokenizer for the smoltts vocabulary.
 *
 * The reference delegates tokenization to HF `tokenizers` (Rust); this is
 * the framework's native host-side equivalent for the byte-level vocab
 * (data_pipeline/scripts/create_bytelevel_init.py layout):
 *   ids 0..255      raw bytes
 *   ids 256..       special tokens, matched greedily anywhere in the text
 *                   (HF special-token semantics)
 *
 * Exposed via ctypes (see smoltts_tpu/native/__init__.py). Special tokens
 * are registered at init; encode scans the input with a first-byte index
 * over the special table, falling back to raw bytes.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MAX_SPECIALS 4096
#define MAX_SPECIAL_LEN 64

typedef struct {
    char text[MAX_SPECIAL_LEN];
    int len;
    int id;
} Special;

typedef struct {
    Special specials[MAX_SPECIALS];
    int n_specials;
    /* first-byte index: for each byte value, range [start, end) into a
     * length-sorted (desc) order array so longest match wins */
    int order[MAX_SPECIALS];
    int first_start[256];
    int first_end[256];
} Tokenizer;

/* qsort_r portability: do a simple insertion sort (n is small per bucket). */
static void sort_order(Tokenizer *t, int *idx, int n) {
    for (int i = 1; i < n; i++) {
        int key = idx[i];
        int j = i - 1;
        while (j >= 0 && t->specials[idx[j]].len < t->specials[key].len) {
            idx[j + 1] = idx[j];
            j--;
        }
        idx[j + 1] = key;
    }
}

Tokenizer *smoltts_tokenizer_new(void) {
    Tokenizer *t = (Tokenizer *)calloc(1, sizeof(Tokenizer));
    return t;
}

void smoltts_tokenizer_free(Tokenizer *t) { free(t); }

int smoltts_tokenizer_add_special(Tokenizer *t, const char *text, int id) {
    size_t len = strlen(text);
    if (t->n_specials >= MAX_SPECIALS || len == 0 || len >= MAX_SPECIAL_LEN)
        return -1;
    Special *s = &t->specials[t->n_specials];
    memcpy(s->text, text, len + 1);
    s->len = (int)len;
    s->id = id;
    t->n_specials++;
    return 0;
}

/* Build the first-byte index. Call once after all add_special calls. */
void smoltts_tokenizer_finalize(Tokenizer *t) {
    int counts[256] = {0};
    for (int i = 0; i < t->n_specials; i++)
        counts[(unsigned char)t->specials[i].text[0]]++;
    int pos = 0;
    for (int b = 0; b < 256; b++) {
        t->first_start[b] = pos;
        t->first_end[b] = pos + counts[b];
        pos += counts[b];
    }
    int fill[256];
    memcpy(fill, t->first_start, sizeof(fill));
    for (int i = 0; i < t->n_specials; i++) {
        unsigned char b = (unsigned char)t->specials[i].text[0];
        t->order[fill[b]++] = i;
    }
    for (int b = 0; b < 256; b++) {
        sort_order(t, t->order + t->first_start[b],
                   t->first_end[b] - t->first_start[b]);
    }
}

/* Encode UTF-8 `text` (len bytes) into `out` (capacity out_cap ids).
 * Returns the number of ids written, or -1 if out_cap is too small. */
int smoltts_tokenizer_encode(Tokenizer *t, const char *text, int len,
                             int32_t *out, int out_cap) {
    int n = 0;
    int i = 0;
    while (i < len) {
        unsigned char b = (unsigned char)text[i];
        int matched = -1;
        for (int oi = t->first_start[b]; oi < t->first_end[b]; oi++) {
            const Special *s = &t->specials[t->order[oi]];
            if (s->len <= len - i && memcmp(text + i, s->text, s->len) == 0) {
                matched = t->order[oi];
                break; /* longest first */
            }
        }
        if (n >= out_cap) return -1;
        if (matched >= 0) {
            out[n++] = t->specials[matched].id;
            i += t->specials[matched].len;
        } else {
            out[n++] = (int32_t)b;
            i += 1;
        }
    }
    return n;
}
