/* Native safetensors codec: header parser + file writer.
 *
 * The reference delegates checkpoint serialization to the vendored Rust
 * `safetensors` crate (reference: train/convert_safetensors.py, MLX
 * load_weights); this is the framework's own native implementation of the
 * format (https spec: 8-byte LE header length, JSON header, raw data).
 *
 * Reading: st_open() parses the JSON header into a flat tensor table; the
 * Python side mmaps the data section and builds zero-copy numpy views
 * (including BF16, which the Rust->numpy path refuses).
 * Writing: st_write() serializes the header and streams tensor data.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define ST_MAX_DIMS 8
#define ST_MAX_NAME 256
#define ST_MAX_DTYPE 8

typedef struct {
    char name[ST_MAX_NAME];
    char dtype[ST_MAX_DTYPE];
    int ndim;
    int64_t shape[ST_MAX_DIMS];
    uint64_t begin, end; /* offsets into data section */
} st_tensor;

typedef struct {
    uint64_t header_len; /* bytes of JSON header (data starts at 8+header_len) */
    int count;
    int cap;
    st_tensor *tensors;
    char error[256];
} st_file;

/* ---------------- minimal JSON scanner (header is machine-generated) ---- */

typedef struct {
    const char *p;
    const char *end;
} js;

static void js_ws(js *s) {
    while (s->p < s->end && (*s->p == ' ' || *s->p == '\t' || *s->p == '\n' || *s->p == '\r'))
        s->p++;
}

static int js_expect(js *s, char c) {
    js_ws(s);
    if (s->p < s->end && *s->p == c) {
        s->p++;
        return 1;
    }
    return 0;
}

static int js_peek(js *s) {
    js_ws(s);
    return s->p < s->end ? (unsigned char)*s->p : -1;
}

/* Parse a JSON string into out (unescaping \" \\ \/ \b \f \n \r \t; \uXXXX
 * decoded to UTF-8). Returns length or -1. */
static int js_string(js *s, char *out, int cap) {
    if (!js_expect(s, '"')) return -1;
    int n = 0;
    while (s->p < s->end) {
        char c = *s->p++;
        if (c == '"') {
            if (out && n < cap) out[n] = 0;
            return n;
        }
        if (c == '\\') {
            if (s->p >= s->end) return -1;
            char e = *s->p++;
            char dec;
            switch (e) {
            case 'n': dec = '\n'; break;
            case 't': dec = '\t'; break;
            case 'r': dec = '\r'; break;
            case 'b': dec = '\b'; break;
            case 'f': dec = '\f'; break;
            case 'u': {
                if (s->end - s->p < 4) return -1;
                unsigned v = 0;
                for (int i = 0; i < 4; i++) {
                    char h = *s->p++;
                    v <<= 4;
                    if (h >= '0' && h <= '9') v |= (unsigned)(h - '0');
                    else if (h >= 'a' && h <= 'f') v |= (unsigned)(h - 'a' + 10);
                    else if (h >= 'A' && h <= 'F') v |= (unsigned)(h - 'A' + 10);
                    else return -1;
                }
                /* encode as UTF-8 (surrogate pairs unsupported; header names
                 * are ASCII in practice) */
                if (v < 0x80) {
                    if (out && n < cap) out[n] = (char)v;
                    n++;
                } else if (v < 0x800) {
                    if (out && n + 1 < cap) {
                        out[n] = (char)(0xC0 | (v >> 6));
                        out[n + 1] = (char)(0x80 | (v & 0x3F));
                    }
                    n += 2;
                } else {
                    if (out && n + 2 < cap) {
                        out[n] = (char)(0xE0 | (v >> 12));
                        out[n + 1] = (char)(0x80 | ((v >> 6) & 0x3F));
                        out[n + 2] = (char)(0x80 | (v & 0x3F));
                    }
                    n += 3;
                }
                continue;
            }
            default: dec = e;
            }
            if (out && n < cap) out[n] = dec;
            n++;
            continue;
        }
        if (out && n < cap) out[n] = c;
        n++;
    }
    return -1;
}

static int js_uint(js *s, uint64_t *out) {
    js_ws(s);
    if (s->p >= s->end || *s->p < '0' || *s->p > '9') return -1;
    uint64_t v = 0;
    while (s->p < s->end && *s->p >= '0' && *s->p <= '9')
        v = v * 10 + (uint64_t)(*s->p++ - '0');
    *out = v;
    return 0;
}

/* Skip any JSON value (for __metadata__ and unknown fields). */
static int js_skip(js *s) {
    int c = js_peek(s);
    if (c == '"') return js_string(s, NULL, 0) >= 0 ? 0 : -1;
    if (c == '{' || c == '[') {
        char open = (char)c, close = (c == '{') ? '}' : ']';
        s->p++;
        int depth = 1;
        while (s->p < s->end && depth > 0) {
            char ch = *s->p;
            if (ch == '"') {
                if (js_string(s, NULL, 0) < 0) return -1;
                continue;
            }
            if (ch == open) depth++;
            if (ch == close) depth--;
            s->p++;
        }
        return depth == 0 ? 0 : -1;
    }
    /* number / literal */
    while (s->p < s->end && *s->p != ',' && *s->p != '}' && *s->p != ']')
        s->p++;
    return 0;
}

/* ---------------- header parse ------------------------------------------ */

static int parse_tensor_body(js *s, st_tensor *t, char *err) {
    if (!js_expect(s, '{')) {
        snprintf(err, 256, "expected '{' in tensor entry %s", t->name);
        return -1;
    }
    t->ndim = -1;
    t->dtype[0] = 0;
    t->begin = t->end = 0;
    if (js_peek(s) == '}') {
        s->p++;
        return 0;
    }
    for (;;) {
        char key[64];
        if (js_string(s, key, sizeof key) < 0) return -1;
        if (!js_expect(s, ':')) return -1;
        if (strcmp(key, "dtype") == 0) {
            if (js_string(s, t->dtype, sizeof t->dtype) < 0) return -1;
        } else if (strcmp(key, "shape") == 0) {
            if (!js_expect(s, '[')) return -1;
            t->ndim = 0;
            if (js_peek(s) == ']') {
                s->p++;
            } else {
                for (;;) {
                    uint64_t v;
                    if (js_uint(s, &v) < 0) return -1;
                    if (t->ndim < ST_MAX_DIMS) t->shape[t->ndim] = (int64_t)v;
                    t->ndim++;
                    if (js_expect(s, ',')) continue;
                    if (js_expect(s, ']')) break;
                    return -1;
                }
            }
            if (t->ndim > ST_MAX_DIMS) {
                snprintf(err, 256, "tensor %s: ndim %d > %d", t->name, t->ndim, ST_MAX_DIMS);
                return -1;
            }
        } else if (strcmp(key, "data_offsets") == 0) {
            if (!js_expect(s, '[')) return -1;
            if (js_uint(s, &t->begin) < 0) return -1;
            if (!js_expect(s, ',')) return -1;
            if (js_uint(s, &t->end) < 0) return -1;
            if (!js_expect(s, ']')) return -1;
        } else {
            if (js_skip(s) < 0) return -1;
        }
        if (js_expect(s, ',')) continue;
        if (js_expect(s, '}')) break;
        snprintf(err, 256, "bad tensor body near byte %ld", (long)(s->end - s->p));
        return -1;
    }
    if (t->dtype[0] == 0 || t->ndim < 0) {
        snprintf(err, 256, "tensor %s missing dtype/shape", t->name);
        return -1;
    }
    return 0;
}

st_file *st_open(const char *path) {
    st_file *f = (st_file *)calloc(1, sizeof(st_file));
    if (!f) return NULL;
    FILE *fp = fopen(path, "rb");
    if (!fp) {
        snprintf(f->error, sizeof f->error, "cannot open %s", path);
        return f;
    }
    unsigned char lenbuf[8];
    if (fread(lenbuf, 1, 8, fp) != 8) {
        snprintf(f->error, sizeof f->error, "short file");
        fclose(fp);
        return f;
    }
    uint64_t hlen = 0;
    for (int i = 7; i >= 0; i--) hlen = (hlen << 8) | lenbuf[i];
    if (hlen > (uint64_t)1 << 31) {
        snprintf(f->error, sizeof f->error, "header too large: %llu", (unsigned long long)hlen);
        fclose(fp);
        return f;
    }
    char *hdr = (char *)malloc(hlen + 1);
    if (!hdr || fread(hdr, 1, hlen, fp) != hlen) {
        snprintf(f->error, sizeof f->error, "truncated header");
        free(hdr);
        fclose(fp);
        return f;
    }
    fclose(fp);
    hdr[hlen] = 0;
    f->header_len = hlen;

    js s = {hdr, hdr + hlen};
    if (!js_expect(&s, '{')) {
        snprintf(f->error, sizeof f->error, "header is not a JSON object");
        free(hdr);
        return f;
    }
    if (js_peek(&s) == '}') {
        free(hdr);
        return f; /* empty: zero tensors */
    }
    for (;;) {
        char name[ST_MAX_NAME];
        if (js_string(&s, name, sizeof name) < 0) {
            snprintf(f->error, sizeof f->error, "bad key in header");
            break;
        }
        if (!js_expect(&s, ':')) {
            snprintf(f->error, sizeof f->error, "missing ':' after %s", name);
            break;
        }
        if (strcmp(name, "__metadata__") == 0) {
            if (js_skip(&s) < 0) {
                snprintf(f->error, sizeof f->error, "bad __metadata__");
                break;
            }
        } else {
            if (f->count == f->cap) {
                f->cap = f->cap ? f->cap * 2 : 64;
                f->tensors = (st_tensor *)realloc(f->tensors, (size_t)f->cap * sizeof(st_tensor));
            }
            st_tensor *t = &f->tensors[f->count];
            memset(t, 0, sizeof *t);
            strncpy(t->name, name, ST_MAX_NAME - 1);
            if (parse_tensor_body(&s, t, f->error) < 0) break;
            f->count++;
        }
        if (js_expect(&s, ',')) continue;
        if (js_expect(&s, '}')) {
            f->error[0] = 0;
            free(hdr);
            return f;
        }
        snprintf(f->error, sizeof f->error, "bad separator in header");
        break;
    }
    free(hdr);
    if (!f->error[0]) snprintf(f->error, sizeof f->error, "parse error");
    return f;
}

const char *st_error(st_file *f) { return f->error[0] ? f->error : NULL; }
uint64_t st_data_start(st_file *f) { return 8 + f->header_len; }
int st_count(st_file *f) { return f->count; }
const char *st_name(st_file *f, int i) { return f->tensors[i].name; }
const char *st_dtype(st_file *f, int i) { return f->tensors[i].dtype; }
int st_ndim(st_file *f, int i) { return f->tensors[i].ndim; }

void st_shape(st_file *f, int i, int64_t *out) {
    memcpy(out, f->tensors[i].shape, (size_t)f->tensors[i].ndim * sizeof(int64_t));
}

void st_offsets(st_file *f, int i, uint64_t *begin, uint64_t *end) {
    *begin = f->tensors[i].begin;
    *end = f->tensors[i].end;
}

void st_close(st_file *f) {
    if (!f) return;
    free(f->tensors);
    free(f);
}

/* ---------------- writer ------------------------------------------------ */

typedef struct {
    FILE *fp;
    char *header;
    size_t hcap, hlen;
    uint64_t data_off;
    int first;
    int failed;
} st_writer;

static void w_put(st_writer *w, const char *s, size_t n) {
    if (w->hlen + n + 1 > w->hcap) {
        while (w->hlen + n + 1 > w->hcap) w->hcap *= 2;
        w->header = (char *)realloc(w->header, w->hcap);
    }
    memcpy(w->header + w->hlen, s, n);
    w->hlen += n;
    w->header[w->hlen] = 0;
}

static void w_puts(st_writer *w, const char *s) { w_put(w, s, strlen(s)); }

/* JSON-escape a tensor name into the header. */
static void w_put_escaped(st_writer *w, const char *s) {
    for (; *s; s++) {
        unsigned char c = (unsigned char)*s;
        if (c == '"' || c == '\\') {
            char buf[3] = {'\\', (char)c, 0};
            w_puts(w, buf);
        } else if (c < 0x20) {
            char buf[8];
            snprintf(buf, sizeof buf, "\\u%04x", c);
            w_puts(w, buf);
        } else {
            w_put(w, (const char *)&c, 1);
        }
    }
}

st_writer *st_writer_new(void) {
    st_writer *w = (st_writer *)calloc(1, sizeof(st_writer));
    w->hcap = 4096;
    w->header = (char *)malloc(w->hcap);
    w->header[0] = 0;
    w->first = 1;
    w_puts(w, "{");
    return w;
}

/* Register one tensor; data is appended later in the same order. */
void st_writer_add(st_writer *w, const char *name, const char *dtype,
                   const int64_t *shape, int ndim, uint64_t nbytes) {
    if (!w->first) w_puts(w, ",");
    w->first = 0;
    w_puts(w, "\"");
    w_put_escaped(w, name);
    w_puts(w, "\":{\"dtype\":\"");
    w_puts(w, dtype);
    w_puts(w, "\",\"shape\":[");
    char buf[32];
    for (int i = 0; i < ndim; i++) {
        snprintf(buf, sizeof buf, i ? ",%lld" : "%lld", (long long)shape[i]);
        w_puts(w, buf);
    }
    w_puts(w, "],\"data_offsets\":[");
    snprintf(buf, sizeof buf, "%llu", (unsigned long long)w->data_off);
    w_puts(w, buf);
    w_puts(w, ",");
    w->data_off += nbytes;
    snprintf(buf, sizeof buf, "%llu", (unsigned long long)w->data_off);
    w_puts(w, buf);
    w_puts(w, "]}");
}

/* Open the output file and emit the (8-padded) header. Returns 0 on ok. */
int st_writer_begin(st_writer *w, const char *path) {
    w_puts(w, "}");
    size_t pad = (8 - (w->hlen % 8)) % 8;
    for (size_t i = 0; i < pad; i++) w_puts(w, " ");
    w->fp = fopen(path, "wb");
    if (!w->fp) return -1;
    unsigned char lenbuf[8];
    uint64_t hlen = w->hlen;
    for (int i = 0; i < 8; i++) lenbuf[i] = (unsigned char)((hlen >> (8 * i)) & 0xFF);
    if (fwrite(lenbuf, 1, 8, w->fp) != 8 || fwrite(w->header, 1, w->hlen, w->fp) != w->hlen) {
        w->failed = 1;
        return -1;
    }
    return 0;
}

int st_writer_data(st_writer *w, const void *buf, uint64_t nbytes) {
    if (!w->fp || w->failed) return -1;
    if (fwrite(buf, 1, nbytes, w->fp) != nbytes) {
        w->failed = 1;
        return -1;
    }
    return 0;
}

int st_writer_finish(st_writer *w) {
    int rc = w->failed ? -1 : 0;
    if (w->fp && fclose(w->fp) != 0) rc = -1;
    free(w->header);
    free(w);
    return rc;
}
