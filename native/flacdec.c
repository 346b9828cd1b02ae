/* FLAC subframe hot loops: Rice residual decode + predictor restore.
 *
 * The container/frame/subframe HEADER parsing lives in Python
 * (synthesizer_tpu/utils/flac.py) — it is a few dozen bits per frame.
 * The per-sample work (unary Rice codes, fixed/LPC reconstruction) is
 * inherently bit-serial, so it lives here; the Python module carries a
 * pure-Python twin fallback for toolchain-less installs.
 *
 * Spec: RFC 9639 (FLAC).  All arithmetic follows the spec's integer
 * semantics: 64-bit LPC accumulation with arithmetic >> shift, int32
 * sample domain.
 */

#include <stdint.h>
#include <stddef.h>

typedef struct {
    const uint8_t *buf;
    long long len;       /* bytes */
    long long pos;       /* bit position */
} BR;

static inline int br_bit(BR *b) {
    if (b->pos >= b->len * 8) return -1;
    int bit = (b->buf[b->pos >> 3] >> (7 - (b->pos & 7))) & 1;
    b->pos++;
    return bit;
}

static inline long long br_uint(BR *b, int n) {
    uint64_t v = 0;
    if (b->pos + n > b->len * 8) return -1;
    for (int i = 0; i < n; i++) {
        v = (v << 1)
            | (unsigned)((b->buf[b->pos >> 3] >> (7 - (b->pos & 7))) & 1);
        b->pos++;
    }
    return (long long)v;
}

/* Decode one subframe's residual (Rice/Rice2 partitions) into
 * out[pred_order..n-1] and apply the predictor in place (warmup samples
 * out[0..pred_order-1] are pre-filled by the caller).
 *
 * method: 0 = 4-bit Rice params, 1 = 5-bit Rice2 params.
 * lpc_order > 0: LPC with coefs[lpc_order] and arithmetic >> lpc_shift;
 * lpc_order == 0: fixed predictor of order fixed_order (== pred_order).
 *
 * Returns the new bit position, or -1 on malformed input. */
long long flac_residual_predict(const uint8_t *buf, long long buflen,
                                long long bitpos, int32_t *out, int n,
                                int pred_order, int method, int part_order,
                                const int32_t *coefs, int lpc_order,
                                int lpc_shift, int fixed_order) {
    BR b = {buf, buflen, bitpos};
    int nparts = 1 << part_order;
    int ppart = n >> part_order;
    int idx = pred_order;
    int pbits = (method == 0) ? 4 : 5;
    long long escape = (method == 0) ? 0xF : 0x1F;

    if (ppart <= 0 || (ppart << part_order) != n) return -1;
    if (ppart - pred_order < 0) return -1;

    for (int p = 0; p < nparts; p++) {
        int count = ppart - (p == 0 ? pred_order : 0);
        long long param = br_uint(&b, pbits);
        if (param < 0) return -1;
        if (param == escape) {
            long long rb = br_uint(&b, 5);
            if (rb < 0) return -1;
            for (int i = 0; i < count; i++) {
                long long v = 0;
                if (rb > 0) {
                    v = br_uint(&b, (int)rb);
                    if (v < 0) return -1;
                    if (v >> (rb - 1)) v -= (1LL << rb); /* sign extend */
                }
                out[idx++] = (int32_t)v;
            }
        } else {
            int k = (int)param;
            for (int i = 0; i < count; i++) {
                uint64_t q = 0;
                int bit;
                while ((bit = br_bit(&b)) == 0) q++;
                if (bit < 0) return -1;
                uint64_t u;
                if (k > 0) {
                    long long rem = br_uint(&b, k);
                    if (rem < 0) return -1;
                    u = (q << k) | (uint64_t)rem;
                } else {
                    u = q;
                }
                out[idx++] = (int32_t)((u & 1)
                                       ? -(int64_t)(u >> 1) - 1
                                       : (int64_t)(u >> 1));
            }
        }
    }
    if (idx != n) return -1;

    if (lpc_order > 0) {
        for (int i = lpc_order; i < n; i++) {
            int64_t acc = 0;
            for (int j = 0; j < lpc_order; j++)
                acc += (int64_t)coefs[j] * (int64_t)out[i - 1 - j];
            out[i] = (int32_t)((int64_t)out[i] + (acc >> lpc_shift));
        }
    } else {
        switch (fixed_order) {
        case 0:
            break;
        case 1:
            for (int i = 1; i < n; i++)
                out[i] = (int32_t)((int64_t)out[i] + out[i - 1]);
            break;
        case 2:
            for (int i = 2; i < n; i++)
                out[i] = (int32_t)((int64_t)out[i] + 2LL * out[i - 1]
                                   - out[i - 2]);
            break;
        case 3:
            for (int i = 3; i < n; i++)
                out[i] = (int32_t)((int64_t)out[i] + 3LL * out[i - 1]
                                   - 3LL * out[i - 2] + out[i - 3]);
            break;
        case 4:
            for (int i = 4; i < n; i++)
                out[i] = (int32_t)((int64_t)out[i] + 4LL * out[i - 1]
                                   - 6LL * out[i - 2] + 4LL * out[i - 3]
                                   - out[i - 4]);
            break;
        default:
            return -1;
        }
    }
    return b.pos;
}

/* CRC-16 (poly 0x8005, init 0) over a byte range — the whole-frame
 * integrity check is the only per-byte host loop left in the decoder. */
uint16_t flac_crc16(const uint8_t *buf, long long n) {
    uint16_t c = 0;
    for (long long i = 0; i < n; i++) {
        c ^= (uint16_t)buf[i] << 8;
        for (int k = 0; k < 8; k++)
            c = (uint16_t)((c & 0x8000) ? (c << 1) ^ 0x8005 : (c << 1));
    }
    return c;
}

/* Append zigzag+Rice-coded residuals at a bit position; returns the new
 * bit position or -1 if the buffer would overflow (caller falls back to
 * a verbatim subframe).  The encoding twin of the decode loop above. */
long long flac_write_rice(uint8_t *buf, long long cap_bytes,
                          long long bitpos, const int32_t *res, int n,
                          int k) {
    long long cap = cap_bytes * 8;
    for (int i = 0; i < n; i++) {
        int64_t r = res[i];
        uint64_t u = (r < 0) ? ((uint64_t)(-(r + 1)) << 1) | 1
                             : (uint64_t)r << 1;
        uint64_t q = u >> k;
        if (bitpos + (long long)q + 1 + k > cap) return -1;
        bitpos += (long long)q;            /* q zero bits (buf pre-zeroed) */
        buf[bitpos >> 3] |= (uint8_t)(0x80 >> (bitpos & 7));
        bitpos++;
        for (int j = k - 1; j >= 0; j--) {
            if ((u >> j) & 1)
                buf[bitpos >> 3] |= (uint8_t)(0x80 >> (bitpos & 7));
            bitpos++;
        }
    }
    return bitpos;
}
