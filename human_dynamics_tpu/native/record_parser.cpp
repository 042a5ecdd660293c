// Native TFRecord framing + tf.train.Example feature extraction.
//
// The TPU-native data loader's host-side hot path: record framing
// (length + masked crc32c) and protobuf Example parsing without any
// TensorFlow/protobuf runtime dependency. Mirrors the wire-format logic
// of human_dynamics_tpu/data/tfrecord.py; the Python package uses this
// library when present (see data/tfrecord_native.py) and falls back to
// the pure-Python codec otherwise.
//
// Build: g++ -O3 -shared -fPIC record_parser.cpp -o librecord_parser.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

struct Reader {
    FILE* f;
};

bool read_varint(const uint8_t* data, long len, long* pos, uint64_t* out) {
    uint64_t result = 0;
    int shift = 0;
    while (*pos < len) {
        uint8_t b = data[*pos];
        (*pos)++;
        result |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) {
            *out = result;
            return true;
        }
        shift += 7;
        if (shift > 63) return false;
    }
    return false;
}

// Locate the serialized Feature payload for `key` inside an Example.
// Returns pointer+len of the Feature message, or nullptr.
const uint8_t* find_feature(
    const uint8_t* data, long len, const char* key, long* out_len)
{
    const long key_len = (long)strlen(key);
    long pos = 0;
    while (pos < len) {
        uint64_t tag, flen;
        if (!read_varint(data, len, &pos, &tag)) return nullptr;
        if ((tag >> 3) != 1 || (tag & 7) != 2) return nullptr;
        if (!read_varint(data, len, &pos, &flen)) return nullptr;
        if (pos + (long)flen > len) return nullptr;  // truncated buffer
        const uint8_t* fdata = data + pos;
        long fend = (long)flen;
        pos += (long)flen;
        // Features message: repeated map entries (field 1).
        long fpos = 0;
        while (fpos < fend) {
            uint64_t etag, elen;
            if (!read_varint(fdata, fend, &fpos, &etag)) return nullptr;
            if (!read_varint(fdata, fend, &fpos, &elen)) return nullptr;
            if (fpos + (long)elen > fend) return nullptr;  // truncated
            const uint8_t* entry = fdata + fpos;
            long eend = (long)elen;
            fpos += (long)elen;
            // Map entry: key (field 1), value (field 2).
            long epos = 0;
            const uint8_t* k = nullptr;
            long klen = 0;
            const uint8_t* v = nullptr;
            long vlen = 0;
            while (epos < eend) {
                uint64_t t, l;
                if (!read_varint(entry, eend, &epos, &t)) return nullptr;
                if (!read_varint(entry, eend, &epos, &l)) return nullptr;
                if (epos + (long)l > eend) return nullptr;  // truncated
                if ((t >> 3) == 1) { k = entry + epos; klen = (long)l; }
                else if ((t >> 3) == 2) { v = entry + epos; vlen = (long)l; }
                epos += (long)l;
            }
            if (k && v && klen == key_len
                    && memcmp(k, key, key_len) == 0) {
                *out_len = vlen;
                return v;
            }
        }
    }
    return nullptr;
}

// Inside a Feature, get the list payload and kind (1 bytes, 2 float,
// 3 int64).
const uint8_t* feature_list(
    const uint8_t* f, long flen, int* kind, long* out_len)
{
    long pos = 0;
    uint64_t tag, len;
    if (!read_varint(f, flen, &pos, &tag)) return nullptr;
    if (!read_varint(f, flen, &pos, &len)) return nullptr;
    if (pos + (long)len > flen) return nullptr;  // truncated buffer
    *kind = (int)(tag >> 3);
    *out_len = (long)len;
    return f + pos;
}

}  // namespace

extern "C" {

// ---- TFRecord framing ----------------------------------------------

void* tfr_open(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    Reader* r = new Reader{f};
    return r;
}

// Reads the next record into a malloc'd buffer (caller frees with
// tfr_free). Returns length, 0 at EOF, -1 on error.
long tfr_next(void* handle, uint8_t** out) {
    Reader* r = (Reader*)handle;
    uint8_t header[12];
    size_t got = fread(header, 1, 12, r->f);
    if (got == 0) return 0;
    if (got < 12) return -1;
    uint64_t length;
    memcpy(&length, header, 8);  // little-endian host assumed
    uint8_t* buf = (uint8_t*)malloc(length + 4);
    if (fread(buf, 1, length + 4, r->f) != length + 4) {
        free(buf);
        return -1;
    }
    *out = buf;  // trailing 4 bytes are the data CRC (unchecked, fast path)
    return (long)length;
}

void tfr_free(uint8_t* buf) { free(buf); }

void tfr_close(void* handle) {
    Reader* r = (Reader*)handle;
    fclose(r->f);
    delete r;
}

// ---- Example feature extraction --------------------------------------

// Copy a packed/unpacked FloatList into out (max capacity). Returns the
// number of floats, -1 if the key is missing or not floats.
long example_get_floats(
    const uint8_t* data, long len, const char* key,
    float* out, long max_out)
{
    long flen;
    const uint8_t* f = find_feature(data, len, key, &flen);
    if (!f) return -1;
    int kind;
    long llen;
    const uint8_t* l = feature_list(f, flen, &kind, &llen);
    if (!l || kind != 2) return -1;
    long pos = 0;
    long count = 0;
    while (pos < llen) {
        uint64_t tag;
        if (!read_varint(l, llen, &pos, &tag)) return -1;
        int wire = (int)(tag & 7);
        if (wire == 2) {  // packed
            uint64_t plen;
            if (!read_varint(l, llen, &pos, &plen)) return -1;
            if (pos + (long)plen > llen) return -1;  // truncated payload
            long n = (long)plen / 4;
            if (count + n > max_out) n = max_out - count;
            memcpy(out + count, l + pos, n * 4);
            count += n;
            pos += (long)plen;
        } else if (wire == 5) {  // single float
            if (pos + 4 > llen) return -1;  // truncated payload
            if (count < max_out) memcpy(out + count, l + pos, 4);
            count += 1;
            pos += 4;
        } else {
            return -1;
        }
    }
    return count;
}

// Copy floats [offset, offset + max_out) of a FloatList into out,
// skipping the prefix without copying it. Returns the number of floats
// written, -1 if the key is missing or not floats. This is the training
// loader's hot path: a T=20 window of a 120-frame tube touches ~1/6 of
// the ~1 MB phi payload.
long example_get_floats_range(
    const uint8_t* data, long len, const char* key, long offset,
    float* out, long max_out)
{
    long flen;
    const uint8_t* f = find_feature(data, len, key, &flen);
    if (!f) return -1;
    int kind;
    long llen;
    const uint8_t* l = feature_list(f, flen, &kind, &llen);
    if (!l || kind != 2) return -1;
    long pos = 0;
    long idx = 0;     // index of the next float in the list
    long count = 0;   // floats written
    while (pos < llen && count < max_out) {
        uint64_t tag;
        if (!read_varint(l, llen, &pos, &tag)) return -1;
        int wire = (int)(tag & 7);
        if (wire == 2) {  // packed chunk
            uint64_t plen;
            if (!read_varint(l, llen, &pos, &plen)) return -1;
            if (pos + (long)plen > llen) return -1;  // truncated payload
            long n = (long)plen / 4;
            long lo = offset > idx ? offset - idx : 0;   // skip within chunk
            if (lo < n) {
                long take = n - lo;
                if (take > max_out - count) take = max_out - count;
                memcpy(out + count, l + pos + lo * 4, take * 4);
                count += take;
            }
            idx += n;
            pos += (long)plen;
        } else if (wire == 5) {
            if (pos + 4 > llen) return -1;  // truncated payload
            if (idx >= offset && count < max_out) {
                memcpy(out + count, l + pos, 4);
                count++;
            }
            idx++;
            pos += 4;
        } else {
            return -1;
        }
    }
    return count;
}

// Int64List -> int64 buffer. Returns count or -1.
long example_get_ints(
    const uint8_t* data, long len, const char* key,
    long long* out, long max_out)
{
    long flen;
    const uint8_t* f = find_feature(data, len, key, &flen);
    if (!f) return -1;
    int kind;
    long llen;
    const uint8_t* l = feature_list(f, flen, &kind, &llen);
    if (!l || kind != 3) return -1;
    long pos = 0;
    long count = 0;
    while (pos < llen) {
        uint64_t tag;
        if (!read_varint(l, llen, &pos, &tag)) return -1;
        int wire = (int)(tag & 7);
        if (wire == 2) {
            uint64_t plen;
            if (!read_varint(l, llen, &pos, &plen)) return -1;
            long end = pos + (long)plen;
            if (end > llen) return -1;  // truncated payload
            while (pos < end) {
                uint64_t v;
                if (!read_varint(l, llen, &pos, &v)) return -1;
                if (count < max_out) out[count] = (long long)v;
                count++;
            }
        } else if (wire == 0) {
            uint64_t v;
            if (!read_varint(l, llen, &pos, &v)) return -1;
            if (count < max_out) out[count] = (long long)v;
            count++;
        } else {
            return -1;
        }
    }
    return count;
}

// Number of elements in a FloatList/Int64List/BytesList (for sizing).
long example_get_count(const uint8_t* data, long len, const char* key) {
    long flen;
    const uint8_t* f = find_feature(data, len, key, &flen);
    if (!f) return -1;
    int kind;
    long llen;
    const uint8_t* l = feature_list(f, flen, &kind, &llen);
    if (!l) return -1;
    long pos = 0;
    long count = 0;
    while (pos < llen) {
        uint64_t tag;
        if (!read_varint(l, llen, &pos, &tag)) return -1;
        int wire = (int)(tag & 7);
        if (wire == 2 && kind == 2) {
            uint64_t plen;
            if (!read_varint(l, llen, &pos, &plen)) return -1;
            if (pos + (long)plen > llen) return -1;  // truncated payload
            count += (long)plen / 4;
            pos += (long)plen;
        } else if (wire == 2) {  // packed varints or bytes entry
            uint64_t plen;
            if (!read_varint(l, llen, &pos, &plen)) return -1;
            if (pos + (long)plen > llen) return -1;  // truncated payload
            if (kind == 1) {
                count += 1;
                pos += (long)plen;
            } else {
                long end = pos + (long)plen;
                while (pos < end) {
                    uint64_t v;
                    if (!read_varint(l, llen, &pos, &v)) return -1;
                    count++;
                }
            }
        } else if (wire == 0) {
            uint64_t v;
            if (!read_varint(l, llen, &pos, &v)) return -1;
            count++;
        } else if (wire == 5) {
            if (pos + 4 > llen) return -1;  // truncated payload
            count++;
            pos += 4;
        } else {
            return -1;
        }
    }
    return count;
}

}  // extern "C"
