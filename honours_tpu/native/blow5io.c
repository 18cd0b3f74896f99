/* Native BLOW5 record scanner/assembler — the IO hot path.
 *
 * The Python layer handles header parsing and codec dispatch; this C
 * layer does the per-record byte work that dominates large-file IO:
 *   - scan the record stream: collect per-record offsets/sizes
 *   - zlib-inflate record payloads into one contiguous arena
 *   - parse primary-column fixed fields and signal blob spans
 * (format per the vendored slow5lib studied for blow5.py:
 *  record = [size:u64 LE][payload]; payload columns slow5_defs.h:84-92)
 *
 * Build: compiled into librangecoder.so (links -lz).
 */

#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

/* Scan records: fill offsets[i] (payload byte offset) and sizes[i].
 * Returns number of records found (<= max_records), or -1 on overrun. */
int64_t ht_blow5_scan(const uint8_t *data, size_t len, size_t start,
		      uint64_t *offsets, uint64_t *sizes,
		      int64_t max_records)
{
	size_t off = start;
	int64_t n = 0;
	while (off + 8 <= len && n < max_records) {
		uint64_t sz;
		memcpy(&sz, data + off, 8);
		off += 8;
		if (off + sz > len)
			return -1;
		offsets[n] = off;
		sizes[n] = sz;
		off += sz;
		n++;
	}
	return n;
}

/* Inflate a zlib stream into out (capacity out_cap).
 * Returns decompressed size or -1. */
int64_t ht_zlib_inflate(const uint8_t *in, size_t in_len, uint8_t *out,
			size_t out_cap)
{
	z_stream zs;
	memset(&zs, 0, sizeof zs);
	if (inflateInit(&zs) != Z_OK)
		return -1;
	zs.next_in = (Bytef *) in;
	zs.avail_in = in_len;
	zs.next_out = out;
	zs.avail_out = out_cap;
	int r = inflate(&zs, Z_FINISH);
	inflateEnd(&zs);
	if (r != Z_STREAM_END)
		return -1;
	return (int64_t) (out_cap - zs.avail_out);
}

/* Parse the fixed prefix of a decompressed record payload.
 * Outputs: read_id span, read_group, 4 doubles, len_raw_signal, and the
 * byte offset of the signal blob.  Returns 0, or -1 on truncation. */
int ht_blow5_parse_fixed(const uint8_t *payload, size_t len,
			 uint32_t *rid_off, uint32_t *rid_len,
			 uint32_t *read_group, double *meta4,
			 uint64_t *len_raw_signal, uint64_t *signal_off)
{
	if (len < 2)
		return -1;
	uint16_t rl;
	memcpy(&rl, payload, 2);
	size_t off = 2;
	if (off + rl + 4 + 32 + 8 > len)
		return -1;
	*rid_off = (uint32_t) off;
	*rid_len = rl;
	off += rl;
	memcpy(read_group, payload + off, 4);
	off += 4;
	memcpy(meta4, payload + off, 32);
	off += 32;
	memcpy(len_raw_signal, payload + off, 8);
	off += 8;
	*signal_off = off;
	return 0;
}
