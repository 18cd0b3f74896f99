/* Table-driven Huffman decode over LSB-first bit streams.
 *
 * The caller supplies a (symbol, code length) LUT indexed by the next
 * `width` stream bits (width >= max code length; built in
 * honours_tpu/kernels/huffman_np.py make_decode_lut).  Matches the
 * reference's decode semantics (press/huffman/huffman.c:1248-1260 walks
 * bits LSB-first) at LUT speed.
 */

#include <stdint.h>
#include <stddef.h>

size_t ht_huffman_decode(const uint8_t *in, size_t in_len,
			 const uint8_t *sym_lut, const uint8_t *len_lut,
			 int width, uint8_t *out, size_t n)
{
	uint64_t buf = 0;
	int nbits = 0;
	size_t pos = 0;
	uint64_t mask = (width >= 64) ? ~0ull : ((1ull << width) - 1);

	for (size_t i = 0; i < n; i++) {
		while (nbits < width) {
			uint64_t b = pos < in_len ? in[pos] : 0;
			pos++;
			buf |= b << nbits;
			nbits += 8;
		}
		uint64_t w = buf & mask;
		out[i] = sym_lut[w];
		int consumed = len_lut[w];
		if (consumed == 0)
			return i; /* corrupt stream guard */
		buf >>= consumed;
		nbits -= consumed;
	}
	return n;
}
