/* Stall segmentation for nanopore raw signal.
 *
 * Re-implementation of the adaptor/stall detector the reference links
 * from sigtk (press/sigtk/src/jnn.c:185-288 jnn_core/jnn_raw, itself
 * adapted from the public SquiggleKit segmenter).  Serial float32
 * arithmetic is preserved exactly so the segment boundaries — and hence
 * the stall-codec streams — match the reference bit-for-bit.
 *
 * Parameters fixed to the cDNA profile the stall codecs use
 * (JNNV1_CDNA_PARAM, press/sigtk/src/jnn.h:40-49): std_scale 0.75,
 * corrector 50, seg_dist 50, window 150, stall_len 0.25, error 5.
 *
 * Build: compiled into librangecoder.so alongside rangecoder.c.
 */

#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>
#include <math.h>

#define CLAMP_MAX 1200.0f
#define CLAMP_MIN 0.0f

/* Returns 1 and fills (*start, *len) with the first detected segment,
 * 0 if none.  Matches find_stall (press/press.c:7728-7746). */
int ht_find_stall(const int16_t *raw, int64_t n, uint16_t *start_out,
		  uint16_t *len_out)
{
	if (n <= 0)
		return 0;

	const float std_scale = 0.75f;
	const int corrector = 50;
	const int seg_dist = 50;
	const int window = 150;
	const float stall_len = 0.25f;
	const int error = 5;

	float *sig = malloc(sizeof *sig * n);
	if (!sig)
		return 0;
	for (int64_t i = 0; i < n; i++) {
		float v = raw[i];
		if (v > CLAMP_MAX)
			v = CLAMP_MAX;
		else if (v < CLAMP_MIN)
			v = CLAMP_MIN;
		sig[i] = v;
	}

	/* serial float32 mean / stddev (sigtk stat.h:17-44 semantics) */
	float sum = 0;
	for (int64_t i = 0; i < n; i++)
		sum += sig[i];
	float mean = sum / n;
	sum = 0;
	for (int64_t i = 0; i < n; i++)
		sum += (sig[i] - mean) * (sig[i] - mean);
	float sd = sqrtf(sum / n);

	float top = mean + sd * std_scale;
	float bot = mean - sd * std_scale;

	/* run state machine: count in-band samples, tolerate short
	 * excursions, emit/merge segments */
	int inseg = 0;
	int err = 0, run_err = 0;
	int count = 0;
	int w = corrector;
	int seg_start = 0, seg_end = 0;
	int64_t first_x = 0, first_y = 0;
	int64_t last_y = 0;
	int nsegs = 0;

	for (int64_t i = 0; i < n; i++) {
		float a = sig[i];
		if (a < top && a > bot) {
			if (!inseg) {
				seg_start = (int) i;
				inseg = 1;
			}
			count++;
			w++;
			if (run_err)
				run_err = 0;
			if (count >= window && count >= w && !(count % w))
				err--;
		} else if (inseg && err < error) {
			count++;
			err++;
			run_err++;
			if (count >= window && count >= w && !(count % w))
				err--;
		} else if (inseg &&
			   (count >= window ||
			    (!nsegs && count >= window * stall_len))) {
			seg_end = (int) i - run_err;
			inseg = 0;
			if (nsegs && seg_start - last_y < seg_dist) {
				/* merge into the previous (last) segment */
				last_y = seg_end;
				if (nsegs == 1)
					first_y = seg_end;
			} else {
				nsegs++;
				last_y = seg_end;
				if (nsegs == 1) {
					first_x = seg_start;
					first_y = seg_end;
				}
			}
			count = 0;
			err = 0;
			run_err = 0;
		} else if (inseg) {
			inseg = 0;
			count = 0;
			err = 0;
			run_err = 0;
		}
	}

	free(sig);
	if (!nsegs)
		return 0;
	*start_out = (uint16_t) first_x;
	*len_out = (uint16_t) (first_y - first_x + 1);
	return 1;
}
