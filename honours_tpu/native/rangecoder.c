/* Adaptive binary range coder with order-0 / order-1 / context-mixing byte
 * models — the native entropy runtime for the rc/rcc/rccm codec families.
 *
 * This replaces the reference's vendored Turbo-Range-Coder
 * (press/Turbo-Range-Coder/turborc.h: rcsenc order-0, rccsenc order-1,
 * rcmsenc context-mixing) with a from-scratch design; the wire format is
 * ours (documented below), the capability and compression class match.
 *
 * Coder core: LZMA-class binary range coder (32-bit range, 64-bit low with
 * carry cache).  Probabilities are 11-bit, adaptive shift 5.
 *
 * Byte models (each byte = 8 binary decisions down a bit tree, ctx starts
 * at 1 and accumulates decoded bits):
 *   order-0:  probs[256]
 *   order-1:  probs[256][256] selected by previous byte
 *   cm:       logistic mix of order-1 and order-2 bit predictions plus an
 *             APM/SSE stage, weights learned online per context
 *
 * Build: cc -O3 -shared -fPIC rangecoder.c -o librangecoder.so
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <stdlib.h>
#include <math.h>

#define PROB_BITS 11
#define PROB_ONE (1u << PROB_BITS)
#define PROB_INIT (PROB_ONE / 2)
#define ADAPT_SHIFT 5
#define TOP (1u << 24)

/* ---------------- range coder core ---------------- */

typedef struct {
	uint64_t low;
	uint32_t range;
	uint8_t cache;
	uint64_t cache_size;
	uint8_t *out;
	size_t pos;
} Enc;

static void enc_init(Enc *e, uint8_t *out)
{
	e->low = 0;
	e->range = 0xFFFFFFFFu;
	e->cache = 0;
	e->cache_size = 1;
	e->out = out;
	e->pos = 0;
}

static void enc_shift_low(Enc *e)
{
	if ((uint32_t) e->low < 0xFF000000u || (int) (e->low >> 32) != 0) {
		uint8_t carry = (uint8_t) (e->low >> 32);
		uint8_t temp = e->cache;
		do {
			e->out[e->pos++] = (uint8_t) (temp + carry);
			temp = 0xFF;
		} while (--e->cache_size);
		e->cache = (uint8_t) (e->low >> 24);
	}
	e->cache_size++;
	e->low = (uint32_t) e->low << 8;
}

static inline void enc_bit(Enc *e, uint16_t *p, int bit)
{
	uint32_t bound = (e->range >> PROB_BITS) * (*p);
	if (!bit) {
		e->range = bound;
		*p += (PROB_ONE - *p) >> ADAPT_SHIFT;
	} else {
		e->low += bound;
		e->range -= bound;
		*p -= *p >> ADAPT_SHIFT;
	}
	while (e->range < TOP) {
		enc_shift_low(e);
		e->range <<= 8;
	}
}

/* encode a bit at a fixed (externally supplied) probability */
static inline void enc_bit_p(Enc *e, uint32_t p, int bit)
{
	uint32_t bound = (e->range >> PROB_BITS) * p;
	if (!bit) {
		e->range = bound;
	} else {
		e->low += bound;
		e->range -= bound;
	}
	while (e->range < TOP) {
		enc_shift_low(e);
		e->range <<= 8;
	}
}

static size_t enc_flush(Enc *e)
{
	for (int i = 0; i < 5; i++)
		enc_shift_low(e);
	return e->pos;
}

typedef struct {
	uint32_t range;
	uint32_t code;
	const uint8_t *in;
	size_t pos;
	size_t len;
} Dec;

static inline uint8_t dec_byte(Dec *d)
{
	return d->pos < d->len ? d->in[d->pos++] : 0;
}

static void dec_init(Dec *d, const uint8_t *in, size_t len)
{
	d->range = 0xFFFFFFFFu;
	d->code = 0;
	d->in = in;
	d->pos = 0;
	d->len = len;
	dec_byte(d); /* mirror of the encoder's initial cache byte */
	for (int i = 0; i < 4; i++)
		d->code = (d->code << 8) | dec_byte(d);
}

static inline int dec_bit(Dec *d, uint16_t *p)
{
	uint32_t bound = (d->range >> PROB_BITS) * (*p);
	int bit;
	if (d->code < bound) {
		d->range = bound;
		*p += (PROB_ONE - *p) >> ADAPT_SHIFT;
		bit = 0;
	} else {
		d->code -= bound;
		d->range -= bound;
		*p -= *p >> ADAPT_SHIFT;
		bit = 1;
	}
	while (d->range < TOP) {
		d->code = (d->code << 8) | dec_byte(d);
		d->range <<= 8;
	}
	return bit;
}

static inline int dec_bit_p(Dec *d, uint32_t p)
{
	uint32_t bound = (d->range >> PROB_BITS) * p;
	int bit;
	if (d->code < bound) {
		d->range = bound;
		bit = 0;
	} else {
		d->code -= bound;
		d->range -= bound;
		bit = 1;
	}
	while (d->range < TOP) {
		d->code = (d->code << 8) | dec_byte(d);
		d->range <<= 8;
	}
	return bit;
}

/* ---------------- order-0 / order-1 byte models ---------------- */

size_t ht_rc0_encode(const uint8_t *in, size_t n, uint8_t *out)
{
	uint16_t *probs = malloc(256 * sizeof *probs);
	for (int i = 0; i < 256; i++)
		probs[i] = PROB_INIT;
	Enc e;
	enc_init(&e, out);
	for (size_t i = 0; i < n; i++) {
		uint32_t ctx = 1;
		uint8_t b = in[i];
		for (int k = 7; k >= 0; k--) {
			int bit = (b >> k) & 1;
			enc_bit(&e, &probs[ctx], bit);
			ctx = (ctx << 1) | bit;
		}
	}
	free(probs);
	return enc_flush(&e);
}

size_t ht_rc0_decode(const uint8_t *in, size_t nin, uint8_t *out, size_t n)
{
	uint16_t *probs = malloc(256 * sizeof *probs);
	for (int i = 0; i < 256; i++)
		probs[i] = PROB_INIT;
	Dec d;
	dec_init(&d, in, nin);
	for (size_t i = 0; i < n; i++) {
		uint32_t ctx = 1;
		for (int k = 0; k < 8; k++)
			ctx = (ctx << 1) | dec_bit(&d, &probs[ctx]);
		out[i] = (uint8_t) ctx;
	}
	free(probs);
	return d.pos;
}

size_t ht_rc1_encode(const uint8_t *in, size_t n, uint8_t *out)
{
	uint16_t *probs = malloc(256 * 256 * sizeof *probs);
	for (int i = 0; i < 256 * 256; i++)
		probs[i] = PROB_INIT;
	Enc e;
	enc_init(&e, out);
	uint8_t prev = 0;
	for (size_t i = 0; i < n; i++) {
		uint16_t *tree = probs + ((uint32_t) prev << 8);
		uint32_t ctx = 1;
		uint8_t b = in[i];
		for (int k = 7; k >= 0; k--) {
			int bit = (b >> k) & 1;
			enc_bit(&e, &tree[ctx], bit);
			ctx = (ctx << 1) | bit;
		}
		prev = b;
	}
	free(probs);
	return enc_flush(&e);
}

size_t ht_rc1_decode(const uint8_t *in, size_t nin, uint8_t *out, size_t n)
{
	uint16_t *probs = malloc(256 * 256 * sizeof *probs);
	for (int i = 0; i < 256 * 256; i++)
		probs[i] = PROB_INIT;
	Dec d;
	dec_init(&d, in, nin);
	uint8_t prev = 0;
	for (size_t i = 0; i < n; i++) {
		uint16_t *tree = probs + ((uint32_t) prev << 8);
		uint32_t ctx = 1;
		for (int k = 0; k < 8; k++)
			ctx = (ctx << 1) | dec_bit(&d, &tree[ctx]);
		prev = out[i] = (uint8_t) ctx;
	}
	free(probs);
	return d.pos;
}

/* ---------------- context-mixing model (rccm class) ----------------
 *
 * lpaq-style lite: order-0, order-1 and order-2 bit-tree models are
 * stretched and mixed by a logistic mixer whose weight set is selected by
 * the partial-byte context; the mixed probability is refined by two
 * chained APM/SSE stages (partial-byte ctx, then order-1 ctx).
 */

static int STRETCH[4096];
static short SQUASH[8192]; /* index: t + 4096, t in [-4096, 4095] */
static int tables_ready = 0;

static void init_tables(void)
{
	if (tables_ready)
		return;
	for (int t = -4096; t < 4096; t++) {
		double v = 4096.0 / (1.0 + exp(-(double) t / 256.0));
		int s = (int) (v + 0.5);
		if (s < 1)
			s = 1;
		if (s > 4095)
			s = 4095;
		SQUASH[t + 4096] = (short) s;
	}
	int j = -4096;
	for (int p = 1; p < 4096; p++) {
		while (j < 4095 && SQUASH[j + 4096] < p)
			j++;
		STRETCH[p] = j;
	}
	STRETCH[0] = -4096;
	tables_ready = 1;
}

#define NMODELS 4
#define O2_CTX (1u << 16)
#define APM_N 33

/* order-2 cells carry an epoch tag so the 32 MB table never needs a
 * per-read clear: value = (epoch << 12) | prob */
static uint32_t *g_o2 = NULL;
static uint32_t g_o2_epoch = 0;

typedef struct {
	uint16_t o0[256];
	uint16_t *o1;          /* [256][256] fast counters (shift 5) */
	uint16_t *o1s;         /* [256][256] slow counters (shift 7) */
	uint32_t *o2;          /* [O2_CTX][256] epoch-tagged */
	uint32_t epoch;
	int *w;                /* [2048][NMODELS] mixer weights, 16.16 */
	uint16_t *apm1;        /* [256][APM_N] by partial-byte ctx */
	uint16_t *apm2;        /* [256][APM_N] by prev1 */
} CM;

static CM *cm_new(void)
{
	init_tables();
	CM *m = malloc(sizeof *m);
	m->o1 = malloc(256 * 256 * sizeof *m->o1);
	m->o1s = malloc(256 * 256 * sizeof *m->o1s);
	if (!g_o2)
		g_o2 = calloc((size_t) O2_CTX * 256, sizeof *g_o2);
	m->o2 = g_o2;
	m->epoch = ++g_o2_epoch;
	if (m->epoch >= (1u << 16)) { /* epoch wrap: hard reset */
		memset(g_o2, 0, (size_t) O2_CTX * 256 * sizeof *g_o2);
		g_o2_epoch = 1;
		m->epoch = 1;
	}
	m->w = malloc(2048 * NMODELS * sizeof *m->w);
	m->apm1 = malloc(256 * APM_N * sizeof *m->apm1);
	m->apm2 = malloc(256 * APM_N * sizeof *m->apm2);
	for (int i = 0; i < 256; i++)
		m->o0[i] = 2048; /* count 0 */
	for (int i = 0; i < 256 * 256; i++) {
		m->o1[i] = 2048;
		m->o1s[i] = 2048;
	}
	for (int i = 0; i < 2048 * NMODELS; i++)
		m->w[i] = (1 << 16) / NMODELS;
	for (int c = 0; c < 256; c++)
		for (int i = 0; i < APM_N; i++) {
			int idx = ((i - 16) * 256) + 4096;
			if (idx > 8191)
				idx = 8191;
			uint16_t v = (uint16_t) (SQUASH[idx] << 2);
			m->apm1[c * APM_N + i] = v;
			m->apm2[c * APM_N + i] = v;
		}
	return m;
}

static void cm_free(CM *m)
{
	free(m->o1);
	free(m->o1s);
	free(m->w);
	free(m->apm1);
	free(m->apm2);
	free(m);
}

typedef struct {
	uint16_t *p[NMODELS - 1];
	uint32_t *p2cell;
	int p2val;
	int p2cnt;
	int st[NMODELS];
	int mixed;
	int *w;
	uint16_t *a; /* 4 APM cells: a1 lo/hi, a2 lo/hi */
	uint16_t *a_cells[4];
	int fr1, fr2;
	uint32_t p_coder;
	uint32_t epoch_;
} CMStep;

static inline void cm_predict(CM *m, uint8_t prev1, uint8_t prev2,
			      uint32_t ctx, CMStep *s)
{
	uint32_t o2c = ((uint32_t) prev1 << 8) | prev2;
	s->p[0] = &m->o0[ctx];
	s->p[1] = &m->o1[((uint32_t) prev1 << 8) | ctx];
	s->p[2] = &m->o1s[((uint32_t) prev1 << 8) | ctx];
	/* o0/o1 carry a 4-bit visit count in their top bits */
	s->p2cell = &m->o2[((size_t) o2c << 8) | ctx];
	uint32_t cell = *s->p2cell;
	if ((cell >> 16) == m->epoch) {
		s->p2val = (int) (cell & 0xFFF);
		s->p2cnt = (int) ((cell >> 12) & 0xF);
	} else {
		s->p2val = 2048;
		s->p2cnt = 0;
	}
	s->epoch_ = m->epoch;
	s->w = &m->w[((ctx << 3) | (prev1 >> 5)) * NMODELS];
	long long t = 0;
	for (int i = 0; i < NMODELS - 1; i++)
		s->st[i] = STRETCH[*s->p[i] & 0xFFF];
	s->st[NMODELS - 1] = STRETCH[s->p2val];
	for (int i = 0; i < NMODELS; i++)
		t += (long long) s->w[i] * s->st[i];
	t >>= 16;
	if (t < -4095)
		t = -4095;
	if (t > 4095)
		t = 4095;
	s->mixed = (int) t;
	int pm = SQUASH[s->mixed + 4096];
	/* APM stage 1: partial-byte ctx over stretch(pm) */
	int st = STRETCH[pm];
	int i1 = (st + 4096) >> 8, f1 = (st + 4096) & 255;
	s->a_cells[0] = &m->apm1[ctx * APM_N + i1];
	s->a_cells[1] = &m->apm1[ctx * APM_N + i1 + 1];
	s->fr1 = f1;
	int pa1 = ((int) *s->a_cells[0] * (256 - f1) +
		   (int) *s->a_cells[1] * f1) >> 10;
	int pr = (pm + pa1) >> 1;
	/* APM stage 2: prev1 ctx */
	int st2 = STRETCH[pr < 1 ? 1 : (pr > 4095 ? 4095 : pr)];
	int i2 = (st2 + 4096) >> 8, f2 = (st2 + 4096) & 255;
	s->a_cells[2] = &m->apm2[prev1 * APM_N + i2];
	s->a_cells[3] = &m->apm2[prev1 * APM_N + i2 + 1];
	s->fr2 = f2;
	int pa2 = ((int) *s->a_cells[2] * (256 - f2) +
		   (int) *s->a_cells[3] * f2) >> 10;
	int p = (pr + pa2) >> 1;
	if (p < 1)
		p = 1;
	if (p > 4094)
		p = 4094;
	s->p_coder = (uint32_t) (4096 - p) >> 1;
	if (s->p_coder < 1)
		s->p_coder = 1;
	if (s->p_coder > 2046)
		s->p_coder = 2046;
}

static inline void cm_update(CMStep *s, int bit)
{
	/* count-adaptive rate: fast while a context is young */
	static const int CRATE[16] = { 1, 2, 2, 3, 3, 3, 4, 4,
				       4, 4, 5, 5, 5, 5, 5, 5 };
	static const int MAXR[NMODELS - 1] = { 5, 5, 8 };
	for (int i = 0; i < NMODELS - 1; i++) {
		uint16_t cell = *s->p[i];
		int cnt = cell >> 12;
		int p = cell & 0xFFF;
		int r = CRATE[cnt];
		if (r > MAXR[i])
			r = MAXR[i];
		if (i == 2)
			r = MAXR[i]; /* slow model stays slow */
		if (bit)
			p += (4096 - p) >> r;
		else
			p -= p >> r;
		if (p > 4095)
			p = 4095;
		if (cnt < 15)
			cnt++;
		*s->p[i] = (uint16_t) ((cnt << 12) | p);
	}
	{
		int p2 = s->p2val;
		int cnt = s->p2cnt;
		int r = CRATE[cnt];
		if (r > 5)
			r = 5;
		if (bit)
			p2 += (4096 - p2) >> r;
		else
			p2 -= p2 >> r;
		if (p2 > 4095)
			p2 = 4095;
		if (cnt < 15)
			cnt++;
		*s->p2cell = (s->epoch_ << 16) | ((uint32_t) cnt << 12) |
			     (uint32_t) p2;
	}
	int pm = SQUASH[s->mixed + 4096];
	int err = (bit << 12) - pm;
	for (int i = 0; i < NMODELS; i++)
		s->w[i] += (s->st[i] * err) >> 10;
	int target = bit ? 4095 << 2 : 0;
	*s->a_cells[0] += (target - *s->a_cells[0]) >> 7;
	*s->a_cells[1] += (target - *s->a_cells[1]) >> 7;
	*s->a_cells[2] += (target - *s->a_cells[2]) >> 7;
	*s->a_cells[3] += (target - *s->a_cells[3]) >> 7;
}

size_t ht_rccm_encode(const uint8_t *in, size_t n, uint8_t *out)
{
	CM *m = cm_new();
	Enc e;
	enc_init(&e, out);
	uint8_t prev1 = 0, prev2 = 0;
	for (size_t i = 0; i < n; i++) {
		uint32_t ctx = 1;
		uint8_t b = in[i];
		for (int k = 7; k >= 0; k--) {
			int bit = (b >> k) & 1;
			CMStep s;
			cm_predict(m, prev1, prev2, ctx, &s);
			enc_bit_p(&e, s.p_coder, bit);
			cm_update(&s, bit);
			ctx = (ctx << 1) | bit;
		}
		prev2 = prev1;
		prev1 = b;
	}
	cm_free(m);
	return enc_flush(&e);
}

size_t ht_rccm_decode(const uint8_t *in, size_t nin, uint8_t *out, size_t n)
{
	CM *m = cm_new();
	Dec d;
	dec_init(&d, in, nin);
	uint8_t prev1 = 0, prev2 = 0;
	for (size_t i = 0; i < n; i++) {
		uint32_t ctx = 1;
		for (int k = 0; k < 8; k++) {
			CMStep s;
			cm_predict(m, prev1, prev2, ctx, &s);
			int bit = dec_bit_p(&d, s.p_coder);
			cm_update(&s, bit);
			ctx = (ctx << 1) | bit;
		}
		prev2 = prev1;
		prev1 = out[i] = (uint8_t) ctx;
	}
	cm_free(m);
	return d.pos;
}
