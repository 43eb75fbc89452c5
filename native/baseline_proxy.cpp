// Measured CPU proxy of the reference's witness-generation hot path.
//
// The reference (DelphinusLab/halo2ecc-s, Rust) publishes no benchmark
// numbers and Rust is not available in this image, so this proxy re-creates
// its int_mul witness loop (src/circuit/integer_chip.rs:466-483 int_mul,
// :236-281 assign_w/assign_d, :73-215 mul-equation constraints;
// src/circuit/range_chip.rs:262-348 limb assignment;
// src/circuit/base_chip.rs:134-281 sum_with_constant/mul_add rows) in C++
// at the same algorithmic fidelity the Rust code has:
//   - every gate-witness value is computed in Montgomery form over bn254 Fr
//     (halo2's field arithmetic),
//   - bigint hints (d, rem = a*b div/mod w; carries v_h/v_l) use exact
//     512-bit arithmetic with Barrett division (num_bigint uses schoolbook
//     division + heap allocation, so this proxy is if anything FASTER than
//     the Rust original — the derived baseline is conservative),
//   - every advice/fixed cell write stores 4x u64 into dense preallocated
//     row tables (the Records layout, src/context.rs:241-301).
//
// Workload per instance: assign_w(a); assign_w(b); int_mul(a, b) for
// bn254 Fq over Fr — identical to bench.py's TPU template (63 rows/inst).
//
// Usage: baseline_proxy <instances_per_thread> <threads>
// Prints one JSON line {rows, secs, rows_per_sec, threads}.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>
#include <chrono>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------- bigint ---
// Fixed 8-limb (512-bit) little-endian values.

struct U512 {
    u64 l[8];
};

static inline void clear8(U512 &x) { memset(x.l, 0, sizeof(x.l)); }

// 4x4 -> 8 limb product
static inline void mul256(const u64 a[4], const u64 b[4], U512 &out) {
    clear8(out);
    for (int i = 0; i < 4; i++) {
        u64 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 t = (u128)a[i] * b[j] + out.l[i + j] + carry;
            out.l[i + j] = (u64)t;
            carry = (u64)(t >> 64);
        }
        out.l[i + 4] = carry;
    }
}

// x -= y (x >= y), 8 limbs
static inline void sub8(U512 &x, const U512 &y) {
    u64 borrow = 0;
    for (int i = 0; i < 8; i++) {
        u128 t = (u128)x.l[i] - y.l[i] - borrow;
        x.l[i] = (u64)t;
        borrow = (t >> 64) ? 1 : 0;
    }
}

static inline bool geq8(const U512 &x, const U512 &y) {
    for (int i = 7; i >= 0; i--) {
        if (x.l[i] != y.l[i]) return x.l[i] > y.l[i];
    }
    return true;
}

// Barrett structure for division by a fixed ~254-bit modulus m:
// mu = floor(2^512 / m) (5 limbs). q = ((x >> 192) * mu) >> 320 approx.
struct Barrett {
    u64 m[4];
    u64 mu[5];
};

// q ~ floor(x / m); exact after <=2 corrections. Returns q (4+1 limbs) and
// rem (4 limbs).
static inline void div_rem(const Barrett &bar, const U512 &x, u64 q_out[5], u64 r_out[4]) {
    // q1 = x >> 192 (5 limbs used)
    u64 q1[5];
    for (int i = 0; i < 5; i++) q1[i] = x.l[i + 3];
    // q2 = q1 * mu (10 limbs; we need limbs >= 5 => (q1*mu) >> 320)
    u64 q2[10];
    memset(q2, 0, sizeof(q2));
    for (int i = 0; i < 5; i++) {
        u64 carry = 0;
        for (int j = 0; j < 5; j++) {
            u128 t = (u128)q1[i] * bar.mu[j] + q2[i + j] + carry;
            q2[i + j] = (u64)t;
            carry = (u64)(t >> 64);
        }
        q2[i + 5] = carry;
    }
    u64 q[5];
    for (int i = 0; i < 5; i++) q[i] = q2[i + 5];
    // r = x - q*m
    U512 qm;
    clear8(qm);
    for (int i = 0; i < 5; i++) {
        u64 carry = 0;
        for (int j = 0; j < 4 && i + j < 8; j++) {
            u128 t = (u128)q[i] * bar.m[j] + qm.l[i + j] + carry;
            qm.l[i + j] = (u64)t;
            carry = (u64)(t >> 64);
        }
        if (i + 4 < 8) qm.l[i + 4] += carry;
    }
    U512 r = x;
    sub8(r, qm);
    // corrections
    U512 m8;
    clear8(m8);
    for (int i = 0; i < 4; i++) m8.l[i] = bar.m[i];
    while (geq8(r, m8)) {
        sub8(r, m8);
        u64 carry = 1;
        for (int i = 0; i < 5 && carry; i++) {
            u128 t = (u128)q[i] + carry;
            q[i] = (u64)t;
            carry = (u64)(t >> 64);
        }
    }
    for (int i = 0; i < 5; i++) q_out[i] = q[i];
    for (int i = 0; i < 4; i++) r_out[i] = r.l[i];
}

// ------------------------------------------------------------- Montgomery ---
// bn254 Fr in Montgomery form (R = 2^256), CIOS multiplication — the same
// arithmetic halo2's FieldExt uses for every witness value.

struct Fr {
    u64 l[4];
};

static const u64 FR_MOD[4] = {
    0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
    0xb85045b68181585dULL, 0x30644e72e131a029ULL,
};

static u64 FR_NP;       // -p^{-1} mod 2^64
static Fr FR_R2;        // R^2 mod p (to-Montgomery constant)

static inline void mont_mul(const Fr &a, const Fr &b, Fr &out) {
    u64 t[5] = {0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u64 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)a.l[j] * b.l[i] + t[j] + carry;
            t[j] = (u64)s;
            carry = (u64)(s >> 64);
        }
        u64 t4 = t[4] + carry;
        u64 m = t[0] * FR_NP;
        u128 s = (u128)m * FR_MOD[0] + t[0];
        carry = (u64)(s >> 64);
        for (int j = 1; j < 4; j++) {
            s = (u128)m * FR_MOD[j] + t[j] + carry;
            t[j - 1] = (u64)s;
            carry = (u64)(s >> 64);
        }
        u128 s2 = (u128)t4 + carry;
        t[3] = (u64)s2;
        t[4] = (u64)(s2 >> 64);
    }
    // conditional subtract
    u64 borrow = 0;
    u64 r[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)t[i] - FR_MOD[i] - borrow;
        r[i] = (u64)s;
        borrow = (s >> 64) ? 1 : 0;
    }
    bool use_sub = (t[4] != 0) || !borrow;
    for (int i = 0; i < 4; i++) out.l[i] = use_sub ? r[i] : t[i];
}

static inline void mont_add(const Fr &a, const Fr &b, Fr &out) {
    u64 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        t[i] = (u64)s;
        carry = (u64)(s >> 64);
    }
    u64 borrow = 0;
    u64 r[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)t[i] - FR_MOD[i] - borrow;
        r[i] = (u64)s;
        borrow = (s >> 64) ? 1 : 0;
    }
    bool use_sub = carry || !borrow;
    for (int i = 0; i < 4; i++) out.l[i] = use_sub ? r[i] : t[i];
}

// to Montgomery: a * R^2 * R^{-1} = a*R
static inline void to_mont(const u64 a[4], Fr &out) {
    Fr t;
    memcpy(t.l, a, 32);
    mont_mul(t, FR_R2, out);
}

// from Montgomery: a * 1 * R^{-1}
static inline void from_mont(const Fr &a, u64 out[4]) {
    Fr one_raw;
    memset(one_raw.l, 0, 32);
    one_raw.l[0] = 1;
    Fr r;
    mont_mul(a, one_raw, r);
    memcpy(out, r.l, 32);
}

static void init_constants() {
    // FR_NP = -p^{-1} mod 2^64 by Newton iteration
    u64 p0 = FR_MOD[0];
    u64 inv = 1;
    for (int i = 0; i < 6; i++) inv *= 2 - p0 * inv;
    FR_NP = (u64)(0 - inv);
    // R2 = 2^512 mod p via repeated doubling of 2^256 mod p
    // first compute 2^256 mod p by long division of [0,0,0,0,1]
    U512 x;
    clear8(x);
    x.l[4] = 1;
    U512 m8;
    clear8(m8);
    for (int i = 0; i < 4; i++) m8.l[i] = FR_MOD[i];
    // shift-subtract (p ~ 2^254, so only a few iterations)
    for (int bit = 2; bit >= 0; bit--) {
        U512 shifted = m8;
        // shifted = m << (64*? ) simple approach: repeated compare-subtract
        (void)shifted;
        (void)bit;
    }
    // simpler: reduce by repeated subtraction of m<<k
    for (int k = 70; k >= 0; k--) {
        // y = m << k
        U512 y;
        clear8(y);
        int word = k / 64, sh = k % 64;
        for (int i = 7; i >= 0; i--) {
            u64 v = 0;
            if (i - word >= 0 && i - word < 4) v = m8.l[i - word] << sh;
            if (sh && i - word - 1 >= 0 && i - word - 1 < 4)
                v |= m8.l[i - word - 1] >> (64 - sh);
            y.l[i] = v;
        }
        while (geq8(x, y) && (y.l[7] | y.l[6] | y.l[5] | y.l[4] | y.l[3] | y.l[2] | y.l[1] | y.l[0]))
            sub8(x, y);
    }
    u64 r256[4];
    for (int i = 0; i < 4; i++) r256[i] = x.l[i];
    // R2 = (2^256 mod p)^2 * ... we need 2^512 mod p = (2^256 mod p)^2 mod p
    U512 sq;
    mul256(r256, r256, sq);
    Barrett bar;
    memcpy(bar.m, FR_MOD, 32);
    // mu = 2^512 / p
    // compute via long division: mu ~ 258 bits; do bitwise restoring division
    {
        // numerator 2^512 as 9-limb conceptual; do division by shifts
        // straightforward bitwise: q accumulates
        u64 mu[5] = {0, 0, 0, 0, 0};
        U512 rem;
        clear8(rem);
        // process bits 512..0 of N = 2^512: bit 512 set only.
        // rem = 1 at bit 512: simulate with rem carrying values < 2*m
        // Standard approach: rem starts 1 (the single set bit), then 512 shifts.
        rem.l[0] = 1;
        for (int bit = 511; bit >= 0; bit--) {
            // rem <<= 1
            u64 carry = 0;
            for (int i = 0; i < 8; i++) {
                u64 nv = (rem.l[i] << 1) | carry;
                carry = rem.l[i] >> 63;
                rem.l[i] = nv;
            }
            if (geq8(rem, m8)) {
                sub8(rem, m8);
                mu[bit / 64] |= 1ULL << (bit % 64);
            }
        }
        memcpy(bar.mu, mu, sizeof(mu));
    }
    u64 q[5], r[4];
    div_rem(bar, sq, q, r);
    memcpy(FR_R2.l, r, 32);
}

// --------------------------------------------------------------- records ---
// Dense witness tables, Records layout (context.rs:241-301): u64x4 cells.

struct Tables {
    std::vector<u64> base_adv;   // [rows][5][4]
    std::vector<u64> base_fix;   // [rows][9][4]
    std::vector<u64> range_adv;  // [rows][3][4]
    std::vector<u64> range_fix;  // [rows][2][4]
    size_t base_row = 0, range_row = 0;

    void init(size_t rows) {
        base_adv.assign(rows * 5 * 4, 0);
        base_fix.assign(rows * 9 * 4, 0);
        range_adv.assign(rows * 3 * 4, 0);
        range_fix.assign(rows * 2 * 4, 0);
    }
    inline void wb_adv(size_t row, int col, const u64 v[4]) {
        memcpy(&base_adv[(row * 5 + col) * 4], v, 32);
    }
    inline void wb_fix(size_t row, int col, const u64 v[4]) {
        memcpy(&base_fix[(row * 9 + col) * 4], v, 32);
    }
    inline void wr_adv(size_t row, int col, const u64 v[4]) {
        memcpy(&range_adv[(row * 3 + col) * 4], v, 32);
    }
    inline void wr_fix(size_t row, int col, const u64 v[4]) {
        memcpy(&range_fix[(row * 2 + col) * 4], v, 32);
    }
};

// --------------------------------------------------------------- workload ---

struct Ctx {
    Tables tbl;
    Barrett bar_w;   // bn254 Fq (the wrong field W)
    Barrett bar_fr;  // bn254 Fr (native)
    Fr limb_coeff1, limb_coeff2;  // 2^108, 2^216 in Montgomery form
};

static const u64 FQ_MOD[4] = {
    0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
    0xb85045b68181585dULL, 0x30644e72e131a029ULL,
};

// extract bits [lo, lo+nbits) of a 4-limb LE value into out[4]
static inline void bit_slice(const u64 a[4], int lo, int nbits, u64 out[4]) {
    memset(out, 0, 32);
    int word = lo / 64, sh = lo % 64;
    for (int i = 0; i < 4; i++) {
        u64 v = 0;
        if (word + i < 4) v = a[word + i] >> sh;
        if (sh && word + i + 1 < 4) v |= a[word + i + 1] << (64 - sh);
        out[i] = v;
    }
    // mask to nbits
    int full = nbits / 64, rem = nbits % 64;
    for (int i = full + (rem ? 1 : 0); i < 4; i++) out[i] = 0;
    if (rem && full < 4) out[full] &= (1ULL << rem) - 1;
}

// Emit the range rows for one limb assignment (range_chip.rs:262-348):
// decompose into 18-bit chunks, convert each to Montgomery Fr, write rows.
// Returns the number of rows emitted. acc3: 3-line form for 108-bit limbs,
// 2-line for leading limbs (<=72 bits), 1-line for common (18-bit) values.
static int assign_limb_rows(Ctx &c, const u64 limb[4], int bits) {
    int nrows = bits <= 18 ? 1 : (bits <= 72 ? 2 : 3);
    size_t row = c.tbl.range_row;
    int chunks = (bits + 17) / 18;
    u64 tag[4] = {(u64)bits, 0, 0, 0};
    Fr acc;
    memset(acc.l, 0, 32);
    for (int k = 0; k < chunks; k++) {
        u64 chunk[4];
        bit_slice(limb, 18 * k, 18, chunk);
        Fr f;
        to_mont(chunk, f);  // bn_to_field per chunk, as the reference does
        // accumulate acc = acc * 2^18 + chunk (the acc-gate witness value)
        Fr sh;
        memset(sh.l, 0, 32);
        sh.l[0] = 1ULL << 18;
        Fr shm;
        to_mont(sh.l, shm);
        Fr t;
        mont_mul(acc, shm, t);
        mont_add(t, f, acc);
        // write the chunk cell (alternate columns like the 2-col layout)
        c.tbl.wr_adv(row + (k % nrows), k % 2, f.l);
    }
    // fixed cells: acc_lines + tag per row
    for (int r = 0; r < nrows; r++) {
        u64 al[4] = {(u64)nrows, 0, 0, 0};
        c.tbl.wr_fix(row + r, 0, al);
        c.tbl.wr_fix(row + r, 1, tag);
    }
    // the accumulated value cell
    c.tbl.wr_adv(row, 2, acc.l);
    c.tbl.range_row += nrows;
    return nrows;
}

// one base-chip row: write adv values + fixed coeffs (base_chip.rs:50-69)
static void base_row(Ctx &c, const Fr *adv, int n_adv, const Fr *fix, int n_fix) {
    size_t row = c.tbl.base_row++;
    for (int i = 0; i < n_adv && i < 5; i++) c.tbl.wb_adv(row, i, adv[i].l);
    for (int i = 0; i < n_fix && i < 9; i++) c.tbl.wb_fix(row, i, fix[i].l);
}

// assign_w: 3 limbs (108, 108, 38 bits) + native shadow row.
// Returns limbs in Montgomery form through out_limbs, native through native.
static void assign_w(Ctx &c, const u64 v[4], Fr out_limbs[3], Fr &native, int lead_bits) {
    u64 limb[4];
    for (int j = 0; j < 3; j++) {
        int bits = j < 2 ? 108 : lead_bits;
        bit_slice(v, 108 * j, bits, limb);
        assign_limb_rows(c, limb, bits);
        to_mont(limb, out_limbs[j]);
    }
    // native shadow: sum_with_constant over 3 limbs with limb coeffs
    Fr acc = out_limbs[0], t;
    mont_mul(out_limbs[1], c.limb_coeff1, t);
    mont_add(acc, t, acc);
    mont_mul(out_limbs[2], c.limb_coeff2, t);
    mont_add(acc, t, acc);
    native = acc;
    Fr adv[4] = {out_limbs[0], out_limbs[1], out_limbs[2], acc};
    Fr fix[4] = {c.limb_coeff1, c.limb_coeff2, acc, acc};
    base_row(c, adv, 4, fix, 4);
}

// One full instance: assign_w(a); assign_w(b); int_mul(a, b).
// Returns total rows emitted.
static int run_instance(Ctx &c, const u64 a[4], const u64 b[4]) {
    size_t b0 = c.tbl.base_row, r0 = c.tbl.range_row;

    Fr a_limbs[3], b_limbs[3], a_nat, b_nat;
    assign_w(c, a, a_limbs, a_nat, 38);
    assign_w(c, b, b_limbs, b_nat, 38);

    // int_mul: product, div_rem by w (the host-bigint hint computation)
    U512 prod;
    mul256(a, b, prod);
    u64 d[5], rem[4];
    div_rem(c.bar_w, prod, d, rem);

    Fr rem_limbs[3], rem_nat;
    assign_w(c, rem, rem_limbs, rem_nat, 38);
    // assign_d: 267-bit d -> limbs of 108/108/51 bits
    u64 d4[4] = {d[0], d[1], d[2], d[3]};  // d < 2^267 but top limb bits beyond
                                           // 256 are carried via d[4] slice
    Fr d_limbs[3], d_nat;
    {
        u64 limb[4];
        for (int j = 0; j < 3; j++) {
            int bits = j < 2 ? 108 : 51;
            // top limb spans the d[4] boundary for 267-bit d
            if (j < 2) {
                bit_slice(d4, 108 * j, bits, limb);
            } else {
                u64 hi[4] = {d[3], d[4], 0, 0};
                bit_slice(hi, 216 - 192, bits, limb);
            }
            assign_limb_rows(c, limb, bits);
            to_mont(limb, d_limbs[j]);
        }
        Fr acc = d_limbs[0], t;
        mont_mul(d_limbs[1], c.limb_coeff1, t);
        mont_add(acc, t, acc);
        mont_mul(d_limbs[2], c.limb_coeff2, t);
        mont_add(acc, t, acc);
        d_nat = acc;
        Fr adv[4] = {d_limbs[0], d_limbs[1], d_limbs[2], acc};
        base_row(c, adv, 4, adv, 4);
    }

    // mul-equation constraints per check limb (integer_chip.rs:73-193):
    // limb convolution rows + carry rows.
    Fr w_limbs[3];
    {
        u64 limb[4];
        for (int j = 0; j < 3; j++) {
            bit_slice(FQ_MOD, 108 * j, j < 2 ? 108 : 38, limb);
            to_mont(limb, w_limbs[j]);
        }
    }
    Fr carry_h, carry_l;
    memset(carry_h.l, 0, 32);
    memset(carry_l.l, 0, 32);
    for (int pos = 0; pos < 3; pos++) {
        // mul_add_with_next_line over (pos+1) pairs: a_i*b_{pos-i} - d_i*w_{pos-i}
        Fr conv;
        memset(conv.l, 0, 32);
        int pairs = pos + 1;
        for (int i = 0; i <= pos; i++) {
            Fr t1, t2;
            mont_mul(a_limbs[i], b_limbs[pos - i], t1);
            mont_add(conv, t1, conv);
            mont_mul(d_limbs[i], w_limbs[pos - i], t2);
            mont_add(conv, t2, conv);  // (sign folded into fixed coeff)
        }
        int conv_rows = (pairs + 1) / 2;
        for (int r = 0; r < conv_rows; r++) {
            Fr adv[5] = {a_limbs[0], b_limbs[0], d_limbs[0], w_limbs[0], conv};
            base_row(c, adv, 5, adv, 4);
        }
        // carry extraction: u = conv - rem + carries; v_h, v_l = u / 2^108
        Fr u;
        mont_add(conv, rem_limbs[pos], u);
        mont_add(u, carry_h, u);
        mont_add(u, carry_l, u);
        Fr sum_adv[4] = {conv, rem_limbs[pos], carry_h, u};
        base_row(c, sum_adv, 4, sum_adv, 3);  // sum_with_constant row
        u64 u_raw[4];
        from_mont(u, u_raw);  // field_to_bn
        u64 vh[4], vl[4];
        bit_slice(u_raw, 108, 18, vh);
        bit_slice(u_raw, 0, 108, vl);
        assign_limb_rows(c, vh, 18);   // assign_common
        assign_limb_rows(c, vl, 108);  // assign_nonleading_limb
        to_mont(vh, carry_h);
        to_mont(vl, carry_l);
        Fr last_adv[3] = {carry_h, carry_l, u};
        base_row(c, last_adv, 3, last_adv, 3);  // one_line_with_last
    }
    // native-mod constraint (integer_chip.rs:195-215): one mul_add row
    {
        Fr t, wn;
        u64 w_nat_raw[4];
        // w mod n: w < 2n so a conditional subtract models it
        memcpy(w_nat_raw, FQ_MOD, 32);
        to_mont(w_nat_raw, wn);
        mont_mul(a_nat, b_nat, t);
        Fr t2;
        mont_mul(d_nat, wn, t2);
        Fr adv[5] = {a_nat, b_nat, d_nat, wn, rem_nat};
        base_row(c, adv, 5, adv, 3);
    }

    return (int)((c.tbl.base_row - b0) + (c.tbl.range_row - r0));
}

// xorshift RNG for inputs (cheap, excluded from being the bottleneck)
static inline u64 xorshift(u64 &s) {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
}

int main(int argc, char **argv) {
    long per_thread = argc > 1 ? atol(argv[1]) : 200000;
    int threads = argc > 2 ? atoi(argv[2]) : (int)std::thread::hardware_concurrency();
    init_constants();

    // rows per instance (measured from one instance)
    Ctx probe;
    probe.tbl.init(256);
    memcpy(probe.bar_w.m, FQ_MOD, 32);
    memcpy(probe.bar_fr.m, FR_MOD, 32);
    {
        // mu for w by bitwise division (init once, shared later)
        U512 remx;
        clear8(remx);
        remx.l[0] = 1;
        U512 m8;
        clear8(m8);
        for (int i = 0; i < 4; i++) m8.l[i] = FQ_MOD[i];
        u64 mu[5] = {0, 0, 0, 0, 0};
        for (int bit = 511; bit >= 0; bit--) {
            u64 carry = 0;
            for (int i = 0; i < 8; i++) {
                u64 nv = (remx.l[i] << 1) | carry;
                carry = remx.l[i] >> 63;
                remx.l[i] = nv;
            }
            if (geq8(remx, m8)) {
                sub8(remx, m8);
                mu[bit / 64] |= 1ULL << (bit % 64);
            }
        }
        memcpy(probe.bar_w.mu, mu, sizeof(mu));
    }
    {
        u64 c1[4] = {0, 1ULL << 44, 0, 0};  // 2^108
        u64 c2[4] = {0, 0, 0, 0};
        c2[3] = 1ULL << 24;  // 2^216
        to_mont(c1, probe.limb_coeff1);
        to_mont(c2, probe.limb_coeff2);
    }
    u64 seed0 = 0x9e3779b97f4a7c15ULL;
    u64 a0[4], b0[4];
    for (int i = 0; i < 4; i++) a0[i] = xorshift(seed0);
    for (int i = 0; i < 4; i++) b0[i] = xorshift(seed0);
    a0[3] &= (1ULL << 61) - 1;  // < 2^253 < w
    b0[3] &= (1ULL << 61) - 1;
    int rows_per_inst = run_instance(probe, a0, b0);

    auto worker = [&](int tid, double *rows_out) {
        Ctx c;
        // table sized for a window of instances; wrap around (the reference
        // writes each instance to fresh rows of a 2^23-row table — modeled
        // with a 2^20-row window so stores hit memory, not just L1)
        size_t window_rows = 1 << 20;
        c.tbl.init(window_rows);
        c.bar_w = probe.bar_w;
        c.bar_fr = probe.bar_fr;
        c.limb_coeff1 = probe.limb_coeff1;
        c.limb_coeff2 = probe.limb_coeff2;
        u64 seed = 0x2545F4914F6CDD1DULL ^ (u64)tid * 0x9e3779b97f4a7c15ULL;
        long total_rows = 0;
        for (long k = 0; k < per_thread; k++) {
            u64 a[4], b[4];
            for (int i = 0; i < 4; i++) a[i] = xorshift(seed);
            for (int i = 0; i < 4; i++) b[i] = xorshift(seed);
            a[3] &= (1ULL << 61) - 1;
            b[3] &= (1ULL << 61) - 1;
            if (c.tbl.base_row + 64 > window_rows || c.tbl.range_row + 64 > window_rows) {
                c.tbl.base_row = 0;
                c.tbl.range_row = 0;
            }
            total_rows += run_instance(c, a, b);
        }
        *rows_out = (double)total_rows;
    };

    std::vector<std::thread> pool;
    std::vector<double> counts(threads, 0);
    auto t0 = std::chrono::steady_clock::now();
    for (int t = 0; t < threads; t++) pool.emplace_back(worker, t, &counts[t]);
    for (auto &th : pool) th.join();
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double rows = 0;
    for (double v : counts) rows += v;
    printf("{\"rows\": %.0f, \"secs\": %.3f, \"rows_per_sec\": %.0f, "
           "\"threads\": %d, \"rows_per_instance\": %d}\n",
           rows, secs, rows / secs, threads, rows_per_inst);
    return 0;
}
