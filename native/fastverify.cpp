// Native constraint-verification backend.
//
// The reference's runtime is native (Rust) end to end; this framework keeps
// the compute path in XLA and implements the host-side runtime hot spots in
// C++: full-table verification of the universal base gate, range region, and
// copy constraints over the raw u64x4 Records buffers (see
// verify/mock_prover.py for the semantics being checked; numpy object-int
// path remains as the reference implementation / fallback).
//
// 256-bit arithmetic: 4x64 limbs, Barrett reduction (HAC 14.42, k=4) with
// unsigned __int128 partial products. Multi-threaded over row chunks.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastverify.so fastverify.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <array>
#include <atomic>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

struct Fp {
    u64 p[4];
    u64 mu[5];  // floor(2^512 / p)
};

inline bool is_zero4(const u64* a) {
    return (a[0] | a[1] | a[2] | a[3]) == 0;
}

inline int cmp_n(const u64* a, const u64* b, int n) {
    for (int i = n - 1; i >= 0; --i) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

// a -= b over n limbs; returns borrow
inline u64 sub_n(u64* a, const u64* b, int n) {
    u64 borrow = 0;
    for (int i = 0; i < n; ++i) {
        u128 t = (u128)a[i] - b[i] - borrow;
        a[i] = (u64)t;
        borrow = (t >> 64) ? 1 : 0;
    }
    return borrow;
}

inline void add_n(u64* a, const u64* b, int n) {
    u64 carry = 0;
    for (int i = 0; i < n; ++i) {
        u128 t = (u128)a[i] + b[i] + carry;
        a[i] = (u64)t;
        carry = (u64)(t >> 64);
    }
}

// out[na+nb] = a[na] * b[nb]
inline void mul_n(u64* out, const u64* a, int na, const u64* b, int nb) {
    std::memset(out, 0, sizeof(u64) * (na + nb));
    for (int i = 0; i < na; ++i) {
        u64 carry = 0;
        for (int j = 0; j < nb; ++j) {
            u128 t = (u128)a[i] * b[j] + out[i + j] + carry;
            out[i + j] = (u64)t;
            carry = (u64)(t >> 64);
        }
        out[i + nb] = carry;
    }
}

// r = x mod p for x < p^2 (x has 8 limbs); Barrett k=4
inline void barrett(const Fp& f, const u64* x, u64* r) {
    u64 q1[5];
    for (int i = 0; i < 5; ++i) q1[i] = x[3 + i];
    u64 q2[10];
    mul_n(q2, q1, 5, f.mu, 5);
    const u64* q3 = q2 + 5;  // floor(q2 / b^5), 5 limbs
    u64 q3p[9];
    mul_n(q3p, q3, 5, f.p, 4);
    u64 rr[5];
    for (int i = 0; i < 5; ++i) rr[i] = x[i];
    sub_n(rr, q3p, 5);  // x - q3*p mod b^5 (non-negative: q3 <= true q)
    u64 pe[5] = {f.p[0], f.p[1], f.p[2], f.p[3], 0};
    for (int it = 0; it < 2; ++it) {
        u64 tmp[5];
        std::memcpy(tmp, rr, sizeof(tmp));
        if (sub_n(tmp, pe, 5) == 0) std::memcpy(rr, tmp, sizeof(tmp));
    }
    for (int i = 0; i < 4; ++i) r[i] = rr[i];
}

inline void mulmod(const Fp& f, const u64* a, const u64* b, u64* r) {
    u64 prod[8];
    mul_n(prod, a, 4, b, 4);
    barrett(f, prod, r);
}

inline void addmod(const Fp& f, const u64* a, const u64* b, u64* r) {
    u64 t[5] = {a[0], a[1], a[2], a[3], 0};
    u64 be[5] = {b[0], b[1], b[2], b[3], 0};
    add_n(t, be, 5);
    u64 pe[5] = {f.p[0], f.p[1], f.p[2], f.p[3], 0};
    u64 tmp[5];
    std::memcpy(tmp, t, sizeof(tmp));
    if (sub_n(tmp, pe, 5) == 0) std::memcpy(t, tmp, sizeof(tmp));
    for (int i = 0; i < 4; ++i) r[i] = t[i];
}

template <typename F>
int64_t parallel_rows(int64_t rows, F&& fn) {
    unsigned nt = std::min<unsigned>(std::thread::hardware_concurrency(), 8);
    if (nt < 1) nt = 1;
    std::atomic<int64_t> bad{-1};
    std::vector<std::thread> threads;
    int64_t chunk = (rows + nt - 1) / nt;
    for (unsigned t = 0; t < nt; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(rows, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back([&, lo, hi]() {
            for (int64_t r = lo; r < hi; ++r) {
                if (bad.load(std::memory_order_relaxed) >= 0) return;
                if (!fn(r)) {
                    int64_t expect = -1;
                    bad.compare_exchange_strong(expect, r);
                    return;
                }
            }
        });
    }
    for (auto& th : threads) th.join();
    return bad.load();
}

}  // namespace

extern "C" {

// adv: (rows+1) x 5 x 4 u64; fix: rows x 9 x 4 u64. Returns first bad row or -1.
int64_t check_base_gate(const u64* adv, const u64* fix, int64_t rows,
                        const u64* p_limbs, const u64* mu_limbs) {
    Fp f;
    std::memcpy(f.p, p_limbs, sizeof(f.p));
    std::memcpy(f.mu, mu_limbs, sizeof(f.mu));

    return parallel_rows(rows, [&](int64_t r) {
        const u64* a = adv + r * 5 * 4;
        const u64* fx = fix + r * 9 * 4;
        u64 acc[4], t[4];
        std::memcpy(acc, fx + 8 * 4, sizeof(acc));  // constant
        // next_coeff * adv[r+1][4]
        mulmod(f, fx + 7 * 4, adv + (r + 1) * 5 * 4 + 4 * 4, t);
        addmod(f, acc, t, acc);
        for (int i = 0; i < 5; ++i) {
            mulmod(f, fx + i * 4, a + i * 4, t);
            addmod(f, acc, t, acc);
        }
        for (int m = 0; m < 2; ++m) {
            u64 ab[4];
            mulmod(f, a + (2 * m) * 4, a + (2 * m + 1) * 4, ab);
            mulmod(f, fx + (5 + m) * 4, ab, t);
            addmod(f, acc, t, acc);
        }
        return is_zero4(acc);
    });
}

// range region: adv (rows+2) x 3 x 4; fix rows x 2 x 4.
// checks lookups (tag <= common_bits, tagged < 2^tag, common < 2^common_bits)
// and the acc_lines gates. Returns first bad row or -1.
int64_t check_range_region(const u64* adv, const u64* fix, int64_t rows,
                           const u64* p_limbs, const u64* mu_limbs,
                           int64_t common_bits) {
    Fp f;
    std::memcpy(f.p, p_limbs, sizeof(f.p));
    std::memcpy(f.mu, mu_limbs, sizeof(f.mu));

    const int ACC = 0, TAGGED = 1, COMMON = 2;
    const int ACC_LINES = 0, TAG = 1;

    return parallel_rows(rows, [&](int64_t r) {
        const u64* fx = fix + r * 2 * 4;
        const u64* tag = fx + TAG * 4;
        const u64* lines = fx + ACC_LINES * 4;
        auto advc = [&](int64_t row, int col) { return adv + (row * 3 + col) * 4; };

        // lookups
        if (tag[1] | tag[2] | tag[3] || tag[0] > (u64)common_bits) return false;
        const u64* tg = advc(r, TAGGED);
        if (tg[1] | tg[2] | tg[3] || (tag[0] < 64 && tg[0] >> tag[0])) return false;
        const u64* cm = advc(r, COMMON);
        if (cm[1] | cm[2] | cm[3] || cm[0] >> common_bits) return false;

        if (lines[1] | lines[2] | lines[3]) return false;
        u64 nl = lines[0];
        if (nl == 0) return true;
        if (nl > 3) return false;

        // acc gate: acc == sum of chunk columns shifted by common_bits steps
        u64 acc[4] = {0, 0, 0, 0};
        u64 shift[4] = {1, 0, 0, 0};
        u64 unit[4] = {1ull << common_bits, 0, 0, 0};
        int k = (int)nl;
        if (k == 1) {
            std::memcpy(acc, advc(r, TAGGED), sizeof(acc));
        } else {
            for (int j = 0; j < k; ++j) {
                u64 t[4];
                mulmod(f, advc(r + j, COMMON), shift, t);
                addmod(f, acc, t, acc);
                mulmod(f, shift, unit, shift);
            }
            for (int j = 0; j < k; ++j) {
                u64 t[4];
                mulmod(f, advc(r + j, TAGGED), shift, t);
                addmod(f, acc, t, acc);
                mulmod(f, shift, unit, shift);
            }
        }
        return cmp_n(acc, advc(r, ACC), 4) == 0;
    });
}

// permutations: idx arrays of length n with (table_id, col, row) per side.
// tables: pointers to 3 adv tables + their col counts + set masks.
int64_t check_permutations(
    const int64_t* rego_a, const int64_t* col_a, const int64_t* row_a,
    const int64_t* rego_b, const int64_t* col_b, const int64_t* row_b,
    int64_t n,
    const u64* tbl0, const uint8_t* set0, int64_t cols0,
    const u64* tbl1, const uint8_t* set1, int64_t cols1,
    const u64* tbl2, const uint8_t* set2, int64_t cols2) {
    const u64* tbls[3] = {tbl0, tbl1, tbl2};
    const uint8_t* sets[3] = {set0, set1, set2};
    int64_t colsv[3] = {cols0, cols1, cols2};

    return parallel_rows(n, [&](int64_t i) {
        int ra = (int)rego_a[i], rb = (int)rego_b[i];
        int64_t ia = row_a[i] * colsv[ra] + col_a[i];
        int64_t ib = row_b[i] * colsv[rb] + col_b[i];
        if (!sets[ra][ia] || !sets[rb][ib]) return false;
        return std::memcmp(tbls[ra] + ia * 4, tbls[rb] + ib * 4, 32) == 0;
    });
}

// select lookup: every row's (limb, sel*2^128 + enc) must appear among rows
// with is_lookup == 0 (or be the all-zero tuple). rows x {adv 2x4, fix 2x4}.
int64_t check_select_lookup(const u64* adv, const u64* fix, int64_t rows,
                            const u64* p_limbs, const u64* mu_limbs) {
    Fp f;
    std::memcpy(f.p, p_limbs, sizeof(f.p));
    std::memcpy(f.mu, mu_limbs, sizeof(f.mu));

    typedef std::array<u64, 8> Key;
    std::vector<Key> table;
    table.reserve(rows + 1);
    table.push_back(Key{});  // empty rows
    for (int64_t r = 0; r < rows; ++r) {
        const u64* is_lookup = fix + (r * 2 + 1) * 4;
        if (is_zero4(is_lookup)) {
            Key k{};
            std::memcpy(k.data(), adv + r * 2 * 4, 32);          // limb
            std::memcpy(k.data() + 4, fix + r * 2 * 4, 32);      // encode
            table.push_back(k);
        }
    }
    std::sort(table.begin(), table.end());
    table.erase(std::unique(table.begin(), table.end()), table.end());

    // sel * 2^128 mod p: shift constant
    u64 shift128[4] = {0, 0, 1, 0};

    return parallel_rows(rows, [&](int64_t r) {
        Key k{};
        std::memcpy(k.data(), adv + r * 2 * 4, 32);
        u64 t[4];
        mulmod(f, adv + (r * 2 + 1) * 4, shift128, t);
        addmod(f, t, fix + r * 2 * 4, t);
        std::memcpy(k.data() + 4, t, 32);
        return std::binary_search(table.begin(), table.end(), k);
    });
}

}  // extern "C"
