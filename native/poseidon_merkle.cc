// Native Poseidon-Merkle engine: BN254 Fr Montgomery arithmetic + Poseidon(2)
// permutation + parallel Merkle tree construction (OpenMP).
//
// Role: host-side native equivalent of the reference's Rust `merkle-tree`
// binary (reference scripts/merkle_tree.rs — ark-bn254 + light-poseidon +
// rs_merkle; sequential, 2.5h at 10M leaves). This engine parallelizes leaf
// hashing and every tree level across cores; the TPU engine
// (zkpoa_tpu/merkle/tree.py) is the accelerator path, this one serves
// host-only deployments and cross-checks the TPU results (the reference
// keeps a TS mirror for the same reason, scripts/merkle_tree.ts).
//
// All Poseidon parameters (round constants, MDS, field constants) are
// injected from Python in Montgomery form at init — no tables are baked in,
// so the circomlib-compatible parameter generation stays single-sourced in
// zkpoa_tpu/ops/poseidon_params.py.
//
// Field element representation: 4 x uint64 little-endian limbs, Montgomery
// form (R = 2^256). CIOS multiplication with __uint128 partial products.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

struct Fr {
    u64 v[4];
};

// field constants (set by init)
static u64 MOD[4];
static u64 N0INV;  // -p^-1 mod 2^64

// poseidon t=3 parameters, Montgomery form (set by init)
static int N_ROUNDS_TOTAL = 0;  // R_F + R_P
static int HALF_FULL = 4;       // R_F / 2
static int R_PARTIAL = 0;
static std::vector<Fr> ARK;  // [rounds * 3]
static Fr MDS[3][3];

inline bool geq_mod(const u64 a[4]) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] > MOD[i]) return true;
        if (a[i] < MOD[i]) return false;
    }
    return true;  // equal
}

inline void sub_mod_inplace(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - MOD[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) & 1;  // 1 if underflow
    }
}

inline void fr_add(Fr &out, const Fr &a, const Fr &b) {
    u128 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_mod(t)) sub_mod_inplace(t);
    std::memcpy(out.v, t, sizeof(t));
}

// CIOS Montgomery multiplication (4 limbs, word-level)
inline void fr_mul(Fr &out, const Fr &a, const Fr &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        // t += a * b[i]
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a.v[j] * b.v[i] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur4 = (u128)t[4] + carry;
        t[4] = (u64)cur4;
        t[5] = (u64)(cur4 >> 64);
        // m = t[0] * n0inv mod 2^64; t += m * p; t >>= 64
        u64 m = t[0] * N0INV;
        carry = ((u128)t[0] + (u128)m * MOD[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)m * MOD[j] + carry;
            t[j - 1] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur5 = (u128)t[4] + carry;
        t[3] = (u64)cur5;
        t[4] = t[5] + (u64)(cur5 >> 64);
        t[5] = 0;
    }
    if (t[4] || geq_mod(t)) sub_mod_inplace(t);
    std::memcpy(out.v, t, 32);
}

inline void fr_sqr(Fr &out, const Fr &a) { fr_mul(out, a, a); }

inline void sbox5(Fr &x) {
    Fr x2, x4;
    fr_sqr(x2, x);
    fr_sqr(x4, x2);
    fr_mul(x, x4, x);
}

// Poseidon t=3 permutation on state[3] (Montgomery form)
void poseidon3_permute(Fr state[3]) {
    int rc = 0;
    for (int r = 0; r < N_ROUNDS_TOTAL; ++r) {
        for (int i = 0; i < 3; ++i) fr_add(state[i], state[i], ARK[rc + i]);
        rc += 3;
        bool full = (r < HALF_FULL) || (r >= HALF_FULL + R_PARTIAL);
        if (full) {
            sbox5(state[0]);
            sbox5(state[1]);
            sbox5(state[2]);
        } else {
            sbox5(state[0]);
        }
        Fr ns[3];
        for (int i = 0; i < 3; ++i) {
            Fr acc, tmp;
            fr_mul(acc, MDS[i][0], state[0]);
            fr_mul(tmp, MDS[i][1], state[1]);
            fr_add(acc, acc, tmp);
            fr_mul(tmp, MDS[i][2], state[2]);
            fr_add(acc, acc, tmp);
            ns[i] = acc;
        }
        state[0] = ns[0];
        state[1] = ns[1];
        state[2] = ns[2];
    }
}

inline void poseidon2_hash(Fr &out, const Fr &left, const Fr &right) {
    Fr state[3];
    std::memset(state[0].v, 0, 32);  // initial state 0 (Montgomery 0 == 0)
    state[1] = left;
    state[2] = right;
    poseidon3_permute(state);
    out = state[0];
}

}  // namespace

extern "C" {

// Initialize field + poseidon parameters. All values Montgomery-form 4x64
// little-endian limbs. ark: rounds*3 elements; mds: 9 elements row-major.
void zkpoa_init(const u64 *mod, u64 n0inv, int n_rounds_total, int half_full,
                int r_partial, const u64 *ark, const u64 *mds) {
    std::memcpy(MOD, mod, 32);
    N0INV = n0inv;
    N_ROUNDS_TOTAL = n_rounds_total;
    HALF_FULL = half_full;
    R_PARTIAL = r_partial;
    ARK.resize(n_rounds_total * 3);
    std::memcpy(ARK.data(), ark, (size_t)n_rounds_total * 3 * 32);
    std::memcpy(MDS, mds, 9 * 32);
}

// Batched Poseidon(2): n pairs -> n hashes (all Montgomery form).
void zkpoa_poseidon2_batch(const u64 *left, const u64 *right, u64 *out,
                           int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        Fr l, r, o;
        std::memcpy(l.v, left + 4 * i, 32);
        std::memcpy(r.v, right + 4 * i, 32);
        poseidon2_hash(o, l, r);
        std::memcpy(out + 4 * i, o.v, 32);
    }
}

// Full Merkle build: leaves[n_leaves] (Montgomery) -> flat node array of
// every level (leaves first). out must hold (2*n_leaves - 1) elements.
// n_leaves must be a power of two. Returns number of levels.
int zkpoa_merkle_build(const u64 *leaves, int64_t n_leaves, u64 *out) {
    std::memcpy(out, leaves, (size_t)n_leaves * 32);
    int64_t src = 0;
    int64_t dst = n_leaves;
    int64_t width = n_leaves;
    int levels = 1;
    while (width > 1) {
        int64_t half = width / 2;
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < half; ++i) {
            Fr l, r, o;
            std::memcpy(l.v, out + 4 * (src + 2 * i), 32);
            std::memcpy(r.v, out + 4 * (src + 2 * i + 1), 32);
            poseidon2_hash(o, l, r);
            std::memcpy(out + 4 * (dst + i), o.v, 32);
        }
        src = dst;
        dst += half;
        width = half;
        ++levels;
    }
    return levels;
}

int zkpoa_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
