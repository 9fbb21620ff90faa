// Native R1CS evaluator: <A,w> * <B,w> == <C,w> over BN254 Fr.
//
// The role circom's C++ witness-generator main loop and rapidsnark's
// constraint handling play in the reference (SURVEY.md §2.5): exact
// 256-bit modular arithmetic in 4x64 limbs with Montgomery multiplication,
// OpenMP over constraints. Python's per-row evaluator takes minutes at
// 10^7 constraints; this does it in seconds.
//
// ABI (ctypes): little-endian 4x64 limb field elements as uint64 arrays.
//   zkpoa_r1cs_eval(n_constraints, n_rows_{a,b,c}, rows_{a,b,c},
//                   witness, n_wires, out_bad_index) -> 0 ok / 1 unsatisfied
// Row encoding: per row three uint64 words (constraint, wire) then 4 limbs
// of the coefficient in MONTGOMERY form.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

typedef unsigned __int128 u128;

// BN254 Fr modulus, little-endian 64-bit limbs
static const uint64_t MOD[4] = {
    0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
    0xb85045b68181585dULL, 0x30644e72e131a029ULL};
// -MOD^-1 mod 2^64
static const uint64_t N0INV = 0xc2e1f593efffffffULL;

struct Fr {
  uint64_t v[4];
};

static inline bool geq(const uint64_t a[4], const uint64_t b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;
}

static inline void sub_mod_once(uint64_t a[4]) {
  if (!geq(a, MOD)) return;
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - MOD[i] - borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
}

static inline void add_mod(uint64_t out[4], const uint64_t a[4],
                           const uint64_t b[4]) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    out[i] = (uint64_t)s;
    carry = s >> 64;
  }
  // carry can only be 0 here for inputs < MOD < 2^254
  sub_mod_once(out);
}

// CIOS Montgomery multiplication: out = a*b*R^-1 mod MOD
static inline void mont_mul(uint64_t out[4], const uint64_t a[4],
                            const uint64_t b[4]) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a[j] * b[i] + carry;
      t[j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (uint64_t)cur;
    t[5] = (uint64_t)(cur >> 64);

    uint64_t m = t[0] * N0INV;
    carry = 0;
    {
      u128 c0 = (u128)t[0] + (u128)m * MOD[0];
      carry = c0 >> 64;
    }
    for (int j = 1; j < 4; ++j) {
      u128 cur2 = (u128)t[j] + (u128)m * MOD[j] + carry;
      t[j - 1] = (uint64_t)cur2;
      carry = cur2 >> 64;
    }
    u128 c4 = (u128)t[4] + carry;
    t[3] = (uint64_t)c4;
    t[4] = t[5] + (uint64_t)(c4 >> 64);
    t[5] = 0;
  }
  out[0] = t[0];
  out[1] = t[1];
  out[2] = t[2];
  out[3] = t[3];
  // t[4] is 0 or 1; fold then reduce
  if (t[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
      u128 d = (u128)out[i] - MOD[i] - borrow;
      out[i] = (uint64_t)d;
      borrow = (d >> 64) & 1;
    }
    // t[4] == 1 guarantees value >= 2^256 > MOD, subtraction is exact
  } else {
    sub_mod_once(out);
  }
}

struct Row {
  uint64_t constraint;
  uint64_t wire;
  uint64_t coeff[4];  // Montgomery form
};

static void accumulate(std::vector<Fr>& acc, const Row* rows, uint64_t n_rows,
                       const uint64_t* witness_mont) {
  // rows are sorted by constraint (the builders emit them in order), so a
  // simple parallel partition over row ranges with private accumulation
  // would race on shared constraints; instead each thread takes a slice
  // of CONSTRAINT ids via binary search on the sorted rows.
#ifdef _OPENMP
#pragma omp parallel
  {
    int tid = omp_get_thread_num();
    int nth = omp_get_num_threads();
    uint64_t lo = n_rows * tid / nth, hi = n_rows * (tid + 1) / nth;
    // snap boundaries to constraint boundaries
    while (lo > 0 && lo < n_rows &&
           rows[lo].constraint == rows[lo - 1].constraint)
      ++lo;
    while (hi < n_rows && hi > 0 &&
           rows[hi].constraint == rows[hi - 1].constraint)
      ++hi;
    for (uint64_t r = lo; r < hi; ++r) {
      const Row& row = rows[r];
      uint64_t prod[4];
      mont_mul(prod, row.coeff, witness_mont + 4 * row.wire);
      add_mod(acc[row.constraint].v, acc[row.constraint].v, prod);
    }
  }
#else
  for (uint64_t r = 0; r < n_rows; ++r) {
    const Row& row = rows[r];
    uint64_t prod[4];
    mont_mul(prod, row.coeff, witness_mont + 4 * row.wire);
    add_mod(acc[row.constraint].v, acc[row.constraint].v, prod);
  }
#endif
}

}  // namespace

extern "C" {

// witness: n_wires * 4 uint64 limbs, PLAIN (non-Montgomery) form.
// rows_*: packed Row records (6 uint64 each), coeffs in MONTGOMERY form,
//         sorted by constraint id.
// Returns 0 if satisfied; 1 otherwise with *bad_index = first failing
// constraint.
int zkpoa_r1cs_eval(uint64_t n_constraints, uint64_t n_wires,
                    const uint64_t* witness_plain, uint64_t n_rows_a,
                    const uint64_t* rows_a, uint64_t n_rows_b,
                    const uint64_t* rows_b, uint64_t n_rows_c,
                    const uint64_t* rows_c, uint64_t* bad_index) {
  // R^2 mod MOD for Montgomery encoding of the witness
  static const uint64_t R2[4] = {
      0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
      0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};

  std::vector<uint64_t> wmont(4 * n_wires);
#ifdef _OPENMP
#pragma omp parallel for
#endif
  for (int64_t i = 0; i < (int64_t)n_wires; ++i)
    mont_mul(&wmont[4 * i], witness_plain + 4 * i, R2);

  std::vector<Fr> a(n_constraints), b(n_constraints), c(n_constraints);
  std::memset(a.data(), 0, sizeof(Fr) * n_constraints);
  std::memset(b.data(), 0, sizeof(Fr) * n_constraints);
  std::memset(c.data(), 0, sizeof(Fr) * n_constraints);
  accumulate(a, (const Row*)rows_a, n_rows_a, wmont.data());
  accumulate(b, (const Row*)rows_b, n_rows_b, wmont.data());
  accumulate(c, (const Row*)rows_c, n_rows_c, wmont.data());

  int bad = -1;
#ifdef _OPENMP
#pragma omp parallel for
#endif
  for (int64_t i = 0; i < (int64_t)n_constraints; ++i) {
    uint64_t ab[4];
    mont_mul(ab, a[i].v, b[i].v);
    if (std::memcmp(ab, c[i].v, 32) != 0) {
#ifdef _OPENMP
#pragma omp critical
#endif
      if (bad < 0 || i < bad) bad = (int)i;
    }
  }
  if (bad >= 0) {
    *bad_index = (uint64_t)bad;
    return 1;
  }
  return 0;
}
}
