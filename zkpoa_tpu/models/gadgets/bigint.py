"""Foreign-field ("bigint") arithmetic gadgets over the native BN254 Fr.

The constraint-side equivalent of the reference's vendored bigint circuit
libraries (circom-ecdsa's bigint.circom for secp256k1 64x4 registers,
circom-pairing's 43x6 BN254 registers — SURVEY.md §2.2): arithmetic in a
foreign prime field p_f is expressed over k limbs of n bits, with products
proven by the witness-quotient identity  a*b = q*p_f + r  checked as a limb
polynomial with a signed carry chain (the CheckCarryToZero pattern,
re-derived; no reference code used).

Limb layouts match the reference's I/O registers (64x4 for secp256k1,
43x6 for BN254-in-circuit, 85x3 for Curve25519 — scripts/lib/field_helper.py
conversions in the reference), so golden input JSON feeds directly.

Soundness invariants:
  * every FF element is range-checked limbwise (< 2^n per limb);
  * products / reductions additionally constrain the result < p_f
    (big_less_than), so equality of elements is limbwise equality;
  * carry bounds: |column_i| <= (k+1)*2^(2n) and carries fit in
    carry_bits = 2n + ceil(log2(k+1)) + 1 - n bits (signed, offset-checked).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from ...fields.bn254 import R as P
from ..r1cs import LC, AnyLC, Circuit, Signal, _lc
from .core import num2bits


@dataclass(frozen=True)
class FFSpec:
    """Foreign field layout: prime p, k limbs of n bits (LSB first)."""

    p: int
    n: int
    k: int
    name: str = ""

    def __post_init__(self):
        assert self.p < (1 << (self.n * self.k))
        # native-field headroom for one column of products + carry
        assert 2 * self.n + (self.k + 2).bit_length() + 2 < 253

    def to_limbs(self, x: int) -> List[int]:
        x = int(x) % self.p
        return [(x >> (self.n * i)) & ((1 << self.n) - 1) for i in range(self.k)]

    def from_limbs(self, limbs: Sequence[int]) -> int:
        v = 0
        for i, limb in enumerate(limbs):
            v |= int(limb) << (self.n * i)
        return v


# Reference-compatible layouts
SECP_FQ = None  # initialized below (avoid import cycle at module load)
SECP_FR = None
BN254_FQ_FF = None
ED25519_FQ_FF = None


class FF:
    """A foreign-field element in-circuit: k limb LCs, each range-checked to
    n bits on allocation. `value` is the concrete witness integer."""

    __slots__ = ("spec", "limbs", "value", "bits")

    def __init__(self, spec: FFSpec, limbs: List[AnyLC], value: int, bits=None):
        self.spec = spec
        self.limbs = [_lc(x) for x in limbs]
        self.value = value % (1 << (spec.n * spec.k))
        self.bits = bits  # per-limb bit signals if allocated via witness()


def ff_witness(c: Circuit, spec: FFSpec, value: int, keep_bits: bool = False) -> FF:
    """Allocate a foreign-field element as fresh range-checked limbs."""
    value = int(value)
    assert 0 <= value < (1 << (spec.n * spec.k))
    limbs = []
    all_bits = []
    v = value
    for _ in range(spec.k):
        limb = c.var(v & ((1 << spec.n) - 1))
        bits = num2bits(c, limb, spec.n)
        limbs.append(limb)
        all_bits.append(bits)
        v >>= spec.n
    return FF(spec, limbs, value, bits=all_bits if keep_bits else None)


def ff_const(c: Circuit, spec: FFSpec, value: int) -> FF:
    value = int(value) % spec.p
    return FF(spec, [LC.const(x) for x in spec.to_limbs(value)], value)


def ff_input(c: Circuit, spec: FFSpec, limbs: List[Signal], values: Sequence[int]) -> FF:
    """Wrap existing limb signals (e.g. circuit inputs in the reference's
    64x4 register format) as an FF element, adding the range checks."""
    for limb in limbs:
        num2bits(c, limb, spec.n)
    return FF(spec, list(limbs), spec.from_limbs(values))


def _carry_bits(spec: FFSpec) -> int:
    """Bits needed for the signed carries of a 2-convolution column."""
    return spec.n + (spec.k + 2).bit_length() + 1


def assert_limb_poly_zero(
    c: Circuit,
    cols: List[LC],
    col_vals: List[int],
    spec: FFSpec,
) -> None:
    """Given column LCs t_i (signed values, |t_i| < (k+2)*2^(2n)) whose
    integer evaluation sum_i t_i * 2^(n*i) is 0, constrain exactly that via
    a sequential signed carry chain. col_vals are the concrete *signed*
    column values for witness generation."""
    n = spec.n
    cb = _carry_bits(spec)
    offset = 1 << cb  # carries live in [-2^cb, 2^cb)
    carry_val = 0
    carry_lc: LC = LC.const(0)
    for i in range(len(cols)):
        total_val = col_vals[i] + carry_val
        assert total_val % (1 << n) == 0, "carry chain: column not divisible"
        new_carry = total_val >> n
        if i == len(cols) - 1:
            # last column: carry must be exactly 0
            c.assert_equal(cols[i] + carry_lc, 0)
            assert new_carry == 0, "carry chain: nonzero final carry"
            return
        assert -offset <= new_carry < offset, "carry out of range"
        carry_sig = c.var((new_carry + offset) % P)  # shifted to non-negative
        num2bits(c, carry_sig, cb + 1)
        carry_lc_new = carry_sig - offset  # the signed carry as an LC
        # t_i + carry_in = carry_out * 2^n
        c.assert_equal(cols[i] + carry_lc, carry_lc_new * (1 << n))
        carry_lc = carry_lc_new
        carry_val = new_carry


def big_less_than(c: Circuit, a: FF, b_limbs: Sequence[int]) -> None:
    """Assert a < b for a constant b given as limbs (used for r < p).
    Chained limbwise compare, most-significant first: lt_i OR (eq_i AND lt_{i-1})."""
    spec = a.spec
    n = spec.n
    # lt/eq per limb via (b_i - a_i) range trick
    lt_flags: List[LC] = []
    eq_flags: List[LC] = []
    for i in range(spec.k):
        ai = a.limbs[i]
        bi = int(b_limbs[i])
        # decompose (b_i - a_i + 2^n) in n+1 bits: bit n == 1 iff a_i <= b_i
        shifted = LC.const(bi) - ai + (1 << n)
        bits = num2bits(c, shifted, n + 1)
        # bit n == 1  <=>  b_i - a_i >= 0  <=>  a_i <= b_i
        le = bits[n]
        from .core import is_zero

        eq = is_zero(c, ai - bi)
        # lt = le AND NOT eq
        lt = c.mul(le, 1 - eq)
        lt_flags.append(_lc(lt))
        eq_flags.append(_lc(eq))
    # fold MSB-first: acc = lt_k-1 + eq_k-1*(lt_k-2 + eq_k-2*(...))
    acc: LC = lt_flags[0]
    for i in range(1, spec.k):
        acc = lt_flags[i] + c.mul(eq_flags[i], acc)
    c.assert_equal(acc, 1)


def _conv_cols(
    c: Circuit, a: FF, b: FF
) -> Tuple[List[LC], List[int]]:
    """Product columns of a*b: cols[i] = sum_{j+l=i} a_j*b_l, as LCs over
    fresh product signals (k^2 mul constraints) + concrete values."""
    spec = a.spec
    k = spec.k
    prods = [[None] * k for _ in range(k)]
    prod_vals = [[0] * k for _ in range(k)]
    a_vals = [c.eval_lc(x) for x in a.limbs]
    b_vals = [c.eval_lc(x) for x in b.limbs]
    for j in range(k):
        for l in range(k):
            prods[j][l] = c.mul(a.limbs[j], b.limbs[l])
            prod_vals[j][l] = a_vals[j] * b_vals[l]
    cols: List[LC] = []
    vals: List[int] = []
    for i in range(2 * k - 1):
        acc = LC.const(0)
        v = 0
        for j in range(max(0, i - k + 1), min(k, i + 1)):
            acc = acc + prods[j][i - j]
            v += prod_vals[j][i - j]
        cols.append(acc)
        vals.append(v)
    return cols, vals


def ff_mul(c: Circuit, a: FF, b: FF, strict: bool = True) -> FF:
    """r = a*b mod p, proven via witness quotient q (k+1 limbs):
    conv(a,b) - conv(q,p) - r == 0 as a limb polynomial."""
    spec = a.spec
    assert b.spec == spec
    n, k = spec.n, spec.k
    ab = a.value * b.value
    q_int, r_int = divmod(ab, spec.p)
    assert q_int < (1 << (n * (k + 1))), "quotient overflow"

    r = ff_witness(c, spec, r_int)
    # q limbs (k+1 of them)
    q_limbs: List[Signal] = []
    qv = q_int
    for _ in range(k + 1):
        limb = c.var(qv & ((1 << n) - 1))
        num2bits(c, limb, n)
        q_limbs.append(limb)
        qv >>= n
    p_limbs = [(spec.p >> (n * i)) & ((1 << n) - 1) for i in range(k)]
    q_vals = [(q_int >> (n * i)) & ((1 << n) - 1) for i in range(k + 1)]
    r_vals = [(r_int >> (n * i)) & ((1 << n) - 1) for i in range(k)]

    cols, vals = _conv_cols(c, a, b)
    # extend to 2k columns (conv(q,p) has k+1+k-1 = 2k terms)
    while len(cols) < 2 * k:
        cols.append(LC.const(0))
        vals.append(0)
    for i in range(2 * k):
        acc = LC.const(0)
        v = 0
        for j in range(k + 1):
            l = i - j
            if 0 <= l < k:
                acc = acc + _lc(q_limbs[j]) * p_limbs[l]
                v += q_vals[j] * p_limbs[l]
        cols[i] = cols[i] - acc
        vals[i] -= v
        if i < k:
            cols[i] = cols[i] - r.limbs[i]
            vals[i] -= r_vals[i]
    assert_limb_poly_zero(c, cols, vals, spec)
    if strict:
        big_less_than(c, r, p_limbs)
    return r


def ff_mul_eq(c: Circuit, a: FF, b: FF, out: FF) -> None:
    """Constrain a*b ≡ out (mod p); out must be canonical (< p)."""
    assert (a.value * b.value - out.value) % a.spec.p == 0, "ff_mul_eq: witness mismatch"
    r = ff_mul(c, a, b)
    ff_assert_equal(c, r, out)


def ff_assert_equal(c: Circuit, a: FF, b: FF) -> None:
    """Limbwise equality (both sides must be canonical < p)."""
    assert a.spec == b.spec
    for x, y in zip(a.limbs, b.limbs):
        c.assert_equal(x, y)


def ff_add(c: Circuit, a: FF, b: FF, strict: bool = False) -> FF:
    """(a + b) mod p with a boolean reduction quotient (requires canonical
    inputs < p). Non-strict results live in [0, 2^(nk)); the < 2^(nk)-p
    ambiguity band is removed by big_less_than at final equality sites."""
    spec = a.spec
    n, k = spec.n, spec.k
    s = a.value + b.value
    q_int, r_int = (1, s - spec.p) if s >= spec.p else (0, s)
    r = ff_witness(c, spec, r_int)
    q = c.var(q_int)
    c.constrain(q, q - 1, 0)
    p_limbs = [(spec.p >> (n * i)) & ((1 << n) - 1) for i in range(k)]
    a_vals = [c.eval_lc(x) for x in a.limbs]
    b_vals = [c.eval_lc(x) for x in b.limbs]
    r_vals = [(r_int >> (n * i)) & ((1 << n) - 1) for i in range(k)]
    cols, vals = [], []
    for i in range(k):
        cols.append(a.limbs[i] + b.limbs[i] - r.limbs[i] - _lc(q) * p_limbs[i])
        vals.append(a_vals[i] + b_vals[i] - r_vals[i] - q_int * p_limbs[i])
    assert_limb_poly_zero(c, cols, vals, spec)
    if strict:
        big_less_than(c, r, p_limbs)
    return r


def ff_sub(c: Circuit, a: FF, b: FF, strict: bool = False) -> FF:
    """(a - b) mod p (canonical inputs; see ff_add on strictness)."""
    spec = a.spec
    n, k = spec.n, spec.k
    d = a.value - b.value
    q_int, r_int = (1, d + spec.p) if d < 0 else (0, d)
    r = ff_witness(c, spec, r_int)
    q = c.var(q_int)
    c.constrain(q, q - 1, 0)
    p_limbs = [(spec.p >> (n * i)) & ((1 << n) - 1) for i in range(k)]
    a_vals = [c.eval_lc(x) for x in a.limbs]
    b_vals = [c.eval_lc(x) for x in b.limbs]
    r_vals = [(r_int >> (n * i)) & ((1 << n) - 1) for i in range(k)]
    cols, vals = [], []
    for i in range(k):
        cols.append(a.limbs[i] - b.limbs[i] - r.limbs[i] + _lc(q) * p_limbs[i])
        vals.append(a_vals[i] - b_vals[i] - r_vals[i] + q_int * p_limbs[i])
    assert_limb_poly_zero(c, cols, vals, spec)
    if strict:
        big_less_than(c, r, p_limbs)
    return r


def ff_neg(c: Circuit, a: FF) -> FF:
    return ff_sub(c, ff_const(c, a.spec, 0), a)


def ff_inv(c: Circuit, a: FF) -> FF:
    """1/a mod p: witness the inverse, constrain a * inv == 1."""
    spec = a.spec
    inv_val = pow(a.value % spec.p, -1, spec.p)
    inv = ff_witness(c, spec, inv_val)
    one = ff_const(c, spec, 1)
    r = ff_mul(c, a, inv)
    ff_assert_equal(c, r, one)
    return inv


def ff_div(c: Circuit, a: FF, b: FF) -> FF:
    """a/b mod p: witness t = a*b^-1, constrain t*b == a. One ff_mul."""
    spec = a.spec
    t_val = a.value % spec.p * pow(b.value % spec.p, -1, spec.p) % spec.p
    t = ff_witness(c, spec, t_val)
    r = ff_mul(c, t, b)
    # a must be canonical for the equality
    ff_assert_equal(c, r, a)
    return t


def ff_is_equal(c: Circuit, a: FF, b: FF):
    """Boolean signal: 1 iff a == b limbwise (canonical inputs)."""
    from .core import is_zero

    flags = []
    for x, y in zip(a.limbs, b.limbs):
        flags.append(is_zero(c, x - y))
    acc = flags[0]
    for f in flags[1:]:
        acc = c.mul(acc, f)
    return acc


def ff_select(c: Circuit, sel: AnyLC, a: FF, b: FF) -> FF:
    """sel ? a : b per limb (sel boolean-constrained by caller)."""
    spec = a.spec
    sel_val = c.eval_lc(sel)
    out_limbs = []
    for x, y in zip(a.limbs, b.limbs):
        d = c.mul(sel, x - y)
        out_limbs.append(y + d)
    value = a.value if sel_val else b.value
    return FF(spec, out_limbs, value)


def _init_specs():
    global SECP_FQ, SECP_FR, BN254_FQ_FF, ED25519_FQ_FF
    from ...fields import bn254 as _bn, curve25519 as _c25519, secp256k1 as _secp

    SECP_FQ = FFSpec(_secp.P, 64, 4, "secp_fq")
    SECP_FR = FFSpec(_secp.N, 64, 4, "secp_fr")
    BN254_FQ_FF = FFSpec(_bn.P, 43, 6, "bn254_fq")
    ED25519_FQ_FF = FFSpec(_c25519.P, 85, 3, "ed25519_fq")


_init_specs()
