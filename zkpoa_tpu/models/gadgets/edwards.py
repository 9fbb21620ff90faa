"""Twisted-Edwards (Curve25519, a = -1) gadgets over the 85x3 foreign field,
and the Pedersen commitment circuit core of layer 3.

Constraint-side equivalent of the reference's vendored ed25519-circom
ScalarMul/PointAdd templates (circuits/layer_three.circom:64-80, SURVEY.md
§2.2), redesigned rather than translated:

  * the complete extended-coordinates addition law (RFC 8032 formulas, the
    same math as zkpoa_tpu.fields.curve25519) — no exceptional cases, so no
    offset/infinity tricks are needed;
  * fixed-base scalar multiplication with 8-bit windows over HOST-side
    precomputed constant tables (the generators are protocol constants
    baked into the circuit — unlike the reference, which takes g and h as
    private input signals and only re-checks them host-side; baking them in
    is strictly stronger and removes ~2x255 in-circuit doublings);
  * per window, the three madd-operand constants (y-x, y+x, 2d*t) are
    selected by a one-hot mux as plain LCs (no allocation), and one
    complete mixed addition folds the entry into the accumulator.

Projective coordinates are not unique, so statement parity with the
reference is point equality of the final commitment (the reference's own
checker uses projective pointEqual — scripts/pedersen_commitment.ts:227-239),
not register equality.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

from ...fields import curve25519 as C
from ..r1cs import LC, AnyLC, Circuit, Signal, _lc
from . import bigint as B
from .bigint import FF

SPEC = None  # set at import bottom (B.ED25519_FQ_FF)

WINDOW = 8
N_BITS = 255


class EdPoint:
    """Extended-coordinates point (X, Y, Z, T) of FF elements."""

    __slots__ = ("x", "y", "z", "t")

    def __init__(self, x: FF, y: FF, z: FF, t: FF):
        self.x, self.y, self.z, self.t = x, y, z, t

    @property
    def value(self) -> Tuple[int, int, int, int]:
        return (self.x.value, self.y.value, self.z.value, self.t.value)


def _ff_from_lc(limbs: List[LC], value: int) -> FF:
    return FF(SPEC, limbs, value)


def ed_const(c: Circuit, pt: C.ExtPoint) -> EdPoint:
    return EdPoint(
        B.ff_const(c, SPEC, pt[0]),
        B.ff_const(c, SPEC, pt[1]),
        B.ff_const(c, SPEC, pt[2]),
        B.ff_const(c, SPEC, pt[3]),
    )


def ed_add(c: Circuit, p1: EdPoint, p2: EdPoint, strict: bool = False) -> EdPoint:
    """Complete extended add (both operands variable). strict=True makes the
    output coordinates canonical (< p) — use for public outputs."""
    ym1 = B.ff_sub(c, p1.y, p1.x)
    yp1 = B.ff_add(c, p1.y, p1.x)
    ym2 = B.ff_sub(c, p2.y, p2.x)
    yp2 = B.ff_add(c, p2.y, p2.x)
    a = B.ff_mul(c, ym1, ym2, strict=False)
    bb = B.ff_mul(c, yp1, yp2, strict=False)
    tt = B.ff_mul(c, p1.t, p2.t, strict=False)
    cc = B.ff_mul(c, tt, B.ff_const(c, SPEC, 2 * C.D % C.P), strict=False)
    zz = B.ff_mul(c, p1.z, p2.z, strict=False)
    dd = B.ff_add(c, zz, zz)
    e = B.ff_sub(c, bb, a)
    f = B.ff_sub(c, dd, cc)
    g = B.ff_add(c, dd, cc)
    h = B.ff_add(c, bb, a)
    return EdPoint(
        B.ff_mul(c, e, f, strict=strict),
        B.ff_mul(c, g, h, strict=strict),
        B.ff_mul(c, f, g, strict=strict),
        B.ff_mul(c, e, h, strict=strict),
    )


def _madd_consts(pt: C.ExtPoint) -> Tuple[int, int, int]:
    """Affine-extended entry (z == 1) -> madd operand constants
    (y-x, y+x, 2d*t)."""
    x, y, z, t = pt
    assert z == 1 or pt == C.IDENTITY
    if z != 1:  # identity stored as (0,1,1,0): already z == 1
        raise AssertionError
    return ((y - x) % C.P, (y + x) % C.P, 2 * C.D * t % C.P)


def ed_madd_mux(
    c: Circuit,
    acc: EdPoint,
    onehot: Sequence[AnyLC],
    entries: Sequence[C.ExtPoint],
    sel_value: int,
) -> EdPoint:
    """acc + entries[sel] where entries are affine-extended constants and
    sel is given as a one-hot selector. The three madd operand constants are
    muxed as LCs (zero allocation) and folded with one complete mixed add."""
    assert len(onehot) == len(entries)
    n, k = SPEC.n, SPEC.k
    consts = [_madd_consts(e) for e in entries]
    mux_lcs: List[List[LC]] = []
    mux_vals: List[int] = []
    for ci in range(3):
        limbs = []
        for li in range(k):
            acc_lc = LC.const(0)
            for sel, cst in zip(onehot, consts):
                limb_val = (cst[ci] >> (n * li)) & ((1 << n) - 1)
                if limb_val:
                    acc_lc = acc_lc + _lc(sel) * limb_val
            limbs.append(acc_lc)
        mux_lcs.append(limbs)
        mux_vals.append(consts[sel_value][ci])

    c1 = _ff_from_lc(mux_lcs[0], mux_vals[0])
    c2 = _ff_from_lc(mux_lcs[1], mux_vals[1])
    c3 = _ff_from_lc(mux_lcs[2], mux_vals[2])

    ym = B.ff_sub(c, acc.y, acc.x)
    yp = B.ff_add(c, acc.y, acc.x)
    a = B.ff_mul(c, ym, c1, strict=False)
    bb = B.ff_mul(c, yp, c2, strict=False)
    cc = B.ff_mul(c, acc.t, c3, strict=False)
    dd = B.ff_add(c, acc.z, acc.z)
    e = B.ff_sub(c, bb, a)
    f = B.ff_sub(c, dd, cc)
    g = B.ff_add(c, dd, cc)
    h = B.ff_add(c, bb, a)
    return EdPoint(
        B.ff_mul(c, e, f, strict=False),
        B.ff_mul(c, g, h, strict=False),
        B.ff_mul(c, f, g, strict=False),
        B.ff_mul(c, e, h, strict=False),
    )


def _onehot(c: Circuit, bits: Sequence[AnyLC], values: Sequence[int]) -> List[AnyLC]:
    """One-hot selectors for a group of bits (little-endian), via tensor
    products of 2-bit one-hots. values[i] = concrete bit values."""
    assert len(bits) == len(values)

    def oh2(b0, v0, b1=None, v1=0):
        nb0 = _lc(1) - _lc(b0)
        if b1 is None:
            return [nb0, _lc(b0)], [1 - v0, v0]
        nb1 = _lc(1) - _lc(b1)
        sels = [
            c.mul(nb0, nb1),
            c.mul(b0, nb1),
            c.mul(nb0, b1),
            c.mul(b0, b1),
        ]
        vals = [
            (1 - v0) * (1 - v1),
            v0 * (1 - v1),
            (1 - v0) * v1,
            v0 * v1,
        ]
        return sels, vals

    groups = []
    i = 0
    while i < len(bits):
        if i + 1 < len(bits):
            groups.append(oh2(bits[i], values[i], bits[i + 1], values[i + 1]))
            i += 2
        else:
            groups.append(oh2(bits[i], values[i]))
            i += 1

    sels, vals = groups[0]
    for gsels, gvals in groups[1:]:
        new_sels, new_vals = [], []
        for j, (gs, gv) in enumerate(zip(gsels, gvals)):
            for ksel, kv in zip(sels, vals):
                # product; skip the mul when one side is a known constant LC?
                new_sels.append(c.mul(gs, ksel))
                new_vals.append(gv * kv)
        sels, vals = new_sels, new_vals
    return sels


@lru_cache(maxsize=None)
def _window_tables(base: C.ExtPoint, n_bits: int, window: int):
    """tables[j][e] = (e * 2^(window*j)) * base as affine-extended points."""
    tables = []
    shift_base = base
    for j in range(0, n_bits, window):
        w = min(window, n_bits - j)
        row = []
        for e in range(1 << w):
            pt = C.point_mul(shift_base, e) if e else C.IDENTITY
            x, y = C.to_affine(pt) if e else (0, 1)
            row.append((x, y, 1, x * y % C.P))
        tables.append(row)
        for _ in range(w):
            shift_base = C.point_double(shift_base)
    return tables


def fixed_base_scalar_mul(
    c: Circuit,
    bits: Sequence[AnyLC],
    bit_values: Sequence[int],
    base: C.ExtPoint,
) -> EdPoint:
    """sum_i bits_i 2^i * base with 8-bit windowed constant tables.

    Returns an extended point; the representative depends on the algorithm
    (projective coords are non-unique)."""
    assert len(bits) == len(bit_values)
    n_bits = len(bits)
    tables = _window_tables(base, n_bits, WINDOW)

    acc = None
    for j, start in enumerate(range(0, n_bits, WINDOW)):
        w = min(WINDOW, n_bits - start)
        wbits = bits[start : start + w]
        wvals = bit_values[start : start + w]
        sel_value = 0
        for b_i, v in enumerate(wvals):
            sel_value |= int(v) << b_i
        onehot = _onehot(c, wbits, wvals)
        if acc is None:
            # initialize from the mux directly (identity-safe complete law
            # makes a dedicated init unnecessary, but starting from the
            # window-0 entry saves one madd)
            n, k = SPEC.n, SPEC.k
            entry_lcs = [[LC.const(0) for _ in range(k)] for _ in range(4)]
            entry_vals = [0, 0, 0, 0]
            for sel, pt in zip(onehot, tables[j]):
                for ci in range(4):
                    for li in range(k):
                        limb_val = (pt[ci] >> (n * li)) & ((1 << n) - 1)
                        if limb_val:
                            entry_lcs[ci][li] = entry_lcs[ci][li] + _lc(sel) * limb_val
            for ci in range(4):
                entry_vals[ci] = tables[j][sel_value][ci]
            acc = EdPoint(
                _ff_from_lc(entry_lcs[0], entry_vals[0]),
                _ff_from_lc(entry_lcs[1], entry_vals[1]),
                _ff_from_lc(entry_lcs[2], entry_vals[2]),
                _ff_from_lc(entry_lcs[3], entry_vals[3]),
            )
        else:
            acc = ed_madd_mux(c, acc, onehot, tables[j], sel_value)
    return acc


def pedersen_commitment_gadget(
    c: Circuit,
    secret_bits: Sequence[AnyLC],
    secret_bit_values: Sequence[int],
    blind_bits: Sequence[AnyLC],
    blind_bit_values: Sequence[int],
) -> EdPoint:
    """secret * G + blind * H on Curve25519 (the layer-3 commitment,
    circuits/layer_three.circom:64-80), generators baked as constants."""
    s1 = fixed_base_scalar_mul(c, secret_bits, secret_bit_values, C.GENERATOR_G)
    s2 = fixed_base_scalar_mul(c, blind_bits, blind_bit_values, C.GENERATOR_H)
    return ed_add(c, s1, s2, strict=True)


def _init():
    global SPEC
    SPEC = B.ED25519_FQ_FF


_init()
