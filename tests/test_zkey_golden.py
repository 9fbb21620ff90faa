"""Golden snarkjs-layout zkey fixture: the container bytes are assembled
HERE, from the documented snarkjs zkey layout (iden3 binary container,
Montgomery little-endian coordinates, sections 1-9 with the coset-Lagrange
section 9) — independently of utils/binfmt's writer. read_zkey must parse
it and the prover must produce a verifying proof against it.

This is the closest substitute this environment allows for snarkjs as an
independent referee (no node): a mismatch in ANY byte convention the
reader assumes — header field order, Montgomery form, G2 coordinate
order, section-4 coefficient encoding, the section-9 coset basis — makes
the proof fail to verify. (Reference role: g16_verify.sh's snarkjs
cross-check; layout per snarkjs zkey_new.js / templates covered in
utils/binfmt.py's module docstring.)
"""

import struct

import pytest  # noqa: F401

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.fields import bn254
from zkpoa_tpu.ops.ntt import domain_root, snarkjs_coset_shift
from zkpoa_tpu.prover import groth16
from zkpoa_tpu.prover.prove import prove
from zkpoa_tpu.utils import binfmt

P, R = bn254.P, bn254.R
N8 = 32
MONT = (1 << 256) % P  # zkey coordinates are stored in Montgomery form


def _mont(x: int) -> bytes:
    return (x % P * MONT % P).to_bytes(32, "little")


def _g1(pt) -> bytes:
    if pt is None:
        return b"\0" * 64
    return _mont(pt[0]) + _mont(pt[1])


def _g2(pt) -> bytes:
    if pt is None:
        return b"\0" * 128
    (x0, x1), (y0, y1) = pt
    return _mont(x0) + _mont(x1) + _mont(y0) + _mont(y1)


def _container(path, sections):
    with open(path, "wb") as f:
        f.write(b"zkey" + struct.pack("<II", 1, len(sections)))
        for stype, payload in sections:
            f.write(struct.pack("<IQ", stype, len(payload)))
            f.write(payload)


def test_golden_snarkjs_zkey_prove_verify(tmp_path):
    # --- toy statement: out = x * y; wires [1, out, x, y], 1 public output
    n_vars, n_pub = 4, 1
    # snarkjs appends one A-side row per public wire (s = 0..n_pub) at
    # constraints n_constraints + s, binding publics into the QAP
    n_cons = 1
    m = 4  # domain: next pow2 >= n_cons + n_pub + 1

    # A/B/C rows: (constraint, signal, value)
    a_rows = [(0, 2, 1)] + [(n_cons + s, s, 1) for s in range(n_pub + 1)]
    b_rows = [(0, 3, 1)]
    c_rows = [(0, 1, 1)]

    # --- toy toxic waste (tiny circuit; soundness is irrelevant here)
    tau, alpha, beta, gamma, delta = 123457, 777, 888, 999, 1111
    w = domain_root(2)  # primitive 4th root in Fr

    def lag_at_tau(i):  # L_i(tau) over the size-m domain
        wi = pow(w, i, R)
        num = wi * (pow(tau, m, R) - 1) % R
        den = m * (tau - wi) % R
        return num * pow(den, -1, R) % R

    lag = [lag_at_tau(i) for i in range(m)]

    def poly_at_tau(rows, k):  # sum over rows of wire k: value * L_c(tau)
        return sum(v * lag[c] for c, s, v in rows if s == k) % R

    A = [poly_at_tau(a_rows, k) for k in range(n_vars)]
    B = [poly_at_tau(b_rows, k) for k in range(n_vars)]
    C = [poly_at_tau(c_rows, k) for k in range(n_vars)]

    g1m, g2m = bn254.g1_mul, bn254.g2_mul
    G1, G2 = bn254.G1_GEN, bn254.G2_GEN
    ginv = pow(gamma, -1, R)
    dinv = pow(delta, -1, R)
    a_q = [g1m(G1, A[k]) for k in range(n_vars)]
    b1_q = [g1m(G1, B[k]) for k in range(n_vars)]
    b2_q = [g2m(G2, B[k]) for k in range(n_vars)]
    comb = [(beta * A[k] + alpha * B[k] + C[k]) % R for k in range(n_vars)]
    ic = [g1m(G1, comb[k] * ginv % R) for k in range(n_pub + 1)]
    c_q = [g1m(G1, comb[k] * dinv % R) for k in range(n_pub + 1, n_vars)]

    # section 9 (snarkjs coset convention): H_i = L_i^{coset}(tau) * Z(tau)
    # / ((g^m - 1) * delta) with g = w_{2m} and L_i^{coset}(X) = L_i(X/g)
    g = snarkjs_coset_shift(2)
    assert pow(g, 2, R) * pow(g, 2, R) % R != 1 or pow(g, 2 * m, R) == 1
    z_tau = (pow(tau, m, R) - 1) % R
    scale = z_tau * pow((pow(g, m, R) - 1) * delta % R, -1, R) % R
    tau_over_g = tau * pow(g, -1, R) % R

    def lag_at(x, i):
        wi = pow(w, i, R)
        return wi * (pow(x, m, R) - 1) % R * pow(m * (x - wi) % R, -1, R) % R

    h_q = [g1m(G1, lag_at(tau_over_g, i) * scale % R) for i in range(m)]

    # --- assemble the container bytes (documented snarkjs layout)
    sec1 = struct.pack("<I", 1)  # Groth16 protocol id
    sec2 = (
        struct.pack("<I", N8) + P.to_bytes(32, "little")
        + struct.pack("<I", N8) + R.to_bytes(32, "little")
        + struct.pack("<III", n_vars, n_pub, m)
        + _g1(g1m(G1, alpha)) + _g1(g1m(G1, beta)) + _g2(g2m(G2, beta))
        + _g2(g2m(G2, gamma)) + _g1(g1m(G1, delta)) + _g2(g2m(G2, delta))
    )
    sec3 = b"".join(_g1(p) for p in ic)
    # section 4: coefficient records (m, constraint, signal, Fr Montgomery)
    mont_r = (1 << 256) % R
    recs = [(0, c, s, v) for c, s, v in a_rows] + [
        (1, c, s, v) for c, s, v in b_rows
    ]
    sec4 = struct.pack("<I", len(recs)) + b"".join(
        struct.pack("<III", mm, c, s) + (v * mont_r % R).to_bytes(32, "little")
        for mm, c, s, v in recs
    )
    sec5 = b"".join(_g1(p) for p in a_q)
    sec6 = b"".join(_g1(p) for p in b1_q)
    sec7 = b"".join(_g2(p) for p in b2_q)
    sec8 = b"".join(_g1(p) for p in c_q)
    sec9 = b"".join(_g1(p) for p in h_q)
    path = str(tmp_path / "golden.zkey")
    _container(path, [(1, sec1), (2, sec2), (3, sec3), (4, sec4),
                      (5, sec5), (6, sec6), (7, sec7), (8, sec8), (9, sec9)])

    # --- read back (auto-detects the coset basis), prove, verify
    pk, coeffs = binfmt.read_zkey(path, h_basis="auto")
    assert pk.h_basis == "coset"
    assert pk.domain_size == m and pk.n_vars == n_vars
    r1cs = binfmt.r1cs_from_zkey_coeffs(coeffs, n_vars, n_pub)
    x_v, y_v = 6, 7
    witness = [1, x_v * y_v, x_v, y_v]
    proof = prove(pk, r1cs, witness, seed="golden")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, [x_v * y_v])
    # tamper rejection: wrong public
    assert not groth16.verify(vk, proof, [x_v * y_v + 1])
