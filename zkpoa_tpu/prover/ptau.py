"""Powers-of-tau ceremony ingestion: snarkjs .ptau parsing, Lagrange-basis
preparation (group NTT on device), circuit-specific key derivation, and
phase-2 contributions — the reference's `snarkjs zkey new / contribute /
beacon` path (scripts/g16_setup.sh:240-278), rebuilt from the protocol:

  * read_ptau: iden3 container sections 2-6 (tau^i G1, tau^i G2,
    alpha tau^i G1, beta tau^i G1, beta G2) in Montgomery LEM form.
  * lagrange_g1: L_i(tau)*G1 for the circuit domain via an inverse GROUP
    NTT over the tau-power points — butterflies are batched point adds
    with per-lane 254-bit scalar ladders for the twiddles (device).
  * setup_from_ptau: per-wire QAP points A_k(tau)G1 etc. as sparse
    weighted sums of Lagrange points (batched scalar-mul + bucket adds),
    with the phase-1 convention gamma = delta = 1 (snarkjs zkey new).
  * contribute / beacon: phase-2 delta updates (delta' = delta*d): scale
    delta1/delta2 by d and c_query/h_query by 1/d.

A dev ceremony (write_dev_ptau) generates a ptau from seed toxic waste so
the whole path is testable offline; setup_from_ptau itself never sees tau.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bn254
from ..fields.bn254 import R
from ..models.r1cs import R1CS
from ..ops import curve_jax, msm as msm_mod
from ..ops.curve_jax import BN254_G1
from ..ops.fp2_jax import BN254_G2
from ..ops.ntt import domain_root
from ..utils import binfmt
from .setup import ProvingKey, _batch_inv

PTAU_MAGIC = b"ptau"
N8 = 32


def _hash_to_fr(seed: str, label: str) -> int:
    h = hashlib.sha256(f"zkpoa-ptau|{seed}|{label}".encode()).digest()
    h += hashlib.sha256(h).digest()
    return int.from_bytes(h, "big") % R


# ---------------------------------------------------------------------------
# Container I/O (snarkjs powersoftau format, sections 1-6)
# ---------------------------------------------------------------------------


def write_dev_ptau(path: str, power: int, seed: str = "zkpoa-dev-ceremony"):
    """A deterministic development ceremony: tau/alpha/beta from a seed.
    Produces sections 1-6 exactly as snarkjs `powersoftau new + contribute`
    would lay them out (without the contribution transcript section 7)."""
    tau = _hash_to_fr(seed, "tau")
    alpha = _hash_to_fr(seed, "alpha")
    beta = _hash_to_fr(seed, "beta")
    n = 1 << power

    taus = [1] * (2 * n - 1)
    for i in range(1, 2 * n - 1):
        taus[i] = taus[i - 1] * tau % R
    tau_g1 = _g1_batch(taus)
    tau_g2 = _g2_batch(taus[:n])
    alpha_tau_g1 = _g1_batch([alpha * t % R for t in taus[:n]])
    beta_tau_g1 = _g1_batch([beta * t % R for t in taus[:n]])
    beta_g2 = _g2_batch([beta])[0]

    header = (
        struct.pack("<I", N8)
        + bn254.P.to_bytes(N8, "little")
        + struct.pack("<II", power, power)
    )
    sections = [
        (1, header),
        (2, b"".join(binfmt._g1_bytes(p) for p in tau_g1)),
        (3, b"".join(binfmt._g2_bytes(p) for p in tau_g2)),
        (4, b"".join(binfmt._g1_bytes(p) for p in alpha_tau_g1)),
        (5, b"".join(binfmt._g1_bytes(p) for p in beta_tau_g1)),
        (6, binfmt._g2_bytes(beta_g2)),
    ]
    binfmt._write_container(path, PTAU_MAGIC, 1, sections)


def read_ptau(path: str):
    """Parse sections 1-6. Returns dict with power, tau_g1 [2n-1], tau_g2
    [n], alpha_tau_g1 [n], beta_tau_g1 [n], beta_g2 (host affine points)."""
    sections = binfmt._read_container(path, PTAU_MAGIC)
    hdr = binfmt._one(sections, 1)
    (n8,) = struct.unpack_from("<I", hdr, 0)
    q = int.from_bytes(hdr[4 : 4 + n8], "little")
    assert n8 == N8 and q == bn254.P, "unsupported ptau field"
    power, _cpower = struct.unpack_from("<II", hdr, 4 + n8)
    n = 1 << power

    def g1s(raw, count):
        return [binfmt._g1_parse(raw[i * 2 * N8 : (i + 1) * 2 * N8]) for i in range(count)]

    def g2s(raw, count):
        return [binfmt._g2_parse(raw[i * 4 * N8 : (i + 1) * 4 * N8]) for i in range(count)]

    return {
        "power": power,
        "tau_g1": g1s(binfmt._one(sections, 2), 2 * n - 1),
        "tau_g2": g2s(binfmt._one(sections, 3), n),
        "alpha_tau_g1": g1s(binfmt._one(sections, 4), n),
        "beta_tau_g1": g1s(binfmt._one(sections, 5), n),
        "beta_g2": g2s(binfmt._one(sections, 6), 1)[0],
    }


def verify_ptau(pt) -> bool:
    """Spot-check ceremony consistency with real pairings:
    e(tau^i G1, G2) == e(G1, tau^i G2) for a few i, and the alpha/beta
    sections against tau_g1."""
    from ..fields.bn254 import pairing

    g2 = bn254.G2_GEN
    for i in (1, 2, min(5, len(pt["tau_g2"]) - 1)):
        lhs = pairing(g2, pt["tau_g1"][i])
        rhs = pairing(pt["tau_g2"][i], bn254.G1_GEN)
        if lhs != rhs:
            return False
    # e(alpha tau G1, G2) == e(alpha G1, tau G2)
    lhs = pairing(g2, pt["alpha_tau_g1"][1])
    rhs = pairing(pt["tau_g2"][1], pt["alpha_tau_g1"][0])
    if lhs != rhs:
        return False
    lhs = pairing(g2, pt["beta_tau_g1"][1])
    rhs = pairing(pt["tau_g2"][1], pt["beta_tau_g1"][0])
    return lhs == rhs


# ---------------------------------------------------------------------------
# Group NTT: Lagrange-basis points from tau powers (device)
# ---------------------------------------------------------------------------


def _g1_batch(scalars) -> List:
    n = len(scalars)
    n_pad = max(64, 1 << (n - 1).bit_length())
    sc = jnp.asarray(msm_mod.scalars_to_limbs(list(scalars) + [0] * (n_pad - n)))
    acc = curve_jax.fixed_base_mul_batch(
        BN254_G1, "bn254_g1", bn254.G1_GEN, bn254.g1_add, sc, 254
    )
    return BN254_G1.decode_jac(acc)[:n]


def _g2_batch(scalars) -> List:
    n = len(scalars)
    n_pad = max(64, 1 << (n - 1).bit_length())
    sc = jnp.asarray(msm_mod.scalars_to_limbs(list(scalars) + [0] * (n_pad - n)))
    acc = curve_jax.fixed_base_mul_batch(
        BN254_G2, "bn254_g2", bn254.G2_GEN, bn254.g2_add, sc, 254
    )
    return BN254_G2.decode_jac(acc)[:n]


def _group_scale(curve, pts_jac, scalars: List[int]):
    """Per-lane scalar multiplication: [N] points x [N] 254-bit scalars via
    one batched double-and-add ladder."""
    sc = jnp.asarray(msm_mod.scalars_to_limbs(scalars))
    return curve_jax.scalar_mul_batch(curve, pts_jac, sc, 254)


def lagrange_g1(points: List, m: int) -> List:
    """L_i(tau)*G1 for the size-m domain from [tau^0..tau^(m-1)]*G1 via an
    inverse group NTT: L_i(tau) = (1/m) sum_j w^{-ij} tau^j, which is the
    inverse-DFT matrix applied to the tau powers. Device: log2(m) butterfly
    stages; each stage one batched ladder for the twiddled half."""
    assert len(points) >= m
    w_inv = pow(domain_root(m.bit_length() - 1), -1, R)
    m_inv = pow(m, -1, R)

    # bit-reverse input order (decimation-in-time over the group)
    log_m = m.bit_length() - 1
    rev = [int(format(i, f"0{log_m}b")[::-1], 2) if log_m else 0 for i in range(m)]
    pts = [points[rev[i]] for i in range(m)]
    cur = BN254_G1.encode_jac(pts)

    for s in range(log_m):
        half = 1 << s
        base = pow(w_inv, m >> (s + 1), R)
        tw = [1] * half
        for j in range(1, half):
            tw[j] = tw[j - 1] * base % R
        # lanes [m] grouped as [m/(2*half), 2, half]
        x = jax.tree.map(
            lambda a: a.reshape(m // (2 * half), 2, half, a.shape[-1]), cur
        )
        u = jax.tree.map(lambda a: a[:, 0], x)
        v = jax.tree.map(lambda a: a[:, 1], x)
        # v' = tw * v (per-lane ladder over the half axis)
        tw_full = tw * (m // (2 * half))
        v_flat = jax.tree.map(lambda a: a.reshape(m // 2, a.shape[-1]), v)
        v_tw = _group_scale(BN254_G1, v_flat, tw_full)
        v_tw = jax.tree.map(
            lambda a: a.reshape(m // (2 * half), half, a.shape[-1]), v_tw
        )
        lo = BN254_G1.add(u, v_tw)
        # hi = u - v_tw: negate y of v_tw then add
        from ..ops import limbs as L

        v_neg = (
            v_tw[0],
            L.sub_mod(BN254_G1.field, jnp.zeros_like(v_tw[1]), v_tw[1]),
            v_tw[2],
        )
        hi = BN254_G1.add(u, v_neg)
        cur = jax.tree.map(
            lambda a, b: jnp.stack([a, b], axis=1).reshape(m, a.shape[-1]), lo, hi
        )

    scaled = _group_scale(BN254_G1, cur, [m_inv] * m)
    return BN254_G1.decode_jac(scaled)


# ---------------------------------------------------------------------------
# Circuit-specific key from a ceremony (snarkjs `zkey new` semantics)
# ---------------------------------------------------------------------------


def _wire_points(rows, lag_pts: List, n_wires: int) -> List:
    """Per-wire sparse weighted sums: out[wire] = sum coeff * L_i. Batched
    device ladder for the coeff scaling, host adds for the (sparse) bucket
    accumulation."""
    pts = []
    scs = []
    wires = []
    for i, wire, coeff in rows:
        if coeff % R == 0 or lag_pts[i] is None:
            continue
        pts.append(lag_pts[i])
        scs.append(coeff % R)
        wires.append(wire)
    out = [None] * n_wires
    if not pts:
        return out
    scaled = curve_jax.scalar_mul_batch(
        BN254_G1, BN254_G1.encode_jac(pts), jnp.asarray(msm_mod.scalars_to_limbs(scs)), 254
    )
    dec = BN254_G1.decode_jac(scaled)
    for w, p in zip(wires, dec):
        out[w] = bn254.g1_add(out[w], p)
    return out


def setup_from_ptau(r1cs: R1CS, ptau_path: str) -> ProvingKey:
    """Groth16 phase-1 key from a powers-of-tau ceremony file: the
    reference's `snarkjs zkey new` (g16_setup.sh:240-253). gamma = delta
    = 1 (phase-2 contributions update delta via contribute())."""
    pt = read_ptau(ptau_path)
    m = 1
    while m < max(r1cs.n_constraints, 2):
        m <<= 1
    assert m <= (1 << pt["power"]), "circuit larger than the ceremony"

    lag = lagrange_g1(pt["tau_g1"], m)
    # alpha/beta-scaled Lagrange points for the C-query combination
    lag_a = lagrange_g1(pt["alpha_tau_g1"], m)
    lag_b = lagrange_g1(pt["beta_tau_g1"], m)

    n_wires = r1cs.n_wires
    n_pub = r1cs.n_public
    a_query = _wire_points(r1cs.a_rows, lag, n_wires)
    b1_query = _wire_points(r1cs.b_rows, lag, n_wires)
    # C-side: beta*A_k + alpha*B_k + C_k all at tau
    beta_a = _wire_points(r1cs.a_rows, lag_b, n_wires)
    alpha_b = _wire_points(r1cs.b_rows, lag_a, n_wires)
    c_at = _wire_points(r1cs.c_rows, lag, n_wires)
    comb = [
        bn254.g1_add(bn254.g1_add(beta_a[k], alpha_b[k]), c_at[k])
        for k in range(n_wires)
    ]
    ic = comb[: n_pub + 1]
    c_query = comb[n_pub + 1 :]

    # H-query (monomial): tau^i * Z(tau) = tau^(i+m) - tau^i, delta = 1
    h_query = [
        bn254.g1_add(pt["tau_g1"][i + m], bn254.g1_neg(pt["tau_g1"][i]))
        for i in range(m - 1)
    ]

    # B2 query over G2 Lagrange points
    lag2 = _lagrange_g2(pt["tau_g2"], m)
    b2_query = _wire_points_g2(r1cs.b_rows, lag2, n_wires)

    alpha1 = pt["alpha_tau_g1"][0]
    beta1 = pt["beta_tau_g1"][0]
    beta2 = pt["beta_g2"]
    delta1 = bn254.G1_GEN
    delta2 = bn254.G2_GEN
    gamma2 = bn254.G2_GEN

    from .groth16 import VerifyingKey

    vk = VerifyingKey(
        alpha_1=alpha1, beta_2=beta2, gamma_2=gamma2, delta_2=delta2,
        ic=ic, n_public=n_pub,
    )
    return ProvingKey(
        n_vars=n_wires,
        n_public=n_pub,
        domain_size=m,
        a_query=a_query,
        b1_query=b1_query,
        c_query=c_query,
        h_query=h_query,
        alpha1=alpha1,
        beta1=beta1,
        delta1=delta1,
        b2_query=b2_query,
        beta2=beta2,
        delta2=delta2,
        vk_json=vk.to_json(),
        h_basis="monomial",
    )


def _lagrange_g2(points: List, m: int) -> List:
    """G2 variant of lagrange_g1 (host ladder — G2 sizes here are the
    circuit's B-wires only; dev-scale)."""
    w_inv = pow(domain_root(m.bit_length() - 1), -1, R)
    m_inv = pow(m, -1, R)
    # direct O(m^2) host evaluation would be too slow even at dev scale;
    # reuse the same butterfly structure with host G2 ops (m log m muls)
    log_m = m.bit_length() - 1
    rev = [int(format(i, f"0{log_m}b")[::-1], 2) if log_m else 0 for i in range(m)]
    cur = [points[rev[i]] for i in range(m)]
    for s in range(log_m):
        half = 1 << s
        base = pow(w_inv, m >> (s + 1), R)
        nxt = [None] * m
        for blk in range(m // (2 * half)):
            tw = 1
            for j in range(half):
                u = cur[blk * 2 * half + j]
                v = cur[blk * 2 * half + half + j]
                vt = bn254.g2_mul(v, tw) if v is not None else None
                nxt[blk * 2 * half + j] = bn254.g2_add(u, vt)
                nxt[blk * 2 * half + half + j] = bn254.g2_add(u, bn254.g2_neg(vt))
                tw = tw * base % R
        cur = nxt
    return [bn254.g2_mul(p, m_inv) if p is not None else None for p in cur]


def _wire_points_g2(rows, lag2: List, n_wires: int) -> List:
    out = [None] * n_wires
    for i, wire, coeff in rows:
        if coeff % R == 0 or lag2[i] is None:
            continue
        out[wire] = bn254.g2_add(out[wire], bn254.g2_mul(lag2[i], coeff % R))
    return out


# ---------------------------------------------------------------------------
# Phase 2: contributions (snarkjs `zkey contribute` / `zkey beacon`)
# ---------------------------------------------------------------------------


def contribute(pk: ProvingKey, entropy: str) -> ProvingKey:
    """Apply one phase-2 contribution d: delta' = delta*d; c/h queries and
    delta1/delta2 are rescaled (the toxic d is discarded)."""
    d = _hash_to_fr(entropy, "delta-contribution")
    d_inv = pow(d, -1, R)
    c_query = _g1_scale_list(pk.c_query, d_inv)
    h_query = _g1_scale_list(pk.h_query, d_inv)
    delta1 = bn254.g1_mul(pk.delta1, d)
    delta2 = bn254.g2_mul(pk.delta2, d)

    from .groth16 import VerifyingKey

    vk = VerifyingKey.from_json(pk.vk_json)
    vk.delta_2 = delta2
    return ProvingKey(
        n_vars=pk.n_vars,
        n_public=pk.n_public,
        domain_size=pk.domain_size,
        a_query=pk.a_query,
        b1_query=pk.b1_query,
        c_query=c_query,
        h_query=h_query,
        alpha1=pk.alpha1,
        beta1=pk.beta1,
        delta1=delta1,
        b2_query=pk.b2_query,
        beta2=pk.beta2,
        delta2=delta2,
        vk_json=vk.to_json(),
        h_basis=pk.h_basis,
    )


def beacon(pk: ProvingKey, beacon_hash: str, iterations: int = 10) -> ProvingKey:
    """Final public beacon contribution (iterated hash of a public value,
    g16_setup.sh:269-278)."""
    h = beacon_hash
    for _ in range(iterations):
        h = hashlib.sha256(h.encode()).hexdigest()
    return contribute(pk, f"beacon|{h}")


def _g1_scale_list(points: List, k: int) -> List:
    pts = [p for p in points if p is not None]
    if not pts:
        return list(points)
    scaled = curve_jax.scalar_mul_batch(
        BN254_G1,
        BN254_G1.encode_jac(pts),
        jnp.asarray(msm_mod.scalars_to_limbs([k] * len(pts))),
        254,
    )
    dec = BN254_G1.decode_jac(scaled)
    out = []
    it = iter(dec)
    for p in points:
        out.append(next(it) if p is not None else None)
    return out
