"""Groth16 trusted setup over BN254 for R1CS circuits built by the framework.

Replaces the snarkjs `zkey new / contribute / export verificationkey` path
(reference scripts/g16_setup.sh:240-294 — the reference's hottest offline
stage: 34h + 290GB peak for the 48M-constraint layer-3 zkey). Here the QAP
evaluation is exact host integer math (Lagrange basis at tau with batched
inversion) and ALL the point generation — the actual exponentiations — runs
on TPU via batched fixed-base scalar multiplication.

SECURITY NOTE: this is a *development* setup: toxic waste (tau, alpha, beta,
gamma, delta) is derived deterministically from a seed so tests are
reproducible. A production MPC ceremony would feed the same ProvingKey
structure; the prover only ever sees the point tables.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bn254
from ..fields.bn254 import R
from ..models.r1cs import R1CS
from ..ops import curve_jax, fp2_jax, msm as msm_mod
from ..ops.curve_jax import BN254_G1
from ..ops.fp2_jax import BN254_G2


def _hash_to_fr(seed: str, label: str) -> int:
    h = hashlib.sha256(f"zkpoa-srs|{seed}|{label}".encode()).digest()
    h += hashlib.sha256(h).digest()
    return int.from_bytes(h, "big") % R


@dataclass
class ProvingKey:
    n_vars: int
    n_public: int
    domain_size: int
    # G1 point tables (affine int tuples; None = infinity)
    a_query: List
    b1_query: List
    c_query: List  # index k-(n_public+1) for private wires
    h_query: List  # see h_basis: monomial (tau^i Z(tau)/delta)G1 or coset-Lagrange
    alpha1: Tuple[int, int]
    beta1: Tuple[int, int]
    delta1: Tuple[int, int]
    # G2
    b2_query: List
    beta2: Tuple
    delta2: Tuple
    vk_json: Dict
    # Section-9 basis convention for h_query (utils/binfmt.py docstring):
    #   'monomial': H_i = (tau^i · Z(tau)/delta)·G1, len = domain_size - 1
    #   'coset':    H_i = L_i^{coset}(tau)·Z(tau)/((g^n−1)·delta)·G1, len =
    #               domain_size — snarkjs/rapidsnark convention (the prover
    #               MSMs coset evaluations of A·B−C against these directly).
    h_basis: str = "monomial"


def _batch_inv(vals: Sequence[int]) -> List[int]:
    """Montgomery batched inversion mod R."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % R
    inv_all = pow(prefix[n], -1, R)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % R
        inv_all = inv_all * vals[i] % R
    return out


def _pad_pow2(n: int, min_pad: int = 64) -> int:
    """Batch sizes are padded to powers of two so different circuits reuse
    the same compiled fixed-base kernels (zero scalars -> infinity, dropped)."""
    return max(min_pad, 1 << (n - 1).bit_length())


def _g1_points_from_scalars(scalars: Sequence[int]) -> List:
    """[k_i * G1] via windowed fixed-base table gathers on device (~16x
    fewer group ops than double-and-add; table host-built once and cached)."""
    n = len(scalars)
    if n == 0:
        return []
    n_pad = _pad_pow2(n)
    sc = jnp.asarray(msm_mod.scalars_to_limbs(list(scalars) + [0] * (n_pad - n)))
    acc = curve_jax.fixed_base_mul_batch(
        BN254_G1, "bn254_g1", bn254.G1_GEN, bn254.g1_add, sc, 254
    )
    return BN254_G1.decode_jac(acc)[:n]


class DeviceG1Points:
    """G1 query table as Montgomery affine limb arrays — device-resident
    (jnp) for mid-size keys, host-resident (numpy, spilled) for keys too
    big to keep in HBM alongside the prove operands (the usable HBM through
    this tunnel is ~7.5GB; a 7.2M-wire key alone is ~5.6GB). Replaces host
    affine int lists in either case (per-point decode would take hours)."""

    def __init__(self, xs, ys, valid):
        self.xs = xs
        self.ys = ys
        self.valid = valid

    def __len__(self):
        return int(self.xs.shape[0])

    def spilled(self) -> "DeviceG1Points":
        """Fetch to host numpy (frees the HBM copy once refs drop)."""
        return DeviceG1Points(
            np.asarray(self.xs), np.asarray(self.ys), np.asarray(self.valid)
        )

    def to_host(self) -> List:
        """Affine int tuples (None = infinity) — small keys only."""
        spec = BN254_G1.field
        xs = spec.from_limbs(np.asarray(spec.from_mont(self.xs)))
        ys = spec.from_limbs(np.asarray(spec.from_mont(self.ys)))
        val = np.asarray(self.valid)
        return [
            (int(x), int(y)) if v else None for x, y, v in zip(xs, ys, val)
        ]


class DeviceG2Points:
    """G2 query table (Fp2 coordinate pairs); see DeviceG1Points on
    device- vs host-residency."""

    def __init__(self, xs, ys, valid):
        self.xs = xs  # (c0, c1) limb arrays
        self.ys = ys
        self.valid = valid

    def __len__(self):
        return int(self.xs[0].shape[0])

    def spilled(self) -> "DeviceG2Points":
        t = lambda tr: jax.tree.map(np.asarray, tr)  # noqa: E731
        return DeviceG2Points(t(self.xs), t(self.ys), np.asarray(self.valid))


SETUP_CHUNK = 1 << 19  # fixed-base generation chunk (compile reuse + HBM)
DEVICE_SCALARS_MAX_LOG_DOMAIN = 22  # above: host setup-scalar path.
# The device path faults the TPU worker at the 2^23 domain — reproduced
# in a minimal harness (experiments/hw_check.py stage 10, round 5:
# _setup_scalars_device on a synthetic 7.2M-wire PackedR1CS crashes the
# worker after ~10 min with all buffers co-resident, while stage 8's
# piecewise runs of the same kernels at the same sizes pass), i.e. a
# platform fault under combined allocation pressure, not a math bug.
# The gate IS the workaround; committed record: experiments/HW_CHECK10.log.
HOST_SPILL_MIN_VARS = 3_000_000  # keys above this spill query tables to
# host RAM (prove uploads each query just-in-time): the full key would not
# fit HBM next to the prove operands


def _vlog(msg: str) -> None:
    import os
    import sys

    if os.environ.get("ZKPOA_VERBOSE"):
        print(f"[zkpoa:setup] {msg}", file=sys.stderr, flush=True)


def _g1_query_device(scalars_limbs, spill: bool = False) -> DeviceG1Points:
    """[k_i * G1] as Montgomery affine arrays, chunked fixed-base + one
    Fermat batch inversion per chunk. Accepts host numpy OR device jnp
    plain-limb scalars. With spill=True each chunk is fetched to host
    numpy as it completes, so HBM never holds the whole table."""
    n = scalars_limbs.shape[0]
    xs_parts, ys_parts, val_parts = [], [], []
    for off in range(0, n, SETUP_CHUNK):
        _vlog(f"g1 query chunk {off}/{n}")
        chunk = jnp.asarray(scalars_limbs[off : off + SETUP_CHUNK])
        pad = max(_pad_pow2(chunk.shape[0]), 64) - chunk.shape[0]
        sc = (
            jnp.concatenate([chunk, jnp.zeros((pad, chunk.shape[1]), jnp.uint32)])
            if pad
            else chunk
        )
        jac = curve_jax.fixed_base_mul_batch(
            BN254_G1, "bn254_g1", bn254.G1_GEN, bn254.g1_add, sc, 254
        )
        xs, ys, valid = curve_jax.jac_to_affine_mont(BN254_G1.field, jac)
        m = chunk.shape[0]
        if spill:
            xs_parts.append(np.asarray(xs[:m]))
            ys_parts.append(np.asarray(ys[:m]))
            val_parts.append(np.asarray(valid[:m]))
        else:
            xs_parts.append(xs[:m])
            ys_parts.append(ys[:m])
            val_parts.append(valid[:m])
    cat = np.concatenate if spill else jnp.concatenate
    return DeviceG1Points(cat(xs_parts), cat(ys_parts), cat(val_parts))


def _g2_query_device(scalars_limbs, spill: bool = False) -> DeviceG2Points:
    from ..ops.fp2_jax import g2_jac_to_affine_mont

    n = scalars_limbs.shape[0]
    xs_parts, ys_parts, val_parts = [], [], []
    for off in range(0, n, SETUP_CHUNK):
        _vlog(f"g2 query chunk {off}/{n}")
        chunk = jnp.asarray(scalars_limbs[off : off + SETUP_CHUNK])
        pad = max(_pad_pow2(chunk.shape[0]), 64) - chunk.shape[0]
        sc = (
            jnp.concatenate([chunk, jnp.zeros((pad, chunk.shape[1]), jnp.uint32)])
            if pad
            else chunk
        )
        jac = curve_jax.fixed_base_mul_batch(
            BN254_G2, "bn254_g2", bn254.G2_GEN, bn254.g2_add, sc, 254
        )
        xs, ys, valid = g2_jac_to_affine_mont(jac)
        m = chunk.shape[0]
        grab = (lambda a: np.asarray(a[:m])) if spill else (lambda a: a[:m])
        xs_parts.append(jax.tree.map(grab, xs))
        ys_parts.append(jax.tree.map(grab, ys))
        val_parts.append(grab(valid))
    catf = np.concatenate if spill else jnp.concatenate
    cat = lambda parts: jax.tree.map(lambda *a: catf(a), *parts)  # noqa: E731
    return DeviceG2Points(cat(xs_parts), cat(ys_parts), catf(val_parts))


def _g2_points_from_scalars(scalars: Sequence[int]) -> List:
    n = len(scalars)
    if n == 0:
        return []
    n_pad = _pad_pow2(n)
    sc = jnp.asarray(msm_mod.scalars_to_limbs(list(scalars) + [0] * (n_pad - n)))
    acc = curve_jax.fixed_base_mul_batch(
        BN254_G2, "bn254_g2", bn254.G2_GEN, bn254.g2_add, sc, 254
    )
    return BN254_G2.decode_jac(acc)[:n]


def qap_evaluate_at_tau(r1cs: R1CS, tau: int, domain_size: int):
    """Per-wire QAP poly evaluations A_k(tau), B_k(tau), C_k(tau) (exact).

    Lagrange: L_i(tau) = Z(tau) * w^i / (m * (tau - w^i)); constraint i sits
    on root w^i. Returns (a_t, b_t, c_t, z_tau) lists of length n_wires."""
    from ..ops.ntt import domain_root

    m = domain_size
    log_m = m.bit_length() - 1
    assert 1 << log_m == m
    w = domain_root(log_m)
    z_tau = (pow(tau, m, R) - 1) % R
    if z_tau == 0:
        raise ValueError("tau hit the domain; pick another seed")
    # roots and denominators
    roots = [1] * m
    for i in range(1, m):
        roots[i] = roots[i - 1] * w % R
    denoms = [(tau - roots[i]) % R for i in range(m)]
    denom_inv = _batch_inv(denoms)
    m_inv = pow(m, -1, R)
    lag = [z_tau * roots[i] % R * denom_inv[i] % R * m_inv % R for i in range(m)]

    a_t = [0] * r1cs.n_wires
    b_t = [0] * r1cs.n_wires
    c_t = [0] * r1cs.n_wires
    for i, wire, coeff in r1cs.a_rows:
        a_t[wire] = (a_t[wire] + coeff * lag[i]) % R
    for i, wire, coeff in r1cs.b_rows:
        b_t[wire] = (b_t[wire] + coeff * lag[i]) % R
    for i, wire, coeff in r1cs.c_rows:
        c_t[wire] = (c_t[wire] + coeff * lag[i]) % R
    return a_t, b_t, c_t, z_tau


def _dev_pow_table(base: int, count: int, scale: int = 1) -> jnp.ndarray:
    """[scale·base^i for i < count] as Montgomery limbs on device via a
    binary masked build (2·log2(count) full-width muls — fully parallel,
    no sequential power ladder)."""
    from ..ops.limbs import BN254_FR
    from ..ops import limbs as L

    spec = BN254_FR
    bits = max((count - 1).bit_length(), 1)
    base_m = spec.encode([base % R])[0]
    scale_m = spec.encode([scale % R])
    idx = jnp.arange(count, dtype=jnp.uint32)
    t = jnp.broadcast_to(scale_m, (count, spec.n_limbs))

    def body(b, carry):
        t, s = carry
        bit = (idx >> b) & 1
        t2 = L.mont_mul(spec, t, s)
        t = jnp.where((bit == 1)[:, None], t2, t)
        return t, L.mont_mul(spec, s, s)

    t, _ = jax.lax.fori_loop(0, bits, body, (t, base_m))
    return t


def _lagrange_at_tau_device(m: int, tau: int, shift_div: int = 1):
    """Lagrange values L_i(tau/shift_div)·stuff as PLAIN limbs [m, K] on
    device: roots by masked power build, denominators inverted with the
    batched Fermat kernel. Returns (lag_mont [m, K], roots_mont, z_at)
    with lag_i = z_at·w^i / (m·(t' − w^i)), t' = tau/shift_div, z_at =
    t'^m − 1 — exactly qap_evaluate_at_tau's host math, vectorized."""
    from ..ops import limbs as L
    from ..ops.limbs import BN254_FR
    from ..ops.ntt import domain_root

    spec = BN254_FR
    w = domain_root(m.bit_length() - 1)
    tp = tau * pow(shift_div, -1, R) % R
    z_at = (pow(tp, m, R) - 1) % R
    if z_at == 0:
        raise ValueError("tau hit the domain; pick another seed")
    roots = _dev_pow_table(w, m)  # mont
    tp_m = jnp.broadcast_to(spec.encode([tp])[0], (m, spec.n_limbs))
    dinv = L.mont_inv(spec, L.sub_mod(spec, tp_m, roots))
    scale = z_at * pow(m, -1, R) % R
    lag = L.mont_mul(spec, roots, dinv)
    lag = L.mont_mul(spec, lag, spec.encode([scale])[0])
    return lag, roots, z_at


def _setup_scalars_device(r1cs: R1CS, seed: str, h_basis: str):
    """_setup_scalars with the QAP-at-tau evaluation, query scalar lists
    and h powers computed ON DEVICE as limb arrays (the host loop walked
    ~30M sparse rows of Python bigint math — minutes per layer-2 setup).
    Returns the same dict shape, with a_t/b_t/c_scalars/h_scalars as
    PLAIN-limb arrays and ic_scalars as host ints (O(n_public))."""
    from ..ops import limbs as L
    from ..ops.limbs import BN254_FR
    from ..ops.ntt import snarkjs_coset_shift
    from ..ops.qap_eval import eval_at_tau_device

    spec = BN254_FR
    tau = _hash_to_fr(seed, "tau")
    alpha = _hash_to_fr(seed, "alpha")
    beta = _hash_to_fr(seed, "beta")
    gamma = _hash_to_fr(seed, "gamma")
    delta = _hash_to_fr(seed, "delta")

    m = 1
    while m < max(r1cs.n_constraints, 2):
        m <<= 1

    lag_m, _roots, z_tau = _lagrange_at_tau_device(m, tau)
    lag_plain = spec.from_mont(lag_m)
    a_t, b_t, c_t = eval_at_tau_device(r1cs.pack(), lag_plain, r1cs.n_wires)

    gamma_inv = pow(gamma, -1, R)
    delta_inv = pow(delta, -1, R)
    n_pub = r1cs.n_public
    n_vars = r1cs.n_wires

    # t_all = beta·a_t + alpha·b_t + c_t (plain limbs)
    t_all = L.add_mod(
        spec,
        L.add_mod(
            spec,
            L.mont_mul(spec, a_t, spec.encode([beta])[0]),
            L.mont_mul(spec, b_t, spec.encode([alpha])[0]),
        ),
        c_t,
    )
    ic_scalars = [int(x) for x in spec.from_limbs(np.asarray(t_all[: n_pub + 1]))]
    ic_scalars = [x * gamma_inv % R for x in ic_scalars]
    c_scalars = L.mont_mul(spec, t_all[n_pub + 1 :], spec.encode([delta_inv])[0])

    if h_basis == "monomial":
        h_scalars = spec.from_mont(
            _dev_pow_table(tau, m - 1, scale=z_tau * delta_inv % R)
        )
    elif h_basis == "coset":
        g = snarkjs_coset_shift(m.bit_length() - 1)
        zc_inv = pow((pow(g, m, R) - 1) % R, -1, R)
        lag_c, _r2, _zp = _lagrange_at_tau_device(m, tau, shift_div=g)
        h_scalars = spec.from_mont(
            L.mont_mul(
                spec, lag_c, spec.encode([z_tau * zc_inv % R * delta_inv % R])[0]
            )
        )
    else:
        raise ValueError(f"unknown h_basis {h_basis!r}")

    return {
        "m": m,
        "n_pub": n_pub,
        "n_vars": n_vars,
        "a_t": a_t,  # plain limb arrays (device)
        "b_t": b_t,
        "c_scalars": c_scalars,
        "h_scalars": h_scalars,
        "ic_scalars": ic_scalars,  # host ints
        "alpha": alpha,
        "beta": beta,
        "gamma": gamma,
        "delta": delta,
    }


def _setup_scalars(r1cs: R1CS, seed: str, h_basis: str):
    """The exact host math of the trusted setup: QAP at tau + all query
    scalar lists. Shared by the host-point and device-point setups."""
    tau = _hash_to_fr(seed, "tau")
    alpha = _hash_to_fr(seed, "alpha")
    beta = _hash_to_fr(seed, "beta")
    gamma = _hash_to_fr(seed, "gamma")
    delta = _hash_to_fr(seed, "delta")

    m = 1
    while m < max(r1cs.n_constraints, 2):
        m <<= 1

    a_t, b_t, c_t, z_tau = qap_evaluate_at_tau(r1cs, tau, m)

    gamma_inv = pow(gamma, -1, R)
    delta_inv = pow(delta, -1, R)
    n_pub = r1cs.n_public
    n_vars = r1cs.n_wires

    # IC (public) and C-query (private) scalars
    ic_scalars = [
        (beta * a_t[k] + alpha * b_t[k] + c_t[k]) % R * gamma_inv % R
        for k in range(n_pub + 1)
    ]
    c_scalars = [
        (beta * a_t[k] + alpha * b_t[k] + c_t[k]) % R * delta_inv % R
        for k in range(n_pub + 1, n_vars)
    ]
    h_scalars = _h_scalars(m, tau, z_tau, delta_inv, h_basis)
    return {
        "m": m,
        "n_pub": n_pub,
        "n_vars": n_vars,
        "a_t": a_t,
        "b_t": b_t,
        "c_scalars": c_scalars,
        "h_scalars": h_scalars,
        "ic_scalars": ic_scalars,
        "alpha": alpha,
        "beta": beta,
        "gamma": gamma,
        "delta": delta,
    }


def _h_scalars(m: int, tau: int, z_tau: int, delta_inv: int, h_basis: str):
    if h_basis == "monomial":
        # H-query scalars: tau^i * Z(tau) / delta
        h_scalars = []
        t_pow = z_tau * delta_inv % R
        for _ in range(m - 1):
            h_scalars.append(t_pow)
            t_pow = t_pow * tau % R
    elif h_basis == "coset":
        # snarkjs convention: H_i = L_i^{coset}(tau)·Z(tau)/((g^m−1)·delta)
        # where the coset nodes are g·w^i with g = w_{2m} (the odd Lagrange
        # points of the 2m ptau domain) and L_i^{coset}(X) = L_i(X/g);
        # g^m = -1 so the Z constant is -2.
        from ..ops.ntt import domain_root, snarkjs_coset_shift

        g = snarkjs_coset_shift(m.bit_length() - 1)
        w = domain_root(m.bit_length() - 1)
        tp = tau * pow(g, -1, R) % R  # tau/g: evaluate standard L_i here
        zp = (pow(tp, m, R) - 1) % R
        if zp == 0:
            raise ValueError("tau hit the coset domain; pick another seed")
        zc_inv = pow((pow(g, m, R) - 1) % R, -1, R)
        roots = [1] * m
        for i in range(1, m):
            roots[i] = roots[i - 1] * w % R
        denom_inv = _batch_inv([(tp - roots[i]) % R for i in range(m)])
        scale = zp * pow(m, -1, R) % R * z_tau % R * zc_inv % R * delta_inv % R
        h_scalars = [scale * roots[i] % R * denom_inv[i] % R for i in range(m)]
    else:
        raise ValueError(f"unknown h_basis {h_basis!r}")
    return h_scalars


def setup(
    r1cs: R1CS, seed: str = "zkpoa-test-srs", h_basis: str = "monomial"
) -> ProvingKey:
    s = _setup_scalars(r1cs, seed, h_basis)
    n_vars, n_pub, m = s["n_vars"], s["n_pub"], s["m"]
    a_t, b_t = s["a_t"], s["b_t"]
    c_scalars, h_scalars, ic_scalars = s["c_scalars"], s["h_scalars"], s["ic_scalars"]
    alpha, beta, gamma, delta = s["alpha"], s["beta"], s["gamma"], s["delta"]

    # --- all point generation on TPU (batched fixed-base) ---
    g1_scalars = (
        a_t + b_t + c_scalars + h_scalars + ic_scalars + [alpha, beta, delta]
    )
    g1_pts = _g1_points_from_scalars(g1_scalars)
    o = 0
    a_query = g1_pts[o : o + n_vars]; o += n_vars
    b1_query = g1_pts[o : o + n_vars]; o += n_vars
    c_query = g1_pts[o : o + len(c_scalars)]; o += len(c_scalars)
    h_query = g1_pts[o : o + len(h_scalars)]; o += len(h_scalars)
    ic_pts = g1_pts[o : o + len(ic_scalars)]; o += len(ic_scalars)
    alpha1, beta1, delta1 = g1_pts[o], g1_pts[o + 1], g1_pts[o + 2]

    g2_pts = _g2_points_from_scalars(b_t + [beta, gamma, delta])
    b2_query = g2_pts[:n_vars]
    beta2, gamma2, delta2 = g2_pts[n_vars], g2_pts[n_vars + 1], g2_pts[n_vars + 2]

    from .groth16 import VerifyingKey

    vk = VerifyingKey(
        alpha_1=alpha1,
        beta_2=beta2,
        gamma_2=gamma2,
        delta_2=delta2,
        ic=ic_pts,
        n_public=n_pub,
    )

    return ProvingKey(
        n_vars=n_vars,
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
        h_basis=h_basis,
    )


def setup_device(
    r1cs: R1CS, seed: str = "zkpoa-test-srs", h_basis: str = "monomial"
) -> ProvingKey:
    """setup() with DEVICE-RESIDENT query tables (DeviceG1Points /
    DeviceG2Points): the path for multi-million-constraint circuits (the
    recursive layer-2/3 verifiers), where per-point host decoding would
    dominate. Scalar math is identical to setup(); only the point tables'
    residency differs. The few standalone points (alpha/beta/delta, IC)
    stay host-side (they are O(n_public))."""
    import os

    from ..ops.msm_pallas import scalars_to_limbs_fast

    m_domain = 1
    while m_domain < max(r1cs.n_constraints, 2):
        m_domain <<= 1
    # Device setup scalars fault the TPU worker at the 2^23 recursive
    # layer-2 domain (kernel fault inside the big fori programs — under
    # bisection, experiments/hw_check.py stage 8); domains above the gate
    # take the exact host path (proved on hardware at 7.24M wires).
    host_scalars_path = (
        os.environ.get("ZKPOA_HOST_SETUP") == "1"
        or (m_domain >= (1 << DEVICE_SCALARS_MAX_LOG_DOMAIN)
            and os.environ.get("ZKPOA_DEVICE_SETUP") != "1")
    )
    if host_scalars_path:
        _vlog(f"setup_device: host QAP scalars ({r1cs.n_constraints} constraints)")
        s = _setup_scalars(r1cs, seed, h_basis)
        enc = scalars_to_limbs_fast
    else:
        _vlog(f"setup_device: device QAP scalars ({r1cs.n_constraints} constraints)")
        s = _setup_scalars_device(r1cs, seed, h_basis)
        enc = lambda x: x  # already plain limb arrays  # noqa: E731
    n_vars, n_pub, m = s["n_vars"], s["n_pub"], s["m"]
    a_t, b_t = s["a_t"], s["b_t"]
    c_scalars, h_scalars, ic_scalars = s["c_scalars"], s["h_scalars"], s["ic_scalars"]
    alpha, beta, gamma, delta = s["alpha"], s["beta"], s["gamma"], s["delta"]

    spill = n_vars > HOST_SPILL_MIN_VARS
    if spill:
        _vlog("setup_device: key exceeds HBM budget — spilling to host RAM")
    _vlog("setup_device: a_query")
    a_query = _g1_query_device(enc(a_t), spill)
    _vlog("setup_device: b1_query")
    b1_query = _g1_query_device(enc(b_t), spill)
    _vlog("setup_device: c_query")
    c_query = _g1_query_device(enc(c_scalars), spill)
    _vlog("setup_device: h_query")
    h_query = _g1_query_device(enc(h_scalars), spill)
    _vlog("setup_device: b2_query (G2)")
    b2_query = _g2_query_device(enc(b_t), spill)
    _vlog("setup_device: done")

    small = _g1_points_from_scalars(ic_scalars + [alpha, beta, delta])
    ic_pts = small[: len(ic_scalars)]
    alpha1, beta1, delta1 = small[-3], small[-2], small[-1]
    g2_small = _g2_points_from_scalars([beta, gamma, delta])
    beta2, gamma2, delta2 = g2_small

    from .groth16 import VerifyingKey

    vk = VerifyingKey(
        alpha_1=alpha1,
        beta_2=beta2,
        gamma_2=gamma2,
        delta_2=delta2,
        ic=ic_pts,
        n_public=n_pub,
    )

    return ProvingKey(
        n_vars=n_vars,
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
        h_basis=h_basis,
    )
