"""Groth16 proving on TPU: witness -> proof.

The online path that replaces rapidsnark's C++ prover (reference
scripts/g16_prove.sh:246-252): QAP quotient h(X) via device NTTs
(zkpoa_tpu.ops.ntt.quotient) and four MSMs (pi_A, pi_B1 G1; pi_B2 G2; pi_C
over C-query + H-query) via the Pippenger kernel (zkpoa_tpu.ops.msm).

Proof randomization (r, s) is deterministic-from-seed by default so tests
are reproducible; pass secrets for real use. Output verifies under
zkpoa_tpu.prover.groth16.verify and exports snarkjs-shaped JSON.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bn254
from ..fields.bn254 import R
from ..models.r1cs import R1CS
from ..ops import msm as msm_mod
from ..ops.curve_jax import BN254_G1
from ..ops.fp2_jax import BN254_G2
from ..ops.limbs import BN254_FR
from ..ops.ntt import coset_qap_evals, quotient
from .groth16 import Proof
from .setup import ProvingKey


def _rand_fr(seed: str, label: str) -> int:
    h = hashlib.sha256(f"zkpoa-prove|{seed}|{label}".encode()).digest()
    h += hashlib.sha256(h).digest()
    return int.from_bytes(h, "big") % R


def _qap_domain_evals(r1cs: R1CS, witness: Sequence[int], domain_size: int):
    a_ev, b_ev, c_ev = r1cs.eval_matrices(witness)
    if not r1cs.c_rows and r1cs.n_constraints:
        # zkey-imported systems carry only A/B rows (a .zkey stores no C
        # matrix); for a satisfying witness C's domain evaluations equal
        # A·B pointwise, which is all the quotient needs.
        c_ev = [a * b % R for a, b in zip(a_ev, b_ev)]
    pad = [0] * (domain_size - len(a_ev))
    enc = BN254_FR.encode
    return enc(a_ev + pad), enc(b_ev + pad), enc(c_ev + pad)


def compute_h_coeffs(r1cs: R1CS, witness: Sequence[int], domain_size: int) -> List[int]:
    """h(X) = (A·B - C)/Z coefficients via device NTTs."""
    a_m, b_m, c_m = _qap_domain_evals(r1cs, witness, domain_size)
    h_m = quotient(a_m, b_m, c_m)
    return [int(x) for x in BN254_FR.decode(h_m)]


def compute_h_operand(
    r1cs: R1CS, witness: Sequence[int], domain_size: int, h_basis: str
) -> List[int]:
    """The scalar operand for the H-query MSM, per the zkey's section-9
    basis (prover/setup.py ProvingKey.h_basis): h coefficients for our
    monomial basis, or coset evaluations of A·B−C for the snarkjs
    coset-Lagrange convention (what rapidsnark MSMs against pointsH)."""
    if h_basis == "monomial":
        return compute_h_coeffs(r1cs, witness, domain_size)
    if h_basis == "coset":
        a_m, b_m, c_m = _qap_domain_evals(r1cs, witness, domain_size)
        return [int(x) for x in BN254_FR.decode(coset_qap_evals(a_m, b_m, c_m))]
    raise ValueError(f"unknown h_basis {h_basis!r}")


def _qap_domain_evals_fast(r1cs: R1CS, witness: Sequence[int], domain_size: int):
    """_qap_domain_evals with vectorized host->device limb encoding (the
    per-int Python loop of FieldSpec.to_limbs dominates at 10^7 wires)."""
    from ..ops.msm_pallas import scalars_to_limbs_fast

    a_ev, b_ev, c_ev = r1cs.eval_matrices(witness)
    if not r1cs.c_rows and r1cs.n_constraints:
        c_ev = [a * b % R for a, b in zip(a_ev, b_ev)]
    pad = [0] * (domain_size - len(a_ev))

    def enc(vals):
        limbs = jnp.asarray(scalars_to_limbs_fast(vals + pad))
        return BN254_FR.to_mont(limbs)

    return enc(a_ev), enc(b_ev), enc(c_ev)


def _prove_device(pk: ProvingKey, r1cs: R1CS, witness, seed, r, s) -> Proof:
    """prove() for device-resident keys (setup_device): every MSM operand
    stays on device — witness limbs uploaded once, the h-operand comes
    straight out of the NTT with no host round trip."""
    from ..ops import msm_pallas as M2
    from ..ops.ntt import coset_qap_evals, quotient

    import os as _os
    import sys as _sys

    def _vlog(msg):
        if _os.environ.get("ZKPOA_VERBOSE"):
            print(f"[zkpoa:prove] {msg}", file=_sys.stderr, flush=True)

    h_basis = getattr(pk, "h_basis", "monomial")
    from ..ops.ntt_blocked import BLOCKED_MIN_LOG_N, quotient_blocked

    w = [int(x) % R for x in witness]
    w_limbs = M2.scalars_to_limbs_fast(w)

    if pk.domain_size >= (1 << BLOCKED_MIN_LOG_N):
        # device SpMV (ops/qap_eval) feeding the blocked four-step quotient:
        # one witness upload, everything else stays in HBM, peak ~3 operands
        # + one block (the monolithic quotient's ~5GB of stage/coset tables
        # + six intermediates RESOURCE_EXHAUSTED the 2^23 layer-2 domain on
        # hardware; the Python eval_matrices loop took minutes per prove)
        from ..ops.qap_eval import eval_matrices_device

        _vlog("device qap eval")
        a_p, b_p, c_p = eval_matrices_device(r1cs.pack(), w_limbs, pk.domain_size)
        _vlog("blocked quotient")
        h_dev = quotient_blocked(a_p, b_p, c_p, h_basis=h_basis)
        if h_basis == "monomial":
            h_dev = h_dev[: len(pk.h_query)]
        # on TPU the h-operand never leaves the device (device-planned
        # MSM); the CPU path still plans on host from a fetched copy
        h_limbs = h_dev if jax.default_backend() != "cpu" else np.asarray(h_dev)
        del h_dev, a_p, b_p, c_p
    else:
        _vlog("qap domain evals")
        a_m, b_m, c_m = _qap_domain_evals_fast(r1cs, witness, pk.domain_size)
        if h_basis == "monomial":
            h_dev = BN254_FR.from_mont(quotient(a_m, b_m, c_m))[: len(pk.h_query)]
        else:
            h_dev = BN254_FR.from_mont(coset_qap_evals(a_m, b_m, c_m))
        # fetch the h operand for HOST stream planning (the device-sort
        # program takes ~10 minutes to compile at N ~ 10^6; numpy plans the
        # whole stream in seconds) — and drop the device-side QAP arrays:
        # at an 8M domain they hold ~2GB of HBM the MSMs need
        h_limbs = np.asarray(h_dev)
        del h_dev, a_m, b_m, c_m

    # witness MSMs: repeated scalar values (wires holding bits etc.) are
    # split out and tree-summed — they would otherwise set the Pippenger
    # round bound to their repeat count (observed 647k rounds at 1.6M
    # wires from the ~650k bit-valued wires). The witness limbs are
    # uploaded ONCE and shared by the a/b1/c/b2 MSMs (device planning
    # needs no per-MSM host data).
    # Low-HBM mode for very large keys (the 15.2M-wire layer-3 prove
    # RESOURCE_EXHAUSTED the chip with ~3 GB of idle buffers resident):
    # spill the h-operand to host until its own MSM (it is consumed LAST)
    # and drop the [nw, N] device order table once the shared index
    # stream is materialized.
    low_hbm = (jax.default_backend() != "cpu"
               and (pk.n_vars >= int(_os.environ.get(
                   "ZKPOA_LOW_HBM_MIN_VARS", str(10_000_000)))))
    if low_hbm and not isinstance(h_limbs, np.ndarray):
        _vlog("low-HBM: spilling h operand to host until the h MSM")
        h_limbs = np.asarray(h_limbs)

    w_dev = jnp.asarray(w_limbs)
    if jax.default_backend() != "cpu":
        # ONE device plan (digit recode + bucket sort) shared by the
        # a/b1/b2 witness MSMs; per-query infinity masks apply inside
        # the accumulation
        _vlog("witness MSM plan (shared)")
        wplan = M2.plan_witness_msms(w_limbs, w_dev)
        if low_hbm:
            wplan.free_order_y()
        _vlog("a-query MSM")
        a_acc = M2.msm_shared(BN254_G1, pk.a_query, wplan,
                              bn254.g1_add, bn254.g1_mul)
        _vlog("b1-query MSM")
        b1_acc = M2.msm_shared(BN254_G1, pk.b1_query, wplan,
                               bn254.g1_add, bn254.g1_mul)
        _vlog("b2-query G2 MSM")
        b2_acc = M2.msm_shared(BN254_G2, pk.b2_query, wplan,
                               bn254.g2_add, bn254.g2_mul, use_tree=True)
    else:
        _vlog("a-query MSM")
        a_acc = M2.msm_tpu_heavy_split(
            BN254_G1, pk.a_query, w_limbs, bn254.g1_add, bn254.g1_mul,
            scalars_dev=w_dev)
        _vlog("b1-query MSM")
        b1_acc = M2.msm_tpu_heavy_split(
            BN254_G1, pk.b1_query, w_limbs, bn254.g1_add, bn254.g1_mul,
            scalars_dev=w_dev)
        _vlog("b2-query G2 MSM")
        b2_acc = M2.msm_tpu_heavy_split(
            BN254_G2, pk.b2_query, w_limbs, bn254.g2_add, bn254.g2_mul,
            use_tree=True, scalars_dev=w_dev)
    _vlog("c-query MSM")
    if jax.default_backend() != "cpu":
        # the C-query covers the private-wire suffix: front-pad it with
        # invalid rows so it rides the SAME shared plan + index stream as
        # a/b1/b2 instead of paying its own digit recode + sort
        c_acc = M2.msm_shared(BN254_G1, pk.c_query, wplan,
                              bn254.g1_add, bn254.g1_mul,
                              prefix_pad=pk.n_public + 1)
    else:
        c_acc = M2.msm_tpu_heavy_split(
            BN254_G1, pk.c_query, w_limbs[pk.n_public + 1 :],
            bn254.g1_add, bn254.g1_mul,
            scalars_dev=w_dev[pk.n_public + 1 :])
    _vlog("h-query MSM")
    if low_hbm:
        # everything the h MSM doesn't need is released first: the shared
        # witness plan (order table already dropped, the stream + scalars
        # go now) — then the spilled h operand comes back on device so
        # the MSM uses device planning (host planning would ship a
        # [nw, N] order table through the tunnel)
        wplan = None
        w_dev = None
        h_limbs = jnp.asarray(h_limbs)
    h_xs = jnp.asarray(pk.h_query.xs)
    h_ys = jnp.asarray(pk.h_query.ys)
    h_acc_d = M2.msm_tpu(BN254_G1, h_xs, h_ys, h_limbs,
                         c=M2.auto_c(len(pk.h_query)),
                         point_valid=jnp.asarray(pk.h_query.valid))

    _vlog("decode proof points")
    h_acc = BN254_G1.decode_jac(jax.tree.map(lambda a: a[None], h_acc_d))[0]
    del h_acc_d, h_xs, h_ys
    return _assemble_proof(pk, a_acc, b1_acc, c_acc, h_acc, b2_acc, r, s)


def _assemble_proof(pk, a_acc, b1_acc, c_acc, h_acc, b2_acc, r, s) -> Proof:
    g1 = bn254
    pi_a = g1.g1_add(g1.g1_add(pk.alpha1, a_acc), g1.g1_mul(pk.delta1, r))
    pi_b1 = g1.g1_add(g1.g1_add(pk.beta1, b1_acc), g1.g1_mul(pk.delta1, s))
    pi_b2 = bn254.g2_add(bn254.g2_add(pk.beta2, b2_acc), bn254.g2_mul(pk.delta2, s))
    pi_c = g1.g1_add(c_acc, h_acc)
    pi_c = g1.g1_add(pi_c, g1.g1_mul(pi_a, s))
    pi_c = g1.g1_add(pi_c, g1.g1_mul(pi_b1, r))
    pi_c = g1.g1_add(pi_c, g1.g1_neg(g1.g1_mul(pk.delta1, r * s % R)))
    return Proof(pi_a=pi_a, pi_b=pi_b2, pi_c=pi_c)


def prove(
    pk: ProvingKey,
    r1cs: R1CS,
    witness: Sequence[int],
    seed: str = "zkpoa-proof",
    r: Optional[int] = None,
    s: Optional[int] = None,
) -> Proof:
    assert len(witness) == pk.n_vars
    r = _rand_fr(seed, "r") if r is None else r % R
    s = _rand_fr(seed, "s") if s is None else s % R

    from .setup import DeviceG1Points

    if isinstance(pk.a_query, DeviceG1Points):
        return _prove_device(pk, r1cs, witness, seed, r, s)

    h_basis = getattr(pk, "h_basis", "monomial")
    h_coeffs = compute_h_operand(r1cs, witness, pk.domain_size, h_basis)

    w = [int(x) % R for x in witness]
    priv = w[pk.n_public + 1 :]

    # G1 MSMs
    a_acc = msm_mod.msm(BN254_G1, pk.a_query, w)
    b1_acc = msm_mod.msm(BN254_G1, pk.b1_query, w)
    c_acc = msm_mod.msm(BN254_G1, pk.c_query, priv)
    h_acc = msm_mod.msm(BN254_G1, pk.h_query, h_coeffs[: len(pk.h_query)])
    # G2 MSM
    b2_acc = msm_mod.msm(BN254_G2, pk.b2_query, w)

    g1 = bn254
    pi_a = g1.g1_add(g1.g1_add(pk.alpha1, a_acc), g1.g1_mul(pk.delta1, r))
    pi_b1 = g1.g1_add(g1.g1_add(pk.beta1, b1_acc), g1.g1_mul(pk.delta1, s))
    pi_b2 = bn254.g2_add(bn254.g2_add(pk.beta2, b2_acc), bn254.g2_mul(pk.delta2, s))
    pi_c = g1.g1_add(c_acc, h_acc)
    pi_c = g1.g1_add(pi_c, g1.g1_mul(pi_a, s))
    pi_c = g1.g1_add(pi_c, g1.g1_mul(pi_b1, r))
    pi_c = g1.g1_add(pi_c, g1.g1_neg(g1.g1_mul(pk.delta1, r * s % R)))

    return Proof(pi_a=pi_a, pi_b=pi_b2, pi_c=pi_c)
