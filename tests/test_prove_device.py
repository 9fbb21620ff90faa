"""Device-resident Groth16 pipeline (setup_device + _prove_device):
multi-million-point keys stay in HBM (no per-point host decode). Proofs
must be byte-identical to the host-point pipeline under the same seeds —
this is the path the recursive layer-2/3 circuits (~7M constraints) use.
Reference analog: rapidsnark's in-memory zkey tables (scripts/g16_prove.sh)."""

import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.models.gadgets.poseidon_gadget import poseidon
from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.prover import groth16
from zkpoa_tpu.prover.prove import prove
from zkpoa_tpu.prover.setup import DeviceG1Points, setup, setup_device


def _toy_circuit():
    c = Circuit()
    out = c.public_output()
    x = c.var(7)
    y = c.var(11)
    c.bind_output(out, poseidon(c, [x, y]))
    return c.compile()


@pytest.mark.parametrize("basis", ["monomial", "coset"])
def test_device_pipeline_matches_host(basis):
    r1cs, wit = _toy_circuit()
    pk = setup_device(r1cs, seed="devtest", h_basis=basis)
    assert isinstance(pk.a_query, DeviceG1Points)
    proof = prove(pk, r1cs, wit, seed="p1")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    publics = [wit[w] for w in range(1, r1cs.n_public + 1)]
    assert groth16.verify(vk, proof, publics)

    pk_h = setup(r1cs, seed="devtest", h_basis=basis)
    proof_h = prove(pk_h, r1cs, wit, seed="p1")
    assert proof.pi_a == proof_h.pi_a
    assert proof.pi_b == proof_h.pi_b
    assert proof.pi_c == proof_h.pi_c


def test_device_points_to_host_roundtrip():
    r1cs, wit = _toy_circuit()
    pk = setup_device(r1cs, seed="devtest")
    pk_h = setup(r1cs, seed="devtest")
    assert pk.a_query.to_host() == pk_h.a_query


@pytest.mark.parametrize("basis", ["monomial", "coset"])
def test_device_pipeline_blocked_quotient(basis, monkeypatch):
    """Force the blocked four-step quotient path (the recursion-scale HBM
    fix) through _prove_device; proofs must stay byte-identical."""
    from zkpoa_tpu.ops import ntt_blocked as NB
    import zkpoa_tpu.prover.prove as PV

    r1cs, wit = _toy_circuit()
    pk = setup_device(r1cs, seed="devtest", h_basis=basis)
    proof_mono = prove(pk, r1cs, wit, seed="p1")
    monkeypatch.setattr(NB, "BLOCKED_MIN_LOG_N", 1)
    monkeypatch.setattr(NB, "BLOCK_TARGET_BYTES", 8 * 16 * 4)
    proof_blk = prove(pk, r1cs, wit, seed="p1")
    assert proof_blk.pi_a == proof_mono.pi_a
    assert proof_blk.pi_b == proof_mono.pi_b
    assert proof_blk.pi_c == proof_mono.pi_c


def test_device_key_disk_cache(tmp_path, monkeypatch):
    """cached_setup persists device keys (.dpk npz + meta); a reloaded key
    proves byte-identically and skips setup entirely."""
    import zkpoa_tpu.prover.cache as cache
    import zkpoa_tpu.prover.setup as setup_mod

    monkeypatch.setattr(cache, "DEVICE_SETUP_MIN_CONSTRAINTS", 1)
    r1cs, wit = _toy_circuit()
    pk = cache.cached_setup(r1cs, str(tmp_path), "toy", seed="devtest")
    assert isinstance(pk.a_query, DeviceG1Points)
    proof = prove(pk, r1cs, wit, seed="p1")

    calls = []
    monkeypatch.setattr(
        cache, "setup_device",
        lambda *a, **k: calls.append(1) or setup_mod.setup_device(*a, **k),
    )
    pk2 = cache.cached_setup(r1cs, str(tmp_path), "toy", seed="devtest")
    assert not calls, "cache hit must not re-run setup"
    proof2 = prove(pk2, r1cs, wit, seed="p1")
    assert (proof.pi_a, proof.pi_b, proof.pi_c) == (proof2.pi_a, proof2.pi_b, proof2.pi_c)


def test_fixed_base_pallas_variant_matches():
    """fixed_base_mul_batch_pallas (CPU: falls through to the jnp fold)
    must produce the same points as the plain fold; exercises the routing
    + digit/index construction."""
    import numpy as np
    import jax.numpy as jnp

    from zkpoa_tpu.fields import bn254
    from zkpoa_tpu.ops import curve_jax, msm as msm_mod
    from zkpoa_tpu.ops.curve_jax import BN254_G1

    rng = np.random.default_rng(13)
    scalars = [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(64)]
    sc = jnp.asarray(msm_mod.scalars_to_limbs(scalars))
    jac_a = curve_jax.fixed_base_mul_batch(
        BN254_G1, "bn254_g1", bn254.G1_GEN, bn254.g1_add, sc, 254)
    jac_b = curve_jax.fixed_base_mul_batch_pallas(
        BN254_G1, "bn254_g1", bn254.G1_GEN, bn254.g1_add, sc, 254)
    pa = BN254_G1.decode_jac(jac_a)
    pb = BN254_G1.decode_jac(jac_b)
    assert pa == pb
    for p, k in zip(pa, scalars):
        assert p == bn254.g1_mul(bn254.G1_GEN, k % bn254.N_CURVE if hasattr(bn254, 'N_CURVE') else k)
