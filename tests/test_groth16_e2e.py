"""End-to-end Groth16 on TPU-path kernels: build a circuit, run the
deterministic dev setup (TPU fixed-base points), prove (TPU NTT quotient +
Pippenger MSMs incl. the G2 MSM), and verify with the host pairing verifier.

Includes the first protocol slice: the membership+sum circuit over the
reference's golden anonymity set, proved against the golden Merkle root."""

import csv

import pytest

import tests.conftest as cft
from zkpoa_tpu.fields import bn254
from zkpoa_tpu.merkle import tree as merkle
from zkpoa_tpu.models.layers import MembershipWitnessInput, membership_sum_circuit
from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.prover import groth16
from zkpoa_tpu.prover.prove import prove
from zkpoa_tpu.prover.setup import setup


def _tiny_circuit(x=3, y=5):
    """Public out = x*y + x, private x, y."""
    c = Circuit()
    out = c.public_output()
    x_s = c.var(x)
    y_s = c.var(y)
    prod = c.mul(x_s, y_s)
    c.bind_output(out, prod + x_s)
    return c


def test_r1cs_satisfaction():
    c = _tiny_circuit()
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)
    assert c.public_values == [18]
    # tamper
    wit2 = list(wit)
    wit2[1] = 19
    assert not r1cs.is_satisfied(wit2)


def test_groth16_tiny_end_to_end():
    c = _tiny_circuit(7, 11)
    r1cs, wit = c.compile()
    pk = setup(r1cs, seed="tiny")
    proof = prove(pk, r1cs, wit, seed="p1")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, c.public_values)
    # wrong public input rejected
    assert not groth16.verify(vk, proof, [c.public_values[0] + 1])
    # different randomization still verifies
    proof2 = prove(pk, r1cs, wit, seed="p2")
    assert proof2.pi_a != proof.pi_a
    assert groth16.verify(vk, proof2, c.public_values)


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_membership_sum_proof_golden_tree():
    """Prove ownership of 3 accounts of the golden anonymity set against the
    reference's golden Merkle root, on the TPU prover."""
    with open(cft.reference_path("tests", "1_sigs_1_batches_5_height", "anonymity_set_10.csv")) as f:
        rows = list(csv.reader(f))[1:]
    addresses = [int(a, 16) for a, _ in rows]
    balances = [int(b) for _, b in rows]
    t = merkle.MerkleTree.build(addresses, balances, height=5)

    owned = [0, 3, 7]  # ascending addresses (csv is sorted)
    accounts = []
    for i in owned:
        pr = t.prove(i)
        accounts.append(
            MembershipWitnessInput(
                address=addresses[i],
                balance=balances[i],
                path_elements=pr.path_elements,
                path_indices=pr.path_indices,
            )
        )
    c = membership_sum_circuit(t.root(), accounts, tree_levels=4)
    r1cs, wit = c.compile()
    assert r1cs.is_satisfied(wit)
    expected_sum = sum(balances[i] for i in owned)
    assert c.public_values == [expected_sum, t.root()]

    pk = setup(r1cs, seed="membership")
    proof = prove(pk, r1cs, wit)
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, [expected_sum, t.root()])
    # forged sum rejected
    assert not groth16.verify(vk, proof, [expected_sum + 1, t.root()])
    # forged root rejected
    assert not groth16.verify(vk, proof, [expected_sum, (t.root() + 1) % bn254.R])


def test_membership_rejects_unsorted_addresses():
    """Anti-double-count: equal/descending addresses must fail witness gen."""
    from zkpoa_tpu.ops.poseidon import poseidon2

    addrs = [5, 5]
    bals = [10, 10]
    tr = merkle.MerkleTree.build(addrs, bals, height=3)
    accounts = []
    for i in range(2):
        pr = tr.prove(i)
        accounts.append(
            MembershipWitnessInput(addrs[i], bals[i], pr.path_elements, pr.path_indices)
        )
    with pytest.raises(AssertionError):
        membership_sum_circuit(tr.root(), accounts, tree_levels=2)
