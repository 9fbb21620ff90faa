"""Batch-parallel proving over the mesh "batch" axis (parallel/batch_prove):
the reference's GNU-parallel per-batch fan-out (full_workflow.sh:552) as a
shard_map. Proofs must be byte-identical to sequential prove() calls."""

import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.models.gadgets.poseidon_gadget import poseidon
from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.parallel.batch_prove import prove_batched
from zkpoa_tpu.parallel.mesh import make_mesh
from zkpoa_tpu.prover import groth16
from zkpoa_tpu.prover.prove import prove
from zkpoa_tpu.prover.setup import setup_device


def _toy(x, y):
    c = Circuit()
    out = c.public_output()
    a = c.var(x)
    b = c.var(y)
    c.bind_output(out, poseidon(c, [a, b]))
    return c.compile()


def test_prove_batched_matches_sequential():
    r1cs, w0 = _toy(7, 11)
    _, w1 = _toy(13, 17)
    pk = setup_device(r1cs, seed="batchkey")
    mesh = make_mesh(2, axis="batch")
    proofs = prove_batched(pk, r1cs, [w0, w1], mesh, seed="bp")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    for i, (proof, wit) in enumerate(zip(proofs, [w0, w1])):
        publics = [wit[w] for w in range(1, r1cs.n_public + 1)]
        assert groth16.verify(vk, proof, publics)
        ref = prove(pk, r1cs, wit, seed=f"bp-b{i}")
        assert proof.pi_a == ref.pi_a and proof.pi_b == ref.pi_b and proof.pi_c == ref.pi_c
