"""Poseidon: circomlib-vector pinning, golden-artifact bit-exactness, and
host-vs-TPU-kernel cross-checks. Also the Merkle engine against the
reference's golden root."""

import csv
import json

import numpy as np
import pytest

import tests.conftest as cft
import jax.numpy as jnp

from zkpoa_tpu.merkle import tree as merkle
from zkpoa_tpu.ops import poseidon as ph
from zkpoa_tpu.ops import poseidon_jax as pj
from zkpoa_tpu.ops.limbs import BN254_FR

# Widely-known circomlib/circomlibjs test vectors (pin the Grain variant).
POSEIDON_1 = 18586133768512220936620570745912940619677854269274689475585506675881198879027
POSEIDON_1_2 = 7853200120776062878684798364095072458815029376092732009249414926327459813530

GOLDEN_DIR = "tests/1_sigs_1_batches_5_height"
GOLDEN_ROOT = 4980353021834912512710796692386145127886467347162150588171360986794629731619
GOLDEN_L1_PUBLIC = 16046945922456683920931562152137446035290667510980821390048840882709291296593


def test_host_known_vectors():
    assert ph.poseidon([1]) == POSEIDON_1
    assert ph.poseidon([1, 2]) == POSEIDON_1_2


def test_host_sponge_single_chunk_is_poseidonex_out1():
    inputs = list(range(1, 5))
    assert ph.poseidon_sponge(inputs) == ph.poseidon_ex(inputs, 0, 2)[1]


def test_host_sponge_multi_chunk():
    inputs = list(range(1, 20))  # 2 chunks: 16 + 3
    first = ph.poseidon_ex(inputs[:16], 0, 1)[0]
    expected = ph.poseidon_ex(inputs[16:], first, 2)[1]
    assert ph.poseidon_sponge(inputs) == expected


def test_jax_poseidon_matches_host():
    rows = [[1], [2], [0], [BN254_FR.modulus - 1]]
    out = pj.poseidon_many(rows)
    for row, o in zip(rows, out):
        assert int(o) == ph.poseidon(row)


def test_jax_hash2_matches_host():
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(BN254_FR.modulus), rng.randrange(BN254_FR.modulus)) for _ in range(5)]
    left = BN254_FR.encode([p[0] for p in pairs])
    right = BN254_FR.encode([p[1] for p in pairs])
    out = BN254_FR.decode(pj.hash2(left, right))
    for (a, b), o in zip(pairs, out):
        assert int(o) == ph.poseidon2(a, b)


def test_jax_sponge_matches_host():
    rows = [list(range(1, 19)), list(range(100, 118))]  # length 18 -> 2 chunks
    enc = BN254_FR.encode(rows)
    out = BN254_FR.decode(pj.sponge_batch(enc))
    for row, o in zip(rows, out):
        assert int(o) == ph.poseidon_sponge(row)


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_golden_layer_one_sponge():
    with open(cft.reference_path(GOLDEN_DIR, "layer_one", "batch_0", "layer_one_batch_0_input.json")) as f:
        d = json.load(f)
    xregs = [int(v) for v in d["pubkey"][0][0]]
    assert ph.poseidon_sponge(xregs) == GOLDEN_L1_PUBLIC


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_merkle_engine_golden_root_and_proofs():
    with open(cft.reference_path(GOLDEN_DIR, "anonymity_set_10.csv")) as f:
        rows = list(csv.reader(f))[1:]
    addresses = [int(a, 16) for a, _ in rows]
    balances = [int(b) for _, b in rows]
    t = merkle.MerkleTree.build(addresses, balances, height=5)
    assert t.n_leaves == 16
    assert t.root() == GOLDEN_ROOT
    for idx in (0, 7, 9, 15):
        proof = t.prove(idx)
        assert merkle.verify_proof(t.root(), proof)
        # tampered sibling must fail
        bad = merkle.MerkleProof(
            proof.leaf, proof.leaf_index, [x + 1 for x in proof.path_elements], proof.path_indices
        )
        assert not merkle.verify_proof(t.root(), bad)
    # padded leaf is literally 0
    assert t.leaf(15) == 0


def test_merkle_owned_index_lookup():
    anon = [10, 20, 30, 40]
    assert merkle.find_owned_indices(anon, [20, 40]) == [1, 3]
    with pytest.raises(ValueError):
        merkle.find_owned_indices(anon, [25])
