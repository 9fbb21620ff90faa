"""Keccak-256: canonical vectors, host-vs-TPU-batch cross-check, and
end-to-end address derivation against the reference's fixture data
(private keys from tests/keys.ts -> secp256k1 pubkey -> keccak -> address
must reproduce the golden anonymity-set CSV rows)."""

import csv
import re

import numpy as np
import pytest

import tests.conftest as cft
from zkpoa_tpu.fields import secp256k1
from zkpoa_tpu.ops import keccak

KECCAK_EMPTY = "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
KECCAK_ABC = "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"


def test_host_known_vectors():
    assert keccak.keccak256(b"").hex() == KECCAK_EMPTY
    assert keccak.keccak256(b"abc").hex() == KECCAK_ABC


def test_host_multiblock():
    # > 136-byte message exercises multi-block absorb; self-consistency via
    # prefix-sensitivity
    a = keccak.keccak256(b"x" * 300)
    b = keccak.keccak256(b"x" * 299 + b"y")
    assert len(a) == 32 and a != b


def test_batch_matches_host():
    msgs = [b"", b"abc", b"hello world", b"\x00" * 64, bytes(range(64))]
    maxlen = 64
    arr = np.zeros((len(msgs), maxlen), dtype=np.uint8)
    # batch kernel is fixed-length; compare per-length groups
    for m in msgs:
        padded = np.frombuffer(m, dtype=np.uint8).reshape(1, -1) if m else np.zeros((1, 0), np.uint8)
        out = keccak.keccak256_fixed_batch(padded.reshape(1, len(m)))
        assert bytes(out[0].tolist()) == keccak.keccak256(m)


def _load_fixture_privkeys(n=40):
    with open(cft.reference_path("tests", "keys.ts")) as f:
        text = f.read()
    keys = [int(m.group(1)) for m in re.finditer(r"(\d{10,})n,", text)]
    assert len(keys) >= n
    return keys[:n]


@pytest.mark.skipif(not cft.has_reference(), reason="reference fixtures not mounted")
def test_address_derivation_reproduces_golden_anon_set():
    """pvt -> pubkey -> keccak -> address with balance pvt % 1000 must
    reproduce every row of the golden anonymity-set CSV (which the reference
    generated with ethers + its Rust tooling)."""
    with open(cft.reference_path("tests", "1_sigs_1_batches_5_height", "anonymity_set_10.csv")) as f:
        rows = list(csv.reader(f))[1:]
    golden = {int(a, 16): int(b) for a, b in rows}

    pvts = _load_fixture_privkeys(10)
    pubs = [secp256k1.pubkey_from_private(k) for k in pvts]
    addrs_batch = keccak.eth_addresses_batch(pubs)
    derived = {a: p % 1000 for a, p in zip(addrs_batch, pvts)}
    assert derived == golden
    # host path agrees
    for pub, addr in zip(pubs, addrs_batch):
        assert keccak.eth_address(pub) == addr
