"""Protocol layer circuits (the framework's "model zoo").

Parity map to the reference (SURVEY.md §2.1):
  * layer_one (batch-ECDSA* verify + pubkey sponge)  — gadget roadmap:
    secp256k1 bigint gadgets (rounds 2+); host/TPU verification of the same
    statement exists today in zkpoa_tpu.fields.secp256k1 / pipeline.
  * layer_two (in-snark G16 verify + address derive + Merkle + sum):
    `membership_sum_circuit` below implements the accounting core —
    Poseidon leaf hashing, Merkle inclusion against the public root,
    strictly-ascending address anti-double-count, balance summation —
    i.e. circuits/layer_two.circom:71-124 minus the recursive verifier and
    Keccak address derivation (those gadgets land in later rounds).
  * layer_three (aggregate + Pedersen commitment): host/TPU Pedersen is in
    fields.curve25519 / pipeline; the ed25519 scalar-mul gadget follows the
    same roadmap.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

from .gadgets.core import assert_less_than
from .gadgets.merkle_gadget import merkle_verify
from .gadgets.poseidon_gadget import poseidon
from .r1cs import Circuit, R1CS


@dataclass
class MembershipWitnessInput:
    """Per-owned-account private data (address, balance, Merkle path)."""

    address: int
    balance: int
    path_elements: List[int]
    path_indices: List[int]


def membership_sum_circuit(
    merkle_root: int,
    accounts: Sequence[MembershipWitnessInput],
    tree_levels: int,
) -> Circuit:
    """Prove: every (address, balance) is a leaf of the tree with
    `merkle_root`; addresses strictly ascend (no double counting,
    circuits/layer_two.circom:78-87); output their balance sum.

    Public wires (in order): [balance_sum (output), merkle_root (input)] —
    matching the reference's layer-2 public signature
    (scripts/generate_circuits.ts:88: only merkle_root is a public input;
    balance_sum is the public output)."""
    c = Circuit()
    balance_sum_out = c.public_output()
    root = c.public(merkle_root)

    addr_sigs = []
    total = None
    for acct in accounts:
        addr = c.var(acct.address)
        bal = c.var(acct.balance)
        leaf = poseidon(c, [addr, bal])
        assert len(acct.path_elements) == tree_levels
        path_el = [c.var(x) for x in acct.path_elements]
        path_ix = [c.var(x) for x in acct.path_indices]
        merkle_verify(c, leaf, root, path_el, path_ix)
        addr_sigs.append(addr)
        total = bal if total is None else total + bal

    # strictly ascending addresses (160-bit compare)
    for prev, cur in zip(addr_sigs, addr_sigs[1:]):
        assert_less_than(c, prev, cur, 160)

    c.bind_output(balance_sum_out, total if total is not None else 0)
    return c
