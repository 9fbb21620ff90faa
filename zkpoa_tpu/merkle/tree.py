"""TPU Poseidon-Merkle engine: batched tree build over the anonymity set and
inclusion-proof extraction.

Replaces the reference's sequential Rust `merkle-tree` binary
(/root/reference/scripts/merkle_tree.rs: leaf = Poseidon(address, balance),
pad to 2^height with zero leaves, rs_merkle tree, per-owned-address proofs)
— noted there as the 2.5h-at-10M-leaves bottleneck. Here: one batched
Poseidon call per level, all leaves hashed in a single device dispatch;
level l has 2^(h-1-l) hashes, so the whole build is ~2x the leaf-hash work.

Output schema matches the reference artifacts: merkle_root.json is the bare
decimal root; merkle_proofs.json carries per-owned-leaf (leaf, path_elements,
path_indices) against the same root (scripts/merkle_tree.rs:190-204,357-392;
verified in-circuit by circuits/merkle.circom MerkleProofVerify).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import poseidon as poseidon_host
from ..ops import poseidon_jax
from ..ops.limbs import BN254_FR


@dataclass
class MerkleProof:
    leaf: int
    leaf_index: int
    path_elements: List[int]  # sibling hashes, leaf level first
    path_indices: List[int]  # 0 = current node is left child, 1 = right


class MerkleTree:
    """Poseidon(2) Merkle tree. `height` counts levels of *nodes* including
    the leaf level and the root (reference convention: a tree over 2^(h-1)
    leaves has height h; full_workflow.sh computes h = ceil(log2(n))+1)."""

    def __init__(self, levels: List[jnp.ndarray]):
        # levels[0] = leaves (uint32 limbs [N, K], Montgomery form);
        # levels[-1] = root ([1, K]). DEVICE-resident: nothing is fetched
        # to the host during the build (the round-1 review flagged the
        # per-level np.asarray round trips as the 10M-leaf killer); root
        # and proof queries decode only the rows they need.
        self._levels = levels

    # -- construction -------------------------------------------------------

    HASH_CHUNK = 1 << 15  # level-hash chunk: big levels share ONE compile

    @classmethod
    def _hash_level(cls, cur: jnp.ndarray) -> jnp.ndarray:
        n2 = cur.shape[0] // 2
        if n2 > cls.HASH_CHUNK:
            parts = []
            for o in range(0, n2, cls.HASH_CHUNK):
                sl = cur[2 * o : 2 * (o + cls.HASH_CHUNK)]
                parts.append(poseidon_jax.hash2(sl[0::2], sl[1::2]))
            return jnp.concatenate(parts)
        return poseidon_jax.hash2(cur[0::2], cur[1::2])

    @classmethod
    def from_leaves_mont(cls, leaves: jnp.ndarray) -> "MerkleTree":
        n = leaves.shape[0]
        assert n & (n - 1) == 0, "leaf count must be a power of two (pad first)"
        levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = cls._hash_level(cur)
            levels.append(cur)
        return cls(levels)

    @classmethod
    def build(cls, addresses: Sequence[int], balances: Sequence[int], height: int) -> "MerkleTree":
        """Leaf = Poseidon(address, balance); pad with zero-valued leaves to
        2^(height-1) (the reference pads with 0, scripts/merkle_tree.rs:256-262)."""
        from ..ops.msm_pallas import scalars_to_limbs_fast

        spec = BN254_FR
        n_leaves = 1 << (height - 1)
        n_real = len(addresses)
        if n_real > n_leaves:
            raise ValueError(f"{n_real} entries exceed 2^{height - 1} leaves")
        addr_m = spec.to_mont(jnp.asarray(scalars_to_limbs_fast(list(addresses))))
        bal_m = spec.to_mont(jnp.asarray(scalars_to_limbs_fast(list(balances))))
        hashed = poseidon_jax.hash2(addr_m, bal_m)  # [n_real, K]
        pad = jnp.zeros((n_leaves - n_real, spec.n_limbs), dtype=jnp.uint32)
        leaves = jnp.concatenate([hashed, pad], axis=0)
        return cls.from_leaves_mont(leaves)

    # -- queries -------------------------------------------------------------

    @property
    def height(self) -> int:
        return len(self._levels)

    @property
    def n_leaves(self) -> int:
        return self._levels[0].shape[0]

    def root(self) -> int:
        return int(BN254_FR.decode(jnp.asarray(self._levels[-1]))[0])

    def leaf(self, index: int) -> int:
        return int(BN254_FR.decode(jnp.asarray(self._levels[0][index : index + 1]))[0])

    def prove(self, index: int) -> MerkleProof:
        if not 0 <= index < self.n_leaves:
            raise IndexError(index)
        siblings_mont = []
        path_indices = []
        idx = index
        for level in self._levels[:-1]:
            sib = idx ^ 1
            siblings_mont.append(level[sib])
            path_indices.append(idx & 1)
            idx >>= 1
        sib_arr = jnp.asarray(np.stack(siblings_mont))
        sib_ints = [int(x) for x in BN254_FR.decode(sib_arr)]
        return MerkleProof(
            leaf=self.leaf(index),
            leaf_index=index,
            path_elements=sib_ints,
            path_indices=path_indices,
        )

    # -- io -------------------------------------------------------------

    def write_root(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(str(self.root()), f)

    def write_proofs(self, indices: Sequence[int], path: str) -> None:
        proofs = [self.prove(i) for i in indices]
        payload = {
            "root": str(self.root()),
            "leaves": [
                {
                    "address_index": p.leaf_index,
                    "leaf": str(p.leaf),
                    "path_elements": [str(x) for x in p.path_elements],
                    "path_indices": p.path_indices,
                }
                for p in proofs
            ],
        }
        with open(path, "w") as f:
            json.dump(payload, f)


def verify_proof(root: int, proof: MerkleProof) -> bool:
    """Host-side check mirroring circuits/merkle.circom MerkleProofVerify."""
    node = proof.leaf
    for sib, bit in zip(proof.path_elements, proof.path_indices):
        node = poseidon_host.poseidon2(sib, node) if bit else poseidon_host.poseidon2(node, sib)
    return node == root


def find_owned_indices(
    anon_addresses: Sequence[int], owned_addresses: Sequence[int]
) -> List[int]:
    """Index of each owned address in the anonymity set (both sorted
    ascending, reference scripts/merkle_tree.rs:334-350 two-pointer scan;
    raises if an owned address is absent)."""
    pos = {a: i for i, a in enumerate(anon_addresses)}
    out = []
    for a in owned_addresses:
        if a not in pos:
            raise ValueError(f"owned address {hex(a)} not in anonymity set")
        out.append(pos[a])
    return out
