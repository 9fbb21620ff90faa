"""Proving-key cache: size-encoded named keys reused across workflow runs.

Role of the reference's zkeys/ directory (full_workflow.sh:303-323,443-462:
`layer_one_<b>_sigs.zkey`, `layer_two_<b>_sigs_<h>_height.zkey`,
`layer_three_<k>_batches.zkey`) — zkey generation is the most expensive
offline stage (34h for the reference's layer-3, SURVEY.md §6), so keys are
cached by circuit shape and reused. Our dev-setup keys are derived from a
seed; the cache stores (seed, shape) so a changed circuit invalidates."""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional

from ..models.r1cs import R1CS
from .setup import ProvingKey, setup, setup_device

# circuits above this size use the device-resident setup (HBM query tables,
# no per-point host decode); such keys are not disk-cached — regenerating is
# minutes, while fetching multi-GB tables through the host link is slower.
DEVICE_SETUP_MIN_CONSTRAINTS = 300_000


def _shape_digest(r1cs: R1CS, seed: str) -> str:
    h = hashlib.sha256()
    h.update(f"{r1cs.n_wires}|{r1cs.n_public}|{r1cs.n_constraints}|{seed}".encode())
    for rows in (r1cs.a_rows, r1cs.b_rows, r1cs.c_rows):
        h.update(str(len(rows)).encode())
        # sample rows for a cheap structural fingerprint
        step = max(1, len(rows) // 1024)
        for t in rows[::step]:
            h.update(repr(t).encode())
    return h.hexdigest()[:16]


def cached_setup(
    r1cs: R1CS,
    cache_dir: Optional[str],
    name: str,
    seed: str = "zkpoa-test-srs",
) -> ProvingKey:
    """setup() with an on-disk cache. `name` is the human-readable
    size-encoded key name (reference convention), e.g.
    'layer_two_2_sigs_12_height'."""
    if r1cs.n_constraints > DEVICE_SETUP_MIN_CONSTRAINTS:
        return setup_device(r1cs, seed=seed)
    if cache_dir is None:
        return setup(r1cs, seed=seed)
    os.makedirs(cache_dir, exist_ok=True)
    digest = _shape_digest(r1cs, seed)
    path = os.path.join(cache_dir, f"{name}.{digest}.pk")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    pk = setup(r1cs, seed=seed)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(pk, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return pk
