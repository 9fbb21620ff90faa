"""Proving-key cache: size-encoded named keys reused across workflow runs.

Role of the reference's zkeys/ directory (full_workflow.sh:303-323,443-462:
`layer_one_<b>_sigs.zkey`, `layer_two_<b>_sigs_<h>_height.zkey`,
`layer_three_<k>_batches.zkey`) — zkey generation is the most expensive
offline stage (34h for the reference's layer-3, SURVEY.md §6), so keys are
cached by circuit shape and reused. Our dev-setup keys are derived from a
seed; the cache stores (seed, shape) so a changed circuit invalidates."""

from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Optional

import numpy as np

from ..models.r1cs import R1CS
from .setup import DeviceG1Points, DeviceG2Points, ProvingKey, setup, setup_device

# circuits above this size use the device-resident setup (HBM query tables,
# no per-point host decode)
DEVICE_SETUP_MIN_CONSTRAINTS = 300_000
# On REAL hardware the device prover takes over much earlier: the host-key
# prove path runs ops/msm.py's unified jnp adds on the TPU backend, which
# crashed the worker at the ~250k-constraint full-mode layer-3
# (experiments/HEAVY_FULL.log round 5) — and is slow there anyway. On the
# CPU backend (tests) the 300k bar stands: device setup's fixed-base
# tables are the slow path there.
DEVICE_SETUP_MIN_CONSTRAINTS_TPU = 50_000


def _device_setup_min() -> int:
    import jax

    if jax.default_backend() == "cpu":
        return DEVICE_SETUP_MIN_CONSTRAINTS
    return int(os.environ.get("ZKPOA_DEVICE_SETUP_MIN_TPU",
                              str(DEVICE_SETUP_MIN_CONSTRAINTS_TPU)))


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
    ptau_path: Optional[str] = None,
    contribute_entropy: Optional[str] = None,
    beacon_hash: Optional[str] = None,
) -> ProvingKey:
    """setup() with an on-disk cache. `name` is the human-readable
    size-encoded key name (reference convention), e.g.
    'layer_two_2_sigs_12_height'.

    With `ptau_path`, keys derive from the powers-of-tau ceremony file
    instead of the seeded dev SRS — the reference's production path
    (`snarkjs zkey new` + contribute + beacon, g16_setup.sh:240-278) —
    and the cache is keyed on the ptau file digest + phase-2 params."""
    if ptau_path is not None:
        return _cached_setup_ptau(
            r1cs, cache_dir, name, ptau_path, contribute_entropy, beacon_hash
        )
    if r1cs.n_constraints > _device_setup_min():
        if cache_dir is None:
            return setup_device(r1cs, seed=seed)
        os.makedirs(cache_dir, exist_ok=True)
        digest = _shape_digest(r1cs, seed)
        path = os.path.join(cache_dir, f"{name}.{digest}.dpk")
        if os.path.exists(path + ".npz"):
            return _load_device_pk(path)
        pk = setup_device(r1cs, seed=seed)
        _save_device_pk(path, pk)
        return pk
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


def _ptau_digest(ptau_path: str) -> str:
    h = hashlib.sha256()
    with open(ptau_path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()[:16]


def _cached_setup_ptau(
    r1cs: R1CS,
    cache_dir: Optional[str],
    name: str,
    ptau_path: str,
    contribute_entropy: Optional[str],
    beacon_hash: Optional[str],
) -> ProvingKey:
    """Ceremony-derived key: phase 1 from the .ptau file, optional phase-2
    contribution + beacon (reference g16_setup.sh:255-278). Cached as a
    host pickle keyed on (circuit shape, ptau digest, phase-2 params)."""
    from . import ptau as P

    def build() -> ProvingKey:
        pk = P.setup_from_ptau(r1cs, ptau_path)
        if contribute_entropy is not None:
            pk = P.contribute(pk, contribute_entropy)
        if beacon_hash is not None:
            pk = P.beacon(pk, beacon_hash)
        return pk

    if cache_dir is None:
        return build()
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"{_ptau_digest(ptau_path)}|{contribute_entropy}|{beacon_hash}"
    digest = _shape_digest(r1cs, tag)
    path = os.path.join(cache_dir, f"{name}.ptau.{digest}.pk")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    pk = build()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(pk, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return pk


def _save_device_pk(path: str, pk: ProvingKey) -> None:
    """Persist a device-resident key: the multi-GB query tables as one
    uncompressed .npz (host-spilled Montgomery limb arrays — disk reads
    are far cheaper than re-running the host QAP scalar math + fixed-base
    generation, VERDICT r2 item 3: 1,183s layer-1 dominated by setup),
    plus a small pickle for the host-side points/vk/meta."""
    arrays = {}
    for qn in ("a_query", "b1_query", "c_query", "h_query"):
        q = getattr(pk, qn).spilled()
        arrays[f"{qn}_xs"] = q.xs
        arrays[f"{qn}_ys"] = q.ys
        arrays[f"{qn}_valid"] = q.valid
    b2 = pk.b2_query.spilled()
    arrays["b2_xs_c0"], arrays["b2_xs_c1"] = b2.xs
    arrays["b2_ys_c0"], arrays["b2_ys_c1"] = b2.ys
    arrays["b2_valid"] = b2.valid
    tmp = path + ".npz.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    meta = {
        k: getattr(pk, k)
        for k in ("n_vars", "n_public", "domain_size", "alpha1", "beta1",
                  "delta1", "beta2", "delta2", "vk_json", "h_basis")
    }
    with open(path + ".meta.tmp", "wb") as f:
        pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path + ".npz")
    os.replace(path + ".meta.tmp", path + ".meta")


def _load_device_pk(path: str) -> ProvingKey:
    """Load a persisted device key as host-spilled arrays (the prover
    uploads each query table just-in-time per MSM)."""
    z = np.load(path + ".npz")
    with open(path + ".meta", "rb") as f:
        meta = pickle.load(f)

    def g1(qn):
        return DeviceG1Points(z[f"{qn}_xs"], z[f"{qn}_ys"], z[f"{qn}_valid"])

    b2 = DeviceG2Points(
        (z["b2_xs_c0"], z["b2_xs_c1"]),
        (z["b2_ys_c0"], z["b2_ys_c1"]),
        z["b2_valid"],
    )
    return ProvingKey(
        a_query=g1("a_query"),
        b1_query=g1("b1_query"),
        c_query=g1("c_query"),
        h_query=g1("h_query"),
        b2_query=b2,
        **meta,
    )
