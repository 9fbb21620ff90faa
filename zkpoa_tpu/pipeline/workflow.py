"""End-to-end proof-of-assets workflow: the orchestrator.

Role of the reference's scripts/full_workflow.sh (SURVEY.md §3.1): parse the
custodian's signatures, plan batches, build the anonymity-set Merkle tree,
prove each batch through layers 1-2, aggregate with layer 3, and run the
final Pedersen-commitment assertion. Differences by design:

  * everything is one Python process driving TPU kernels (no file-handoff
    subprocess pipeline); files are still written at each stage in the
    reference's JSON shapes so artifacts stay interoperable;
  * proving keys come from the deterministic dev setup with an on-disk
    cache keyed by circuit shape (the reference's zkeys/ cache);
  * `mode="accounting"` proves the membership/aggregation statements only
    (fast, CI-friendly); `mode="full"` builds the complete layer-1/2
    circuits (in-circuit ECDSA* + Keccak address derivation);
    `mode="recursive"` additionally verifies every lower-layer proof
    IN-SNARK (the reference's circom-pairing verifyProof, here the ~7M-
    constraint residue-witness gadget) — full protocol parity, TPU-scale.
    In every mode each layer's proof is also checked by the host pairing
    verifier (the role snarkjs plays in the reference, g16_verify.sh).

CLI mirrors the reference's 3-argument contract (full_workflow.sh:43):
    python -m zkpoa_tpu.pipeline.workflow <sigs.json> <anon_set.csv> <blind>
        [-b BUILD_DIR] [-p IDEAL_BATCH_SIZE] [-m MODE] [-z ZKEY_CACHE]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time

# persistent XLA compile cache: the fused limb kernels are compile-heavy;
# repeat workflow runs (and the zkey-cache path) reuse cached executables
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/zkpoa_jax"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..fields import curve25519 as C
from ..merkle.tree import MerkleTree, find_owned_indices
from ..models.layers import (
    LayerOneInput,
    LayerTwoInput,
    MembershipWitnessInput,
    layer_one_circuit,
    layer_three_circuit,
    layer_two_circuit,
    membership_sum_circuit,
)
from ..ops import poseidon as poseidon_host
from ..prover import groth16
from ..prover.cache import cached_setup
from ..prover.prove import prove
from ..utils.serde import to_limbs_64x4
from . import planner
from .pedersen_check import check_commitment, dechunk_commitment
from .sanitize import sanitize
from .sigs import AccountAttestation, layer_one_input, parse_signatures_file
from ..utils.trace import Tracer


@dataclass
class WorkflowResult:
    build_dir: str
    num_sigs: int
    num_batches: int
    merkle_height: int
    merkle_root: int
    balance_sum: int
    commitment: tuple
    layer_three_public: List[int]
    timings: Dict[str, float] = field(default_factory=dict)


def _log(msg: str) -> None:
    print(f"[zkpoa] {msg}", flush=True)


def load_anon_set(path: str):
    """CSV with header 'address,...' rows of (hex address, balance)."""
    addresses, balances = [], []
    with open(path) as f:
        rows = list(csv.reader(f))
    for row in rows[1:]:
        if not row:
            continue
        addresses.append(int(row[0], 16))
        balances.append(int(row[1]))
    order = sorted(range(len(addresses)), key=lambda i: addresses[i])
    return [addresses[i] for i in order], [balances[i] for i in order]


def run_workflow(
    sigs_path: str,
    anon_set_path: str,
    blinding_factor: int,
    build_root: str = "build",
    ideal_batch_size: int = 2,
    mode: str = "accounting",
    zkey_cache: Optional[str] = None,
    tree_height: Optional[int] = None,
    setup_seed: str = "zkpoa-test-srs",
    profile: bool = False,
    resume: bool = False,
    ptau_path: Optional[str] = None,
    contribute_entropy: Optional[str] = None,
    beacon_hash: Optional[str] = None,
) -> WorkflowResult:
    if (contribute_entropy or beacon_hash) and not ptau_path:
        raise ValueError(
            "contribute_entropy/beacon_hash require ptau_path — phase-2 "
            "randomization is only applied to a ceremony-derived key")
    # logs land in <build_root>/logs during input prep, then move under the
    # sized build dir naming once the batch plan is known
    tracer = Tracer(log_dir=None, profile=profile)
    timings = tracer.timings
    Stage = lambda _t, name: tracer.stage(name)  # noqa: E731

    # -- input preparation (reference L4) ---------------------------------
    with Stage(timings, "parse signatures"):
        atts = parse_signatures_file(sigs_path)
    with Stage(timings, "load anonymity set"):
        anon_addrs, anon_bals = load_anon_set(anon_set_path)

    n = len(atts)
    bplan = planner.plan(n, ideal_batch_size)
    height = tree_height or planner.merkle_height(len(anon_addrs))
    build_dir = os.path.join(
        build_root, f"{n}_sigs_{bplan.num_batches}_batches_{height}_height"
    )
    os.makedirs(build_dir, exist_ok=True)
    tracer.__init__(log_dir=os.path.join(build_dir, "logs"), profile=profile,
                    timings=timings)
    _log(
        f"{n} sigs, batch size {bplan.batch_size} x {bplan.num_batches} batches"
        f" (remainder {bplan.remainder}), tree height {height}, mode={mode}"
    )

    # benchmarks.txt (reference convention: tests/*/benchmarks.txt) is
    # REWRITTEN after every appended line and at every stage exit — from the
    # merkle build onward — so a run that dies mid-prove still leaves the
    # constraint counts + stage timings of everything it completed (a
    # 28-minute layer-2 attempt once left only a joblog line behind)
    bench_path = os.path.join(build_dir, "benchmarks.txt")

    def _flush_bench():
        with open(bench_path, "w") as f:
            f.write(f"config: {n}_sigs_{bplan.num_batches}_batches_{height}_height"
                    f" mode={mode}\n\nconstraints:\n")
            for line in bench_lines:
                f.write(f"  {line}\n")
            f.write("\nstage timings (s):\n")
            for key, v in timings.items():
                f.write(f"  {key}: {v:.2f}\n")

    class _BenchLines(list):
        def append(self, line):  # flush on every record
            super().append(line)
            _flush_bench()

    bench_lines: List[str] = _BenchLines()

    import contextlib

    @contextlib.contextmanager
    def _stage_flushing(_t, name):
        try:
            with tracer.stage(name):
                yield
        finally:
            _flush_bench()  # timings survive a stage that dies mid-prove

    Stage = _stage_flushing

    # -- Merkle engine (reference L5, the Rust merkle-tree binary) --------
    # Built in a background thread, overlapped with the layer-1 work —
    # layer-1 circuits never touch the tree (the reference backgrounds its
    # merkle-tree binary the same way, full_workflow.sh:371-380,430). JAX
    # dispatch is thread-safe; the chip interleaves the two streams.
    merkle_out: Dict[str, object] = {}

    def _build_merkle():
        with Stage(timings, "merkle tree build"):
            tree = MerkleTree.build(anon_addrs, anon_bals, height)
            merkle_out["root"] = tree.root()
            tree.write_root(os.path.join(build_dir, "merkle_root.json"))
            owned_idx = find_owned_indices(anon_addrs, [a.address for a in atts])
            merkle_out["proofs"] = {
                i: tree.prove(idx) for i, idx in enumerate(owned_idx)
            }
            tree.write_proofs(owned_idx, os.path.join(build_dir, "merkle_proofs.json"))

    import threading

    import jax as _jax
    import numpy as _np

    # warm the device on the MAIN thread before any worker thread touches
    # it: the remote (axon) backend's first-use initialization from a
    # secondary thread has been observed to hang the whole run
    _np.asarray(_jax.numpy.zeros((8,), _jax.numpy.uint32))

    merkle_thread = threading.Thread(target=_build_merkle, name="merkle-build")
    merkle_thread.start()

    batches = []
    bdirs = []
    for bi in range(bplan.num_batches):
        start, end = bplan.batch_range(bi)
        batches.append(atts[start:end])
        bdir = os.path.join(build_dir, f"batch_{bi}")
        os.makedirs(bdir, exist_ok=True)
        bdirs.append(bdir)

    # -- layer 1 (all batches share one proving key: the reference's
    # per-shape zkey, full_workflow.sh:303-323) ----------------------------
    # ceremony routing: every per-layer setup below derives from the same
    # .ptau file when one is given (reference g16_setup.sh:240-278 semantics:
    # one ceremony serves all circuits that fit its power)
    setup_kw = dict(seed=setup_seed, ptau_path=ptau_path,
                    contribute_entropy=contribute_entropy,
                    beacon_hash=beacon_hash)
    san1s: List[Optional[dict]] = [None] * bplan.num_batches
    pk1_vk_jsons: List[Optional[dict]] = [None] * bplan.num_batches

    def _resume_layer(bi: int, name: str) -> Optional[dict]:
        """Load a completed batch layer from its on-disk artifacts (every
        pipeline stage is restartable from files, the reference's design
        — SURVEY §5 checkpoint/resume; a dead multi-minute prove no
        longer loses the finished layers)."""
        if not resume:
            return None
        need = [os.path.join(bdirs[bi], f"{name}_sanitized_proof.json"),
                os.path.join(bdirs[bi], f"{name}_vkey.json")]
        if not all(os.path.exists(p) for p in need):
            return None
        with open(need[0]) as f:
            san = json.load(f)
        with open(need[1]) as f:
            vkj = json.load(f)
        _log(f"resume: {name} batch {bi} loaded from {bdirs[bi]}")
        return {"san": san, "vk_json": vkj}

    if mode in ("full", "recursive"):
        l1_done = {}
        for bi in range(bplan.num_batches):
            r = _resume_layer(bi, "layer_one")
            if r is not None:
                san1s[bi] = r["san"]
                pk1_vk_jsons[bi] = r["vk_json"]
                l1_done[bi] = True
        l1_builds = []
        for bi, batch in enumerate(batches):
            if l1_done.get(bi):
                l1_builds.append(None)
                continue
            with Stage(timings, f"layer1 build batch {bi}"):
                l1_inp_json = layer_one_input(batch)
                with open(os.path.join(bdirs[bi], "layer_one_input.json"), "w") as f:
                    json.dump(l1_inp_json, f)
                sigs = [
                    LayerOneInput.from_json_entry(l1_inp_json, i)
                    for i in range(len(batch))
                ]
                c1 = layer_one_circuit(sigs)
                r1, w1 = c1.compile()
                bench_lines.append(
                    f"layer_one batch {bi}: {r1.n_constraints} constraints, "
                    f"{r1.n_wires} wires ({len(batch)} sigs)"
                )
                l1_builds.append((r1, w1, c1.public_values))
        pk1 = None
        for group in _shape_groups(batches):
            group = [bi for bi in group if not l1_done.get(bi)]
            if not group:
                continue
            bi0 = group[0]
            r1_0 = l1_builds[bi0][0]
            with Stage(timings, f"layer1 setup ({len(batches[bi0])} sigs)"):
                pk1 = cached_setup(
                    r1_0, zkey_cache, f"layer_one_{len(batches[bi0])}_sigs",
                    **setup_kw,
                )
            with Stage(timings, f"layer1 prove batches {group}"):
                proofs1 = _prove_many(
                    pk1, r1_0, [l1_builds[bi][1] for bi in group],
                    [f"l1-b{bi}" for bi in group],
                )
            vk1 = groth16.VerifyingKey.from_json(pk1.vk_json)
            for proof1, bi in zip(proofs1, group):
                publics1 = l1_builds[bi][2]
                assert groth16.verify(vk1, proof1, publics1), "layer-1 verify failed"
                _write_proof(bdirs[bi], "layer_one", proof1, publics1, pk1.vk_json)
                san1s[bi] = sanitize(vk1, proof1, publics1)
                with open(
                    os.path.join(bdirs[bi], "layer_one_sanitized_proof.json"), "w"
                ) as f:
                    json.dump(san1s[bi], f)
            # release the layer-1 device key: only its vk_json is needed
            # downstream, and the multi-GB HBM query tables must not stay
            # alive through the (larger) layer-2 setup/prove
            for bi in group:
                pk1_vk_jsons[bi] = pk1.vk_json
            pk1 = None
        l1_builds = None

    merkle_thread.join()
    root: int = merkle_out["root"]
    proofs = merkle_out["proofs"]

    # -- layer 2 (one key per batch shape, proofs batched over the mesh) ---
    batch_balance_sums: List[int] = [0] * bplan.num_batches
    l2_sanitized: List[Optional[dict]] = [None] * bplan.num_batches
    l2_vk_jsons: List[Optional[dict]] = [None] * bplan.num_batches
    l2_done = {}
    for bi in range(bplan.num_batches):
        r = _resume_layer(bi, "layer_two")
        if r is not None:
            l2_sanitized[bi] = r["san"]
            l2_vk_jsons[bi] = r["vk_json"]
            # balance = pubInput[0] of the sanitized layer-2 proof
            # (reference input_prep_for_layer_three.ts:122)
            batch_balance_sums[bi] = int(r["san"]["pubInput"][0])
            l2_done[bi] = True
    l2_builds = []
    for bi, batch in enumerate(batches):
        if l2_done.get(bi):
            l2_builds.append(None)
            continue
        start, _ = bplan.batch_range(bi)
        with Stage(timings, f"layer2 build batch {bi}"):
            batch_proofs = [proofs[start + j] for j in range(len(batch))]
            if mode in ("full", "recursive"):
                inp2 = _layer_two_input(batch, batch_proofs, root, height)
                if mode == "recursive":
                    inp2.proof = san1s[bi]
                with open(os.path.join(bdirs[bi], "layer_two_input.json"), "w") as f:
                    json.dump(_jsonable(inp2.__dict__), f)
                inner_vk1 = None
                if mode == "recursive":
                    from ..models.gadgets.pairing_gadget import PreparedVK

                    inner_vk1 = _prepared_vk_cached(pk1_vk_jsons[bi], PreparedVK)
                c2 = layer_two_circuit(inp2, tree_height=height, inner_vk=inner_vk1)
            else:
                accounts = [
                    MembershipWitnessInput(
                        address=a.address,
                        balance=a.balance,
                        path_elements=p.path_elements,
                        path_indices=p.path_indices,
                    )
                    for a, p in zip(batch, batch_proofs)
                ]
                c2 = membership_sum_circuit(root, accounts, tree_levels=height - 1)
            r2, w2 = c2.compile()
            bench_lines.append(
                f"layer_two batch {bi}: {r2.n_constraints} constraints, "
                f"{r2.n_wires} wires ({len(batch)} sigs, height {height}, {mode})"
            )
            l2_builds.append((r2, w2, c2.public_values))
    for group in _shape_groups(batches):
        group = [bi for bi in group if not l2_done.get(bi)]
        if not group:
            continue
        bi0 = group[0]
        r2_0 = l2_builds[bi0][0]
        with Stage(timings, f"layer2 setup ({len(batches[bi0])} sigs)"):
            pk2 = cached_setup(
                r2_0, zkey_cache,
                f"layer_two_{mode}_{len(batches[bi0])}_sigs_{height}_height",
                **setup_kw,
            )
        with Stage(timings, f"layer2 prove batches {group}"):
            proofs2 = _prove_many(
                pk2, r2_0, [l2_builds[bi][1] for bi in group],
                [f"l2-b{bi}" for bi in group],
            )
        vk2 = groth16.VerifyingKey.from_json(pk2.vk_json)
        for proof2, bi in zip(proofs2, group):
            publics2 = l2_builds[bi][2]
            assert groth16.verify(vk2, proof2, publics2), "layer-2 verify failed"
            _write_proof(bdirs[bi], "layer_two", proof2, publics2, pk2.vk_json)
            l2_sanitized[bi] = sanitize(vk2, proof2, publics2)
            l2_vk_jsons[bi] = pk2.vk_json
            batch_balance_sums[bi] = publics2[0]
            with open(
                os.path.join(bdirs[bi], "layer_two_sanitized_proof.json"), "w"
            ) as f:
                json.dump(l2_sanitized[bi], f)
        pk2 = None  # release the layer-2 device key (HBM)
    l2_builds = None

    # -- layer 3: aggregation + Pedersen commitment -----------------------
    # full mode proves the in-circuit Pedersen commitment (~700k
    # constraints — TPU-scale); accounting mode proves the aggregation
    # binding circuit and computes the commitment registers host-side
    # (the final checker still validates them against the secrets).
    balance_sum = sum(batch_balance_sums)
    l3dir = os.path.join(build_dir, "layer_three")
    os.makedirs(l3dir, exist_ok=True)
    with Stage(timings, "layer3 prove"):
        if mode in ("full", "recursive"):
            inner3 = []
            if mode == "recursive":
                from ..models.gadgets.pairing_gadget import PreparedVK

                inner3 = [
                    (_prepared_vk_cached(vkj, PreparedVK), san)
                    for vkj, san in zip(l2_vk_jsons, l2_sanitized)
                ]
            c3 = layer_three_circuit(
                batch_balance_sums, root, blinding_factor, inner=inner3
            )
            r3, w3 = c3.compile()
            bench_lines.append(
                f"layer_three: {r3.n_constraints} constraints, {r3.n_wires} "
                f"wires ({bplan.num_batches} batches, {mode})"
            )
            pk3 = cached_setup(
                r3, zkey_cache, f"layer_three_{bplan.num_batches}_batches",
                **setup_kw,
            )
            proof3 = prove(pk3, r3, w3, seed="l3")
            vk3 = groth16.VerifyingKey.from_json(pk3.vk_json)
            assert groth16.verify(vk3, proof3, c3.public_values), "layer-3 verify failed"
            _write_proof(l3dir, "layer_three", proof3, c3.public_values, pk3.vk_json)
            l3_public = c3.public_values
        else:
            from ..models.r1cs import Circuit
            from ..utils.serde import to_limbs_85x3

            c3 = Circuit()
            out = c3.public_output()
            root_sig = c3.public(root)
            bal_sigs = [c3.var(b) for b in batch_balance_sums]
            total = bal_sigs[0]
            for b_sig in bal_sigs[1:]:
                total = total + b_sig
            c3.bind_output(out, total)
            r3, w3 = c3.compile()
            pk3 = cached_setup(
                r3, zkey_cache, f"layer_three_sum_{bplan.num_batches}_batches",
                **setup_kw,
            )
            proof3 = prove(pk3, r3, w3, seed="l3")
            vk3 = groth16.VerifyingKey.from_json(pk3.vk_json)
            assert groth16.verify(vk3, proof3, c3.public_values), "layer-3 verify failed"
            _write_proof(l3dir, "layer_three", proof3, c3.public_values, pk3.vk_json)
            com = C.pedersen_commitment(balance_sum, blinding_factor)
            l3_public = [
                reg for ci in range(4) for reg in to_limbs_85x3(com[ci])
            ] + [root]

    # -- final assertion (pedersen_commitment_checker) --------------------
    with Stage(timings, "pedersen check"):
        assert check_commitment(
            l3_public, balance_sum, blinding_factor
        ), "final Pedersen commitment check failed"
        assert l3_public[12] == root
        with open(os.path.join(l3dir, "commitment.json"), "w") as f:
            json.dump([str(x) for x in l3_public], f)

    # benchmarks.txt: constraint counts + stage timings, the reference's
    # per-run record (tests/*/benchmarks.txt; feeds the C1(s)/C2(s,h) fits)
    _flush_bench()

    _log(f"workflow OK: balance_sum={balance_sum} root={root}")
    return WorkflowResult(
        build_dir=build_dir,
        num_sigs=n,
        num_batches=bplan.num_batches,
        merkle_height=height,
        merkle_root=root,
        balance_sum=balance_sum,
        commitment=dechunk_commitment(l3_public),
        layer_three_public=l3_public,
        timings=timings,
    )


def _shape_groups(batches) -> List[List[int]]:
    """Batch indices grouped by batch size: same-size batches share one
    circuit shape and proving key; a remainder batch gets its own
    (reference full_workflow.sh:398-401)."""
    groups: Dict[int, List[int]] = {}
    for bi, b in enumerate(batches):
        groups.setdefault(len(b), []).append(bi)
    return list(groups.values())


def _prove_many(pk, r1cs, wits, seeds: List[str]) -> List:
    """prove() for several same-shape witnesses — batched over a mesh
    "batch" axis when multiple devices are available (the reference's
    `seq 0 k-1 | parallel prove_layers_one_two`, full_workflow.sh:552),
    sequential otherwise. Seeds match the sequential path exactly, so the
    two paths produce byte-identical proofs."""
    import jax

    from ..prover.setup import DeviceG1Points

    ndev = len(jax.devices())
    if len(wits) > 1 and ndev > 1 and isinstance(pk.a_query, DeviceG1Points):
        from ..parallel.batch_prove import prove_batched
        from ..parallel.mesh import make_mesh

        ax = min(ndev, len(wits))
        # the batch axis must divide the witness count after padding —
        # prove_batched pads internally, so any axis size <= ndev works
        mesh = make_mesh(ax, axis="batch")
        return prove_batched(pk, r1cs, wits, mesh, seeds=seeds, axis="batch")
    return [prove(pk, r1cs, w, seed=s) for w, s in zip(wits, seeds)]


_PVK_CACHE: Dict[str, object] = {}


def _prepared_vk_cached(vk_json: dict, cls):
    """PreparedVK per distinct vkey (comb tables + Miller lines are
    shape-cacheable; the reference's zkey-cache analog for recursion)."""
    key = json.dumps(vk_json, sort_keys=True)
    if key not in _PVK_CACHE:
        from ..prover.groth16 import VerifyingKey

        _PVK_CACHE[key] = cls.from_vk(VerifyingKey.from_json(vk_json))
    return _PVK_CACHE[key]


def _write_proof(dirpath: str, name: str, proof, publics, vk_json) -> None:
    with open(os.path.join(dirpath, "proof.json"), "w") as f:
        json.dump(proof.to_json(), f)
    with open(os.path.join(dirpath, "public.json"), "w") as f:
        json.dump([str(x) for x in publics], f)
    with open(os.path.join(dirpath, f"{name}_vkey.json"), "w") as f:
        json.dump(vk_json, f)


def _layer_two_input(
    batch: List[AccountAttestation], batch_proofs, root: int, height: int
) -> LayerTwoInput:
    """input_prep_for_layer_two.ts equivalent: sponge hash + registers +
    merkle data from in-memory state."""
    sponge_regs: List[int] = []
    pubkeys = []
    for a in batch:
        x_regs = to_limbs_64x4(a.signature.pubkey[0])
        y_regs = to_limbs_64x4(a.signature.pubkey[1])
        sponge_regs.extend(x_regs)
        pubkeys.append([x_regs, y_regs])
    return LayerTwoInput(
        pubkey_x_coord_hash=poseidon_host.poseidon_sponge(sponge_regs),
        pubkeys=pubkeys,
        merkle_root=root,
        leaf_addresses=[a.address for a in batch],
        leaf_balances=[a.balance for a in batch],
        path_elements=[p.path_elements for p in batch_proofs],
        path_indices=[p.path_indices for p in batch_proofs],
    )


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(x) for x in obj]
    if isinstance(obj, int) and abs(obj) > 2**53:
        return str(obj)
    return obj


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="TPU-native proof-of-assets workflow (full_workflow.sh contract)"
    )
    ap.add_argument("sigs", help="signatures.json (SignatureData[])")
    ap.add_argument("anon_set", help="anonymity set CSV (address,balance)")
    ap.add_argument("blinding_factor", type=lambda s: int(s, 0))
    ap.add_argument("-b", "--build-dir", default="build")
    ap.add_argument("-p", "--batch-size", type=int, default=2,
                    help="ideal signatures per batch")
    ap.add_argument("-m", "--mode", choices=("accounting", "full", "recursive"),
                    default="accounting")
    ap.add_argument("-z", "--zkey-cache", default=None)
    ap.add_argument("-H", "--tree-height", type=int, default=None)
    ap.add_argument("--profile", action="store_true",
                    help="record per-stage JAX profiler traces under "
                         "<build>/logs/xprof (view with TensorBoard)")
    ap.add_argument("-r", "--resume", action="store_true",
                    help="reuse completed per-batch layer artifacts from a "
                         "previous (partial) run of the same build dir")
    ap.add_argument("--ptau", default=None, metavar="PATH",
                    help="powers-of-tau ceremony file: layer keys derive "
                         "from it instead of the seeded dev SRS (reference "
                         "g16_setup.sh ptau contract)")
    ap.add_argument("--contribute", default=None, metavar="ENTROPY",
                    help="phase-2 contribution entropy applied to every "
                         "ptau-derived key (requires --ptau)")
    ap.add_argument("--beacon", default=None, metavar="HASH",
                    help="phase-2 beacon randomizer applied after the "
                         "contribution (requires --ptau)")
    args = ap.parse_args(argv)
    if (args.contribute or args.beacon) and not args.ptau:
        ap.error("--contribute/--beacon require --ptau: phase-2 "
                 "randomization only applies to a ceremony-derived key "
                 "(without it the seeded dev SRS would be used silently)")

    res = run_workflow(
        args.sigs,
        args.anon_set,
        args.blinding_factor,
        build_root=args.build_dir,
        ideal_batch_size=args.batch_size,
        mode=args.mode,
        zkey_cache=args.zkey_cache,
        tree_height=args.tree_height,
        profile=args.profile,
        resume=args.resume,
        ptau_path=args.ptau,
        contribute_entropy=args.contribute,
        beacon_hash=args.beacon,
    )
    _log(json.dumps({"build_dir": res.build_dir, "balance_sum": str(res.balance_sum),
                     "merkle_root": str(res.merkle_root),
                     "timings": {k: round(v, 2) for k, v in res.timings.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
