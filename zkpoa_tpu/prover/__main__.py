"""Groth16 toolchain CLI — the reference's per-layer g16_setup.sh /
g16_prove.sh / g16_verify.sh wrappers (SURVEY.md §2.3), plus proof
sanitization (sanitize_groth16_proof.py), as subcommands of one binary:

    python -m zkpoa_tpu.prover setup    --layer one --input in.json -Z zkeys/
    python -m zkpoa_tpu.prover prove    --layer two --input in.json -Z zkeys/ -o out/ [--recursive]
    python -m zkpoa_tpu.prover verify   vkey.json proof.json public.json
    python -m zkpoa_tpu.prover sanitize vkey.json proof.json public.json -o sanitized.json

Inputs are the reference's per-layer JSON signal shapes
(layer_one_batch_N_input.json, layer_two_batch_N_input.json,
layer_three_input.json — scripts/lib/interfaces.ts). The eager circuit
builder needs a concrete input even for setup, but the emitted R1CS
*structure* depends only on the input shape (limb counts, NAF schedule,
tree height — never on values), so a zkey generated from any valid input
of the same shape is reusable — the same property circom compilation
gives the reference. `--recursive` additionally verifies the embedded
lower-layer proof in-snark (models/gadgets/pairing_gadget.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent XLA compile cache (same default as the workflow CLI)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/zkpoa_jax"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def _build_circuit(layer: str, d: dict, recursive: bool):
    """Circuit + cache name from a reference-shaped input JSON."""
    from ..models.layers import (
        LayerOneInput,
        LayerTwoInput,
        layer_one_circuit,
        layer_three_circuit,
        layer_two_circuit,
    )

    if layer == "one":
        n = len(d["r"])
        sigs = [LayerOneInput.from_json_entry(d, i) for i in range(n)]
        return layer_one_circuit(sigs), f"layer_one_{n}_sigs"
    if layer == "two":
        inp = LayerTwoInput.from_json(d)
        height = len(d["path_elements"][0]) + 1
        inner_vk = None
        suffix = ""
        if recursive:
            from ..models.gadgets.pairing_gadget import PreparedVK

            inner_vk = PreparedVK.from_sanitized(d)
            suffix = "_recursive"
        c = layer_two_circuit(inp, tree_height=height, inner_vk=inner_vk)
        n = len(d["pubkey"])
        return c, f"layer_two_full{suffix}_{n}_sigs_{height}_height"
    if layer == "three":
        balances = [int(x) for x in d["balances"]]
        root = int(d["merkle_root"])
        blind = int(d["ped_com_blinding_factor"])
        inner = []
        suffix = ""
        if recursive:
            from ..models.gadgets.pairing_gadget import PreparedVK

            shared = {k: d[k] for k in ("gamma2", "delta2", "negalfa1xbeta2", "IC")}
            pvk = PreparedVK.from_sanitized(shared)
            for b in range(len(balances)):
                inner.append(
                    (pvk, {"negpa": d["negpa"][b], "pb": d["pb"][b], "pc": d["pc"][b]})
                )
            suffix = "_recursive"
        c = layer_three_circuit(balances, root, blind, inner=inner)
        return c, f"layer_three{suffix}_{len(balances)}_batches"
    raise SystemExit(f"unknown layer {layer!r}")


def _cmd_setup(args) -> int:
    from .cache import cached_setup

    with open(args.input) as f:
        d = json.load(f)
    t0 = time.time()
    circuit, name = _build_circuit(args.layer, d, args.recursive)
    r1cs, _ = circuit.compile()
    print(f"[g16-setup] {name}: {r1cs.n_constraints} constraints "
          f"({time.time() - t0:.1f}s build)", flush=True)
    t0 = time.time()
    pk = cached_setup(r1cs, args.zkey_dir, name, seed=args.seed)
    print(f"[g16-setup] proving key ready ({time.time() - t0:.1f}s); "
          f"vkey -> {name}_vkey.json", flush=True)
    if args.zkey_dir:
        with open(os.path.join(args.zkey_dir, f"{name}_vkey.json"), "w") as f:
            json.dump(pk.vk_json, f)
    return 0


def _cmd_prove(args) -> int:
    from . import groth16
    from .cache import cached_setup
    from .prove import prove

    with open(args.input) as f:
        d = json.load(f)
    t0 = time.time()
    circuit, name = _build_circuit(args.layer, d, args.recursive)
    r1cs, witness = circuit.compile()
    print(f"[g16-prove] {name}: {r1cs.n_constraints} constraints, witness ready "
          f"({time.time() - t0:.1f}s)", flush=True)
    pk = cached_setup(r1cs, args.zkey_dir, name, seed=args.seed)
    t0 = time.time()
    proof = prove(pk, r1cs, witness, seed=args.proof_seed)
    print(f"[g16-prove] proof in {time.time() - t0:.1f}s", flush=True)
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, circuit.public_values), "self-verify failed"
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "proof.json"), "w") as f:
        json.dump(proof.to_json(), f)
    with open(os.path.join(args.out_dir, "public.json"), "w") as f:
        json.dump([str(x) for x in circuit.public_values], f)
    with open(os.path.join(args.out_dir, f"layer_{args.layer}_vkey.json"), "w") as f:
        json.dump(pk.vk_json, f)
    print(f"[g16-prove] wrote proof.json/public.json to {args.out_dir}", flush=True)
    return 0


def _cmd_export(args) -> int:
    """Emit iden3 binary artifacts (.r1cs/.wtns/.zkey) for a layer input —
    the interop surface snarkjs/rapidsnark users consume (binfmt module)."""
    from ..utils import binfmt
    from .cache import cached_setup

    with open(args.input) as f:
        d = json.load(f)
    circuit, name = _build_circuit(args.layer, d, args.recursive)
    r1cs, witness = circuit.compile()
    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.join(args.out_dir, name)
    binfmt.write_r1cs(base + ".r1cs", r1cs)
    binfmt.write_wtns(base + ".wtns", witness)
    print(f"[g16-export] {base}.r1cs ({r1cs.n_constraints} constraints), .wtns", flush=True)
    if args.zkey:
        pk = cached_setup(r1cs, args.zkey_dir, name, seed=args.seed)
        binfmt.write_zkey(base + ".zkey", pk, r1cs)
        print(f"[g16-export] {base}.zkey", flush=True)
    return 0


def _cmd_prove_zkey(args) -> int:
    """Prove from foreign artifacts only: a .zkey + a .wtns (the rapidsnark
    prover CLI contract, ref scripts/g16_prove.sh:246-252)."""
    from ..utils import binfmt
    from . import groth16
    from .prove import prove

    t0 = time.time()
    pk, coeffs = binfmt.read_zkey(args.zkey)
    witness = binfmt.read_wtns(args.wtns)
    r1cs = binfmt.r1cs_from_zkey_coeffs(coeffs, pk.n_vars, pk.n_public)
    print(f"[g16-prove] zkey {pk.n_vars} vars / domain {pk.domain_size} "
          f"loaded ({time.time() - t0:.1f}s)", flush=True)
    t0 = time.time()
    proof = prove(pk, r1cs, witness, seed=args.proof_seed)
    print(f"[g16-prove] proof in {time.time() - t0:.1f}s", flush=True)
    publics = witness[1 : pk.n_public + 1]
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    assert groth16.verify(vk, proof, publics), "self-verify failed"
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "proof.json"), "w") as f:
        json.dump(proof.to_json(), f)
    with open(os.path.join(args.out_dir, "public.json"), "w") as f:
        json.dump([str(x) for x in publics], f)
    print(f"[g16-prove] wrote proof.json/public.json to {args.out_dir}", flush=True)
    return 0


def _cmd_verify(args) -> int:
    from .groth16 import verify_files

    ok = verify_files(args.vkey, args.proof, args.public)
    print("OK" if ok else "INVALID")
    return 0 if ok else 1


def _cmd_sanitize(args) -> int:
    from ..pipeline.sanitize import sanitize_files

    sanitize_files(args.vkey, args.proof, args.public, args.out)
    print(f"sanitized -> {args.out}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="zkpoa_tpu.prover",
                                 description="Groth16 toolchain (g16_*.sh contract)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for cmd, fn in (("setup", _cmd_setup), ("prove", _cmd_prove), ("export", _cmd_export)):
        p = sub.add_parser(cmd)
        p.add_argument("--layer", choices=("one", "two", "three"), required=True)
        p.add_argument("--input", required=True, help="reference-shaped layer input JSON")
        p.add_argument("-Z", "--zkey-dir", default=None, help="proving-key cache dir")
        p.add_argument("--seed", default="zkpoa-test-srs", help="dev-setup seed")
        p.add_argument("--recursive", action="store_true",
                       help="verify the embedded lower-layer proof in-snark")
        if cmd == "prove":
            p.add_argument("-o", "--out-dir", required=True)
            p.add_argument("--proof-seed", default="zkpoa-proof")
        if cmd == "export":
            p.add_argument("-o", "--out-dir", required=True)
            p.add_argument("--zkey", action="store_true",
                           help="also run setup and emit a .zkey")
        p.set_defaults(fn=fn)

    p = sub.add_parser("prove-zkey", help="prove from a .zkey + .wtns "
                       "(rapidsnark prover CLI contract)")
    p.add_argument("--zkey", required=True)
    p.add_argument("--wtns", required=True)
    p.add_argument("-o", "--out-dir", required=True)
    p.add_argument("--proof-seed", default="zkpoa-proof")
    p.set_defaults(fn=_cmd_prove_zkey)

    p = sub.add_parser("verify")
    p.add_argument("vkey")
    p.add_argument("proof")
    p.add_argument("public")
    p.set_defaults(fn=_cmd_verify)

    p = sub.add_parser("sanitize")
    p.add_argument("vkey")
    p.add_argument("proof")
    p.add_argument("public")
    p.add_argument("-o", "--out", required=True)
    p.set_defaults(fn=_cmd_sanitize)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
