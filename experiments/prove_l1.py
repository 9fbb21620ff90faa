#!/usr/bin/env python3
"""Hardware layer-1 prove latency: cold (compile-inclusive) vs warm.

The round-3 recursive run measured 1,255s for layer-1 @ 1 sig (1.5M
constraints) against the reference's ~20s CPU total — but that number
folds in every XLA compile of the prover's program shapes (the 2-core
host compiles Mosaic kernels in minutes) plus the first-touch uploads.
This experiment separates them: one circuit build, cached setup, then
TWO proves of the same shape — the second is the steady-state per-proof
latency (the number that matters at the reference's 128-proof scale,
where one shape amortizes every compile).

Writes experiments/PROVE_L1.json. Usage: prove_l1.py [n_sigs]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/zkpoa_jax"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("ZKPOA_VERBOSE", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_sigs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    t_all = time.perf_counter()

    from zkpoa_tpu.models.layers import LayerOneInput, layer_one_circuit
    from zkpoa_tpu.pipeline import fixtures
    from zkpoa_tpu.pipeline.sigs import layer_one_input, parse_signatures
    from zkpoa_tpu.prover import groth16
    from zkpoa_tpu.prover.cache import cached_setup
    from zkpoa_tpu.prover.prove import prove

    rec = {"n_sigs": n_sigs}

    t0 = time.perf_counter()
    sigs_json = fixtures.generate_signatures(n_sigs)
    atts = parse_signatures(sigs_json)
    l1_inp = layer_one_input(atts)
    sigs = [LayerOneInput.from_json_entry(l1_inp, i) for i in range(n_sigs)]
    c1 = layer_one_circuit(sigs)
    r1, w1 = c1.compile()
    rec["constraints"] = r1.n_constraints
    rec["build_s"] = round(time.perf_counter() - t0, 1)
    log(f"build: {rec['build_s']}s, {r1.n_constraints} constraints")

    t0 = time.perf_counter()
    cache_dir = os.path.join(REPO, "build", "zkeys")
    pk = cached_setup(r1, cache_dir, f"exp_l1_{n_sigs}_sigs")
    rec["setup_s"] = round(time.perf_counter() - t0, 1)
    log(f"setup (cached ok): {rec['setup_s']}s")

    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        proof = prove(pk, r1, w1, seed=f"exp-{i}")
        dt = time.perf_counter() - t0
        times.append(round(dt, 1))
        ok = groth16.verify(vk, proof, c1.public_values)
        log(f"prove {i} ({'cold' if i == 0 else 'warm'}): {dt:.1f}s verify={ok}")
        assert ok, "proof failed to verify"
    rec["prove_cold_s"], rec["prove_warm_s"] = times
    rec["total_s"] = round(time.perf_counter() - t_all, 1)

    out = os.path.join(REPO, "experiments", "PROVE_L1.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
