#!/usr/bin/env python3
"""Fit constraint-count models C1(s) and C2(s, h) from our own circuits —
the reference's tests/line_of_best_fit.py / plane_of_best_fit.py analog
(its models: C1(s) = 447044*s + 888502, C2(s,h) = 159591*s + 6054*h +
19490640, README.md:183-208).

Builds layer-1 circuits at several batch sizes and layer-2 accounting
cores at several (s, h), least-squares fits the models, and writes
experiments/CONSTRAINT_MODELS.json. Pure host work (circuit building);
run time a few minutes at the default sizes.
"""

import json
import os
import sys
import time

# pure host work: never initialize the (possibly busy) TPU backend
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from zkpoa_tpu.models.layers import (  # noqa: E402
    LayerOneInput,
    LayerTwoInput,
    layer_one_circuit,
    layer_two_circuit,
)
from zkpoa_tpu.pipeline.fixtures import generate_signatures  # noqa: E402
from zkpoa_tpu.pipeline.sigs import layer_one_input, parse_signatures  # noqa: E402


def _sigs(n):
    atts = parse_signatures(generate_signatures(n, seed="cmodel"))
    d = layer_one_input(atts)
    return [LayerOneInput.from_json_entry(d, i) for i in range(n)], atts


def fit_c1(sizes=(1, 2, 4)):
    pts = []
    for s in sizes:
        sigs, _ = _sigs(s)
        t0 = time.time()
        c = layer_one_circuit(sigs)
        pts.append((s, c.n_constraints))
        print(f"layer_one s={s}: {c.n_constraints} constraints "
              f"({time.time()-t0:.1f}s build)", flush=True)
    xs = np.array([p[0] for p in pts], dtype=float)
    ys = np.array([p[1] for p in pts], dtype=float)
    slope, icept = np.polyfit(xs, ys, 1)
    return {"points": pts, "slope": round(float(slope)), "intercept": round(float(icept))}


def _layer_two_inp(s, h):
    """Layer-2 input with synthetic Merkle data (constraint count only
    depends on shapes, not values — build with check=False)."""
    from zkpoa_tpu.merkle.tree import MerkleTree, find_owned_indices
    from zkpoa_tpu.pipeline.workflow import _layer_two_input

    sigs, atts = _sigs(s)
    addrs = sorted(a.address for a in atts)
    bals = [a.balance for a in sorted(atts, key=lambda a: a.address)]
    tree = MerkleTree.build(addrs, bals, h)
    owned = find_owned_indices(addrs, [a.address for a in atts])
    proofs = [tree.prove(i) for i in owned]
    return _layer_two_input(atts, proofs, tree.root(), h)


def fit_c2(configs=((1, 5), (2, 5), (4, 5), (2, 8), (2, 12))):
    pts = []
    for s, h in configs:
        inp = _layer_two_inp(s, h)
        t0 = time.time()
        c = layer_two_circuit(inp, tree_height=h)  # non-recursive core
        pts.append((s, h, c.n_constraints))
        print(f"layer_two s={s} h={h}: {c.n_constraints} constraints "
              f"({time.time()-t0:.1f}s build)", flush=True)
    a = np.array([[s, h, 1.0] for s, h, _ in pts])
    y = np.array([n for _, _, n in pts], dtype=float)
    coef, *_ = np.linalg.lstsq(a, y, rcond=None)
    return {
        "points": pts,
        "per_sig": round(float(coef[0])),
        "per_height": round(float(coef[1])),
        "intercept": round(float(coef[2])),
    }


def main():
    out = {
        "c1_layer_one": fit_c1(),
        "c2_layer_two_core_nonrecursive": fit_c2(),
        "reference": {
            "c1": "447044*s + 888502 (README.md:183-195)",
            "c2": "159591*s + 6054*h + 19490640 (README.md:197-208; "
                  "includes the ~19.5M-constraint circom-pairing verifier — "
                  "our recursive layer-2 adds a ~7M residue-witness verifier "
                  "on top of the core fit above)",
        },
    }
    path = os.path.join(REPO, "experiments", "CONSTRAINT_MODELS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
