"""Batch-parallel proving over the mesh "batch" axis (parallel/batch_prove):
the reference's GNU-parallel per-batch fan-out (full_workflow.sh:552) as a
shard_map. Proofs must be byte-identical to sequential prove() calls."""

import pytest

import tests.conftest as cft  # noqa: F401
from zkpoa_tpu.models.gadgets.poseidon_gadget import poseidon
from zkpoa_tpu.models.r1cs import Circuit
from zkpoa_tpu.parallel.batch_prove import prove_batched
from zkpoa_tpu.parallel.mesh import make_mesh
from zkpoa_tpu.prover import groth16
from zkpoa_tpu.prover.prove import prove
from zkpoa_tpu.prover.setup import setup_device


def _toy(x, y):
    c = Circuit()
    out = c.public_output()
    a = c.var(x)
    b = c.var(y)
    c.bind_output(out, poseidon(c, [a, b]))
    return c.compile()


def test_prove_batched_matches_sequential():
    r1cs, w0 = _toy(7, 11)
    _, w1 = _toy(13, 17)
    pk = setup_device(r1cs, seed="batchkey")
    mesh = make_mesh(2, axis="batch")
    proofs = prove_batched(pk, r1cs, [w0, w1], mesh, seed="bp")
    vk = groth16.VerifyingKey.from_json(pk.vk_json)
    for i, (proof, wit) in enumerate(zip(proofs, [w0, w1])):
        publics = [wit[w] for w in range(1, r1cs.n_public + 1)]
        assert groth16.verify(vk, proof, publics)
        ref = prove(pk, r1cs, wit, seed=f"bp-b{i}")
        assert proof.pi_a == ref.pi_a and proof.pi_b == ref.pi_b and proof.pi_c == ref.pi_c


def test_hierarchical_mesh_msm_batch_sharded():
    """2D (DCN x ICI) mesh: batches over the outer axis, points sharded
    over the inner — a simulated two-host topology on the 8-device CPU
    mesh (SURVEY §2.6/§7 multi-host scaffolding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkpoa_tpu.fields import bn254
    from zkpoa_tpu.ops import msm as msm_mod
    from zkpoa_tpu.ops.curve_jax import BN254_G1
    from zkpoa_tpu.parallel.mesh import make_hierarchical_mesh, msm_batch_sharded

    mesh = make_hierarchical_mesh(shape=(2, 4))
    rng = np.random.default_rng(3)
    n, nb = 32, 2
    mults = [int(k) + 1 for k in rng.integers(1, 1 << 20, size=n)]
    pts = [bn254.g1_mul(bn254.G1_GEN, k) for k in mults]
    xs, ys, _ = BN254_G1.encode_affine(pts)
    scalar_sets = [
        [int.from_bytes(rng.bytes(32), "big") % bn254.R for _ in range(n)]
        for _ in range(nb)
    ]
    sc_nb = jnp.stack([
        jnp.asarray(msm_mod.scalars_to_limbs(s)) for s in scalar_sets
    ])
    res = msm_batch_sharded(BN254_G1, xs, ys, sc_nb, mesh, n_bits=254, c=5)
    for b in range(nb):
        got = BN254_G1.decode_jac(jax.tree.map(lambda l, b=b: l[b : b + 1], res))[0]
        want_k = sum(s * m for s, m in zip(scalar_sets[b], mults)) % bn254.R
        assert got == bn254.g1_mul(bn254.G1_GEN, want_k)
