"""Batch-parallel proving: the reference's `seq 0 k-1 | parallel
prove_layers_one_two` (scripts/full_workflow.sh:552) mapped onto a mesh
"batch" axis — independent proof batches of the SAME circuit shape prove
simultaneously, one batch per device (or device group), with the proving
key replicated and witnesses sharded.

The per-batch MSMs run the fused single-chip kernel inside shard_map; the
QAP quotient NTTs batch over a leading axis (ops.ntt transforms axis -2).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops import msm_pallas as M2


def msm_batch_parallel(
    curve,
    xs,
    ys,
    scalars_nb: jnp.ndarray,  # [NB, N, K] plain limbs
    mesh: Mesh,
    plan: M2.MsmPlan,
    point_valid: Optional[jnp.ndarray] = None,
    axis: str = "batch",
):
    """One MSM per batch over the mesh's batch axis: points replicated,
    scalars sharded. Returns a Jacobian pytree with leaves [NB, K].
    NB must be divisible by the axis size; `plan` must bound every batch's
    occupancy (take the max over per-batch plans)."""
    from jax import shard_map

    if point_valid is None:
        point_valid = jnp.ones((plan.n,), dtype=bool)

    def local(sc_local):
        def one(sc):
            res, _exc = M2._msm_fused(curve, plan, xs, ys, sc, point_valid)
            return res

        return jax.lax.map(one, sc_local)

    out_spec = jax.tree.map(lambda _: P(axis), curve.infinity((1,)))
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=out_spec,
        check_vma=False,
    )(scalars_nb)


def prove_batched(
    pk,
    r1cs,
    witnesses: Sequence[Sequence[int]],
    mesh: Mesh,
    seed: str = "zkpoa-proof",
    axis: str = "batch",
    seeds: Optional[Sequence[str]] = None,
) -> List:
    """Prove the SAME circuit for several witnesses with the batch axis of
    `mesh` (the reference's per-batch GNU-parallel fan-out). Requires a
    device-resident key (prover.setup.setup_device). Returns one Proof per
    witness, identical to sequential prove() calls with seeds
    f"{seed}-b{i}" (or the explicit per-witness `seeds`)."""
    from ..fields import bn254
    from ..fields.bn254 import R
    from ..ops.curve_jax import BN254_G1
    from ..ops.fp2_jax import BN254_G2
    from ..ops.limbs import BN254_FR
    from ..ops.ntt import coset_qap_evals, quotient
    from ..prover.prove import _assemble_proof, _qap_domain_evals_fast, _rand_fr
    from ..prover.setup import DeviceG1Points

    assert isinstance(pk.a_query, DeviceG1Points), "prove_batched needs a device key"
    nb = len(witnesses)
    ndev = mesh.shape[axis]
    pad = (-nb) % ndev

    # h operands: batched NTT over the leading axis
    a_ms, b_ms, c_ms = [], [], []
    for w in witnesses:
        a_m, b_m, c_m = _qap_domain_evals_fast(r1cs, w, pk.domain_size)
        a_ms.append(a_m)
        b_ms.append(b_m)
        c_ms.append(c_m)
    stack = lambda xs_: jnp.stack(xs_ + [xs_[-1]] * pad)  # noqa: E731
    a_s, b_s, c_s = stack(a_ms), stack(b_ms), stack(c_ms)
    h_basis = getattr(pk, "h_basis", "monomial")
    if h_basis == "monomial":
        h_nb = BN254_FR.from_mont(quotient(a_s, b_s, c_s))[:, : len(pk.h_query)]
    else:
        h_nb = BN254_FR.from_mont(coset_qap_evals(a_s, b_s, c_s))

    w_limbs = [M2.scalars_to_limbs_fast([int(x) % R for x in w]) for w in witnesses]
    w_nb = jnp.asarray(np.stack(w_limbs + [w_limbs[-1]] * pad))

    def shared_plan(limb_sets, valid):
        c = M2.auto_c(limb_sets[0].shape[0])
        rounds = max(
            M2.plan_msm(wl, 254, c, valid).rounds for wl in limb_sets
        )
        return M2.MsmPlan(254, c, limb_sets[0].shape[0], rounds)

    plan_w = shared_plan(w_limbs, np.asarray(pk.a_query.valid))
    a_accs = msm_batch_parallel(
        BN254_G1, pk.a_query.xs, pk.a_query.ys, w_nb, mesh, plan_w,
        pk.a_query.valid, axis)
    b1_accs = msm_batch_parallel(
        BN254_G1, pk.b1_query.xs, pk.b1_query.ys, w_nb, mesh, plan_w,
        pk.b1_query.valid, axis)
    priv_nb = w_nb[:, pk.n_public + 1 :]
    plan_c = shared_plan(
        [wl[pk.n_public + 1 :] for wl in w_limbs], np.asarray(pk.c_query.valid)
    )
    c_accs = msm_batch_parallel(
        BN254_G1, pk.c_query.xs, pk.c_query.ys, priv_nb, mesh, plan_c,
        pk.c_query.valid, axis)
    c_h = M2.auto_c(h_nb.shape[1])
    h_rounds = max(
        M2.plan_msm_device(h_nb[i], 254, c_h, pk.h_query.valid).rounds
        for i in range(nb)
    )
    plan_h = M2.MsmPlan(254, c_h, h_nb.shape[1], h_rounds)
    h_accs = msm_batch_parallel(
        BN254_G1, pk.h_query.xs, pk.h_query.ys, h_nb, mesh, plan_h,
        pk.h_query.valid, axis)

    proofs = []
    for i in range(nb):
        # G2 MSM per batch (pytree path — small fraction of the work)
        plan_b2 = M2.plan_msm(w_limbs[i], 254, M2.auto_c(len(w_limbs[i])),
                              np.asarray(pk.b2_query.valid))
        b2_acc_d = M2.msm_tpu_tree(
            BN254_G2, pk.b2_query.xs, pk.b2_query.ys, w_nb[i],
            point_valid=pk.b2_query.valid, plan=plan_b2)
        take = lambda tr: jax.tree.map(lambda a: a[i : i + 1], tr)  # noqa: E731
        a_acc = BN254_G1.decode_jac(take(a_accs))[0]
        b1_acc = BN254_G1.decode_jac(take(b1_accs))[0]
        c_acc = BN254_G1.decode_jac(take(c_accs))[0]
        h_acc = BN254_G1.decode_jac(take(h_accs))[0]
        b2_acc = BN254_G2.decode_jac(jax.tree.map(lambda a: a[None], b2_acc_d))[0]
        seed_i = seeds[i] if seeds is not None else f"{seed}-b{i}"
        r = _rand_fr(seed_i, "r")
        s = _rand_fr(seed_i, "s")
        proofs.append(_assemble_proof(pk, a_acc, b1_acc, c_acc, h_acc, b2_acc, r, s))
    return proofs
