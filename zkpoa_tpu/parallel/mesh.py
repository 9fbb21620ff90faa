"""Multi-chip sharding: mesh construction and sharded kernels.

The reference's only parallelism is GNU-parallel process fan-out on one box
(SURVEY.md §2.6); here the same axes map onto a jax.sharding.Mesh:

  * batch axis ("batch"): independent proof batches (layer-1/2 chains) —
    the reference's `parallel prove_layers_one_two` — run as independent
    program instances over mesh rows.
  * data axis ("data"): *within* one proof, MSM points / NTT rows / Merkle
    leaves are sharded across chips — parallelism the reference cannot do.

MSM combine: each shard computes a full local Pippenger over its points
(zkpoa_tpu.ops.msm.msm_impl inside shard_map); the per-shard Jacobian
results (one point each) are jointly reduced with a log-depth tree of
unified adds after an implicit all-gather. Collectives ride ICI; on
multi-host slices the same code spans DCN through the global mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops import msm as msm_mod
from ..ops.curve_jax import Jac


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def msm_sharded(
    curve,
    xs,
    ys,
    scalars: jnp.ndarray,
    mesh: Mesh,
    n_bits: int = 254,
    c: int = msm_mod.DEFAULT_WINDOW_BITS,
    axis: str = "data",
) -> Jac:
    """MSM with points+scalars sharded along `axis` of `mesh`. Returns an
    unsharded Jacobian point. N must divide the axis size (pad with
    point_valid=False upstream if needed)."""
    from jax import shard_map

    ndev = mesh.shape[axis]

    def local(xs_l, ys_l, sc_l):
        p = msm_mod.msm_impl(curve, xs_l, ys_l, sc_l, n_bits, c)
        return jax.tree.map(lambda l: l[None], p)  # leaf [1, ...]

    spec_pts = jax.tree.map(lambda _: P(axis), xs)
    partials = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_pts, jax.tree.map(lambda _: P(axis), ys), P(axis)),
        out_specs=jax.tree.map(lambda _: P(axis), xs),
        check_vma=False,
    )(xs, ys, scalars)
    # partials leaves: [ndev, ...]; tree-reduce (log2 ndev unified adds)
    m = ndev
    reduced = partials
    while m > 1:
        half = m // 2
        left = jax.tree.map(lambda l: l[:half], reduced)
        right = jax.tree.map(lambda l: l[half : 2 * half], reduced)
        summed = curve.add(left, right)
        if m % 2:
            tail = jax.tree.map(lambda l: l[m - 1 : m], reduced)
            first = jax.tree.map(lambda l: l[:1], summed)
            rest = jax.tree.map(lambda l: l[1:], summed)
            first = curve.add(first, tail)
            summed = jax.tree.map(
                lambda f, r: jnp.concatenate([f, r], axis=0), first, rest
            )
        reduced = summed
        m = half
    return jax.tree.map(lambda l: l[0], reduced)


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """jax.distributed.initialize wrapper for multi-host slices (SURVEY
    §2.6/§7: ICI intra-slice, DCN across hosts). No-op when single-process
    or already initialized; returns the process count. The reference has
    no multi-host story at all — its fan-out is GNU parallel on one box
    (full_workflow.sh:552)."""
    if coordinator_address is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            pass  # already initialized
    return jax.process_count()


def make_hierarchical_mesh(
    dcn_axis: str = "batch", ici_axis: str = "data",
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """2D mesh (hosts × local devices): the outer axis maps to DCN
    (independent proof batches — cheap, rare collectives), the inner to
    ICI (intra-proof MSM/NTT sharding — bandwidth-hungry all_to_all /
    all_gather). `shape` overrides the (process_count, local_count)
    factorization — e.g. (2, 4) simulates a two-host topology on an
    8-device single-process (virtual CPU) mesh."""
    devs = np.array(jax.devices())
    if shape is None:
        shape = (jax.process_count(), jax.local_device_count())
    assert shape[0] * shape[1] == devs.size, (shape, devs.size)
    return Mesh(devs.reshape(shape), (dcn_axis, ici_axis))


def msm_batch_sharded(
    curve,
    xs,
    ys,
    scalars_nb: jnp.ndarray,  # [NB, N, K_s]
    mesh: Mesh,
    n_bits: int = 254,
    c: int = msm_mod.DEFAULT_WINDOW_BITS,
    batch_axis: str = "batch",
    data_axis: str = "data",
) -> Jac:
    """Hierarchical MSM over a 2D (DCN × ICI) mesh: independent batches
    over `batch_axis`, each batch's points sharded over `data_axis`.
    Point/bucket partial sums cross only the ICI axis (an all_gather +
    log-depth unified adds — point addition is not a psum reduction);
    nothing crosses DCN. Returns a Jacobian pytree with leaves [NB, ...]."""
    from jax import shard_map

    di = mesh.shape[data_axis]

    def local(xs_l, ys_l, sc_l):
        # xs_l [N/di, K]; sc_l [NB/db, N/di, K_s]
        def one(sc):
            return msm_mod.msm_impl(curve, xs_l, ys_l, sc, n_bits, c)

        partials = jax.lax.map(one, sc_l)  # leaves [NB/db, ...]
        gathered = jax.tree.map(
            lambda l: jax.lax.all_gather(l, data_axis), partials
        )  # leaves [di, NB/db, ...]
        acc = jax.tree.map(lambda l: l[0], gathered)
        for i in range(1, di):
            acc = curve.add(acc, jax.tree.map(lambda l, i=i: l[i], gathered))
        return acc

    spec_pts = jax.tree.map(lambda _: P(data_axis), xs)
    out_spec = jax.tree.map(lambda _: P(batch_axis), xs)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_pts, jax.tree.map(lambda _: P(data_axis), ys),
                  P(batch_axis, data_axis)),
        out_specs=out_spec,
        check_vma=False,
    )(xs, ys, scalars_nb)


def shard_leading(arr_tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree of arrays with the leading dim sharded over `axis`."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P(axis)))

    return jax.tree.map(put, arr_tree)


def replicate(arr_tree, mesh: Mesh):
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree.map(put, arr_tree)
