"""Multi-chip execution: expansion + DB scan sharded over a jax.sharding.Mesh.

The reference is single-threaded/single-process (SURVEY §2c); multi-chip is
a new design obligation driven by BASELINE.json.  Layout:

* mesh axis ``"db"`` — partitions the **first hypercube dimension** D0.
  Each device owns a contiguous block of DB rows (and slices the matching
  part of the first selection-vector block), so every recursion level below
  the top is embarrassingly parallel; only the top-level contraction
  crosses devices, as one homomorphic-add ``psum`` of reduced RNS limb
  arrays (u64 headroom: S·q < 2^64 for any realistic mesh size).
* mesh axis ``"batch"`` — partitions independent queries (the reference's
  serial per-query loop, server.cpp:60-63, becomes a sharded batch axis).
  Query expansion runs per batch shard, replicated across the "db" axis —
  it is ~D0× cheaper than the scan it feeds.

D0 and the query batch are zero-padded to multiples of the mesh axes;
zero ciphertexts/rows are exact no-ops in every homomorphic identity, so
padded results equal the unpadded scan bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pir_tpu.core.context import PirContext
from pir_tpu.ops import expand, modular, scan


def pad_axis(arr: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = arr.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(arr, pad)


def default_mesh(devices=None, batch: int = 1) -> Mesh:
    """Mesh over all devices: ("db", "batch") with the given batch width."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n % batch != 0:
        raise ValueError(f"device count {n} not divisible by batch axis {batch}")
    return Mesh(devices.reshape(n // batch, batch), axis_names=("db", "batch"))


def make_sharded_pipeline(
    ctx: PirContext,
    dims: tuple,
    db_ntt,
    mesh: Mesh,
    db_shoup=None,
    reply_limbs: int | None = None,
):
    """Jitted multi-query pipeline: (query_cts, galois_keys) -> replies.

    query_cts: u64[Q, num_cts, 2, L, N] with Q a multiple of the mesh
    "batch" axis.  Returns u64[Q, (2·ER)^(d-1), 2, L', N] where L' is
    `reply_limbs` when set (replies mod-switched after the cross-shard
    reduction — ops/modswitch.py) and the full L otherwise.
    """
    dim_sum = sum(dims)
    d0 = dims[0]
    n_db = mesh.shape["db"]
    d0p = -(-d0 // n_db) * n_db
    d0_local = d0p // n_db
    local_dims = (d0_local,) + tuple(dims[1:])
    block = 1
    for d in dims[1:]:
        block *= d

    db_blocks = pad_axis(
        jnp.asarray(db_ntt).reshape(d0, block, ctx.L, ctx.n), 0, n_db
    )
    shoup_blocks = (
        pad_axis(
            jnp.asarray(db_shoup).reshape(d0, block, ctx.L, ctx.n), 0, n_db
        )
        if db_shoup is not None
        else jnp.zeros_like(db_blocks)
    )
    have_shoup = db_shoup is not None

    def shard_body(query_local, gk, db_local, shoup_local):
        # query_local: [Q/S_b, num_cts, 2, L, N]; db_local: [D0p/S_db, B, L, N]
        db_flat = db_local.reshape(-1, *db_local.shape[2:])
        shoup_flat = (
            shoup_local.reshape(-1, *shoup_local.shape[2:]) if have_shoup else None
        )
        my_db = jax.lax.axis_index("db")

        def one_query(query_cts):
            sv = expand.expand_query(ctx, gk, query_cts, dim_sum)
            sv_ntt = ctx.ntt_q.forward(sv)
            sv0 = pad_axis(sv_ntt[:d0], 0, n_db)
            sv0_local = jax.lax.dynamic_slice_in_dim(
                sv0, my_db * d0_local, d0_local, axis=0
            )
            sv_local = jnp.concatenate([sv0_local, sv_ntt[d0:]], axis=0)
            partial = scan.database_scan_decomp(
                ctx, db_flat, local_dims, sv_local, shoup_flat
            )
            # cross-shard homomorphic add: reduced summands, exact u64 psum
            total = jax.lax.psum(partial, axis_name="db")
            reply = modular.barrett_reduce_64(
                total, ctx.limbs_q.q, ctx.limbs_q.ratio_hi
            )
            if reply_limbs is not None:
                from pir_tpu.ops import modswitch

                reply = modswitch.mod_switch_to(ctx, reply, reply_limbs)
            return reply

        return jax.vmap(one_query)(query_local)

    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P("batch"), P(), P("db"), P("db")),
        out_specs=P("batch"),
        check_vma=False,
    )

    def pipeline(query_cts, gk):
        return mapped(query_cts, gk, db_blocks, shoup_blocks)

    return jax.jit(pipeline)
