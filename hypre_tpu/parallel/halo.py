"""Halo exchange plans — the ParCSR CommPkg analog.

Reference: parcsr_mv/par_csr_communication.h:51-79 (send_procs /
send_map_elmts / recv_vec_starts) and new_commpkg.c (scalable plan build).

TPU design: a compile-time plan of index arrays + a fixed set of
neighbor OFFSETS on the 1-D shard axis.  At runtime each offset is one
`jax.lax.ppermute` of a padded send buffer (pack -> permute -> scatter
into the ghost vector), the direct analog of pack(send_map_elmts) ->
Irecv/Isend -> unpack.  XLA's latency-hiding scheduler overlaps the
permutes with the diag SpMV, reproducing hypre's comm/compute overlap
(par_csr_matvec.c:264-315) without hand-rolled async code.

A dense `all_gather` fallback covers pathological coupling (every shard
talks to every shard) where per-offset permutes would degenerate.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .partition import BlockPartition


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static exchange plan for one matrix (built once, like CommPkg).

    Per offset d (static python int list `offsets`):
      send_idx[o][s, k]  local row (in shard s) to pack for shard s+d
      recv_pos[o][s, k]  slot in shard s's ghost buffer where the k-th
                         value arriving from shard s-d lands
    Pads index `rows_per_shard` (send side, reads a dummy zero) and
    `ghost_width` (recv side, writes a dummy slot).
    """

    send_idx: tuple  # tuple of int32 [n_shards, W_o]
    recv_pos: tuple  # tuple of int32 [n_shards, W_o]
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    ghost_width: int = dataclasses.field(metadata=dict(static=True))
    use_allgather: bool = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    ghost_gids: jax.Array | None = None  # int32 [n_shards, ghost_width] (allgather path)


def build_halo_plan(
    col_map_offd: list[np.ndarray],
    part: BlockPartition,
    max_offsets: int = 8,
) -> HaloPlan:
    """col_map_offd[s]: sorted unique global col ids shard s needs
    (excluding its own rows) — exactly hypre's col_map_offd."""
    S = part.n_shards
    ghost_width = max((len(c) for c in col_map_offd), default=0)
    ghost_width = max(ghost_width, 1)

    # who owns each needed gid
    needed_offsets: set[int] = set()
    per_pair: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    for s, cm in enumerate(col_map_offd):
        if len(cm) == 0:
            continue
        owners = part.owner(cm)
        for o in np.unique(owners):
            d = (int(s) - int(o)) % S  # sender o, receiver s: permute by d
            needed_offsets.add(d)
            mask = owners == o
            # sender-local rows to pack; receiver ghost slots
            per_pair[(int(o), int(s))] = (
                part.local(cm[mask]).astype(np.int32),
                np.flatnonzero(mask).astype(np.int32),
            )

    use_allgather = len(needed_offsets) > max_offsets
    if use_allgather:
        gids = np.full((S, ghost_width), 0, dtype=np.int32)
        for s, cm in enumerate(col_map_offd):
            gids[s, : len(cm)] = cm
        return HaloPlan(
            send_idx=(),
            recv_pos=(),
            offsets=(),
            ghost_width=ghost_width,
            use_allgather=True,
            n_shards=S,
            ghost_gids=jnp.asarray(gids),
        )

    offsets = tuple(sorted(needed_offsets))
    send_idx, recv_pos = [], []
    for d in offsets:
        W = max(
            (len(per_pair[(o, (o + d) % S)][0]) for o in range(S) if (o, (o + d) % S) in per_pair),
            default=0,
        )
        W = max(W, 1)
        sidx = np.full((S, W), part.rows_per_shard, dtype=np.int32)  # dummy read
        rpos = np.full((S, W), ghost_width, dtype=np.int32)  # dummy write
        for o in range(S):
            s = (o + d) % S
            if (o, s) in per_pair:
                sl, rp = per_pair[(o, s)]
                sidx[o, : len(sl)] = sl
                rpos[s, : len(rp)] = rp
        send_idx.append(jnp.asarray(sidx))
        recv_pos.append(jnp.asarray(rpos))

    from ..utils.errors import arg_error, debug_assert

    # hypre_assert-level invariants (active under HYPRE_TPU_DEBUG):
    # every ghost slot of every shard is written by exactly one
    # (offset, position) pair — a malformed plan silently corrupts
    # halos otherwise
    for s_chk in range(S):
        filled = np.concatenate(
            [rp[s_chk][rp[s_chk] < ghost_width] for rp in
             [np.asarray(r) for r in recv_pos]]
        ) if recv_pos else np.empty(0, np.int32)
        debug_assert(
            len(filled) == len(np.unique(filled)),
            f"halo plan: shard {s_chk} ghost slot written twice",
        )
        debug_assert(
            len(filled) == len(col_map_offd[s_chk]),
            f"halo plan: shard {s_chk} covers {len(filled)} of "
            f"{len(col_map_offd[s_chk])} ghost slots",
        )
    return HaloPlan(
        send_idx=tuple(send_idx),
        recv_pos=tuple(recv_pos),
        offsets=offsets,
        ghost_width=ghost_width,
        use_allgather=False,
        n_shards=S,
        ghost_gids=None,
    )


def exchange(plan: HaloPlan, x_local: jax.Array, axis: str) -> jax.Array:
    """Inside shard_map: x_local [rows_per_shard, ...] (this shard's
    block; trailing dims ride along, so whole ELL ROWS can be shipped —
    the hypre_ParCSRMatrixExtractBExt remote-row fetch,
    par_csr_matop.c:1655) -> ghost [ghost_width+1, ...] (last slot is
    the pad sink)."""
    S = plan.n_shards
    tail = x_local.shape[1:]
    if plan.use_allgather:
        with jax.named_scope("HALO_EXCHANGE"):
            full = jax.lax.all_gather(x_local, axis, tiled=True)
            i = jax.lax.axis_index(axis)
            gids = plan.ghost_gids[i]
            ghost = full[gids]
            return jnp.concatenate(
                [ghost, jnp.zeros((1,) + tail, x_local.dtype)]
            )

    i = jax.lax.axis_index(axis)
    x_ext = jnp.concatenate(
        [x_local, jnp.zeros((1,) + tail, x_local.dtype)]
    )
    ghost = jnp.zeros((plan.ghost_width + 1,) + tail, x_local.dtype)
    with jax.named_scope("HALO_EXCHANGE"):
        for o, d in enumerate(plan.offsets):
            with jax.named_scope("PACK_UNPACK"):
                buf = x_ext[plan.send_idx[o][i]]
            perm = [(src, (src + d) % S) for src in range(S)]
            buf = jax.lax.ppermute(buf, axis, perm)
            with jax.named_scope("PACK_UNPACK"):
                ghost = ghost.at[plan.recv_pos[o][i]].set(buf)
    return ghost


def reverse_exchange(
    plan: HaloPlan,
    ghost_contrib: jax.Array,
    axis: str,
    n_local: int,
    combine: str = "add",
) -> jax.Array:
    """Transposed communication (reference: parcsr_mv/communicationT.c,
    and CommHandle unpack with action=add) — each shard holds
    CONTRIBUTIONS to ghost slots [ghost_width+1, ...]; they are shipped
    back to the owning shards and combined (add/max) into the owner's
    local rows.  Returns the [n_local, ...] combined contribution
    (zeros where nothing arrived); the caller adds it to its own local
    partials.  Used for S^T column counts (PMIS measures), the S^T
    direction of the PMIS independent-set comparison, and the P^T leg
    of the distributed Galerkin product."""
    S = plan.n_shards
    tail = ghost_contrib.shape[1:]
    if combine not in ("add", "max"):
        raise arg_error(f"unknown combine {combine!r}")

    if plan.use_allgather:
        i = jax.lax.axis_index(axis)
        gids = plan.ghost_gids[i]
        per_len = n_local  # uniform block partition
        full = jnp.zeros((S * per_len,) + tail, ghost_contrib.dtype)
        if combine == "add":
            full = full.at[gids].add(ghost_contrib[: plan.ghost_width])
            with jax.named_scope("HALO_EXCHANGE"):
                full = jax.lax.psum(full, axis)
        else:
            full = full.at[gids].max(ghost_contrib[: plan.ghost_width])
            with jax.named_scope("HALO_EXCHANGE"):
                full = jax.lax.pmax(full, axis)
        return jax.lax.dynamic_slice_in_dim(full, i * per_len, per_len)

    i = jax.lax.axis_index(axis)
    out = jnp.zeros((n_local + 1,) + tail, ghost_contrib.dtype)
    with jax.named_scope("HALO_EXCHANGE"):
        for o, d in enumerate(plan.offsets):
            with jax.named_scope("PACK_UNPACK"):
                # slots this shard RECEIVED from offset d now carry the
                # contributions it must send BACK against that offset
                buf = ghost_contrib[plan.recv_pos[o][i]]
            perm = [((src + d) % S, src) for src in range(S)]
            buf = jax.lax.ppermute(buf, axis, perm)
            with jax.named_scope("PACK_UNPACK"):
                if combine == "add":
                    out = out.at[plan.send_idx[o][i]].add(buf)
                else:
                    out = out.at[plan.send_idx[o][i]].max(buf)
    return out[:n_local]
