"""Mesh construction and sharded tokenization steps.

Design (SPMD, TPU-first — see SURVEY.md §7 "Distribution layer"):

* 1-D ``data`` mesh over all available devices (chips within a slice ride
  ICI; multi-host extends the same axis over DCN transparently through
  jax's global device list).
* ``shard_merge_rows``: the BPE merge kernel wrapped in ``shard_map`` with
  rows sharded over ``data`` and tables replicated. Each device's shard
  runs its own `while_loop` until *its* rows are merged — there is no
  per-iteration global reduction, so stragglers never serialize the mesh.
* ``sharded_encode_step``: one full data-parallel step — merge + psum'd
  byte/token counters — the unit the multi-chip dry run compiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.merge import merge_rows_local

DATA_AXIS = "data"
HOST_AXIS = "hosts"
CHIP_AXIS = "chips"


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def get_mesh_2d(
    n_hosts: int, chips_per_host: int, devices=None
) -> Mesh:
    """(hosts, chips) mesh for multi-host pod slices.

    The tokenization workload is pure data parallelism, but the 2-D mesh
    makes the network topology explicit: reductions over ``chips`` ride
    ICI within a host's slice, reductions over ``hosts`` cross DCN. The
    sharded step reduces counters over chips first, then hosts, so the
    DCN leg carries one scalar per host.
    """
    if devices is None:
        devices = jax.devices()
    need = n_hosts * chips_per_host
    assert len(devices) >= need, (len(devices), need)
    arr = np.asarray(devices[:need]).reshape(n_hosts, chips_per_host)
    return Mesh(arr, (HOST_AXIS, CHIP_AXIS))


def sharded_encode_step_2d(mesh: Mesh):
    """Data-parallel tokenization step over a (hosts, chips) mesh.

    Rows shard over both axes (flattened DP); byte/token counters reduce
    hierarchically: psum over ICI (chips) then DCN (hosts).
    """

    @partial(jax.jit, static_argnames=("mask",))
    def step(byte_buf, lengths, byte_rank, pair_rows, mask: int):
        def local(bb, ln, br, pr_rows):
            tok, counts = merge_rows_local(bb, ln, br, pr_rows, mask=mask)
            local_bytes = jnp.sum(ln, dtype=jnp.int32)
            local_tokens = jnp.sum(counts, dtype=jnp.int32)
            # ICI reduction first, then DCN: the cross-host leg moves one
            # scalar per host instead of per chip
            b_ici = jax.lax.psum(local_bytes, CHIP_AXIS)
            t_ici = jax.lax.psum(local_tokens, CHIP_AXIS)
            return (
                tok,
                counts,
                jax.lax.psum(b_ici, HOST_AXIS),
                jax.lax.psum(t_ici, HOST_AXIS),
            )

        shard = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P((HOST_AXIS, CHIP_AXIS), None),
                P((HOST_AXIS, CHIP_AXIS)),
                P(None),
                P(None, None),
            ),
            out_specs=(
                P((HOST_AXIS, CHIP_AXIS), None),
                P((HOST_AXIS, CHIP_AXIS)),
                P(),
                P(),
            ),
        )
        return shard(byte_buf, lengths, byte_rank, pair_rows)

    return step


def shard_merge_rows(mesh: Mesh):
    """Build a jitted, mesh-sharded merge over packed pretoken rows.

    Returns ``fn(byte_buf (R, C) u8, lengths (R,) i32, byte_rank (256,) i32,
    pair_rows (nb, 12) i32, mask static) -> (tok (R, C) i32, counts (R,) i32)``
    with R divisible by the mesh size. Tables are replicated; rows sharded.
    """

    @partial(jax.jit, static_argnames=("mask",))
    def fn(byte_buf, lengths, byte_rank, pair_rows, mask: int):
        shard = jax.shard_map(
            partial(merge_rows_local, mask=mask),
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(None), P(None, None)),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
        )
        return shard(byte_buf, lengths, byte_rank, pair_rows)

    return fn


def sharded_encode_step(mesh: Mesh):
    """One data-parallel tokenization step with psum'd statistics.

    Consumes a row-sharded packed buffer, produces row-sharded token ids
    plus *global* (replicated) counters reduced over ICI:
    ``bytes_processed`` and ``tokens_produced``. This is the framework's
    "training step" analogue for the multi-chip dry run.
    """

    @partial(jax.jit, static_argnames=("mask",))
    def step(byte_buf, lengths, byte_rank, pair_rows, mask: int):
        def local(bb, ln, br, pr_rows):
            tok, counts = merge_rows_local(bb, ln, br, pr_rows, mask=mask)
            # int32: per-step shard totals stay well under 2^31 (a step
            # processes at most MAX_ROWS*width = 16M bytes per device).
            local_bytes = jnp.sum(ln, dtype=jnp.int32)
            local_tokens = jnp.sum(counts, dtype=jnp.int32)
            return (
                tok,
                counts,
                jax.lax.psum(local_bytes, DATA_AXIS),
                jax.lax.psum(local_tokens, DATA_AXIS),
            )

        shard = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(None), P(None, None)),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(), P()),
        )
        return shard(byte_buf, lengths, byte_rank, pair_rows)

    return step


def shard_rows(mesh: Mesh, byte_buf, lengths):
    """Place packed rows row-sharded on the mesh (tables stay replicated)."""
    row_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    len_sharding = NamedSharding(mesh, P(DATA_AXIS))
    return (
        jax.device_put(byte_buf, row_sharding),
        jax.device_put(lengths, len_sharding),
    )
