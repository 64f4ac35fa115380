"""Ring collectives for the halo exchange (graph axis).

Two implementations of the same reduce-scatter + all-gather ring schedule for
summing partial vertex aggregates across the edge-partition axis:

  * `ring_all_reduce` — jax.lax.ppermute chunks under shard_map.  XLA lowers
    each hop to an async collective-permute, so hop k+1's send overlaps hop
    k's local add (the "halo all-to-all overlapped with local aggregation"
    pattern of BASELINE configs[4]).  Runs anywhere — tested on the 8-device
    fake CPU mesh.
  * `ring_all_reduce_pallas` — the same schedule as a Pallas kernel with
    explicit `pltpu.make_async_remote_copy` remote DMA and send/recv
    semaphores (SNIPPETS.md pattern; pallas_guide "Ring Collectives").
    Requires real multi-chip ICI; EXPERIMENTAL — the psum path in
    parallel/halo.py remains the default until profiled on a pod slice.

Both compute the same result as jax.lax.psum(x, axis) (property tested).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ring_all_reduce(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Bandwidth-optimal ring all-reduce of x over `axis_name`.

    Must be called inside shard_map.  Reduce-scatter phase: N-1 hops, each
    shard accumulates one chunk; all-gather phase: N-1 hops broadcast the
    reduced chunks.  Equivalent to psum (XLA emits the same ring for psum on
    ICI — this explicit version exists to host the overlap schedule and to
    mirror the Pallas DMA variant below).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    me = jax.lax.axis_index(axis_name)
    rows = x.shape[0]
    pad = (-rows) % n
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    chunks = jnp.stack(jnp.split(x, n, axis=0))          # [n, rows/n, ...]
    perm = [(i, (i + 1) % n) for i in range(n)]

    # The hop count n-1 is STATIC — plain Python loops keep the schedule
    # reverse-mode differentiable (fori_loop is not), which the training
    # path requires; XLA still turns each hop into an async
    # collective-permute overlapped with the local add.

    # reduce-scatter: after n-1 permute+add hops, shard `me` owns the full
    # sum of chunk (me + 1) % n
    acc = chunks[me]
    for k in range(n - 1):
        recv = jax.lax.ppermute(acc, axis_name, perm)
        acc = chunks[(me - k - 1 + n) % n] + recv
    # acc = full sum of chunk (me + 1) % n
    owned_idx = (me + 1) % n

    # all-gather the reduced chunks around the ring
    gathered = jnp.zeros_like(chunks).at[owned_idx].set(acc)
    cur = acc
    for k in range(n - 1):
        cur = jax.lax.ppermute(cur, axis_name, perm)
        gathered = gathered.at[(owned_idx - k - 1 + n) % n].set(cur)
    out = jnp.concatenate(list(gathered), axis=0)
    return out[:rows] if pad else out


# ----------------------------------------------------------- Pallas variant

def _ring_ar_kernel(x_ref, out_ref, comm_ref, send_sem, recv_sem, *,
                    axis_name, chunk_rows):
    """One bidirectional-capable ring all-reduce step schedule with explicit
    remote DMA.  EXPERIMENTAL (needs a real multi-chip mesh)."""
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(me + 1, n)

    out_ref[:] = x_ref[:]

    def hop(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)
        src_idx = jax.lax.rem(me - k + n, n) * chunk_rows
        comm_ref[slot] = out_ref[pl.ds(src_idx, chunk_rows), :]
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[slot],
            dst_ref=comm_ref.at[nxt],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[nxt],
            device_id=(right,),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        dst_idx = jax.lax.rem(me - k - 1 + 2 * n, n) * chunk_rows
        out_ref[pl.ds(dst_idx, chunk_rows), :] = (
            out_ref[pl.ds(dst_idx, chunk_rows), :] + comm_ref[nxt])
        return 0

    jax.lax.fori_loop(0, n - 1, hop, 0)
    # all-gather phase: circulate the reduced chunks
    def hop2(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)
        src_idx = jax.lax.rem(me + 1 - k + 2 * n, n) * chunk_rows
        comm_ref[slot] = out_ref[pl.ds(src_idx, chunk_rows), :]
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[slot],
            dst_ref=comm_ref.at[nxt],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[nxt],
            device_id=(right,),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        dst_idx = jax.lax.rem(me - k + 2 * n, n) * chunk_rows
        out_ref[pl.ds(dst_idx, chunk_rows), :] = comm_ref[nxt]
        return 0

    jax.lax.fori_loop(0, n - 1, hop2, 0)


def ring_all_reduce_pallas(x: jnp.ndarray, axis_name: str,
                           axis_size: int) -> jnp.ndarray:
    """Pallas remote-DMA ring all-reduce (call under shard_map on a real
    multi-chip mesh).  EXPERIMENTAL."""
    rows, d = x.shape
    assert rows % axis_size == 0, "pad rows to a multiple of the axis size"
    chunk_rows = rows // axis_size
    kernel = functools.partial(_ring_ar_kernel, axis_name=axis_name,
                               chunk_rows=chunk_rows)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, d), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
    )(x)
