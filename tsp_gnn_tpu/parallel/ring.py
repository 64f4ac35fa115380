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

def _ring_ar_kernel(x_ref, out_ref, comm_ref, send_sem, recv_sem, ready_sem,
                    *, axis_name, chunk_rows):
    """Reduce-scatter + all-gather ring with explicit remote DMA.

    Double-buffered: hop h sends from comm slot h%2 into the right
    neighbour's slot (h+1)%2.  A slot written by the neighbour's hop h is
    this device's SEND buffer at hop h-1 — so a device running 2+ hops
    ahead would overwrite a buffer whose send may still be in flight.  The
    `ready_sem` capacity handshake closes that race (caught by the
    interpret-mode equivalence test, 1-in-5 reproduction on the fake mesh):
    after finishing hop h every device signals its LEFT neighbour; before
    the DMA of any hop h>0 it waits for the signal proving the right
    neighbour finished hop h-1 (freeing the slot about to be written).
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(me + 1, n)
    left = jax.lax.rem(me - 1 + n, n)

    out_ref[:] = x_ref[:]

    def hop(h, _):
        slot = jax.lax.rem(h, 2)
        nxt = jax.lax.rem(h + 1, 2)
        phase2 = h >= n - 1
        k = jnp.where(phase2, h - (n - 1), h)
        src_chunk = jnp.where(phase2,
                              jax.lax.rem(me + 1 - k + 2 * n, n),
                              jax.lax.rem(me - k + 2 * n, n))
        dst_chunk = jnp.where(phase2,
                              jax.lax.rem(me - k + 2 * n, n),
                              jax.lax.rem(me - k - 1 + 2 * n, n))
        comm_ref[slot] = out_ref[pl.ds(src_chunk * chunk_rows, chunk_rows), :]

        @pl.when(h > 0)
        def _wait_capacity():
            # right neighbour finished hop h-1 -> its slot `nxt` is free
            pltpu.semaphore_wait(ready_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[slot],
            dst_ref=comm_ref.at[nxt],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[nxt],
            # dict + MESH: address the right neighbour along the ring axis
            # only; other mesh axes keep this device's own coordinates
            device_id={axis_name: right},
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma.start()
        rdma.wait()
        dst = pl.ds(dst_chunk * chunk_rows, chunk_rows)

        @pl.when(phase2)
        def _copy():
            out_ref[dst, :] = comm_ref[nxt]

        @pl.when(jnp.logical_not(phase2))
        def _add():
            out_ref[dst, :] = out_ref[dst, :] + comm_ref[nxt]

        # hop h done: my send buffer `slot` is drained and my receive was
        # consumed -> tell LEFT it may write me at its hop h+1
        pltpu.semaphore_signal(ready_sem, 1, device_id={axis_name: left},
                               device_id_type=pltpu.DeviceIdType.MESH)
        return 0

    total_hops = 2 * (n - 1)
    jax.lax.fori_loop(0, total_hops, hop, 0)
    # drain the final hop's capacity signal (each device waits total_hops-1
    # times but signals total_hops times) so semaphores end at zero
    @pl.when(total_hops > 0)
    def _drain():
        pltpu.semaphore_wait(ready_sem, 1)


def ring_all_reduce_pallas(x: jnp.ndarray, axis_name: str,
                           axis_size: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Pallas remote-DMA ring all-reduce (call under shard_map on a real
    multi-chip mesh, or with interpret=True on the fake CPU mesh).

    EXPERIMENTAL on real hardware [ADVICE r3]: the slot/phase schedule and
    the capacity-handshake (ready_sem) protocol are verified == psum in
    TPU-interpret mode on the 8-device fake mesh (tests/test_ring.py)
    [VERDICT r2 #6], but DeviceIdType.MESH addressing and the handshake
    remain unexercised on real multi-chip ICI — psum stays the production
    default until a pod-slice run confirms this path."""
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
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x)
