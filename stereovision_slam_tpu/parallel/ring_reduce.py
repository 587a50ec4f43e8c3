"""Pallas ring all-reduce over inter-chip RDMA for distributed BA.

The reference has no distributed communication at all (SURVEY.md §2 — its
only concurrency is pthreads around a shared Map, backend.cpp:250-345). The
TPU framework's multi-chip BA (parallel/sharded_ba.py) reduces per-device
normal-equation blocks across the `dp` mesh axis; by default that is
`lax.psum` (XLA's fused ICI collective). This module provides the same
reduction as a hand-written Pallas kernel — a unidirectional ring
reduce-scatter + all-gather over `make_async_remote_copy` RDMA — the
building block XLA cannot express for us once the reduction needs to be
fused with compute, prioritized against other traffic, or carried over
DCN-spanning pod slices with custom scheduling.

Algorithm (bandwidth-optimal, 2(n-1) hops of R/n rows each):
  * reduce-scatter: at step s, device d sends its running sum of chunk
    (d - s) mod n to d+1 and folds the incoming chunk (d - s - 1) mod n;
    after n-1 steps device d owns the fully-reduced chunk (d + 1) mod n.
  * all-gather: the owned chunks circulate n-1 more hops.

Flow control: a two-slot VMEM mailbox per device; a credit semaphore
(signaled to the LEFT neighbor after each consume) keeps a sender from
overwriting a slot its receiver has not folded yet; a neighbor barrier
(`get_barrier_semaphore`) opens the ring. The kernel runs under
`shard_map`; on non-TPU backends it executes in the Pallas TPU interpreter
(`pltpu.InterpretParams(detect_races=True)`), which is how the test suite
validates it race-free on the 8-device virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_kernel(axis_name: str, mesh_axes: tuple[tuple[str, int], ...],
                 x_ref, out_ref, comm_ref, send_sem, recv_sem, credit_sem):
    """All-reduce x_ref (n*Rc, 128) into out_ref along `axis_name`.

    mesh_axes: (name, size) for every mesh axis in order, used to linearize
    logical device ids (RDMA device_id is the position in the mesh's device
    list; the ring moves along `axis_name` with the other axes fixed).
    """
    n = jax.lax.axis_size(axis_name)
    Rc = comm_ref.shape[1]

    # linearized logical ids of the left/right ring neighbors
    stride, ring_stride = 1, 1
    lin = jnp.int32(0)
    for name, size in reversed(mesh_axes):
        idx = jax.lax.axis_index(name)
        if name == axis_name:
            ring_stride = stride
            ring_idx = idx
        else:
            lin = lin + idx * stride
        stride *= size
    right = lin + jax.lax.rem(ring_idx + 1, n) * ring_stride
    left = lin + jax.lax.rem(ring_idx + n - 1, n) * ring_stride
    me = ring_idx

    out_ref[:] = x_ref[:]

    # neighbor barrier: nobody sends into a mailbox that is not ready
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    def chunk(owner):
        return pl.ds(owner * Rc, Rc)

    def hop(g, send_chunk, recv_chunk, reduce_phase):
        slot = jax.lax.rem(g, 2)

        # credit: our receiver must have folded what we put in this slot
        # two hops ago (it signals us after every fold)
        @pl.when(g >= 2)
        def _():
            pltpu.semaphore_wait(credit_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[chunk(send_chunk)],
            dst_ref=comm_ref.at[slot],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        incoming = comm_ref[slot]
        out_ref[chunk(recv_chunk)] = jax.lax.select(
            reduce_phase, out_ref[chunk(recv_chunk)] + incoming, incoming)
        pltpu.semaphore_signal(credit_sem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)

    def rs_step(s, _):
        hop(s, jax.lax.rem(me - s + 2 * n, n),
            jax.lax.rem(me - s - 1 + 2 * n, n), True)
        return _

    jax.lax.fori_loop(0, n - 1, rs_step, 0)

    def ag_step(s, _):
        hop(s + n - 1, jax.lax.rem(me + 1 - s + 2 * n, n),
            jax.lax.rem(me - s + 2 * n, n), False)
        return _

    jax.lax.fori_loop(0, n - 1, ag_step, 0)

    # drain the two credits granted by the receiver's final folds
    pltpu.semaphore_wait(credit_sem, 2)


def ring_all_reduce_flat(x: jax.Array, axis_name: str,
                         mesh_axes: tuple[tuple[str, int], ...],
                         interpret: bool = False,
                         collective_id: int = 1) -> jax.Array:
    """All-reduce a (R, 128) float array along a mesh axis. R must divide
    by 8 * axis_size (f32 sublane tiling per chunk). Call inside shard_map."""
    n = dict(mesh_axes)[axis_name]
    if n == 1:
        return x  # zero hops: the kernel's credit drain would hang
    R, C = x.shape
    assert C == 128 and R % (8 * n) == 0, (R, C, n)
    Rc = R // n
    kernel = functools.partial(_ring_kernel, axis_name, tuple(mesh_axes))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Rc, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=collective_id),
        interpret=(pltpu.InterpretParams(detect_races=True)
                   if interpret else False),
    )(x)


def ring_psum(tree, axis_name: str, mesh_axes, interpret: bool = False,
              collective_id: int = 1):
    """`lax.psum` drop-in for a pytree of float arrays: one fused ring
    all-reduce over the concatenated flattened leaves (one 2(n-1)-hop ring
    instead of one collective per tensor). Call inside shard_map.

    In interpret mode the payload is split into sub-128-row sequential rings:
    the Pallas TPU interpreter's buffer allocation deadlocks on multi-device
    meshes once a single kernel input exceeds ~96 KB per device (observed
    empirically, jax 0.9.0); real-TPU lowering is a single fused ring.
    """
    leaves, treedef = jax.tree.flatten(tree)
    n = dict(mesh_axes)[axis_name]
    if n == 1:
        return tree  # reduction over a singleton axis is the identity
    dtype = jnp.result_type(*leaves)
    sizes = [l.size for l in leaves]
    flat = jnp.concatenate([l.reshape(-1).astype(dtype) for l in leaves])
    row = 128 * 8 * n
    total = -(-flat.size // row) * row
    flat = jnp.concatenate(
        [flat, jnp.zeros((total - flat.size,), dtype)]).reshape(-1, 128)

    R = flat.shape[0]
    max_rows = R
    if interpret:
        max_rows = max((128 // (8 * n)) * 8 * n, 8 * n)
    if R <= max_rows:
        red = ring_all_reduce_flat(flat, axis_name, tuple(mesh_axes),
                                   interpret=interpret,
                                   collective_id=collective_id).reshape(-1)
    else:
        parts = []
        for off in range(0, R, max_rows):
            seg = flat[off:off + max_rows]
            if seg.shape[0] % (8 * n):
                seg = jnp.concatenate([seg, jnp.zeros(
                    (8 * n - seg.shape[0] % (8 * n), 128), dtype)])
            parts.append(ring_all_reduce_flat(
                seg, axis_name, tuple(mesh_axes), interpret=interpret,
                collective_id=collective_id)[:min(max_rows, R - off)])
        red = jnp.concatenate(parts).reshape(-1)

    out, off = [], 0
    for leaf, size in zip(leaves, sizes):
        out.append(jax.lax.dynamic_slice_in_dim(red, off, size, 0)
                   .reshape(leaf.shape).astype(leaf.dtype))
        off += size
    return jax.tree.unflatten(treedef, out)
