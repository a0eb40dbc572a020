"""Pipeline parallelism (GPipe) over a scanned-block tower.

Beyond the reference (DP-only NCCL training, SURVEY.md §2.6) and beyond the
repo's DP/TP/frame-sharding: stage-parallel execution of a stack of
identical blocks whose weights are STACKED on a leading layer axis — the
exact layout the vision tower's `lax.scan` already uses (models/vision.py),
so a tower pipelines without any per-layer module surgery.

TPU-native design:
  * stages = shards of the stacked weight pytree over a 'pipe' mesh axis
    (leading-axis reshape (L, ...) -> (S, L/S, ...), one `jax.device_put`);
  * the moving activation hops stages via `jax.lax.ppermute` over ICI —
    the only cross-chip traffic is one microbatch activation per step;
  * the schedule is a `lax.scan` of M + S - 1 SPMD steps (GPipe fill +
    drain; bubble fraction (S-1)/(M+S-1)); every stage runs its local
    `lax.scan` over L/S layers each step — one compiled block body, XLA
    pipelines weight prefetch exactly as in the sequential tower;
  * TRAINING pipelines too: the schedule being a scan (all ops transposable,
    incl. ppermute) makes pipeline_scan reverse-differentiable — jax.grad
    through it runs the GPipe backward (reverse ppermute hops, per-stage
    microbatch gradient accumulation) and matches the sequential tower's
    gradients (tests/test_pipeline.py);
  * outputs return stage-sharded (each stage contributes its own (M, b, ...)
    buffer under out_specs P('pipe'); only the last stage's slice is real) —
    no in-loop collectives at all.

For the ~150M-param CLIP towers, DP/TP is the right choice (weights fit on
one chip); pipeline parallelism is shipped for the regime where they don't,
and to complete the dp x tp x sp x pp sharding surface.
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def restage(stacked, n_stages: int):
    """Reshape every (L, ...) stacked leaf to (S, L/S, ...) with a clear
    error on uneven layer counts. Traceable (used inline under jit)."""
    def reshape(x):
        L = x.shape[0]
        if L % n_stages != 0:
            raise ValueError(
                f"stage_params: layer count {L} not divisible by "
                f"{n_stages} pipeline stages")
        return x.reshape(n_stages, L // n_stages, *x.shape[1:])

    return jax.tree_util.tree_map(reshape, stacked)


def stage_params(stacked, mesh: Mesh, axis: str = "pipe"):
    """Reshape every (L, ...) stacked leaf to (S, L/S, ...) and shard the
    leading stage axis over the mesh's `axis`. L must divide evenly."""
    return jax.device_put(restage(stacked, mesh.shape[axis]),
                          NamedSharding(mesh, P(axis)))


def pipeline_scan(block_fn: Callable, staged_params, x, mesh: Mesh,
                  axis: str = "pipe", microbatches: int = 1,
                  remat: bool = False):
    """Run `x` through the full layer stack with GPipe scheduling.

    block_fn(carry, layer_params) -> carry — the same body a sequential
    `lax.scan(body, x, stacked_params)` would use (carry may be a pytree;
    every leaf's leading dim is treated as the batch axis and must divide
    by `microbatches`).

    staged_params: output of stage_params() — (S, L/S, ...) leaves sharded
    over `axis`.

    remat: rematerialize the block body on the backward pass — each stage
    then stores only the per-microbatch stage INPUTS (the GPipe activation
    budget) instead of every layer's internals.

    Returns the carry after all L layers, numerically identical to the
    sequential scan (same per-layer order, same dtypes).
    """
    S = mesh.shape[axis]
    M = microbatches
    if remat:
        block_fn = jax.checkpoint(block_fn)

    def split(leaf):
        B = leaf.shape[0]
        if B % M != 0:
            raise ValueError(f"batch leaf {leaf.shape} not divisible by "
                             f"{M} microbatches")
        return leaf.reshape(M, B // M, *leaf.shape[1:])

    xs = jax.tree_util.tree_map(split, x)

    def per_stage(params_local, xs_rep):
        # shard_map delivers the sharded stage axis with local size 1
        params_local = jax.tree_util.tree_map(lambda p: p[0], params_local)
        stage = jax.lax.axis_index(axis)

        def run_local(h):
            def body(c, p):
                return block_fn(c, p), None
            out, _ = jax.lax.scan(body, h, params_local)
            return out

        def mb(t):
            """Microbatch t (clamped; garbage slots are never stored)."""
            tc = jnp.clip(t, 0, M - 1)
            return jax.tree_util.tree_map(
                lambda l: jax.lax.dynamic_index_in_dim(l, tc, 0,
                                                       keepdims=False),
                xs_rep)

        zero_mb = jax.tree_util.tree_map(jnp.zeros_like, mb(0))
        outs0 = jax.tree_util.tree_map(
            lambda l: jnp.zeros((M,) + l.shape, l.dtype), zero_mb)
        perm = [(i, i + 1) for i in range(S - 1)]

        def step(carry, t):
            cur, outs = carry
            # stage 0 ingests microbatch t; later stages consume what
            # ppermute delivered last step (stage 0's incoming is the
            # unpermuted-zeros fill, always overwritten)
            cur = jax.tree_util.tree_map(
                lambda c, i: jnp.where(stage == 0, i, c), cur, mb(t))
            y = run_local(cur)
            # the last stage emits microbatch t-(S-1) once the fill ends
            idx = t - (S - 1)
            valid = (stage == S - 1) & (idx >= 0)
            idxc = jnp.clip(idx, 0, M - 1)

            def emit(o, yy):
                prev = jax.lax.dynamic_index_in_dim(o, idxc, 0,
                                                    keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(valid, yy, prev), idxc, 0)

            outs = jax.tree_util.tree_map(emit, outs, y)
            nxt = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, perm), y)
            return (nxt, outs), None

        # lax.scan, NOT fori_loop: scan is reverse-differentiable, so
        # jax.grad through pipeline_scan yields the GPipe BACKWARD schedule
        # for free — the transpose of each forward ppermute(i -> i+1) hop is
        # the reverse ppermute(i+1 -> i) hop, the transpose of the stage-0
        # ingest select is the cotangent scatter back into the microbatch
        # buffer, and per-stage weight gradients accumulate across the
        # M + S - 1 transposed steps (GPipe microbatch grad accumulation).
        # Residuals: scan stores each step's saved values — the per-
        # microbatch stage activations GPipe holds by design.
        (_, outs), _ = jax.lax.scan(step, (zero_mb, outs0),
                                    jnp.arange(M + S - 1))
        # return stage-sharded: each stage contributes its own buffer; only
        # the last stage's is the real output (selected by the caller) —
        # avoids any end-of-pipe collective
        return jax.tree_util.tree_map(lambda o: o[None], outs)

    spec_p = jax.tree_util.tree_map(lambda _: P(axis), staged_params)
    spec_x = jax.tree_util.tree_map(lambda _: P(), xs)
    out_specs = jax.tree_util.tree_map(lambda _: P(axis), xs)
    outs = jax.shard_map(per_stage, mesh=mesh,
                         in_specs=(spec_p, spec_x),
                         out_specs=out_specs,
                         check_vma=False)(staged_params, xs)
    # (S, M, b, ...) -> last stage's (M, b, ...) -> (B, ...)
    return jax.tree_util.tree_map(
        lambda o: o[S - 1].reshape((-1,) + o.shape[3:]), outs)
