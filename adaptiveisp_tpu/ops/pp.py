"""Pipeline-parallel (pp) streaming ISP render over a (data x pipe) mesh.

An ISP is literally a pipeline, so pipeline parallelism is native here in a
way it never was in the reference (which has no PP anywhere, SURVEY.md
§2.5): stage i of a scripted filter chain (reference ``Filter.run``
composition, /root/reference/isp/filters.py:128-139) lives on
pipe-coordinate i, and a stream of frames flows through the device ring.
After the S-1-tick fill, all S stages run CONCURRENTLY on S consecutive
frames — per-chip stage work drops S-fold versus replaying the whole chain
on one chip, and activations move hop-by-hop over ICI via ``ppermute``
(the GPipe schedule, with the ISP frame as the uniform-shape microbatch
carry that CNN pipelining usually lacks).

Schedule (classic GPipe over a ring):

    tick t: every device applies ITS stage (``lax.switch`` on
            ``axis_index('pipe')``) to the frame it holds, then
            ``ppermute``s the result to its successor; device 0 injects
            fresh frame t, device S-1's outputs from ticks S-1..S-1+M-1
            are the finished frames.

The whole schedule is one ``lax.scan`` inside one ``shard_map`` — a single
XLA program, no host round-trips between ticks.  Results are numerically
identical to the sequential per-frame render (tests/test_ep_pp.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adaptiveisp_tpu.ops.bank import get_spec, render_fixed
from adaptiveisp_tpu.train.mesh import DATA_AXIS, PIPE_AXIS


def make_pipelined_render(cfg, mesh: Mesh, names: Sequence[str]):
    """Build the pipeline-parallel scripted renderer.

    names: the filter chain, one stage per 'pipe' device (len == mesh pipe
    size).  Returns a jitted ``fn(frames [M,n,H,W,3], params_list) ->
    [M,n,H,W,3]`` where ``params_list[i]`` is stage i's parameter vector
    ``[n_params]`` (per-stage constants, the scripted-pipeline contract)
    and the microbatch dim n is sharded over 'data'.
    """
    names = tuple(names)
    n_pipe = mesh.shape[PIPE_AXIS]
    if len(names) != n_pipe:
        raise ValueError(
            f"{len(names)} stages need a pipe axis of {len(names)}, "
            f"mesh has {n_pipe}")
    specs = [get_spec(cfg, n) for n in names]
    p_max = max(s.n_params for s in specs)

    branches = []
    for name, spec in zip(names, specs):
        def mk(name=name, spec=spec):
            def branch(img, p_pad):
                p = jnp.broadcast_to(p_pad[None, :spec.n_params],
                                     (img.shape[0], spec.n_params))
                return render_fixed(cfg, img, name, p)
            return branch
        branches.append(mk())

    perm = [(d, (d + 1) % n_pipe) for d in range(n_pipe)]

    def local(frames, params_pad):
        # frames [T, n, H, W, 3] (T = M + S - 1, zero-padded tail),
        # params_pad [1, Pmax] — this device's stage constants.
        i = jax.lax.axis_index(PIPE_AXIS)
        my_params = params_pad[0]

        def tick(recv, frame_t):
            inp = jnp.where(i == 0, frame_t, recv)
            out = jax.lax.switch(i, branches, inp, my_params)
            send = jax.lax.ppermute(out, PIPE_AXIS, perm)
            return send, out

        # the carry is device-varying over 'pipe' (each device holds a
        # different in-flight frame); mark the zero init accordingly
        init = jax.lax.pcast(jnp.zeros_like(frames[0]), (PIPE_AXIS,),
                             to="varying")
        _, ys = jax.lax.scan(tick, init, frames)
        # stacked over 'pipe' by out_specs; the caller keeps coordinate S-1
        return ys[None]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None, None, None),
                  P(PIPE_AXIS, None)),
        out_specs=P(PIPE_AXIS, None, DATA_AXIS, None, None, None))

    def fn(frames, params_list):
        m = frames.shape[0]
        pad = jnp.zeros((n_pipe - 1,) + frames.shape[1:], frames.dtype)
        stream = jnp.concatenate([frames, pad], axis=0)
        params_pad = jnp.stack(
            [jnp.pad(p, (0, p_max - s.n_params))
             for s, p in zip(specs, params_list)], axis=0)
        ys = sharded(stream, params_pad)  # [S, T, n, H, W, 3]
        # device S-1 finishes frame m at tick m + S - 1
        return jax.lax.dynamic_slice_in_dim(
            ys[n_pipe - 1], n_pipe - 1, m, axis=0)

    frames_sh = NamedSharding(mesh, P(None, DATA_AXIS, None, None, None))
    return jax.jit(fn, in_shardings=(frames_sh, None),
                   out_shardings=frames_sh)
