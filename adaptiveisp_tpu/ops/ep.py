"""Expert-parallel (ep) candidate rendering over a (data x expert) mesh.

The policy always evaluates ALL K filter branches on the input and blends
them by a one-hot action (reference /root/reference/agent.py:103-116, 154)
— structurally a mixture-of-experts where every expert is dense.  On a
single chip that is K sequential renders; here the K branches are spread
over the 'expert' mesh axis: each chip renders only K/E candidates,
weights them by its slice of the one-hot, and a ``psum`` over 'expert'
completes the blend.  Per-chip filter FLOPs drop K/E-fold — the ep axis of
the dp/tp/pp/sp/ep taxonomy, applied where it is native to this workload.

Mechanics: the K filters have heterogeneous parameter vectors, so the
per-filter params are zero-padded to the widest and stacked to [K, N, Pmax]
(sharded [expert, data, -]); inside the shard each local slot j recovers
its GLOBAL filter index as ``axis_index('expert') * K_local + j`` and
dispatches through ``lax.switch`` over the full branch table — compiled
once, executing exactly one branch per slot at runtime.

Result is numerically identical to :func:`adaptiveisp_tpu.ops.bank.
render_blend` (tests/test_ep_pp.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adaptiveisp_tpu.ops.bank import apply_one, filter_specs
from adaptiveisp_tpu.train.mesh import DATA_AXIS, EXPERT_AXIS


def pad_stack_params(specs, params_list: Sequence) -> jnp.ndarray:
    """[K, N, Pmax]: per-filter param rows zero-padded to the widest."""
    p_max = max(s.n_params for s in specs)
    rows = []
    for spec, p in zip(specs, params_list):
        rows.append(jnp.pad(p, ((0, 0), (0, p_max - spec.n_params))))
    return jnp.stack(rows, axis=0)


def make_ep_blend_render(cfg, mesh: Mesh):
    """Build the expert-parallel one-hot blend renderer.

    Returns a jitted ``fn(img [N,H,W,3], params_list, onehot [N,K]) ->
    [N,H,W,3]`` with the batch sharded over 'data', the K filter branches
    over 'expert', and the output batch-sharded (replicated over 'expert').
    Requires ``cfg.n_filters % mesh.shape['expert'] == 0``.
    """
    if cfg.masking:
        raise ValueError("ep render does not carry per-filter mask params; "
                         "disable cfg.masking (the default)")
    specs = filter_specs(cfg)
    n_filters = len(specs)
    n_expert = mesh.shape[EXPERT_AXIS]
    if n_filters % n_expert != 0:
        raise ValueError(
            f"{n_filters} filters do not tile over {n_expert} experts")
    k_local = n_filters // n_expert

    branches = []
    for spec in specs:
        def mk(spec=spec):
            def branch(img, p_pad):
                return apply_one(cfg, spec, img, p_pad[:, :spec.n_params])
            return branch
        branches.append(mk())

    def local(img, params_pad, onehot):
        # img [n,H,W,3]; params_pad [k_local, n, Pmax]; onehot [n, k_local]
        e = jax.lax.axis_index(EXPERT_AXIS)
        out = jnp.zeros_like(img)
        for j in range(k_local):
            gk = e * k_local + j
            cand = jax.lax.switch(gk, branches, img, params_pad[j])
            out = out + cand * onehot[:, j, None, None, None]
        return jax.lax.psum(out, EXPERT_AXIS)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None, None),
                  P(EXPERT_AXIS, DATA_AXIS, None),
                  P(DATA_AXIS, EXPERT_AXIS)),
        out_specs=P(DATA_AXIS, None, None, None))

    img_sh = NamedSharding(mesh, P(DATA_AXIS, None, None, None))

    def fn(img, params_list, onehot):
        params_pad = pad_stack_params(specs, params_list)
        return sharded(img, params_pad, onehot)

    return jax.jit(fn, in_shardings=(img_sh, None, None),
                   out_shardings=img_sh)
