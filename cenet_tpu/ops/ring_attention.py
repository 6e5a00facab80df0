"""Ring attention: sequence/context-parallel exact attention over a mesh axis.

The sequence-parallel hook for >224² inputs (SURVEY §2.7 / VERDICT r3 #9). The
reference has no long-sequence story at all — its largest attention is 3136
tokens (56² DSEB1 / Nonlocal / PVT stage 1, ``dseb.py:114-118``,
``pvtv2.py:316-322``) and it manages cost only via spatial-reduction attention.
At higher resolutions (448² → 12544 tokens, 896² → 50k) the N² map no longer
fits one chip's HBM; this module shards the token dim over a ``'seq'`` mesh axis
and streams k/v blocks around the ICI ring with ``lax.ppermute``, combining
partial softmaxes with the standard online (max, sum, acc) rescaling — EXACT
fp32-softmax attention (same numerics as ``xla_attention_core`` up to fp
reassociation), memory O(N²/p) per device, and the rotation overlaps compute.

Routing: ``attn_impl='ring'`` (or ``'ring@seq'``) through
``nn.attention.get_attention_core``; requires a registered mesh
(``core.mesh.set_attention_mesh``) with a ``'seq'`` axis that divides the token
count, falling back to the naive core otherwise. Differentiable (ppermute's
transpose is ppermute with the inverse permutation — the backward pass rides the
same ring).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def ring_attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Per-device body (call inside shard_map over ``axis_name``).

    q: (B, H, Nl, D) local query block, pre-scaled; k: (B, H, Ml, D) and
    v: (B, H, Ml, Dv) local key/value blocks → (B, H, Nl, Dv).
    Streaming-softmax accumulation in fp32 while k/v rotate one hop per step.
    """
    p = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]

    m = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)  # running row max
    l = jnp.zeros(q.shape[:3], jnp.float32)  # running row sum
    acc = jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32)
    # mark the fresh accumulators as device-varying over the ring axis so the
    # scan carry types line up with the body outputs (jax 0.9 shard_map typing)
    m, l, acc = (jax.lax.pcast(a, (axis_name,), to="varying") for a in (m, l, acc))

    def body(carry, _):
        k_c, v_c, m, l, acc = carry
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k_c).astype(jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1))
        pm = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)  # exp(-inf - finite) = 0 on the first block
        l = l * corr + pm.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhnm,bhmd->bhnd", pm, v_c.astype(jnp.float32))
        # rotate k/v one hop around the ring (ICI neighbour exchange on TPU)
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        return (k_c, v_c, m_new, l, acc), None

    (_, _, m, l, acc), _ = jax.lax.scan(body, (k, v, m, l, acc), None, length=p)
    return (acc / l[..., None]).astype(q.dtype)


def make_ring_core(axis: str = "seq") -> Callable:
    """An attention core (q, k, v) → out with tokens sharded over ``axis``.

    Falls back to the naive XLA core when no mesh is registered, the axis is
    absent/size-1, or the token counts don't divide (self-attention only:
    q and k must carry the same token count to ride the same sharding)."""

    def wrapped(q, k, v):
        from cenet_tpu.core.mesh import get_attention_mesh
        from cenet_tpu.nn.attention import xla_attention_core

        mesh = get_attention_mesh()
        n, mtok = q.shape[2], k.shape[2]
        if (
            mesh is None
            or mesh.shape.get(axis, 1) <= 1
            or n != mtok
            or n % mesh.shape[axis]
        ):
            from cenet_tpu.ops.flash_attention import _SMALL_LIMIT, chunked_attention_core

            if q.shape[0] * q.shape[1] * n * mtok * 4 > _SMALL_LIMIT:
                # off-mesh fallback at ring-scale shapes (the whole point of the
                # ring is that the full map doesn't fit): query-block scan, same
                # numerics, O(N·chunk) memory instead of a materialized N² map
                return chunked_attention_core(q, k, v)
            return xla_attention_core(q, k, v)
        spec = P(None, None, axis, None)
        f = jax.shard_map(
            partial(ring_attention_core, axis_name=axis),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )
        return f(q, k, v)

    return wrapped
