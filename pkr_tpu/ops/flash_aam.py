"""Flash AAM-softmax loss: margin + online-softmax CE over class tiles.

Motivation: the reference's head materializes (B, n_spk) cosine logits, adds
the margin, and feeds CrossEntropyLoss (model.py:483-499 + train loop).  At
VoxCeleb scale (7.3k speakers) that is fine; at production speaker counts
(100k-1M) the logits tensor becomes the step's dominant HBM traffic
(B=1024 x 1M x 4B = 4 GB round-tripped three times: margin, softmax, grad).

This Pallas kernel streams class tiles through VMEM instead:
  forward: for each class tile, cos = ê @ ŵᵀ on the MXU, the ArcFace margin
  applied to the label column, and an online (flash-style) max/sum-exp
  update; only per-example (lse, z_target) leave the chip's VMEM.
  backward: recomputes each cosine tile, forms a = (softmax - onehot)·dz/dcos
  in VMEM, and accumulates d_ê (B, D) and the tile's d_W — the full logits
  and probability matrices never exist.

Margin semantics match pkr_tpu.ops.aam.aam_logits exactly (hard-margin
monotonicity guard, s scale, sin clipped away from 0 so the where never
leaks NaN gradients).  Gradients flow through both L2 normalizations.

Tested value+grad against the reference jax implementation (interpret mode
on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 2048
_NEG_INF = -1e30


def _margin_consts(m: float):
    return (math.cos(m), math.sin(m), math.cos(math.pi - m),
            math.sin(math.pi - m) * m)


def _normalize(x, eps=1e-12):
    norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    return x / norm, norm


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(labels_ref, e_ref, w_ref, lse_ref, zy_ref,
                m_scr, s_scr, zy_scr, *, n_classes, tile, m, s):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)
        zy_scr[:] = jnp.zeros_like(zy_scr)

    w = w_ref[:].astype(jnp.float32)  # (tile, D)
    wnorm = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=1, keepdims=True), 1e-24))
    w_hat = w / wnorm
    cos = jnp.dot(e_ref[:].astype(jnp.float32), w_hat.T,
                  preferred_element_type=jnp.float32)  # (B, tile)

    cos_m, sin_m, th, mm = _margin_consts(m)
    sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 1e-12, 1.0))
    phi = cos * cos_m - sin * sin_m
    phi = jnp.where(cos - th > 0, phi, cos - mm)

    col = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1) + j * tile
    is_tgt = col == labels_ref[:]  # labels (B, 1) broadcasts
    valid = col < n_classes
    z = jnp.where(is_tgt, phi, cos) * s
    z = jnp.where(valid, z, _NEG_INF)

    # online softmax update
    m_old = m_scr[:]  # (B, 1)
    m_new = jnp.maximum(m_old, jnp.max(z, axis=1, keepdims=True))
    s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(z - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new
    zy_scr[:] = zy_scr[:] + jnp.sum(jnp.where(is_tgt, z, 0.0), axis=1,
                                    keepdims=True)

    @pl.when(j == nj - 1)
    def _finish():
        lse_ref[:] = (m_scr[:] + jnp.log(s_scr[:])) * jnp.ones_like(lse_ref)
        zy_ref[:] = zy_scr[:] * jnp.ones_like(zy_ref)


def _adapt_tile(tile, B, C):
    """Cap the class tile so the (B, tile) f32 working set (cos/p/a plus the
    (tile, D) weight blocks, double-buffered) stays inside ~16 MB of VMEM."""
    cap = max(128, (1 << 18) // max(B, 1) * 128 // 128)
    cap = max(128, min(tile, cap, -(-C // 128) * 128))
    return cap


def _fwd_pallas(e_hat, weight, labels, m, s, tile, interpret):
    B, D = e_hat.shape
    C = weight.shape[0]
    tile = _adapt_tile(tile, B, C)
    c_pad = -(-C // tile) * tile
    if c_pad != C:
        weight = jnp.pad(weight, ((0, c_pad - C), (0, 0)), constant_values=1.0)
    grid = (c_pad // tile,)
    labels2 = labels.astype(jnp.int32)[:, None]
    kernel = functools.partial(_fwd_kernel, n_classes=C, tile=tile, m=m, s=s)
    lse, zy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(labels2, e_hat, weight)
    return lse[:, 0], zy[:, 0]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(labels_ref, e_ref, w_ref, lse_ref, g_ref,
                de_ref, dw_ref, de_scr, *, n_classes, tile, m, s):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        de_scr[:] = jnp.zeros_like(de_scr)

    w = w_ref[:].astype(jnp.float32)
    wnorm = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=1, keepdims=True), 1e-24))
    w_hat = w / wnorm
    e = e_ref[:].astype(jnp.float32)
    cos = jnp.dot(e, w_hat.T, preferred_element_type=jnp.float32)

    cos_m, sin_m, th, mm = _margin_consts(m)
    sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 1e-12, 1.0))
    phi = cos * cos_m - sin * sin_m
    in_phi = cos - th > 0
    phi = jnp.where(in_phi, phi, cos - mm)

    col = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1) + j * tile
    is_tgt = col == labels_ref[:]
    valid = col < n_classes
    z = jnp.where(is_tgt, phi, cos) * s
    p = jnp.where(valid, jnp.exp(z - lse_ref[:, 0:1]), 0.0)

    # dz/dcos: s off-target; s*phi' on target (phi' = cos_m + sin_m*cos/sin
    # inside the margin branch, 1 outside)
    dphi = jnp.where(in_phi, cos_m + sin_m * cos / sin, 1.0)
    dz = jnp.where(is_tgt, s * dphi, s)
    a = (p - is_tgt.astype(jnp.float32)) * dz * g_ref[:]  # (B, tile)
    a = jnp.where(valid, a, 0.0)

    de_scr[:] = de_scr[:] + jnp.dot(a, w_hat, preferred_element_type=jnp.float32)

    # d_w tile: unproject through the row normalization
    dw_hat = jnp.dot(a.T, e, preferred_element_type=jnp.float32)  # (tile, D)
    proj = jnp.sum(dw_hat * w_hat, axis=1, keepdims=True)
    dw_ref[:] = (dw_hat - proj * w_hat) / wnorm

    @pl.when(j == nj - 1)
    def _finish():
        de_ref[:] = de_scr[:]


def _bwd_pallas(e_hat, weight, labels, lse, g_per_example, m, s, tile, interpret):
    B, D = e_hat.shape
    C = weight.shape[0]
    tile = _adapt_tile(tile, B, C) // 2 if _adapt_tile(tile, B, C) > 128 else 128
    c_pad = -(-C // tile) * tile
    if c_pad != C:
        weight = jnp.pad(weight, ((0, c_pad - C), (0, 0)), constant_values=1.0)
    grid = (c_pad // tile,)
    labels2 = labels.astype(jnp.int32)[:, None]
    lse2 = lse[:, None] * jnp.ones((1, 128), jnp.float32)
    g2 = g_per_example[:, None]
    kernel = functools.partial(_bwd_kernel, n_classes=C, tile=tile, m=m, s=s)
    de, dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(labels2, e_hat, weight, lse2, g2)
    return de, dw[:C]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_aam_loss(emb: jnp.ndarray, weight: jnp.ndarray, labels: jnp.ndarray,
                   m: float = 0.2, s: float = 30.0, tile: int = DEFAULT_TILE,
                   interpret: bool = False) -> jnp.ndarray:
    """Mean ArcFace cross-entropy over the batch without materializing
    (B, n_classes) logits.  emb (B, D) f32, weight (n_classes, D) f32."""
    loss, _ = _flash_fwd(emb, weight, labels, m, s, tile, interpret)
    return loss


def _flash_fwd(emb, weight, labels, m, s, tile, interpret):
    e_hat, e_norm = _normalize(emb.astype(jnp.float32))
    lse, zy = _fwd_pallas(e_hat, weight.astype(jnp.float32), labels, m, s,
                          tile, interpret)
    loss = jnp.mean(lse - zy)
    return loss, (e_hat, e_norm, weight, labels, lse)


def _flash_bwd(m, s, tile, interpret, residuals, gloss):
    e_hat, e_norm, weight, labels, lse = residuals
    B = e_hat.shape[0]
    g = jnp.full((B,), gloss / B, jnp.float32)
    de_hat, dw = _bwd_pallas(e_hat, weight.astype(jnp.float32), labels, lse,
                             g, m, s, tile, interpret)
    # unproject d_ê through the embedding normalization
    proj = jnp.sum(de_hat * e_hat, axis=1, keepdims=True)
    de = (de_hat - proj * e_hat) / e_norm
    return de.astype(jnp.float32), dw, None


flash_aam_loss.defvjp(_flash_fwd, _flash_bwd)


def reference_aam_loss(emb, weight, labels, m=0.2, s=30.0):
    """Dense reference (ops.aam path + CE) for parity tests."""
    from pkr_tpu.ops.aam import aam_logits

    logits = aam_logits(emb, weight, labels, m, s)
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def flash_aam_loss_sharded(emb, weight, labels, mesh, m: float = 0.2,
                           s: float = 30.0, tile: int = DEFAULT_TILE,
                           interpret: bool = False):
    """Data-parallel flash loss under an explicit shard_map.

    A pallas_call is a single-device program — under pjit with a sharded
    batch XLA cannot partition the custom call, so the multi-chip path wraps
    the kernel per-device: each data shard computes its local mean loss over
    the (replicated) class weight and the global loss is the pmean.  Batch
    must divide the mesh's 'data' axis.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("data", None), P(None, None), P("data")),
                       out_specs=P(), check_rep=False)
    def local(e, w, y):
        loss = flash_aam_loss(e, w, y, m, s, tile, interpret)
        return jax.lax.pmean(loss, "data")

    return local(emb, weight, labels)
