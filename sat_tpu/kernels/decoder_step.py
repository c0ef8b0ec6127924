"""Fused Pallas decoder-step kernel: attention + beta gate + LSTM cell +
deep-output projection in ONE kernel pass.

This is the TPU-native replacement for the reference's per-step module chain
(reference: model.py:298-327 / 526-548 — embedding -> SoftAttention -> beta ->
cuDNN LSTM -> DeepOutput as five separate CUDA launches).  The XLA fallback
path (models/decoder.py:decoder_step) is already fused per-op by XLA; this
kernel goes further by keeping EVERY intermediate (attention scores, alpha,
context, gates) in VMEM for the whole step — zero HBM round-trips between the
five stages.  The final vocab projection (E x V matmul) is deliberately left
to XLA: it is a single large MXU op that XLA schedules optimally, and keeping
it out of the kernel frees ~2-4 MB of VMEM for larger row tiles.

Scope: inference path (no dropout), single-layer LSTM (the reference default
used in all its experiments; multi-layer configs fall back to the jnp path).
Numerics: bf16/f32 inputs, f32 accumulation on the MXU, f32 softmax/LSTM state
math — validated bit-close against the jnp path in tests.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SATConfig


class FusedWeights(NamedTuple):
    """Decoder-step weights packed for the kernel (see pack_fused_weights)."""
    wd: jax.Array      # (H, A)   attention decoder projection
    wf: jax.Array      # (1, A)   attention scorer
    wb: jax.Array      # (H, D)   beta gate weight
    bb: jax.Array      # (1, D)   beta gate bias
    wie: jax.Array     # (E, 4H)  LSTM input weights, embed part
    wiz: jax.Array     # (D, 4H)  LSTM input weights, context part
    whh: jax.Array     # (H, 4H)  LSTM recurrent weights
    bias: jax.Array    # (1, 4H)  combined LSTM bias (b_ih + b_hh)
    wh: jax.Array      # (H, E)   deep-output hidden projection
    wc: jax.Array      # (D, E)   deep-output context projection (zeros if not deep)


def pack_fused_weights(params: Dict, cfg: SATConfig,
                       dtype=jnp.float32) -> FusedWeights:
    """Reshape decoder params into the kernel layout. Call once per decode."""
    assert cfg.decoder_layers == 1, "fused kernel supports decoder_layers=1"
    E, D = cfg.embed_dim, cfg.encoder_dim
    lstm = params["lstm"]["layer_0"]
    w_ih = lstm["w_ih"]                       # (E+D, 4H)
    if cfg.deep_output:
        wc = params["out_context"]["w"]
    else:
        wc = jnp.zeros((D, cfg.embed_dim), dtype)
    return FusedWeights(
        wd=params["att_dec"]["w"].astype(dtype),
        wf=params["f_att"]["w"].reshape(1, -1).astype(dtype),
        wb=params["beta"]["w"].astype(dtype),
        bb=params["beta"]["b"].reshape(1, -1).astype(dtype),
        wie=w_ih[:E].astype(dtype),
        wiz=w_ih[E:].astype(dtype),
        whh=lstm["w_hh"].astype(dtype),
        bias=(lstm["b_ih"] + lstm["b_hh"]).reshape(1, -1).astype(dtype),
        wh=params["out_hidden"]["w"].astype(dtype),
        wc=wc.astype(dtype),
    )


def _kernel(embed_ref, h_ref, c_ref, annot_ref, att_enc_ref,
            wd_ref, wf_ref, wb_ref, bb_ref, wie_ref, wiz_ref, whh_ref,
            bias_ref, wh_ref, wc_ref,
            t_out_ref, h_out_ref, c_out_ref, zt_out_ref, alpha_out_ref,
            *, deep_output: bool, inv_sqrt_l: float, hidden_dim: int):
    f32 = jnp.float32
    embed = embed_ref[:]                      # (T, E)
    h = h_ref[:]                              # (T, H)
    c = c_ref[:].astype(f32)                  # (T, H)
    annot = annot_ref[:]                      # (T, L, D)
    att_enc = att_enc_ref[:]                  # (T, L, A)

    # --- additive attention (model.py:94-109) ---------------------------
    att_dec = jnp.dot(h, wd_ref[:], preferred_element_type=f32)   # (T, A)
    s = jnp.tanh(att_enc.astype(f32) + att_dec[:, None, :])       # (T, L, A)
    att = jnp.sum(s * wf_ref[:].astype(f32)[None], axis=2)        # (T, L)
    att = att * inv_sqrt_l
    alpha = jax.nn.softmax(att, axis=-1)                          # (T, L) f32
    zt = jnp.sum(annot.astype(f32) * alpha[:, :, None], axis=1)   # (T, D)

    # --- beta gate (model.py:187-192) ------------------------------------
    beta = jax.nn.sigmoid(
        jnp.dot(h, wb_ref[:], preferred_element_type=f32) + bb_ref[:].astype(f32))
    xz = (beta * zt).astype(embed.dtype)                          # (T, D)

    # --- LSTM cell (torch gate order i,f,g,o) ----------------------------
    gates = (jnp.dot(embed, wie_ref[:], preferred_element_type=f32)
             + jnp.dot(xz, wiz_ref[:], preferred_element_type=f32)
             + jnp.dot(h, whh_ref[:], preferred_element_type=f32)
             + bias_ref[:].astype(f32))                           # (T, 4H)
    hd = hidden_dim
    i = jax.nn.sigmoid(gates[:, 0 * hd:1 * hd])
    f = jax.nn.sigmoid(gates[:, 1 * hd:2 * hd])
    g = jnp.tanh(gates[:, 2 * hd:3 * hd])
    o = jax.nn.sigmoid(gates[:, 3 * hd:4 * hd])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)                                   # (T, H) f32

    # --- deep output pre-projection (model.py:125-130) --------------------
    hproj = jnp.dot(h_new.astype(embed.dtype), wh_ref[:],
                    preferred_element_type=f32)
    if deep_output:
        t = jnp.tanh(embed.astype(f32) + hproj
                     + jnp.dot(zt.astype(embed.dtype), wc_ref[:],
                               preferred_element_type=f32))
    else:
        t = hproj

    dt = embed.dtype
    t_out_ref[:] = t.astype(dt)
    h_out_ref[:] = h_new.astype(dt)
    c_out_ref[:] = c_new.astype(dt)
    zt_out_ref[:] = zt.astype(dt)
    alpha_out_ref[:] = alpha.astype(f32)


def fused_step_supported(cfg: SATConfig) -> bool:
    return cfg.decoder_layers == 1


def fused_decoder_step(fw: FusedWeights, cfg: SATConfig, prev_embed: jax.Array,
                       h: jax.Array, c: jax.Array, annotations: jax.Array,
                       att_enc: jax.Array, tile_n: int = 0,
                       interpret: bool = None
                       ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One fused decode step (minus the vocab projection).

    prev_embed (N, E); h, c (N, H) single layer; annotations (N, L, D);
    att_enc (N, L, A).  Returns (t (N, E), h', c', zt, alpha) where
    ``logits = deep_output_final(t)`` is applied by the caller."""
    n, L, d = annotations.shape
    e, hd = prev_embed.shape[-1], h.shape[-1]
    a = att_enc.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # pallas CPU = interpreter
    if tile_n <= 0:
        # pick the largest row tile whose working set fits ~12MB of VMEM
        import numpy as np
        bytes_per = np.dtype(prev_embed.dtype).itemsize
        weight_bytes = sum(int(x.size) for x in fw) * bytes_per
        budget = 12 * 1024 * 1024 - weight_bytes
        per_row = (L * (d + a) + 2 * d + 4 * hd * 2 + e) * 4  # f32 intermediates
        tile_n = int(max(8, min(128, budget // max(per_row, 1))))
        tile_n = 1 << (tile_n.bit_length() - 1)  # floor to power of two
    # floor of 8 sublanes: 1-row tiles fail Mosaic relayout (see
    # greedy_loop.py); n < 8 pads up to one 8-row tile
    tile_n = min(tile_n, max(n, 8))
    pad = (-n) % tile_n
    if pad:
        z = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        prev_embed, h, c = z(prev_embed), z(h), z(c)
        annotations, att_enc = z(annotations), z(att_enc)
    n_pad = n + pad

    grid = (n_pad // tile_n,)
    row_spec = lambda *trail: pl.BlockSpec(
        (tile_n,) + trail, lambda i: (i,) + (0,) * len(trail),
        memory_space=pltpu.VMEM)
    w_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    dt = prev_embed.dtype
    kernel = functools.partial(_kernel, deep_output=bool(cfg.deep_output),
                               inv_sqrt_l=float(L) ** -0.5, hidden_dim=hd)
    t, h_new, c_new, zt, alpha = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(e), row_spec(hd), row_spec(hd),
                  row_spec(L, d), row_spec(L, a)] + [w_spec(x) for x in fw],
        out_specs=[row_spec(e), row_spec(hd), row_spec(hd), row_spec(d),
                   row_spec(L)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, e), dt),
                   jax.ShapeDtypeStruct((n_pad, hd), dt),
                   jax.ShapeDtypeStruct((n_pad, hd), dt),
                   jax.ShapeDtypeStruct((n_pad, d), dt),
                   jax.ShapeDtypeStruct((n_pad, L), jnp.float32)],
        interpret=interpret,
    )(prev_embed, h, c, annotations, att_enc, *fw)
    if pad:
        t, h_new, c_new = t[:n], h_new[:n], c_new[:n]
        zt, alpha = zt[:n], alpha[:n]
    return t, h_new, c_new, zt, alpha


def fused_output_logits(params: Dict, cfg: SATConfig, t: jax.Array) -> jax.Array:
    """The vocab projection left outside the kernel (one large MXU matmul)."""
    if cfg.weight_tying and cfg.deep_output:
        return jnp.dot(t, params["embedding"].T.astype(t.dtype),
                       preferred_element_type=jnp.float32)
    out = jnp.dot(t, params["out_proj"]["w"].astype(t.dtype),
                  preferred_element_type=jnp.float32)
    if "b" in params["out_proj"]:
        out = out + params["out_proj"]["b"]
    return out
