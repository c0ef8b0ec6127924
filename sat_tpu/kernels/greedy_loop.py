"""Whole-decode-loop Pallas kernel: ALL greedy timesteps inside one kernel.

Microbenchmarks (see git history) show the XLA scan path's decode time is
dominated not by FLOPs but by HBM traffic that repeats every timestep: the
(B, L, D) annotations re-stream through the zt contraction each step, and
every weight matrix re-loads per step.  This kernel runs the ENTIRE decode
loop per batch tile with annotations, attention projections, and every weight
(including the embedding table and vocab projection) resident in VMEM —
after the initial tile load there is ZERO HBM traffic until the final token
writes.  Token feedback uses a one-hot MXU lookup (ids -> one-hot @ E), so
the in-kernel loop has no gathers.

Semantics match decode/beam.py:greedy_decode exactly (same masking, scoring,
finish bookkeeping; reference: model.py:330-340 for the masks).  Single-layer
LSTM; falls back to the scan path when the working set exceeds VMEM.

Measured on a real v5e (encoder_dim=256, B=512, bf16): the XLA scan path runs
this decode at 0.92 ms/batch vs 1.18 ms for this kernel — XLA's automatic
fusion is already near-optimal for these shapes, and Mosaic's codegen for the
L=49 softmax/reduce patterns trails it.  The kernel is kept as a validated
native-path option (and the harness for future per-arch tuning), but the
default decode path is the XLA scan.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SATConfig
from .decoder_step import FusedWeights, pack_fused_weights

NEG_INF = -1e9


def _loop_kernel(annot_ref, att_enc_ref, h0_ref, c0_ref,
                 wd_ref, wf_ref, wb_ref, bb_ref, wie_ref, wiz_ref, whh_ref,
                 bias_ref, wh_ref, wc_ref, emb_ref, wout_ref, bout_ref,
                 mask_ref, mask0_ref,
                 tokens_ref, alphas_ref, scores_ref, flen_ref, fin_ref,
                 h_scr, c_scr,
                 *, steps: int, deep_output: bool, inv_sqrt_l: float,
                 hidden_dim: int, temperature: float,
                 start_i: int, end_i: int, pad_i: int):
    # All loop state lives in VMEM refs (outputs + scratch); the fori_loop
    # carries only the trip counter — large scf.for carries don't legalize.
    f32 = jnp.float32
    annot = annot_ref[:].astype(f32)          # (T, L, D)
    att_enc = att_enc_ref[:].astype(f32)      # (T, L, A)
    tb = annot.shape[0]
    v = emb_ref.shape[0]
    dt = h0_ref.dtype

    vocab_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, v), 1)

    h_scr[:] = h0_ref[:]
    c_scr[:] = c0_ref[:].astype(f32)
    scores_ref[:] = jnp.zeros((tb, 1), f32)
    flen_ref[:] = jnp.zeros((tb, 1), jnp.int32)
    fin_ref[:] = jnp.zeros((tb, 1), jnp.int32)
    tokens_ref[0, pl.ds(0, 1), :] = jnp.full((1, tb), start_i, jnp.int32)

    def body(t, _):
        prev = tokens_ref[0, pl.ds(t, 1), :].reshape(tb, 1)       # (T, 1)
        h = h_scr[:]
        c = c_scr[:]
        finished = fin_ref[:] > 0                                 # (T, 1)
        scores = scores_ref[:]
        flen = flen_ref[:]

        # embedding lookup as one-hot matmul (no gathers in-kernel)
        onehot = (vocab_iota == prev).astype(dt)                  # (T, V)
        embed = jnp.dot(onehot, emb_ref[:], preferred_element_type=f32)

        att_dec = jnp.dot(h, wd_ref[:], preferred_element_type=f32)
        s = jnp.tanh(att_enc + att_dec[:, None, :])
        att = jnp.sum(s * wf_ref[:].astype(f32)[None], axis=2) * inv_sqrt_l
        alpha = jax.nn.softmax(att, axis=-1)                      # (T, L)
        zt = jnp.sum(annot * alpha[:, :, None], axis=1)           # (T, D)

        beta = jax.nn.sigmoid(
            jnp.dot(h, wb_ref[:], preferred_element_type=f32)
            + bb_ref[:].astype(f32))
        xz = (beta * zt).astype(dt)

        gates = (jnp.dot(embed.astype(dt), wie_ref[:], preferred_element_type=f32)
                 + jnp.dot(xz, wiz_ref[:], preferred_element_type=f32)
                 + jnp.dot(h, whh_ref[:], preferred_element_type=f32)
                 + bias_ref[:].astype(f32))
        hd = hidden_dim
        ig = jax.nn.sigmoid(gates[:, 0 * hd:1 * hd])
        fg = jax.nn.sigmoid(gates[:, 1 * hd:2 * hd])
        gg = jnp.tanh(gates[:, 2 * hd:3 * hd])
        og = jax.nn.sigmoid(gates[:, 3 * hd:4 * hd])
        c_new = fg * c + ig * gg
        h_new = og * jnp.tanh(c_new)

        hproj = jnp.dot(h_new.astype(dt), wh_ref[:], preferred_element_type=f32)
        if deep_output:
            tproj = jnp.tanh(embed + hproj
                             + jnp.dot(zt.astype(dt), wc_ref[:],
                                       preferred_element_type=f32))
        else:
            tproj = hproj
        logits = (jnp.dot(tproj.astype(dt), wout_ref[:],
                          preferred_element_type=f32)
                  + bout_ref[:].astype(f32))                      # (T, V)

        scaled = logits / temperature
        mask = jnp.where(t == 0, mask0_ref[:], mask_ref[:]).astype(f32)
        sel = scaled + mask
        token = jnp.argmax(sel, axis=-1)[:, None].astype(jnp.int32)  # (T, 1)
        smax = jnp.max(scaled, axis=-1, keepdims=True)
        tok_logp = (jnp.max(jnp.where(vocab_iota == token, scaled, NEG_INF),
                            axis=-1, keepdims=True)
                    - (jnp.log(jnp.sum(jnp.exp(scaled - smax), axis=-1,
                                       keepdims=True)) + smax))

        token = jnp.where(finished, pad_i, token)
        newly = jnp.logical_and(jnp.logical_not(finished), token == end_i)

        tokens_ref[0, pl.ds(t + 1, 1), :] = token.reshape(1, tb)
        alphas_ref[0, pl.ds(t, 1), :, :] = alpha[None].astype(f32)
        scores_ref[:] = jnp.where(finished, scores, scores + tok_logp)
        flen_ref[:] = jnp.where(newly, t, flen)
        fin_ref[:] = jnp.logical_or(finished, newly).astype(jnp.int32)
        h_scr[:] = h_new.astype(dt)
        c_scr[:] = c_new
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


def greedy_loop_vmem_bytes(cfg: SATConfig, L: int, tile_b: int,
                           itemsize: int = 2) -> int:
    e, d, a, h, v = (cfg.embed_dim, cfg.encoder_dim, cfg.attention_dim,
                     cfg.decoder_dim, cfg.vocab_size)
    weights = (h * a + a + h * d + d + e * 4 * h + d * 4 * h + h * 4 * h
               + 4 * h + h * e + d * e + v * e + e * v + v + 2 * v)
    tile = tile_b * (L * d + L * a) * 4 + tile_b * (2 * h + e + 2 * v) * 4
    return weights * itemsize + tile


def greedy_loop_supported(cfg: SATConfig, L: int,
                          min_tile: int = 8) -> bool:
    if cfg.decoder_layers != 1:
        return False
    return greedy_loop_vmem_bytes(cfg, L, min_tile) < 13 * 1024 * 1024


def greedy_loop_decode(params: Dict, cfg: SATConfig, annotations: jax.Array,
                       att_enc: jax.Array, h0: jax.Array, c0: jax.Array,
                       *, max_gen_length: int, temperature: float = 1.0,
                       tile_b: int = 0, interpret: bool = None):
    """Run the whole greedy loop in-kernel.

    annotations (B, L, D); att_enc (B, L, A); h0/c0 (B, H) single layer.
    Returns (tokens (B, S+2) i32, alphas (B, S+1, L) f32, scores (B,) f32,
    flen (B,) i32, finished (B,) bool)."""
    b, L, d = annotations.shape
    S = max_gen_length
    v, e, hd = cfg.vocab_size, cfg.embed_dim, cfg.decoder_dim
    vocab = cfg.vocab_stoi
    pad_i, unk_i = int(vocab["<PAD>"]), int(vocab["<UNK>"])
    start_i, end_i = int(vocab["<START>"]), int(vocab["<END>"])
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    dt = annotations.dtype
    fw = pack_fused_weights(params, cfg, dtype=dt)
    emb = params["embedding"].astype(dt)
    if cfg.weight_tying and cfg.deep_output:
        wout = params["embedding"].T.astype(dt)
        bout = jnp.zeros((1, v), jnp.float32)
    else:
        wout = params["out_proj"]["w"].astype(dt)
        bout = (params["out_proj"]["b"].reshape(1, v).astype(jnp.float32)
                if "b" in params["out_proj"] else jnp.zeros((1, v), jnp.float32))
    mask = jnp.zeros((1, v), jnp.float32) \
        .at[0, jnp.array([start_i, pad_i])].set(NEG_INF)
    mask0 = mask.at[0, jnp.array([end_i, unk_i])].set(NEG_INF)

    if tile_b <= 0:
        tile_b = 8
        while (tile_b < 128 and tile_b * 2 <= b
               and greedy_loop_vmem_bytes(cfg, L, tile_b * 2,
                                          np.dtype(dt).itemsize)
               < 13 * 1024 * 1024):
            tile_b *= 2
    # never drop below 8 sublanes: a tile of 1 row makes Mosaic's relayout of
    # the (tile, L) softmax vectors fail ("non-singleton logical dimension is
    # replicated in destination but not in source"); b < 8 pads UP to one
    # 8-row tile instead
    tile_b = min(tile_b, max(b, 8))
    pad = (-b) % tile_b
    if pad:
        z = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        annotations, att_enc = z(annotations), z(att_enc)
        h0, c0 = z(h0), z(c0)
    bp = b + pad
    grid = (bp // tile_b,)

    row = lambda *trail: pl.BlockSpec((tile_b,) + trail,
                                      lambda i: (i,) + (0,) * len(trail),
                                      memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                     memory_space=pltpu.VMEM)
    # time-major outputs with a leading grid dim so the trailing block dims
    # equal the array dims (Mosaic's lane/sublane divisibility rule)
    n_tiles = bp // tile_b
    tokens_spec = pl.BlockSpec((1, S + 2, tile_b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    alphas_spec = pl.BlockSpec((1, S + 1, tile_b, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)

    consts = list(fw) + [emb, wout, bout, mask, mask0]
    kernel = functools.partial(
        _loop_kernel, steps=S + 1, deep_output=bool(cfg.deep_output),
        inv_sqrt_l=float(L) ** -0.5, hidden_dim=hd,
        temperature=float(temperature), start_i=start_i, end_i=end_i,
        pad_i=pad_i)
    tokens, alphas, scores, flen, fin = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row(L, d), row(L, att_enc.shape[-1]), row(hd), row(hd)]
                 + [const(x) for x in consts],
        out_specs=[tokens_spec, alphas_spec, row(1), row(1), row(1)],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, S + 2, tile_b), jnp.int32),
                   jax.ShapeDtypeStruct((n_tiles, S + 1, tile_b, L),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((bp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((bp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((bp, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((tile_b, hd), dt),
                        pltpu.VMEM((tile_b, hd), jnp.float32)],
        interpret=interpret,
    )(annotations, att_enc, h0, c0, *consts)
    # (G, S+2, T) -> (B, S+2); (G, S+1, T, L) -> (B, S+1, L)
    tokens = jnp.moveaxis(tokens, 2, 1).reshape(bp, S + 2)[:b]
    alphas = jnp.moveaxis(alphas, 2, 1).reshape(bp, S + 1, L)[:b]
    return (tokens, alphas, scores[:b, 0], flen[:b, 0],
            fin[:b, 0].astype(bool))
