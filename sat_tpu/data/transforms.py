"""On-device augmentation pipeline as one jitted XLA program.

Replaces the reference's CPU torchvision transform stacks (reference:
train.py:208-233) with a TPU-native design: ALL geometric augmentations
(random-resized-crop, hflip, perspective/affine/rotation) compose into a
single per-sample 3x3 homography applied with ONE bilinear grid-sample —
one resampling pass instead of torchvision's chained interpolations, fully
batched, static shapes.  Color jitter + gaussian noise follow element-wise.

Knobs map 1:1 to the reference flags:
  aug_scale            -> RandomResizedCrop(scale=(aug_scale, 1.0)) (train.py:218)
  aug_hflip            -> RandomHorizontalFlip(p) (train.py:222)
  aug_color_jitter     -> ColorJitter(b=c=s=v, hue=0.03) (train.py:224)
  aug_optical_strength -> RandomChoice[Perspective(0.5*v) | Affine(45*v, shear 45*v)
                          | Rotation(45*v)] (train.py:226-231)
  aug_noise_std        -> AddGaussianNoise (train.py:232; util.py:121-130)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import SATConfig
from ..ops.image_ops import (adjust_brightness, adjust_contrast, adjust_hue,
                             adjust_saturation, affine_grid,
                             grid_sample_bilinear)


def _rrc_theta(rng: jax.Array, b: int, lo_scale: float) -> jax.Array:
    """RandomResizedCrop as a homography: area U(lo,1), log-uniform aspect in
    (3/4, 4/3), uniform position, clamped to fit (single draw, no retry loop)."""
    r_area, r_ratio, r_x, r_y = jax.random.split(rng, 4)
    area = jax.random.uniform(r_area, (b,), minval=lo_scale, maxval=1.0)
    log_ratio = jax.random.uniform(r_ratio, (b,), minval=jnp.log(3 / 4),
                                   maxval=jnp.log(4 / 3))
    ratio = jnp.exp(log_ratio)
    cw = jnp.minimum(jnp.sqrt(area * ratio), 1.0)   # crop width as fraction
    ch = jnp.minimum(jnp.sqrt(area / ratio), 1.0)
    # crop center in normalized [-1,1], constrained so the rect stays inside
    max_tx, max_ty = 1.0 - cw, 1.0 - ch
    tx = jax.random.uniform(r_x, (b,), minval=-1.0, maxval=1.0) * max_tx
    ty = jax.random.uniform(r_y, (b,), minval=-1.0, maxval=1.0) * max_ty
    zeros = jnp.zeros((b,))
    ones = jnp.ones((b,))
    return jnp.stack([
        jnp.stack([cw, zeros, tx], -1),
        jnp.stack([zeros, ch, ty], -1),
        jnp.stack([zeros, zeros, ones], -1)], axis=1)


def _rotation_theta(angle: jax.Array) -> jax.Array:
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    z, o = jnp.zeros_like(angle), jnp.ones_like(angle)
    return jnp.stack([
        jnp.stack([ca, -sa, z], -1),
        jnp.stack([sa, ca, z], -1),
        jnp.stack([z, z, o], -1)], axis=1)


def _affine_theta(rng: jax.Array, b: int, strength: float) -> jax.Array:
    """RandomAffine(degrees=45*s, shear=45*s): rotation composed with x-shear."""
    r1, r2 = jax.random.split(rng)
    max_rad = jnp.deg2rad(45.0 * strength)
    ang = jax.random.uniform(r1, (b,), minval=-max_rad, maxval=max_rad)
    shear = jnp.tan(jax.random.uniform(r2, (b,), minval=-max_rad, maxval=max_rad))
    rot = _rotation_theta(ang)
    z, o = jnp.zeros((b,)), jnp.ones((b,))
    sh = jnp.stack([
        jnp.stack([o, shear, z], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([z, z, o], -1)], axis=1)
    return jnp.einsum("bij,bjk->bik", rot, sh)


def _perspective_theta(rng: jax.Array, b: int, distortion: float) -> jax.Array:
    """RandomPerspective(distortion_scale): displace the 4 corners inward by
    U(0, d/2) per axis and solve the 8-DOF homography (batched 8x8 solve)."""
    corners_dst = jnp.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
    disp = jax.random.uniform(rng, (b, 4, 2), minval=0.0, maxval=distortion)
    # displace each corner towards the center (like torchvision's inward jitter)
    signs = -jnp.sign(corners_dst)[None]
    corners_src = corners_dst[None] + signs * disp

    def solve_h(dst, src):
        # find H with H @ [dst,1] ~ [src,1] (maps output coords -> input coords)
        rows = []
        for i in range(4):
            x, y = dst[i, 0], dst[i, 1]
            u, v = src[i, 0], src[i, 1]
            rows.append(jnp.array([x, y, 1, 0, 0, 0, 0, 0]) * 1.0
                        + jnp.concatenate([jnp.zeros(6), -u * jnp.array([x, y])]))
            rows.append(jnp.concatenate([jnp.zeros(3), jnp.array([x, y, 1]),
                                         -v * jnp.array([x, y])]))
        A = jnp.stack(rows)
        rhs = src.reshape(-1)
        h8 = jnp.linalg.solve(A, rhs)
        return jnp.concatenate([h8, jnp.ones(1)]).reshape(3, 3)

    return jax.vmap(solve_h)(jnp.broadcast_to(corners_dst, (b, 4, 2)), corners_src)


def build_train_augment(cfg: SATConfig) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Returns jittable augment(rng, images_uint8 (B,S,S,3)) -> float32 [0,1]+noise."""
    size = cfg.input_size

    def augment(rng: jax.Array, images: jax.Array) -> jax.Array:
        # bf16 end-to-end when the train step is bf16: uint8 values 0..255 are
        # exactly representable (8 mantissa bits), and every downstream pass
        # (resample matmuls, color tail, encoder) moves half the bytes
        dt = jnp.bfloat16 if cfg.precision == 16 else jnp.float32
        x = images.astype(dt) / jnp.asarray(255.0, dt)
        b = x.shape[0]
        (r_rrc, r_flip, r_cb, r_cc, r_cs, r_ch, r_opt, r_choice,
         r_noise) = jax.random.split(rng, 9)

        # ---- geometry ------------------------------------------------------
        use_optical = 0.0 < cfg.aug_optical_strength <= 1.0
        use_crop = cfg.aug_scale != 1.0
        # strict upper bound is reference-faithful: train.py:221-222 only adds
        # RandomHorizontalFlip when 0 < aug_hflip < 1.0 (p=1.0 -> no flip)
        use_flip = 0.0 < cfg.aug_hflip < 1.0
        if use_optical:
            # general warps: compose crop * flip * optical into one homography
            # and resample once (pointwise gathers — only paid when optical
            # augs are on; the reference default has them off)
            if use_crop:
                theta = _rrc_theta(r_rrc, b, cfg.aug_scale)
            else:
                theta = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
            if use_flip:
                flip = jax.random.bernoulli(r_flip, cfg.aug_hflip, (b,))
                fsign = jnp.where(flip, -1.0, 1.0)
                fmat = jnp.eye(3)[None] * jnp.stack(
                    [fsign, jnp.ones((b,)), jnp.ones((b,))], -1)[:, :, None]
                theta = jnp.einsum("bij,bjk->bik", theta, fmat)
            s = cfg.aug_optical_strength
            t_persp = _perspective_theta(r_opt, b, 0.5 * s)
            t_aff = _affine_theta(r_opt, b, s)
            t_rot = _rotation_theta(
                jax.random.uniform(r_opt, (b,), minval=-jnp.deg2rad(45 * s),
                                   maxval=jnp.deg2rad(45 * s)))
            choice = jax.random.randint(r_choice, (b,), 0, 3)
            t_opt = jnp.where((choice == 0)[:, None, None], t_persp,
                              jnp.where((choice == 1)[:, None, None], t_aff, t_rot))
            theta = jnp.einsum("bij,bjk->bik", theta, t_opt)
            gy, gx = affine_grid(theta, (size, size), (size, size))
            x = grid_sample_bilinear(x, gy, gx)
        else:
            # axis-aligned crop+flip: SEPARABLE resampling as two batched
            # matmuls on the MXU (bilinear weight matrices; the earlier
            # gather formulation was ~36% of the whole b256 train step —
            # see ops/image_ops.py::separable_resample_mxu).  bf16 multiplies
            # when the train step is bf16 anyway; fp32 otherwise.
            if use_crop:
                theta = _rrc_theta(r_rrc, b, cfg.aug_scale)
                cw, tx = theta[:, 0, 0], theta[:, 0, 2]
                ch, ty = theta[:, 1, 1], theta[:, 1, 2]
                centers = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2 - 1
                mx = cw[:, None] * centers[None, :] + tx[:, None]
                my = ch[:, None] * centers[None, :] + ty[:, None]
                px = (mx + 1.0) * 0.5 * size - 0.5
                py = (my + 1.0) * 0.5 * size - 0.5
                if use_flip:
                    # fold hflip into the column coords: mirroring the output
                    # == sampling the reversed coordinate row (bit-exact, and
                    # saves a full-image reverse + select after the resample)
                    flip = jax.random.bernoulli(r_flip, cfg.aug_hflip, (b,))
                    px = jnp.where(flip[:, None], px[:, ::-1], px)
                from ..ops.image_ops import separable_resample_mxu
                dt = jnp.bfloat16 if cfg.precision == 16 else jnp.float32
                x = separable_resample_mxu(x, py, px, compute_dtype=dt)
            elif use_flip:
                flip = jax.random.bernoulli(r_flip, cfg.aug_hflip, (b,))
                x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

        # ---- color jitter (fixed order b->c->s->h; torchvision randomizes order)
        if cfg.aug_color_jitter != 0 and cfg.aug_color_jitter <= 1.0:
            v = cfg.aug_color_jitter
            fb = jax.random.uniform(r_cb, (b,), minval=max(0, 1 - v), maxval=1 + v)
            fc = jax.random.uniform(r_cc, (b,), minval=max(0, 1 - v), maxval=1 + v)
            fs = jax.random.uniform(r_cs, (b,), minval=max(0, 1 - v), maxval=1 + v)
            fh = jax.random.uniform(r_ch, (b,), minval=-0.03, maxval=0.03)
            x = adjust_brightness(x, fb)
            x = adjust_contrast(x, fc)
            x = adjust_saturation(x, fs)
            x = adjust_hue(x, fh)

        # ---- gaussian input noise (util.py:121-130), drawn in x's dtype;
        # image-sized draw -> hardware RNG when cfg.fast_rng (3.3x threefry)
        if cfg.aug_noise_std > 0:
            from ..models.decoder import fast_key
            x = x + jax.random.normal(fast_key(r_noise, cfg.fast_rng), x.shape,
                                      x.dtype) * jnp.asarray(
                                          cfg.aug_noise_std, x.dtype)
        return x

    return augment


def val_preprocess(images: jax.Array) -> jax.Array:
    """uint8 -> float32 [0,1]; resize/crop already done host-side, normalize
    happens inside the model (reference: model.py:59)."""
    return images.astype(jnp.float32) / 255.0
