"""Fused on-device train-time 3D augmentations.

Parity target: ``augment_tensors`` + the ten tensor transforms
(reference: tf2.5/scripts/model/augmentations.py:36-378). The reference runs
these per-sample inside tf.data CPU workers; here the WHOLE pipeline is one
jit-compiled, vmapped, device-resident function — geometric warps become
static-shape bilinear gathers with traced coordinates (no dynamic
resize-then-crop), so XLA fuses the entire augmentation into a handful of
kernels that run on the TPU between host load and the train step.

Semantics preserved exactly (shared-draw label consistency contract,
augmentations.py:114-120):

  * master gate: apply anything iff U() > 1 - prob                  (:51)
  * per-transform gates: apply iff U() > tx_prob                    (:59-111)
  * zoom      — upscale to a random size in [H, ceil(H*zoom)) then take the
                BOTTOM-RIGHT HxW crop (:139-152 — offset scale-H, scale-W)
  * hflip     — axial left-right flip with p=0.5                    (:156-163)
  * rotate    — symmetric-pad + bilinear rotate + central crop
                == direct inverse-rotation sampling about the in-plane center
                with SYMMETRIC boundary reflection                  (:219-236)
  * translate — symmetric-pad + crop == integer shift by
                (pad_bottom - pad_top, pad_right - pad_left) with
                SYMMETRIC reflection                                (:167-181)
  * channel-shift — the same shift on ONE random MRI channel (sim.
                inter-sequence registration error; labels untouched) (:185-215)
  * gamma     — per-channel coin; min-max -> pow(gamma) -> restore the
                original mean/std                                    (:275-310)
  * poor-scan — per-channel coin; bilinear down to int(0.75*H) square then
                nearest back up (the reference uses shape[1] for BOTH output
                dims — reproduced)                                   (:240-271)
  * noise     — additive N(0, U(0,stddev)) on image channels only    (:314-326)

Geometric draws are shared between image and label; intensity transforms
never touch labels. Gates are evaluated with ``jnp.where`` over both branches
— branch compute is trivially cheap next to the conv stack and this keeps a
single fused program with no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ops.resample import (
    _reflect_index,
    resize_bilinear_2d,
    resize_nearest_2d,
    sample_bilinear_2d,
)


@dataclasses.dataclass(frozen=True)
class AugmentParams:
    """Reference --AUGM_PARAMS order (train_model.py:94-95):
    (M_PROB, TX_PROB, TRANS, ROT, HFLIP, SCALE, NOISE, C_SHIFT, POOR_QUAL, GAMMA)."""

    prob: float = 1.00
    tx_prob: float = 0.25
    translate_factor: float = 0.15
    rotation_degree: float = 10.0
    axial_hflip: bool = True
    zoom_factor: float = 1.20
    gauss_noise_stddev: float = 0.10
    chan_shift_factor: float = 0.025
    sim_poor_scan: bool = True
    gamma_correct: Tuple[float, float] = (0.50, 1.50)

    @classmethod
    def from_list(cls, params: Sequence) -> "AugmentParams":
        return cls(
            prob=float(params[0]), tx_prob=float(params[1]),
            translate_factor=float(params[2]), rotation_degree=float(params[3]),
            axial_hflip=bool(params[4]), zoom_factor=float(params[5]),
            gauss_noise_stddev=float(params[6]), chan_shift_factor=float(params[7]),
            sim_poor_scan=bool(params[8]),
            gamma_correct=tuple(params[9]) if hasattr(params[9], "__len__") else (0.5, 1.5),
        )


def _warp_volume(vol: jax.Array, cy: jax.Array, cx: jax.Array, boundary: str) -> jax.Array:
    """Apply one (H,W) coordinate warp to every depth slice of (D,H,W,C)."""
    return jax.vmap(lambda sl: sample_bilinear_2d(sl, cy, cx, boundary=boundary))(vol)


def _zoom(vol: jax.Array, scale: jax.Array) -> jax.Array:
    """Bottom-right crop of a bilinear upscale to (scale, scale)
    (reference zoom_4D_tensor, augmentations.py:139-152)."""
    D, H, W, C = vol.shape
    s = scale.astype(jnp.float32)
    i = jnp.arange(H, dtype=jnp.float32)
    j = jnp.arange(W, dtype=jnp.float32)
    # output row i of the crop = row (scale - H + i) of the (scale,scale)
    # resize; half-pixel centers, edge clamp (tf.image.resize semantics).
    cy = jnp.clip(((s - H) + i + 0.5) * (H / s) - 0.5, 0.0, H - 1)
    cx = jnp.clip(((s - W) + j + 0.5) * (W / s) - 0.5, 0.0, W - 1)
    cy = cy[:, None] * jnp.ones((1, W), jnp.float32)
    cx = cx[None, :] * jnp.ones((H, 1), jnp.float32)
    return _warp_volume(vol, cy, cx, "edge")


def _rotate(vol: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """Inverse-rotation bilinear sampling about the in-plane center with
    SYMMETRIC reflection (reference rotate_4D_tensor, augmentations.py:219-236:
    symmetric pad -> tfa.image.rotate BILINEAR -> central crop)."""
    D, H, W, C = vol.shape
    theta = angle_deg * (math.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ci, cj = (H - 1) / 2.0, (W - 1) / 2.0
    ii = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W)) - ci
    jj = jnp.ones((H, 1)) * jnp.arange(W, dtype=jnp.float32)[None, :] - cj
    cy = ci + cos * ii - sin * jj
    cx = cj + sin * ii + cos * jj
    return _warp_volume(vol, cy, cx, "symmetric")


def _translate(vol: jax.Array, dy: jax.Array, dx: jax.Array) -> jax.Array:
    """Integer shift with SYMMETRIC boundary (reference translate_4D_tensor,
    augmentations.py:167-181: pad(top,left)+crop(bottom,right) == shift by
    (pad_bottom - pad_top, pad_right - pad_left))."""
    D, H, W, C = vol.shape
    iy = _reflect_index(jnp.arange(H) + dy, H)
    ix = _reflect_index(jnp.arange(W) + dx, W)
    return vol[:, iy][:, :, ix]


def _gamma_one_channel(key, x: jax.Array, gamma: jax.Array) -> jax.Array:
    """Gamma shift preserving mean/std (reference gamma_shift_3D_tensor,
    augmentations.py:298-310); per-channel coin inside."""
    apply = jax.random.uniform(key) > 0.5
    mn, sd = jnp.mean(x), jnp.std(x)
    lo, hi = jnp.min(x), jnp.max(x)
    x_ = jnp.power((x - lo) / (hi - lo + 1e-8), gamma) * (hi - lo) + lo
    x_ = x_ - jnp.mean(x_)
    x_ = x_ / (jnp.std(x_) + 1e-8) * sd + mn
    return jnp.where(apply, x_, x)


def _poor_scan_one_channel(key, x: jax.Array) -> jax.Array:
    """Bilinear downsample to int(0.75*H) square + nearest upsample
    (reference sim_poor_scan_3D_tensor, augmentations.py:264-271 — note both
    output dims use shape[1])."""
    apply = jax.random.uniform(key) > 0.5
    D, H, W = x.shape
    small = int(H * 0.75)

    def deg(sl):  # (H, W) -> (H, H) per reference quirk, then back
        lo = resize_bilinear_2d(sl[..., None], small, small)
        return resize_nearest_2d(lo, H, H)[..., 0]

    x_ = jax.vmap(deg)(x)
    if W != H:  # reference only supports square in-plane; keep shape safe
        x_ = x_[:, :, :W] if W < H else jnp.pad(x_, ((0, 0), (0, 0), (0, W - H)))
    return jnp.where(apply, x_, x)


def augment_sample(
    key: jax.Array,
    image: jax.Array,
    label: jax.Array,
    params: AugmentParams,
    train_obj: str = "lesion",
    dist_map: "jax.Array | None" = None,
):
    """Augment one (D,H,W,C) sample. Mirrors augment_tensors
    (augmentations.py:36-132) with explicit key plumbing.

    ``dist_map`` (D,H,W,K) — the precomputed signed EDT of the foreground
    label channels for the boundary loss (reference losses.py:82-96 computes
    it per step via tf.py_function; here the pipeline precomputes it and this
    function keeps it geometrically consistent with the label). Distance
    fields are 1-Lipschitz, so the same bilinear warps are well-defined on
    them; flips/rotations/translations preserve distances exactly, and the
    in-plane zoom rescales values by scale/H (exact in-plane, approximate for
    the through-plane component of the 3D EDT).
    """
    p = params
    D, H, W, C = image.shape
    n_img_ch = 3 if train_obj == "lesion" else 1
    keys = jax.random.split(key, 20)

    master = jax.random.uniform(keys[0]) > (1.0 - p.prob)

    img, lbl, dm = image, label, dist_map

    # ---- zoom (shared draw with label) ---------------------------------- :58-62
    if p.zoom_factor != 0.0:
        zoom_on = jax.random.uniform(keys[1]) > p.tx_prob
        scale = jax.random.randint(keys[2], (), H, int(math.ceil(H * p.zoom_factor)))
        img = jnp.where(zoom_on, _zoom(img, scale), img)
        lbl = jnp.where(zoom_on, _zoom(lbl, scale), lbl)
        if dm is not None:
            dm = jnp.where(
                zoom_on, _zoom(dm, scale) * (scale.astype(jnp.float32) / H), dm)

    # ---- axial horizontal flip ------------------------------------------ :64-67
    if p.axial_hflip:
        flip_on = jax.random.uniform(keys[3]) > 0.5
        img = jnp.where(flip_on, jnp.flip(img, axis=2), img)
        lbl = jnp.where(flip_on, jnp.flip(lbl, axis=2), lbl)
        if dm is not None:
            dm = jnp.where(flip_on, jnp.flip(dm, axis=2), dm)

    # ---- rotation -------------------------------------------------------- :69-73
    if p.rotation_degree != 0:
        rot_on = jax.random.uniform(keys[4]) > p.tx_prob
        angle = jax.random.uniform(
            keys[5], (), minval=-p.rotation_degree, maxval=p.rotation_degree)
        img = jnp.where(rot_on, _rotate(img, angle), img)
        lbl = jnp.where(rot_on, _rotate(lbl, angle), lbl)
        if dm is not None:
            dm = jnp.where(rot_on, _rotate(dm, angle), dm)

    # ---- translation ----------------------------------------------------- :75-83
    if p.translate_factor != 0.0:
        trans_on = jax.random.uniform(keys[6]) > p.tx_prob
        max_h = int(math.ceil(H * p.translate_factor))
        max_w = int(math.ceil(W * p.translate_factor))
        pad_top = jax.random.randint(keys[7], (), 0, max_h)
        pad_bottom = jax.random.randint(keys[8], (), 0, max_h)
        pad_right = jax.random.randint(keys[9], (), 0, max_w)
        pad_left = jax.random.randint(keys[10], (), 0, max_w)
        dy, dx = pad_bottom - pad_top, pad_right - pad_left
        img = jnp.where(trans_on, _translate(img, dy, dx), img)
        lbl = jnp.where(trans_on, _translate(lbl, dy, dx), lbl)
        if dm is not None:
            dm = jnp.where(trans_on, _translate(dm, dy, dx), dm)

    # ---- channel shift (lesion only; labels untouched) ------------------- :85-94
    if train_obj == "lesion" and p.chan_shift_factor != 0:
        cs_on = jax.random.uniform(keys[11]) > p.tx_prob
        max_h = int(math.ceil(H * p.chan_shift_factor))
        max_w = int(math.ceil(W * p.chan_shift_factor))
        cs_top = jax.random.randint(keys[12], (), 0, max_h)
        cs_bottom = jax.random.randint(keys[13], (), 0, max_h)
        cs_right = jax.random.randint(keys[14], (), 0, max_w)
        cs_left = jax.random.randint(keys[15], (), 0, max_w)
        sel = jax.random.randint(keys[16], (), 0, 3)
        shifted = _translate(img, cs_bottom - cs_top, cs_right - cs_left)
        chan_ids = jnp.arange(C)
        mask = ((chan_ids == sel) & (chan_ids < 3))[None, None, None, :]
        img = jnp.where(cs_on & mask, shifted, img)

    # ---- gamma correction ------------------------------------------------ :96-100
    if p.gamma_correct and (p.gamma_correct[0] != 0 or p.gamma_correct[1] != 0):
        gamma_on = jax.random.uniform(keys[17]) > p.tx_prob
        gamma = jax.random.uniform(
            keys[18], (), minval=p.gamma_correct[0], maxval=p.gamma_correct[1])
        gkeys = jax.random.split(keys[19], n_img_ch)
        parts = [
            _gamma_one_channel(gkeys[c], img[..., c], gamma) for c in range(n_img_ch)
        ]
        gimg = jnp.concatenate(
            [jnp.stack(parts, axis=-1), img[..., n_img_ch:]], axis=-1)
        img = jnp.where(gamma_on, gimg, img)

    # ---- simulate poor scan --------------------------------------------- :102-105
    if p.sim_poor_scan:
        ps_key = jax.random.fold_in(key, 101)
        ps_on = jax.random.uniform(jax.random.fold_in(ps_key, 0)) > p.tx_prob
        pkeys = jax.random.split(jax.random.fold_in(ps_key, 1), n_img_ch)
        parts = [
            _poor_scan_one_channel(pkeys[c], img[..., c]) for c in range(n_img_ch)
        ]
        pimg = jnp.concatenate(
            [jnp.stack(parts, axis=-1), img[..., n_img_ch:]], axis=-1)
        img = jnp.where(ps_on, pimg, img)

    # ---- additive gaussian noise ---------------------------------------- :107-111
    if p.gauss_noise_stddev != 0:
        nz_key = jax.random.fold_in(key, 202)
        nz_on = jax.random.uniform(jax.random.fold_in(nz_key, 0)) > p.tx_prob
        stddev = jax.random.uniform(
            jax.random.fold_in(nz_key, 1), (), minval=0.0, maxval=p.gauss_noise_stddev)
        noise = stddev * jax.random.normal(
            jax.random.fold_in(nz_key, 2), img[..., :n_img_ch].shape)
        nimg = jnp.concatenate(
            [img[..., :n_img_ch] + noise, img[..., n_img_ch:]], axis=-1)
        img = jnp.where(nz_on, nimg, img)

    # ---- master gate ----------------------------------------------------- :51
    out_img = jnp.where(master, img, image)
    out_lbl = jnp.where(master, lbl, label)
    if dist_map is not None:
        return out_img, out_lbl, jnp.where(master, dm, dist_map)
    return out_img, out_lbl


@partial(jax.jit, static_argnames=("params", "train_obj"))
def augment_batch(
    key: jax.Array,
    batch: Dict[str, jax.Array],
    params: AugmentParams,
    train_obj: str = "lesion",
) -> Dict[str, jax.Array]:
    """Vmapped, jitted batch augmentation: batch dict in, batch dict out."""
    n = batch["image"].shape[0]
    keys = jax.random.split(key, n)
    out = dict(batch)
    if "dist_map" in batch:
        img, lbl, dm = jax.vmap(
            lambda k, im, lb, d: augment_sample(k, im, lb, params, train_obj, d)
        )(keys, batch["image"], batch["detection"], batch["dist_map"])
        out["dist_map"] = dm
    else:
        img, lbl = jax.vmap(
            lambda k, im, lb: augment_sample(k, im, lb, params, train_obj)
        )(keys, batch["image"], batch["detection"])
    out["image"], out["detection"] = img, lbl
    return out


def make_augment_fn(params, train_obj: str = "lesion"):
    """Adapter for data.batch_iterator: (key, batch) -> batch."""
    if not isinstance(params, AugmentParams):
        params = AugmentParams.from_list(params)
    return lambda key, batch: augment_batch(key, batch, params, train_obj)
