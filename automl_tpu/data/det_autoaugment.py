"""Box-aware AutoAugment for detection — policies v0/v1 as device ops.

Policy tables and level->magnitude mappings reproduce
efficientdet/aug/autoaugment.py:37-95, 1431-1580 (data). Geometry is one
mechanism: every image op is an inverse-map affine warp, and the matching box
transform maps the 4 corners through the FORWARD affine (inverse of the
inverse map) and rebounds — so image and boxes cannot drift apart.

Simplification vs the reference: *_Only_BBoxes ops apply the transform under
a union-of-boxes mask (the reference loops boxes on host with per-box
probability 0.3). Everything here jits; shapes stay static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from automl_tpu.data import augment

_MAX_LEVEL = 10.0

POLICY_V0 = [
    [("TranslateX_BBox", 0.6, 4), ("Equalize", 0.8, 10)],
    [("TranslateY_Only_BBoxes", 0.2, 2), ("Cutout", 0.8, 8)],
    [("Sharpness", 0.0, 8), ("ShearX_BBox", 0.4, 0)],
    [("ShearY_BBox", 1.0, 2), ("TranslateY_Only_BBoxes", 0.6, 6)],
    [("Rotate_BBox", 0.6, 10), ("Color", 1.0, 6)],
]

# Subset of v1 (ref: aug/autoaugment.py:52-95) restricted to the ops this
# device implementation supports; *_Only_BBoxes color ops approximate the
# per-box host loop with a union-of-boxes mask.
POLICY_V1 = [
    [("TranslateX_BBox", 0.6, 4), ("Equalize", 0.8, 10)],
    [("TranslateY_Only_BBoxes", 0.2, 2), ("Cutout", 0.8, 8)],
    [("Sharpness", 0.0, 8), ("ShearX_BBox", 0.4, 0)],
    [("ShearY_BBox", 1.0, 2), ("TranslateY_Only_BBoxes", 0.6, 6)],
    [("Rotate_BBox", 0.6, 10), ("Color", 1.0, 6)],
    [("Equalize", 0.6, 10), ("TranslateX_BBox", 0.2, 2)],
    [("Color", 1.0, 10), ("TranslateY_Only_BBoxes", 0.4, 6)],
    [("Rotate_BBox", 0.8, 10), ("Contrast", 0.0, 10)],
    [("Cutout", 0.2, 2), ("Brightness", 0.8, 10)],
    [("Color", 1.0, 6), ("Equalize", 1.0, 2)],
    [("Color", 0.2, 8), ("Rotate_BBox", 0.8, 10)],
    [("Sharpness", 0.4, 4), ("TranslateY_Only_BBoxes", 0.0, 4)],
    [("Sharpness", 1.0, 4), ("SolarizeAdd", 0.4, 4)],
    [("Rotate_BBox", 1.0, 8), ("Sharpness", 0.2, 8)],
]


def _transform_boxes_forward(boxes, classes, minv, out_hw):
  """Map (ymin,xmin,ymax,xmax) through the forward affine (= inv(minv))."""
  fwd = jnp.linalg.inv(minv.astype(jnp.float32))
  y0, x0, y1, x1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
  ones = jnp.ones_like(y0)
  corners = jnp.stack([
      jnp.stack([y0, x0, ones], -1), jnp.stack([y0, x1, ones], -1),
      jnp.stack([y1, x0, ones], -1), jnp.stack([y1, x1, ones], -1),
  ], axis=1)  # [G, 4, 3]
  moved = jnp.einsum("ij,gcj->gci", fwd, corners)
  ny0 = jnp.clip(jnp.min(moved[..., 0], axis=1), 0, out_hw[0])
  nx0 = jnp.clip(jnp.min(moved[..., 1], axis=1), 0, out_hw[1])
  ny1 = jnp.clip(jnp.max(moved[..., 0], axis=1), 0, out_hw[0])
  nx1 = jnp.clip(jnp.max(moved[..., 1], axis=1), 0, out_hw[1])
  new_boxes = jnp.stack([ny0, nx0, ny1, nx1], axis=1)
  valid = (classes > 0) & (ny1 - ny0 > 1e-3) & (nx1 - nx0 > 1e-3)
  new_boxes = jnp.where(valid[:, None], new_boxes, 0.0)
  new_classes = jnp.where(valid, classes, -1)
  return new_boxes, new_classes


def _affine_with_boxes(image, boxes, classes, minv):
  img = augment.affine_warp(image, minv, 128.0)
  nb, nc = _transform_boxes_forward(boxes, classes, minv,
                                    (image.shape[0], image.shape[1]))
  return img, nb, nc


def _boxes_mask(image, boxes, classes):
  h, w, _ = image.shape
  yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
  xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
  valid = (classes > 0)[:, None, None]
  inside = ((yy[None] >= boxes[:, 0, None, None])
            & (yy[None] < boxes[:, 2, None, None])
            & (xx[None] >= boxes[:, 1, None, None])
            & (xx[None] < boxes[:, 3, None, None]) & valid)
  return jnp.any(inside, axis=0)[..., None]


def _rand_sign(rng, v):
  return jnp.where(jax.random.bernoulli(rng), v, -v)


def _apply_op(name: str, level: float, image, boxes, classes, rng):
  h, w, _ = image.shape
  eye = jnp.eye(3, dtype=jnp.float32)
  if name == "TranslateX_BBox":
    pix = _rand_sign(rng, level / _MAX_LEVEL * 250.0)
    return _affine_with_boxes(image, boxes, classes, eye.at[1, 2].set(pix))
  if name == "TranslateY_BBox":
    pix = _rand_sign(rng, level / _MAX_LEVEL * 250.0)
    return _affine_with_boxes(image, boxes, classes, eye.at[0, 2].set(pix))
  if name == "ShearX_BBox":
    s = _rand_sign(rng, level / _MAX_LEVEL * 0.3)
    return _affine_with_boxes(image, boxes, classes, eye.at[1, 0].set(s))
  if name == "ShearY_BBox":
    s = _rand_sign(rng, level / _MAX_LEVEL * 0.3)
    return _affine_with_boxes(image, boxes, classes, eye.at[0, 1].set(s))
  if name == "Rotate_BBox":
    deg = _rand_sign(rng, level / _MAX_LEVEL * 30.0)
    minv = augment._rotate_matrix(jnp.deg2rad(deg), h, w)
    return _affine_with_boxes(image, boxes, classes, minv)
  if name == "TranslateY_Only_BBoxes":
    pix = _rand_sign(rng, level / _MAX_LEVEL * 120.0)
    shifted = augment.affine_warp(image, eye.at[0, 2].set(pix), 128.0)
    mask = _boxes_mask(image, boxes, classes)
    return jnp.where(mask, shifted, image), boxes, classes
  if name == "Equalize":
    return augment.equalize(image), boxes, classes
  if name == "AutoContrast":
    return augment.autocontrast(image), boxes, classes
  if name == "Solarize":
    return augment.solarize(image, 256.0 - level / _MAX_LEVEL * 256.0), boxes, classes
  if name == "Posterize":
    bits = jnp.maximum(jnp.round(level / _MAX_LEVEL * 4.0), 1).astype(jnp.int32)
    return augment.posterize(image, bits), boxes, classes
  if name == "Cutout":
    pad = int(level / _MAX_LEVEL * 100.0)
    return augment.cutout(image, rng, pad), boxes, classes
  if name == "BBox_Cutout":
    # cutout restricted to the union of gt boxes (ref bbox_cutout semantics)
    pad = int(level / _MAX_LEVEL * 50.0)
    cut = augment.cutout(image, rng, pad)
    mask = _boxes_mask(image, boxes, classes)
    return jnp.where(mask, cut, image), boxes, classes
  if name == "SolarizeAdd":
    return augment.solarize_add(image, level / _MAX_LEVEL * 110.0), boxes, classes
  factor = level / _MAX_LEVEL * 1.8 + 0.1
  if name == "Color":
    return augment.color(image, factor), boxes, classes
  if name == "Sharpness":
    return augment.sharpness(image, factor), boxes, classes
  if name == "Contrast":
    return augment.contrast(image, factor), boxes, classes
  if name == "Brightness":
    return augment.brightness(image, factor), boxes, classes
  raise ValueError(f"Unknown det-autoaugment op {name!r}")


# v2/v3 (ref: aug/autoaugment.py:96-148).
POLICY_V2 = [
    [("Color", 0.0, 6), ("Cutout", 0.6, 8), ("Sharpness", 0.4, 8)],
    [("Rotate_BBox", 0.4, 8), ("Sharpness", 0.4, 2), ("Rotate_BBox", 0.8, 10)],
    [("TranslateY_BBox", 1.0, 8), ("AutoContrast", 0.8, 2)],
    [("AutoContrast", 0.4, 6), ("ShearX_BBox", 0.8, 8), ("Brightness", 0.0, 10)],
    [("SolarizeAdd", 0.2, 6), ("Contrast", 0.0, 10), ("AutoContrast", 0.6, 0)],
    [("Cutout", 0.2, 0), ("Solarize", 0.8, 8), ("Color", 1.0, 4)],
    [("TranslateY_BBox", 0.0, 4), ("Equalize", 0.6, 8), ("Solarize", 0.0, 10)],
    [("TranslateY_BBox", 0.2, 2), ("ShearY_BBox", 0.8, 8), ("Rotate_BBox", 0.8, 8)],
    [("Cutout", 0.8, 8), ("Brightness", 0.8, 8), ("Cutout", 0.2, 2)],
    [("Color", 0.8, 4), ("TranslateY_BBox", 1.0, 6), ("Rotate_BBox", 0.6, 6)],
    [("Rotate_BBox", 0.6, 10), ("BBox_Cutout", 1.0, 4), ("Cutout", 0.2, 8)],
    [("Rotate_BBox", 0.0, 0), ("Equalize", 0.6, 6), ("ShearY_BBox", 0.6, 8)],
    [("Brightness", 0.8, 8), ("AutoContrast", 0.4, 2), ("Brightness", 0.2, 2)],
    [("TranslateY_BBox", 0.4, 8), ("Solarize", 0.4, 6), ("SolarizeAdd", 0.2, 10)],
    [("Contrast", 1.0, 10), ("SolarizeAdd", 0.2, 8), ("Equalize", 0.2, 4)],
]

POLICY_V3 = [
    [("Posterize", 0.8, 2), ("TranslateX_BBox", 1.0, 8)],
    [("BBox_Cutout", 0.2, 10), ("Sharpness", 1.0, 8)],
    [("Rotate_BBox", 0.6, 8), ("Rotate_BBox", 0.8, 10)],
    [("Equalize", 0.8, 10), ("AutoContrast", 0.2, 10)],
    [("SolarizeAdd", 0.2, 2), ("TranslateY_BBox", 0.2, 8)],
    [("Sharpness", 0.0, 2), ("Color", 0.4, 8)],
    [("Equalize", 1.0, 8), ("TranslateY_BBox", 1.0, 8)],
    [("Posterize", 0.6, 2), ("Rotate_BBox", 0.0, 10)],
    [("AutoContrast", 0.6, 0), ("Rotate_BBox", 1.0, 6)],
    [("Equalize", 0.0, 4), ("Cutout", 0.8, 10)],
    [("Brightness", 1.0, 2), ("TranslateY_BBox", 1.0, 6)],
    [("Contrast", 0.0, 2), ("ShearY_BBox", 0.8, 0)],
    [("AutoContrast", 0.8, 10), ("Contrast", 0.2, 10)],
    [("Rotate_BBox", 1.0, 10), ("Cutout", 1.0, 10)],
    [("SolarizeAdd", 0.8, 6), ("Equalize", 0.8, 8)],
]


def distort_image_with_autoaugment(image, boxes, classes, rng,
                                   policy_name: str = "v0"):
  """Apply one randomly-chosen sub-policy (image [H,W,C] in [0,255] float,
  boxes absolute, padded classes <= 0). Returns (image, boxes, classes)."""
  policy = {"v0": POLICY_V0, "v1": POLICY_V1, "v2": POLICY_V2,
            "v3": POLICY_V3}[policy_name]
  image = image.astype(jnp.float32)
  k_sel, rng = jax.random.split(rng)
  idx = jax.random.randint(k_sel, (), 0, len(policy))

  def make_branch(sub_policy):
    def branch(args):
      image, boxes, classes, rng = args
      for name, prob, level in sub_policy:
        rng, k_p, k_op = jax.random.split(rng, 3)
        new_img, new_boxes, new_classes = _apply_op(
            name, float(level), image, boxes, classes, k_op)
        do = jax.random.bernoulli(k_p, prob)
        image = jnp.where(do, new_img, image)
        boxes = jnp.where(do, new_boxes, boxes)
        classes = jnp.where(do, new_classes, classes)
      return image, boxes, classes
    return branch

  branches = [make_branch(sp) for sp in policy]
  return jax.lax.switch(idx, branches, (image, boxes, classes, rng))
