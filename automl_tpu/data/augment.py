"""Device-side augmentation: RandAugment / AutoAugment color+geometry ops,
mixup/cutmix, gridmask — all pure jnp on batched uint8/float images.

The reference runs these on host CPU inside tf.data (efficientnetv2/
autoaugment.py, efficientdet/aug/*). Here every op is a jit-able function of
([B,H,W,C] image batch, rng) so augmentation fuses into the device input
pipeline and never stalls infeed — a north-star requirement.

Op-semantics parity refs (values in [0, 255], level->arg mappings):
  RandAugment/AutoAugment ops   efficientnetv2/autoaugment.py:33-260
  level -> magnitude mapping     efficientnetv2/autoaugment.py:262-340
  mixup / cutmix                efficientnetv2/datasets.py:191-301
  gridmask                      efficientdet/aug/gridmask.py:22-136
Geometric ops use one affine-warp primitive (inverse-map + bilinear/nearest
gather) — the same matrix math transforms detection boxes jointly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Affine warp primitive.
# ---------------------------------------------------------------------------


def affine_warp(image, matrix, fill_value=128.0, method: str = "nearest",
                out_hw=None):
  """Warp [H,W,C] image by the INVERSE-map 3x3 affine `matrix`.

  Output pixel (y, x) samples input at matrix @ (y, x, 1). Out-of-bounds
  pixels take fill_value (the reference's gray 128 replace). `out_hw` sets
  the output size (defaults to the input size).
  """
  h, w, _ = image.shape
  oh, ow = out_hw if out_hw is not None else (h, w)
  yy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
  xx = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
  ones = jnp.ones_like(xx)
  coords = jnp.stack([yy, xx, ones], axis=-1)          # [H, W, 3]
  src = jnp.einsum("ij,hwj->hwi", matrix.astype(jnp.float32), coords)
  sy, sx = src[..., 0], src[..., 1]
  if method == "nearest":
    iy = jnp.round(sy).astype(jnp.int32)
    ix = jnp.round(sx).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    out = image[iy, ix]
  else:  # bilinear
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    img = image.astype(jnp.float32)
    out = ((1 - wy) * (1 - wx) * img[y0i, x0i]
           + (1 - wy) * wx * img[y0i, x1i]
           + wy * (1 - wx) * img[y1i, x0i]
           + wy * wx * img[y1i, x1i])
    valid = (sy >= -1) & (sy <= h) & (sx >= -1) & (sx <= w)
  fill = jnp.full_like(out, fill_value, dtype=out.dtype)
  return jnp.where(valid[..., None], out, fill).astype(image.dtype)


def _translate_matrix(dy, dx):
  return jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32) \
      .at[0, 2].set(dy).at[1, 2].set(dx)


def _rotate_matrix(radians, h, w):
  """Inverse map for rotation about the image center."""
  cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
  cos, sin = jnp.cos(radians), jnp.sin(radians)
  # inverse rotation
  m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
  m = m.at[0, 0].set(cos).at[0, 1].set(sin)
  m = m.at[1, 0].set(-sin).at[1, 1].set(cos)
  offset_y = cy - (cos * cy + sin * cx)
  offset_x = cx - (-sin * cy + cos * cx)
  return m.at[0, 2].set(offset_y).at[1, 2].set(offset_x)


# ---------------------------------------------------------------------------
# Color ops ([H,W,C] float in [0, 255]).
# ---------------------------------------------------------------------------


def _blend(a, b, factor):
  return jnp.clip(b + factor * (a - b), 0.0, 255.0)


def _grayscale(image):
  rgb = jnp.array([0.299, 0.587, 0.114], image.dtype)
  return jnp.sum(image * rgb, axis=-1, keepdims=True) * jnp.ones_like(image)


def autocontrast(image):
  lo = jnp.min(image, axis=(0, 1), keepdims=True)
  hi = jnp.max(image, axis=(0, 1), keepdims=True)
  scale = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
  off = jnp.where(hi > lo, -lo * scale, 0.0)
  return jnp.clip(image * scale + off, 0.0, 255.0)


def equalize(image):
  """Per-channel histogram equalization (uint8 semantics)."""
  def eq_channel(ch):
    ch_i = jnp.clip(ch, 0, 255).astype(jnp.int32)
    histo = jnp.zeros((256,), jnp.int32).at[ch_i.reshape(-1)].add(1)
    nonzero = histo > 0
    # TF semantics: step = (total - last nonzero bin count) // 255
    last_nz_count = histo[jnp.max(jnp.where(nonzero, jnp.arange(256), 0))]
    step = (jnp.sum(histo) - last_nz_count) // 255
    lut = (jnp.cumsum(histo) + (step // 2)) // jnp.maximum(step, 1)
    lut = jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]])
    lut = jnp.clip(lut, 0, 255)
    return jnp.where(step == 0, ch_i, lut[ch_i]).astype(jnp.float32)
  return jnp.stack([eq_channel(image[..., c]) for c in range(image.shape[-1])],
                   axis=-1)


def invert(image):
  return 255.0 - image


def posterize(image, bits):
  shift = (8 - bits).astype(jnp.int32) if hasattr(bits, "astype") else int(8 - bits)
  x = jnp.clip(image, 0, 255).astype(jnp.int32)
  x = jnp.right_shift(x, shift)
  x = jnp.left_shift(x, shift)
  return x.astype(jnp.float32)


def solarize(image, threshold=128.0):
  return jnp.where(image < threshold, image, 255.0 - image)


def solarize_add(image, addition=0.0, threshold=128.0):
  added = jnp.clip(image + addition, 0.0, 255.0)
  return jnp.where(image < threshold, added, image)


def color(image, factor):
  return _blend(image, _grayscale(image), factor)


def contrast(image, factor):
  mean = jnp.mean(_grayscale(image))
  return _blend(image, jnp.full_like(image, mean), factor)


def brightness(image, factor):
  return _blend(image, jnp.zeros_like(image), factor)


def sharpness(image, factor):
  """Blend with a 3x3 smoothing-kernel blur (ref kernel [[1,1,1],[1,5,1],[1,1,1]]/13)."""
  kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
  c = image.shape[-1]
  k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
  img = image.astype(jnp.float32)[None]
  blurred = jax.lax.conv_general_dilated(
      img, k, (1, 1), "VALID", feature_group_count=c,
      dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
  blurred = jnp.pad(blurred, ((1, 1), (1, 1), (0, 0)), mode="edge")
  # only interior pixels take the blurred value (TF 'orig where pad' behavior)
  h, w, _ = image.shape
  yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
  xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
  interior = ((yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1))[..., None]
  degenerate = jnp.where(interior, blurred, image)
  return _blend(image, degenerate, factor)


def cutout(image, rng, pad_size, replace=128.0):
  """Zero (replace) a random 2*pad_size square (ref: autoaugment.py cutout)."""
  h, w, _ = image.shape
  ky, kx = jax.random.split(rng)
  cy = jax.random.randint(ky, (), 0, h)
  cx = jax.random.randint(kx, (), 0, w)
  yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
  xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
  mask = ((jnp.abs(yy - cy) <= pad_size)
          & (jnp.abs(xx - cx) <= pad_size))[..., None]
  # replace may be a scalar or a full-shape array (the ft path uses random
  # replacement values, ref: preprocessing.py:102-106)
  fill = jnp.broadcast_to(jnp.asarray(replace, image.dtype), image.shape)
  return jnp.where(mask, fill, image)


# Geometric wrappers (image-only).


def rotate(image, degrees, replace=128.0):
  return affine_warp(image, _rotate_matrix(jnp.deg2rad(degrees),
                                           image.shape[0], image.shape[1]),
                     replace)


def translate_x(image, pixels, replace=128.0):
  return affine_warp(image, _translate_matrix(0.0, pixels), replace)


def translate_y(image, pixels, replace=128.0):
  return affine_warp(image, _translate_matrix(pixels, 0.0), replace)


def _shear_x_matrix(level):
  # output (y, x) samples input at (y, x + level * y)  [x-shear]
  return jnp.eye(3, dtype=jnp.float32).at[1, 0].set(level)


def _shear_y_matrix(level):
  return jnp.eye(3, dtype=jnp.float32).at[0, 1].set(level)


def shear_x_op(image, level, replace=128.0):
  return affine_warp(image, _shear_x_matrix(level), replace)


def shear_y_op(image, level, replace=128.0):
  return affine_warp(image, _shear_y_matrix(level), replace)


# ---------------------------------------------------------------------------
# RandAugment.
# ---------------------------------------------------------------------------

_MAX_LEVEL = 10.0


def _mag(level, maxval):
  return level / _MAX_LEVEL * maxval


def _rand_sign(rng, v):
  return jnp.where(jax.random.bernoulli(rng), v, -v)


def randaugment(image, rng, num_layers: int = 2, magnitude: float = 15.0):
  """RandAugment on one [H,W,C] image in [0,255] float.

  Ops and level mappings per efficientnetv2/autoaugment.py (RandAugment
  available_ops). Returns float image in [0,255].
  """
  level = jnp.asarray(magnitude, jnp.float32)

  def op_autocontrast(img, r): return autocontrast(img)
  def op_equalize(img, r): return equalize(img)
  def op_invert(img, r): return invert(img)
  def op_rotate(img, r): return rotate(img, _rand_sign(r, _mag(level, 30.0)))
  def op_posterize(img, r): return posterize(
      img, jnp.round(_mag(level, 4.0)).astype(jnp.int32))
  def op_solarize(img, r): return solarize(img, _mag(level, 256.0))
  def op_solarize_add(img, r): return solarize_add(img, _mag(level, 110.0))
  def op_color(img, r): return color(img, 1.0 + _rand_sign(r, _mag(level, 0.9)))
  def op_contrast(img, r): return contrast(img, 1.0 + _rand_sign(r, _mag(level, 0.9)))
  def op_brightness(img, r): return brightness(
      img, 1.0 + _rand_sign(r, _mag(level, 0.9)))
  def op_sharpness(img, r): return sharpness(
      img, 1.0 + _rand_sign(r, _mag(level, 0.9)))
  def op_shear_x(img, r): return shear_x_op(
      img, _rand_sign(r, _mag(level, 0.3)))
  def op_shear_y(img, r): return shear_y_op(
      img, _rand_sign(r, _mag(level, 0.3)))
  def op_translate_x(img, r): return translate_x(
      img, _rand_sign(r, _mag(level, 100.0)))
  def op_translate_y(img, r): return translate_y(
      img, _rand_sign(r, _mag(level, 100.0)))
  def op_cutout(img, r): return cutout(
      img, r, jnp.round(_mag(level, 40.0)).astype(jnp.int32))

  ops = [op_autocontrast, op_equalize, op_invert, op_rotate, op_posterize,
         op_solarize, op_solarize_add, op_color, op_contrast, op_brightness,
         op_sharpness, op_shear_x, op_shear_y, op_translate_x, op_translate_y,
         op_cutout]

  img = image.astype(jnp.float32)
  for layer in range(num_layers):
    rng, kop, kr = jax.random.split(rng, 3)
    op_idx = jax.random.randint(kop, (), 0, len(ops))
    img = jax.lax.switch(op_idx, [lambda im, f=f, kr=kr: f(im, kr)
                                  for f in ops], img)
  return jnp.clip(img, 0.0, 255.0)


def batched_randaugment(images, rng, num_layers: int = 2,
                        magnitude: float = 15.0):
  """[B,H,W,C] in [0,255] -> augmented, per-image independent randomness."""
  keys = jax.random.split(rng, images.shape[0])
  return jax.vmap(lambda im, k: randaugment(im, k, num_layers, magnitude))(
      images.astype(jnp.float32), keys)


# ---------------------------------------------------------------------------
# Mixup / Cutmix (batch-level, label-mixing).
# ---------------------------------------------------------------------------


def mixup(images, labels, rng, alpha: float):
  """Mix each image with the batch reversed (ref: datasets.py:191-230)."""
  lam = jax.random.beta(rng, alpha, alpha, (images.shape[0],))
  lam_img = lam.reshape(-1, 1, 1, 1).astype(images.dtype)
  mixed = lam_img * images + (1 - lam_img) * images[::-1]
  lam_lab = lam.reshape(-1, 1).astype(labels.dtype)
  mixed_labels = lam_lab * labels + (1 - lam_lab) * labels[::-1]
  return mixed, mixed_labels


def cutmix(images, labels, rng, alpha: float):
  """Paste a random box from the reversed batch (ref: datasets.py:232-301)."""
  b, h, w, _ = images.shape
  k1, k2, k3 = jax.random.split(rng, 3)
  lam = jax.random.beta(k1, alpha, alpha, (b,))
  cut = jnp.sqrt(1.0 - lam)
  cut_h = (cut * h).astype(jnp.int32)
  cut_w = (cut * w).astype(jnp.int32)
  cy = jax.random.randint(k2, (b,), 0, h)
  cx = jax.random.randint(k3, (b,), 0, w)
  yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
  xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
  y0 = jnp.clip(cy - cut_h // 2, 0, h)[:, None, None]
  y1 = jnp.clip(cy + cut_h // 2, 0, h)[:, None, None]
  x0 = jnp.clip(cx - cut_w // 2, 0, w)[:, None, None]
  x1 = jnp.clip(cx + cut_w // 2, 0, w)[:, None, None]
  mask = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[..., None]
  mixed = jnp.where(mask, images[::-1], images)
  area = ((y1 - y0) * (x1 - x0)).reshape(-1).astype(jnp.float32) / (h * w)
  lam_eff = (1.0 - area).reshape(-1, 1).astype(labels.dtype)
  mixed_labels = lam_eff * labels + (1 - lam_eff) * labels[::-1]
  return mixed, mixed_labels


def mixing(images, labels, rng, mixup_alpha: float = 0.0,
           cutmix_alpha: float = 0.0):
  """Apply mixup and/or cutmix; both -> half the batch each
  (ref: datasets.py:268-301)."""
  if not mixup_alpha and not cutmix_alpha:
    return images, labels
  k1, k2 = jax.random.split(rng)
  if mixup_alpha and cutmix_alpha:
    b = images.shape[0]
    half = b // 2
    im1, lb1 = mixup(images[:half], labels[:half], k1, mixup_alpha)
    im2, lb2 = cutmix(images[half:], labels[half:], k2, cutmix_alpha)
    return (jnp.concatenate([im1, im2], 0), jnp.concatenate([lb1, lb2], 0))
  if mixup_alpha:
    return mixup(images, labels, k1, mixup_alpha)
  return cutmix(images, labels, k2, cutmix_alpha)


# ---------------------------------------------------------------------------
# Mosaic (detection): 4 images -> 1, boxes co-transformed.
# ---------------------------------------------------------------------------


def mosaic(images, boxes, classes, rng, center_range=(0.25, 0.75)):
  """Fuse 4 images into one mosaic with a random center split.

  images: [4, H, W, C]; boxes: [4, G, 4] absolute; classes: [4, G].
  Returns (image [H, W, C], boxes [4*G, 4], classes [4*G]).
  (Capability parity: efficientdet/aug/mosaic.py:23-136; implemented as four
  traced affine warps + quadrant masks so it jits with static shapes.)
  """
  _, h, w, c = images.shape
  k1, k2 = jax.random.split(rng)
  cy = (center_range[0] + jax.random.uniform(k1, ())
        * (center_range[1] - center_range[0])) * h
  cx = (center_range[0] + jax.random.uniform(k2, ())
        * (center_range[1] - center_range[0])) * w

  yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
  xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
  quads = [  # (y0, x0, y1, x1) of each quadrant as traced scalars
      (0.0, 0.0, cy, cx), (0.0, cx, cy, jnp.float32(w)),
      (cy, 0.0, jnp.float32(h), cx), (cy, cx, jnp.float32(h), jnp.float32(w)),
  ]
  out = jnp.zeros((h, w, c), jnp.float32)
  out_boxes, out_classes = [], []
  for i, (y0, x0, y1, x1) in enumerate(quads):
    qh = jnp.maximum(y1 - y0, 1.0)
    qw = jnp.maximum(x1 - x0, 1.0)
    sy, sx = h / qh, w / qw   # inverse scale: quadrant -> full image
    m = jnp.eye(3, dtype=jnp.float32)
    m = m.at[0, 0].set(sy).at[1, 1].set(sx)
    m = m.at[0, 2].set(-y0 * sy).at[1, 2].set(-x0 * sx)
    warped = affine_warp(images[i].astype(jnp.float32), m, 0.0, "bilinear")
    mask = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[..., None]
    out = jnp.where(mask, warped, out)
    b = boxes[i]
    nb = jnp.stack([b[:, 0] / sy + y0, b[:, 1] / sx + x0,
                    b[:, 2] / sy + y0, b[:, 3] / sx + x0], axis=1)
    nb = jnp.stack([jnp.clip(nb[:, 0], y0, y1), jnp.clip(nb[:, 1], x0, x1),
                    jnp.clip(nb[:, 2], y0, y1), jnp.clip(nb[:, 3], x0, x1)],
                   axis=1)
    valid = ((nb[:, 2] - nb[:, 0] > 1) & (nb[:, 3] - nb[:, 1] > 1)
             & (classes[i] > 0))
    out_boxes.append(jnp.where(valid[:, None], nb, 0.0))
    out_classes.append(jnp.where(valid, classes[i], -1))
  return out, jnp.concatenate(out_boxes), jnp.concatenate(out_classes)


# ---------------------------------------------------------------------------
# GridMask (detection).
# ---------------------------------------------------------------------------


def gridmask(image, rng, ratio: float = 0.6, gridmask_size_ratio: float = 0.5,
             fill=1.0):
  """Grid of masked squares (ref: aug/gridmask.py:22-136)."""
  h, w, _ = image.shape
  k1, k2, k3 = jax.random.split(rng, 3)
  max_side = max(h, w)
  mask_h = int(max_side * (1 + gridmask_size_ratio) * 1.5)
  d = jax.random.randint(k1, (), max(1, max_side // 8), max(2, max_side // 2))
  keep = (d.astype(jnp.float32) * ratio).astype(jnp.int32)
  sy = jax.random.randint(k2, (), 0, jnp.maximum(d, 1))
  sx = jax.random.randint(k3, (), 0, jnp.maximum(d, 1))
  yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
  xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
  masked = (((yy + sy) % jnp.maximum(d, 1)) < keep) & (
      ((xx + sx) % jnp.maximum(d, 1)) < keep)
  return jnp.where(masked[..., None], jnp.asarray(fill, image.dtype), image)
