"""Preprocessing: host does JPEG decode + fixed resize; EVERYTHING random
happens on device (crop/flip/jitter as traced affine warps), so the infeed
payload is a fixed-shape uint8 tensor and augmentation rides the MXU/VPU.

Semantics parity refs:
  classification train crop  efficientnetv2/preprocessing.py:22-55
    (distorted-bbox crop area 8-100%, aspect 3/4-4/3, then resize)
  eval center crop           efficientnetv2/preprocessing.py:58-70
    (crop fraction size/(size+32))
  detection input processor  efficientdet/dataloader.py:59-211
    (normalize, hflip with boxes, scale jitter [min,max], resize+crop,
     box clip + pad_to_fixed_size)

Difference by design: the reference crops the ORIGINAL decoded image on host;
we crop a host-resized fixed canvas on device. At canvas >= 1.15x target the
resampling difference is negligible and the host stays shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from automl_tpu.data import augment

MEAN_RGB = (0.485 * 255, 0.456 * 255, 0.406 * 255)
STDDEV_RGB = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def normalize_image(image, mean=MEAN_RGB, stddev=STDDEV_RGB):
  mean = jnp.asarray(mean, jnp.float32)
  stddev = jnp.asarray(stddev, jnp.float32)
  return (image.astype(jnp.float32) - mean) / stddev


def normalize_cls(image, norm: str = "v2"):
  """Classification normalization families (efficientnetv2/preprocessing.py):
  'v2' = (x - 128) / 128 (preprocess_image:150);
  'ft' = (x/255 - 0.5) / 0.5 (preprocess_for_finetune:82-84);
  'legacy' = per-channel ImageNet MEAN/STDDEV_RGB (preprocess_legacy,
  the effnetv1_ dispatcher at preprocessing.py:110-154)."""
  x = image.astype(jnp.float32)
  if norm == "v2":
    return (x - 128.0) / 128.0
  if norm == "ft":
    return (x / 255.0 - 0.5) / 0.5
  if norm == "legacy":
    return normalize_image(x)
  raise ValueError(f"Unknown cls norm {norm!r}")


def norm_for_augname(augname: str | None) -> tuple[str, str | None]:
  """(norm, effective augname): 'effnetv1_*' -> legacy norm; 'ft*' -> ft."""
  if augname and augname.startswith("effnetv1_"):
    return "legacy", augname[len("effnetv1_"):]
  if augname and augname.startswith("ft"):
    return "ft", augname
  return "v2", augname


# ---------------------------------------------------------------------------
# Classification.
# ---------------------------------------------------------------------------


def random_resized_crop(image, rng, out_size: int,
                        area_range=(0.08, 1.0), aspect_range=(3 / 4, 4 / 3)):
  """Inception-style random crop as a single affine warp to [out, out]."""
  h, w, _ = image.shape
  k1, k2, k3, k4 = jax.random.split(rng, 4)
  area = jax.random.uniform(k1, (), minval=area_range[0], maxval=area_range[1])
  log_ratio = jax.random.uniform(
      k2, (), minval=jnp.log(aspect_range[0]), maxval=jnp.log(aspect_range[1]))
  ratio = jnp.exp(log_ratio)
  crop_h = jnp.sqrt(area * h * w / ratio)
  crop_w = crop_h * ratio
  crop_h = jnp.minimum(crop_h, h)
  crop_w = jnp.minimum(crop_w, w)
  y0 = jax.random.uniform(k3, ()) * (h - crop_h)
  x0 = jax.random.uniform(k4, ()) * (w - crop_w)
  # inverse map: out pixel (y, x) -> in (y0 + y * crop_h/out, x0 + x * crop_w/out)
  m = jnp.eye(3, dtype=jnp.float32)
  m = m.at[0, 0].set(crop_h / out_size).at[1, 1].set(crop_w / out_size)
  m = m.at[0, 2].set(y0).at[1, 2].set(x0)
  return _warp_to(image, m, out_size)


def _warp_to(image, matrix, out_size: int):
  """Bilinear inverse-map affine warp to a square output (edge clamped)."""
  out = augment.affine_warp(image.astype(jnp.float32), matrix, 0.0,
                            method="bilinear", out_hw=(out_size, out_size))
  return out.astype(jnp.float32)


def random_hflip(image, rng):
  w = image.shape[1]
  return jnp.where(jax.random.bernoulli(rng), image[:, ::-1], image)


def cls_train_preprocess(images, rng, out_size: int, augname: str = "randaug",
                         ra_num_layers: int = 2, ra_magnitude: float = 15.0):
  """[B,H,W,C] uint8 canvas -> [B,out,out,C] f32 normalized, augmented.

  Dispatches on augname like the reference (preprocessing.py:110-154):
  'effnetv1_*' uses legacy MEAN/STDDEV normalization, 'ft*' the finetune
  path (no crop, cutout), otherwise v2 (x-128)/128.
  """
  norm, aug = norm_for_augname(augname)
  if norm == "ft":
    return cls_finetune_preprocess(images, rng, out_size, augname=aug,
                                   ra_num_layers=ra_num_layers,
                                   ra_magnitude=ra_magnitude, train=True)
  b = images.shape[0]
  keys = jax.random.split(rng, b * 3)
  kcrop, kflip, kaug = keys[:b], keys[b:2 * b], keys[2 * b:]

  def one(img, kc, kf):
    img = random_resized_crop(img, kc, out_size)
    img = random_hflip(img, kf)
    return img

  imgs = jax.vmap(one)(images, kcrop, kflip)
  if aug and ("randaug" in aug or "autoaug" in aug):
    imgs = jax.vmap(lambda im, k: augment.randaugment(
        im, k, ra_num_layers, ra_magnitude))(imgs, kaug)
  return normalize_cls(imgs, norm)


def cls_finetune_preprocess(images, rng, out_size: int, augname: str = "ft",
                            ra_num_layers: int = 2, ra_magnitude: float = 15.0,
                            train: bool = True):
  """Finetune path (ref: preprocessing.py:73-107): full-image resize (no
  distorted crop), flip, optional rand/autoaug, then cutout with RANDOM
  replacement values, all at (x/255 - .5)/.5 normalization."""
  b, h, w, c = images.shape
  imgs = jax.image.resize(images.astype(jnp.float32),
                          (b, out_size, out_size, c), method="bilinear")
  if not train:
    return normalize_cls(imgs, "ft")
  keys = jax.random.split(rng, b * 3)
  kflip, kaug, kcut = keys[:b], keys[b:2 * b], keys[2 * b:]
  imgs = jax.vmap(random_hflip)(imgs, kflip)
  if "randaug" in augname or "autoaug" in augname:
    imgs = jax.vmap(lambda im, k: augment.randaugment(
        im, k, ra_num_layers, ra_magnitude))(imgs, kaug)
  imgs = normalize_cls(imgs, "ft")
  if augname == "ft" or "cutout" in augname:
    def cut(img, k):
      k1, k2 = jax.random.split(k)
      replace = jax.random.uniform(k1, img.shape, img.dtype, -1.0, 1.0)
      return augment.cutout(img, k2, pad_size=out_size // 4, replace=replace)
    imgs = jax.vmap(cut)(imgs, kcut)
  return imgs


def cls_eval_preprocess(images, out_size: int, crop_pad: int = 32,
                        norm: str = "v2", precropped: bool = False):
  """Center crop fraction out/(out+pad) then resize (ref: preprocessing.py:58-70).

  precropped=True (or images already exactly out_size x out_size): the host
  loader has done the reference-exact eval geometry (crop from the ORIGINAL
  + bilinear resize — pipeline.ImageNetTFRecordLoader eval branch); only
  normalization remains. The device crop-from-canvas path is the fallback
  for callers feeding raw canvases (benchmarks, ad-hoc images)."""
  b, h, w, c = images.shape
  if precropped or (h, w) == (out_size, out_size):
    return normalize_cls(images.astype(jnp.float32), norm)
  frac = out_size / (out_size + crop_pad)
  crop_h, crop_w = int(h * frac), int(w * frac)
  y0, x0 = (h - crop_h) // 2, (w - crop_w) // 2
  crop = images[:, y0:y0 + crop_h, x0:x0 + crop_w]
  out = jax.image.resize(crop.astype(jnp.float32),
                         (b, out_size, out_size, c), method="bilinear",
                         antialias=False)
  return normalize_cls(out, norm)


# ---------------------------------------------------------------------------
# Detection.
# ---------------------------------------------------------------------------


def det_train_preprocess(image, boxes, classes, rng, out_size: int,
                         true_hw=None, jitter_min: float = 0.1,
                         jitter_max: float = 2.0, rand_hflip: bool = True,
                         mean=MEAN_RGB, stddev=STDDEV_RGB):
  """One image + padded gt -> flip + scale-jitter + crop, boxes co-transformed,
  all as ONE affine warp on device.

  image: [H,W,C] canvas; the real content occupies [0:true_h, 0:true_w]
    (aspect-preserved host resize, padded bottom/right). true_hw: [2] f32
    content dims (defaults to the full canvas). boxes: [G,4] absolute
    (ymin,xmin,ymax,xmax) in canvas coords; padding rows have class <= 0.
  Returns (image [out,out,C] f32 normalized, boxes [G,4], classes [G]).
  """
  ch, cw, _ = image.shape
  if true_hw is None:
    true_hw = jnp.array([ch, cw], jnp.float32)
  h = true_hw[0].astype(jnp.float32)
  w = true_hw[1].astype(jnp.float32)
  k1, k2, k3 = jax.random.split(rng, 3)

  do_flip = jax.random.bernoulli(k1) & rand_hflip
  # jitter scale relative to the reference scale out/max(h, w)
  jitter = jitter_min + jax.random.uniform(k2, ()) * (jitter_max - jitter_min)
  scale = jitter * out_size / jnp.maximum(h, w)
  max_off_y = jnp.maximum(h * scale - out_size, 0.0)
  max_off_x = jnp.maximum(w * scale - out_size, 0.0)
  off = jax.random.uniform(k3, (2,))
  off_y, off_x = off[0] * max_off_y, off[1] * max_off_x

  # inverse map out (y, x) -> content (iy, ix); optional x-flip about w
  inv_s = 1.0 / scale
  iy_off = off_y * inv_s
  m_noflip = (jnp.eye(3, dtype=jnp.float32)
              .at[0, 0].set(inv_s).at[1, 1].set(inv_s)
              .at[0, 2].set(iy_off).at[1, 2].set(off_x * inv_s))
  m_flip = (jnp.eye(3, dtype=jnp.float32)
            .at[0, 0].set(inv_s).at[1, 1].set(-inv_s)
            .at[0, 2].set(iy_off).at[1, 2].set(w - off_x * inv_s))
  m = jnp.where(do_flip, m_flip, m_noflip)
  out = _warp_to(image, m, out_size)
  # zero pixels sampled from outside the true content
  yy = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 0)
  xx = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 1)
  src_y = yy * inv_s + iy_off
  src_x = jnp.where(do_flip, w - (xx * inv_s + off_x * inv_s),
                    xx * inv_s + off_x * inv_s)
  inside = ((src_y >= 0) & (src_y < h) & (src_x >= 0) & (src_x < w))[..., None]
  out = jnp.where(inside, out, 0.0)

  # forward-transform boxes
  x_min, x_max = boxes[:, 1], boxes[:, 3]
  fx_min = jnp.where(do_flip, w - x_max, x_min)
  fx_max = jnp.where(do_flip, w - x_min, x_max)
  new_boxes = jnp.stack([boxes[:, 0] * scale - off_y,
                         fx_min * scale - off_x,
                         boxes[:, 2] * scale - off_y,
                         fx_max * scale - off_x], axis=1)
  new_boxes = jnp.clip(new_boxes, 0.0, out_size)
  valid = ((new_boxes[:, 2] - new_boxes[:, 0] > 1e-3)
           & (new_boxes[:, 3] - new_boxes[:, 1] > 1e-3)
           & (classes > 0))
  classes = jnp.where(valid, classes, -1)
  new_boxes = jnp.where(valid[:, None], new_boxes, 0.0)
  return normalize_image(out, mean, stddev), new_boxes, classes


def det_eval_preprocess(image, out_size: int, mean=MEAN_RGB, stddev=STDDEV_RGB):
  """Scale-preserving resize to out_size (returns image + scale to undo).

  Matches the reference inference path bit-for-bit-ish
  (dataloader.py:115-142): normalize FIRST (so the pad region is zero in
  normalized space), then TF2-convention half-pixel bilinear resize without
  antialias (jax.image.resize antialias=False == tf.image.resize BILINEAR),
  then pad bottom/right to the square canvas. Published-checkpoint mAP
  parity depends on this exact recipe."""
  import numpy as np
  h, w, _ = image.shape
  # TF computes the scale and scaled sizes in float32 and truncates
  # (dataloader.py:115-127: int32 cast) — e.g. h=636 -> 636*(256/636) =
  # 255.99998f -> 255, NOT 256. Replicate exactly or every sample position
  # shifts sub-pixel and logits drift.
  scale32 = np.float32(min(np.float32(out_size) / np.float32(h),
                           np.float32(out_size) / np.float32(w)))
  sh = int(np.float32(h) * scale32)
  sw = int(np.float32(w) * scale32)
  scale = float(scale32)
  normalized = normalize_image(image.astype(jnp.float32), mean, stddev)
  scaled = jax.image.resize(normalized, (sh, sw, image.shape[-1]),
                            method="bilinear", antialias=False)
  out = jnp.zeros((out_size, out_size, image.shape[-1]), jnp.float32)
  out = jax.lax.dynamic_update_slice(out, scaled, (0, 0, 0))
  return out, 1.0 / scale
