"""Optimizers / schedules / train-step tests, incl. Lion algorithm goldens
and a full sharded train step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from automl_tpu import nn
from automl_tpu.config import Config
from automl_tpu.train import optimizers as opt_lib
from automl_tpu.train import schedules
from automl_tpu.train import train_lib


# --- Lion ----------------------------------------------------------------


def test_lion_update_rule():
  """First step from zero momentum: update = -lr * sign((1-b1) * g)."""
  params = {"w": jnp.array([1.0, -2.0, 3.0])}
  grads = {"w": jnp.array([0.5, -0.1, 0.0])}
  tx = opt_lib.lion(learning_rate=0.1, b1=0.9, b2=0.99)
  state = tx.init(params)
  updates, state = tx.update(grads, state, params)
  np.testing.assert_allclose(np.asarray(updates["w"]), [-0.1, 0.1, 0.0],
                             atol=1e-6)
  # momentum after step: (1-b2)*g
  np.testing.assert_allclose(np.asarray(state[0].momentum["w"]),
                             0.01 * np.asarray(grads["w"]), rtol=1e-5)


def test_lion_momentum_interpolation():
  params = {"w": jnp.zeros(1)}
  tx = opt_lib.scale_by_lion(b1=0.9, b2=0.99)
  state = tx.init(params)
  g1 = {"w": jnp.array([1.0])}
  _, state = tx.update(g1, state, params)
  # second step: sign((1-b1)*g2 + b1*m) with m = 0.01
  g2 = {"w": jnp.array([-0.2])}
  out, _ = tx.update(g2, state, params)
  want = np.sign(0.1 * -0.2 + 0.9 * 0.01)
  np.testing.assert_allclose(np.asarray(out["w"]), [want])


def test_lion_weight_decay_decoupled():
  params = {"w": jnp.array([2.0])}
  tx = opt_lib.lion(learning_rate=1.0, weight_decay=0.1)
  state = tx.init(params)
  updates, _ = tx.update({"w": jnp.array([0.0])}, state, params)
  # sign(0) = 0, decay adds wd*param: update = -(0 + 0.1*2.0)
  np.testing.assert_allclose(np.asarray(updates["w"]), [-0.2], atol=1e-6)


# --- schedules -------------------------------------------------------------


def test_warmup_exponential_schedule():
  fn = schedules.warmup_lr("exponential", 0.016, steps_per_epoch=100,
                           warmup_epochs=5, decay_epochs=2.4,
                           decay_factor=0.97)
  # mid-warmup: linear ramp
  np.testing.assert_allclose(float(fn(250)), 0.016 * 250 / 500, rtol=1e-6)
  # after warmup: staircase decay (floor(700 / 240) == 2)
  np.testing.assert_allclose(float(fn(700)), 0.016 * 0.97 ** 2, rtol=1e-5)


def test_detection_lr_warmup_and_cosine():
  cfg = Config(dict(learning_rate=0.08, lr_warmup_init=0.008,
                    lr_warmup_epoch=1.0, num_epochs=10,
                    lr_decay_method="cosine", poly_lr_power=0.9,
                    first_lr_drop_epoch=200.0, second_lr_drop_epoch=250.0))
  fn = schedules.detection_lr(cfg, steps_per_epoch=10)
  np.testing.assert_allclose(float(fn(0)), 0.008, rtol=1e-5)
  np.testing.assert_allclose(float(fn(10)), 0.08, rtol=1e-3)
  assert float(fn(100)) < 1e-5  # cosine end ~ 0


def test_build_optimizer_names():
  for name in ("sgd", "momentum", "rmsprop", "adam", "adamw", "lion"):
    tx = opt_lib.build_optimizer(name, 0.1)
    state = tx.init({"w": jnp.ones(3)})
    updates, _ = tx.update({"w": jnp.ones(3)}, state, {"w": jnp.ones(3)})
    assert updates["w"].shape == (3,)


def test_clip_gradients():
  g = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([0.1])}
  clipped = opt_lib.clip_gradients(g, 1.0, per_var=True)
  assert float(optax.global_norm(clipped)) <= 1.0 + 1e-5


def test_ema_update():
  ema = {"w": jnp.array([0.0])}
  params = {"w": jnp.array([1.0])}
  out = opt_lib.ema_update(ema, params, decay=0.9, step=None)
  np.testing.assert_allclose(np.asarray(out["w"]), [0.1], rtol=1e-6)
  # early-step debias: decay_t = min(0.9999, 1/10) at step 0
  out2 = opt_lib.ema_update(ema, params, decay=0.9999, step=0)
  np.testing.assert_allclose(np.asarray(out2["w"]), [0.9], rtol=1e-5)


# --- end-to-end train steps -------------------------------------------------


def _tiny_cls_setup():
  from automl_tpu.models import build_model
  from automl_tpu.configs.effnet_configs import get_model_config
  cfg = get_model_config("efficientnetv2-b0")
  cfg.model.override(dict(
      num_classes=4,
      blocks_args=["r1_k3_s1_e1_i8_o8_c1", "r1_k3_s2_e4_i8_o16_se0.25"],
      feature_size=16))
  cfg.train.override(dict(optimizer="lion", lr_base=1e-3, gclip=1.0))
  model = build_model(cfg.model)
  tx = opt_lib.masked_for_params(
      opt_lib.build_optimizer("lion", 1e-3),
      model.init(jax.random.key(0)))
  return cfg, model, tx


def test_cls_train_step_runs_and_learns():
  nn.set_policy("float32")
  try:
    cfg, model, tx = _tiny_cls_setup()
    params = model.init(jax.random.key(0))
    state = train_lib.create_train_state(params, tx)
    step_fn = jax.jit(train_lib.make_cls_train_step(model, tx, cfg))
    x = jax.random.normal(jax.random.key(1), (8, 32, 32, 3))
    y = jax.nn.one_hot(jnp.arange(8) % 4, 4)
    batch = {"image": x, "label": y}
    rng = jax.random.key(2)
    losses = []
    for _ in range(5):
      state, metrics = step_fn(state, batch, rng)
      losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert losses[-1] < losses[0], losses  # memorizes a fixed batch
    assert state.ema_params is not None
  finally:
    nn.set_policy("mixed_bfloat16")


def test_cls_train_step_sharded_on_mesh():
  nn.set_policy("float32")
  try:
    from automl_tpu.parallel import create_mesh, shard_batch, replicate
    cfg, model, tx = _tiny_cls_setup()
    mesh = create_mesh((1, 8, 1))
    params = model.init(jax.random.key(0))
    state = train_lib.create_train_state(params, tx)
    state = replicate(mesh, state)
    step_fn = jax.jit(train_lib.make_cls_train_step(model, tx, cfg))
    batch = {"image": jax.random.normal(jax.random.key(1), (16, 32, 32, 3)),
             "label": jax.nn.one_hot(jnp.arange(16) % 4, 4)}
    batch = shard_batch(mesh, batch)
    state, metrics = step_fn(state, batch, jax.random.key(2))
    assert jnp.isfinite(metrics["loss"])
  finally:
    nn.set_policy("mixed_bfloat16")


def test_det_train_step_positives_momentum():
  """positives_momentum > 0 keeps a moving normalizer in the train state
  (ref: det_model_fn.py:197-221 moving_normalizer_var)."""
  nn.set_policy("float32")
  try:
    from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
    from automl_tpu.models.efficientdet import EfficientDet
    cfg = get_efficientdet_config("efficientdet-test")
    cfg.override(dict(positives_momentum=0.9))
    model = EfficientDet(cfg)
    params = jax.jit(model.init)(jax.random.key(0))
    tx = opt_lib.masked_for_params(
        opt_lib.build_optimizer("momentum", 1e-3), params)
    state = train_lib.create_train_state(params, tx, moving_normalizer=True)
    assert float(state.normalizer) == 1.0
    step_fn = jax.jit(train_lib.make_det_train_step(model, tx, cfg))
    batch = {
        "image": jax.random.normal(jax.random.key(1), (2, 64, 64, 3)),
        "gt_boxes": jnp.array([[[4.0, 4.0, 40.0, 40.0]]] * 2),
        "gt_classes": jnp.array([[1]] * 2),
    }
    state, m = step_fn(state, batch, jax.random.key(2))
    pos_sum = float(m["num_positives"]) * 2 + 1.0
    np.testing.assert_allclose(
        float(state.normalizer), 0.9 * 1.0 + 0.1 * pos_sum, rtol=1e-5)
    prev = float(state.normalizer)
    state, m = step_fn(state, batch, jax.random.key(2))
    np.testing.assert_allclose(
        float(state.normalizer), 0.9 * prev + 0.1 * pos_sum, rtol=1e-5)
  finally:
    nn.set_policy("mixed_bfloat16")


def test_det_train_step_adversarial_loss():
  """adv_multiplier > 0 mixes an FGSM neighbor loss into the detection loss
  (working analog of the reference's unwired nsl AdversarialLoss,
  tf2/train_lib.py:328-354): det_loss grows by the adv term, the step still
  jits, and params still update."""
  nn.set_policy("float32")
  try:
    from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
    from automl_tpu.models.efficientdet import EfficientDet
    batch = {
        "image": jax.random.normal(jax.random.key(1), (2, 64, 64, 3)),
        "gt_boxes": jnp.array([[[4.0, 4.0, 40.0, 40.0]]] * 2),
        "gt_classes": jnp.array([[1]] * 2),
    }

    def one_step(adv_multiplier):
      cfg = get_efficientdet_config("efficientdet-test")
      cfg.override(dict(adv_multiplier=adv_multiplier, adv_step_size=0.05))
      model = EfficientDet(cfg)
      params = jax.jit(model.init)(jax.random.key(0))
      tx = opt_lib.masked_for_params(
          opt_lib.build_optimizer("momentum", 1e-3), params)
      state = train_lib.create_train_state(params, tx)
      step_fn = jax.jit(train_lib.make_det_train_step(model, tx, cfg))
      new_state, m = step_fn(state, batch, jax.random.key(2))
      return state, new_state, m

    _, _, m_plain = one_step(0.0)
    s0, s1, m_adv = one_step(0.5)
    # the adversarial perturbation ascends the loss: mixed det_loss exceeds
    # the clean one (same init/params/rng in both runs)
    assert float(m_adv["det_loss"]) > float(m_plain["det_loss"])
    # and roughly by the expected factor (adv loss >= clean loss)
    assert float(m_adv["det_loss"]) >= 1.4 * float(m_plain["det_loss"])
    # params still update
    leaf0 = jax.tree_util.tree_leaves(s0.params)[0]
    leaf1 = jax.tree_util.tree_leaves(s1.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
  finally:
    nn.set_policy("mixed_bfloat16")


def test_segmentation_train_step_loss_drops():
  """Segmentation training (heads=['segmentation'], sparse xent + pixel
  accuracy — the reference's tf2/segmentation.py demo): 15 steps on a
  fixed synthetic mask must cut the loss and lift pixel accuracy."""
  from automl_tpu import nn
  from automl_tpu.configs.efficientdet_configs import get_efficientdet_config
  from automl_tpu.models.efficientdet import EfficientDet
  from automl_tpu.train import optimizers as opt_lib
  from automl_tpu.train import train_lib

  nn.set_policy("float32")
  try:
    cfg = get_efficientdet_config("efficientdet-test")
    cfg.heads = ["segmentation"]
    model = EfficientDet(cfg)
    params = model.init(jax.random.key(0))
    tx = opt_lib.build_optimizer("adam", 3e-3)
    state = train_lib.create_train_state(params, tx, ema=False)
    step_fn = jax.jit(train_lib.make_seg_train_step(model, tx, cfg))

    # seg head outputs at stride 8 upsampled x2 -> canvas/4
    size = 64
    out = size // 4
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randint(0, 255, (2, size, size, 3)), jnp.float32)
    mask = np.zeros((2, out, out), np.int32)
    mask[:, :, out // 2:] = 1
    mask[:, 0, 0] = -1  # a void pixel (ignored)
    batch = {"image": image, "mask": jnp.asarray(mask)}

    losses, accs = [], []
    for _ in range(15):
      state, m = step_fn(state, batch, jax.random.key(1))
      losses.append(float(m["loss"]))
      accs.append(float(m["pixel_acc"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert accs[-1] > 0.8, accs
    assert np.isfinite(losses).all()
  finally:
    nn.set_policy("mixed_bfloat16")
