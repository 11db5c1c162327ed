"""Integration tests: two-stage training end-to-end on synthetic data,
data-parallel consistency, checkpoint roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from lns_tpu.data.synthetic import synthetic_config
from lns_tpu.parallel.mesh import data_mesh
from lns_tpu.train import Stage1Trainer, Stage2Trainer
from lns_tpu.train.checkpoint import load_pytree, save_pytree


@pytest.fixture(scope="module")
def ns2d_cfg(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ns2d"))
    return synthetic_config("ns2d", tmp, epochs=1)


def test_stage1_trains_and_checkpoints(ns2d_cfg):
    t = Stage1Trainer(ns2d_cfg, use_wandb=False)
    t.train()
    ckpt = os.path.join(ns2d_cfg.log_dir, "checkpoints", "vqgan_epoch_final.msgpack")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(ns2d_cfg.log_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(ns2d_cfg.log_dir, "samples", "sample_final.png"))
    # checkpoint roundtrip
    restored = load_pytree(t.params, ckpt)
    for a, b in zip(jax.tree.leaves(t.params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage2_trains_from_stage1_ckpt(ns2d_cfg, tmp_path):
    ckpt = os.path.join(ns2d_cfg.log_dir, "checkpoints", "vqgan_epoch_final.msgpack")
    if not os.path.exists(ckpt):  # independent of test ordering
        t1 = Stage1Trainer(ns2d_cfg, use_wandb=False)
        t1.save("final")
    cfg2 = ns2d_cfg.replace(
        log_dir=str(tmp_path / "log_s2"),
        pretrained_checkpoint_path=os.path.join(
            ns2d_cfg.log_dir, "checkpoints", "vqgan_epoch_final.msgpack"
        ),
        learning_rate=5e-4,
        epochs=1,
    )
    t = Stage2Trainer(cfg2, use_wandb=False)
    loss0 = t.validate("pre")
    t.train()
    assert os.path.exists(os.path.join(cfg2.log_dir, "checkpoints", "model_final.msgpack"))
    # frozen AE params unchanged by training
    ae0 = load_pytree(t.params, os.path.join(cfg2.log_dir, "checkpoints", "model_0.msgpack"))
    for a, b in zip(jax.tree.leaves(ae0["vq_ae"]), jax.tree.leaves(t.params["vq_ae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage1_dp_mesh_matches_single_device(tmp_path):
    """One DP train step on an 8-device mesh must match the single-device
    step bit-for-bit-ish (same params, same batch)."""
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1)
    cfg_a = cfg.replace(log_dir=str(tmp_path / "a"))
    cfg_b = cfg.replace(log_dir=str(tmp_path / "b"))
    t_single = Stage1Trainer(cfg_a, seed=7, use_wandb=False)
    mesh = data_mesh(jax.devices()[:8])
    t_dp = Stage1Trainer(cfg_b, seed=7, mesh=mesh, use_wandb=False)

    x = t_single.train_ds.get_batch(np.arange(8))
    # identical init (same seed) -> loss and gradients must agree; the psum
    # reduction order only perturbs at float rounding level
    g1 = jax.grad(t_single._loss)(t_single.params, jnp.asarray(x))
    g2 = jax.grad(t_dp._loss)(t_dp.params, t_dp._put(x))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
    p1, o1, l1 = t_single._train_step(t_single.params, t_single.opt_state, jnp.asarray(x))
    p2, o2, l2 = t_dp._train_step(t_dp.params, t_dp.opt_state, t_dp._put(x))
    assert abs(float(l1) - float(l2)) < 1e-5


def test_stage2_noise_injection_path(tmp_path):
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1, noise_level=0.1)
    t1 = Stage1Trainer(cfg.replace(log_dir=str(tmp_path / "s1")), use_wandb=False)
    t1.save("final")
    cfg2 = cfg.replace(
        log_dir=str(tmp_path / "log_s2"),
        pretrained_checkpoint_path=os.path.join(tmp_path, "s1", "checkpoints",
                                                "vqgan_epoch_final.msgpack"),
    )
    t2 = Stage2Trainer(cfg2, use_wandb=False)
    z_in, z_out = t2.train_ds.get_batch(np.arange(4))
    k = jax.random.PRNGKey(0)
    p, o, loss = t2._train_step(t2.prop_params, t2.opt_state, jnp.asarray(z_in),
                                jnp.asarray(z_out), None, k)
    assert np.isfinite(float(loss))


def test_rollout_loss_gradients_flow_through_time(tmp_path):
    """BPTT: gradient w.r.t. propagator params must reflect multi-step
    feedback (loss at step 2 depends on step-1 output)."""
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1)
    from lns_tpu.models import LatentDynamics

    model = LatentDynamics(cfg)
    v = model.init(jax.random.PRNGKey(0), (2, 32, 32, 1))
    params = v["params"]
    z_in = jnp.ones((2, 1, 8, 8, cfg.latent_dim))
    z_out = jnp.zeros((2, 2, 8, 8, cfg.latent_dim))

    g = jax.grad(
        lambda pp: model.rollout_loss({"vq_ae": params["vq_ae"], "propagator": pp},
                                      z_in, z_out)
    )(params["propagator"])
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert total > 0


def test_chunked_decode_matches_batched(tmp_path):
    """predict(decode_chunk=k) must equal the one-pass batched decode for
    both dividing and non-dividing chunk sizes (padding path)."""
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1)
    from lns_tpu.models import LatentDynamics

    model = LatentDynamics(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x.shape)["params"]
    y = np.asarray(model.predict({"params": params}, x, 4, to_x=True))
    for chunk in (4, 5, 12, 64):  # 3*4=12 frames: divides, pads, exact, >n
        yc = np.asarray(model.predict({"params": params}, x, 4, to_x=True,
                                      decode_chunk=chunk))
        np.testing.assert_allclose(yc, y, rtol=0, atol=1e-5)


def test_bf16_rollout_close_to_f32(tmp_path):
    """The bf16 benchmark path must track the f32 rollout (short horizon,
    random-init weights — loose bound, just guards against blowups)."""
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1)
    from lns_tpu.models import LatentDynamics

    m32 = LatentDynamics(cfg)
    m16 = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    params = m32.init(jax.random.PRNGKey(0), x.shape)["params"]
    y32 = np.asarray(m32.predict({"params": params}, x, 5, to_x=True), np.float32)
    y16 = np.asarray(m16.predict({"params": params}, x, 5, to_x=True), np.float32)
    rel = np.linalg.norm(y16 - y32) / (np.linalg.norm(y32) + 1e-8)
    assert rel < 0.15, rel


def test_remat_rollout_matches_standard(tmp_path):
    """jax.checkpoint rematerialization must not change loss or gradients."""
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1)
    from lns_tpu.models import LatentDynamics

    model = LatentDynamics(cfg)
    params = model.init(jax.random.PRNGKey(0), (2, 32, 32, 1))["params"]
    z_in = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 8, cfg.latent_dim))
    z_out = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, 8, cfg.latent_dim))

    def loss(pp, remat):
        return model.rollout_loss({"vq_ae": params["vq_ae"], "propagator": pp},
                                  z_in, z_out, remat=remat)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params["propagator"])
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params["propagator"])
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_twophase_stage1_dp_mesh_denorm_loss(tmp_path):
    """Two-phase stage-1 trains under a DP mesh with the denormalized loss
    (Dirichlet-wall masking inside the sharded jitted step)."""
    cfg = synthetic_config("twophase", str(tmp_path), epochs=1, batch_size=8)
    mesh = data_mesh(jax.devices()[:4])
    t = Stage1Trainer(cfg, mesh=mesh, use_wandb=False)
    x = t.train_ds.get_batch(np.arange(8))
    p, o, loss = t._train_step(t.params, t.opt_state, t._put(x))
    assert np.isfinite(float(loss))


def test_mixed_precision_training_both_stages(tmp_path):
    """mixed_precision: true trains with bf16 activations while params and
    losses stay f32 and finite (a TPU-native option the reference lacks)."""
    import jax.numpy as jnp

    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1).replace(
        mixed_precision=True, log_dir=str(tmp_path / "log_s1"))
    t1 = Stage1Trainer(cfg, use_wandb=False)
    assert t1.model.dtype == jnp.bfloat16
    t1.train()
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(t1.params))

    cfg2 = cfg.replace(
        log_dir=str(tmp_path / "log_s2"),
        pretrained_checkpoint_path=os.path.join(
            cfg.log_dir, "checkpoints", "vqgan_epoch_final.msgpack"),
        learning_rate=5e-4,
        epochs=1,
    )
    t2 = Stage2Trainer(cfg2, use_wandb=False)
    loss = t2.validate("pre")
    assert np.isfinite(loss)
    t2.train()
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(t2.prop_params))
    assert all(np.all(np.isfinite(np.asarray(p)))
               for p in jax.tree.leaves(t2.prop_params))


def test_bf16_rollout_accepts_f32_latents_and_cond(tmp_path):
    """Regression: the scan carry must be cast to the propagator compute
    dtype — f32 latents entering a bf16 mixed-precision rollout (and the
    conditional FiLM path) previously tripped the scan carry-type check."""
    cfg = synthetic_config("twophase_conditional", str(tmp_path), epochs=1)
    from lns_tpu.models import LatentDynamics

    m = LatentDynamics(cfg, dtype=jnp.bfloat16, ae_dtype=jnp.bfloat16)
    shape = (2, cfg.resolutions[0], cfg.resolutions[1], cfg.in_channels)
    p = m.init(jax.random.PRNGKey(0), shape)["params"]
    z_in = jnp.ones((2, 1, 7, 15, cfg.latent_dim), jnp.float32)
    z_out = jnp.ones((2, 3, 7, 15, cfg.latent_dim), jnp.float32)
    cond = jnp.ones((2,), jnp.float32)
    loss = m.rollout_loss(
        {"vq_ae": p["vq_ae"], "propagator": p["propagator"]}, z_in, z_out, cond)
    assert np.isfinite(float(loss))
    y = m.predict({"params": p}, jnp.ones(shape), 3, cond=cond, to_x=True)
    assert y.shape[1] == 3 and np.all(np.isfinite(np.asarray(y, np.float32)))


@pytest.mark.slow  # four trainer builds (~60 s compile on forced CPU)
def test_device_data_matches_host_batching(tmp_path):
    """`device_data: true` stages the corpus in device memory and gathers
    batches on-device by index; the training trajectory must match the
    host-batched path (same deterministic (seed, epoch, step) order)."""
    for sub in ("a", "b", "a2", "b2"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    cfg_a = synthetic_config("ns2d", str(tmp_path / "a"), epochs=2,
                             ckpt_every=99)
    cfg_b = synthetic_config("ns2d", str(tmp_path / "b"), epochs=2,
                             ckpt_every=99, device_data=True)
    t1a = Stage1Trainer(cfg_a, use_wandb=False)
    t1b = Stage1Trainer(cfg_b, use_wandb=False)
    assert not t1a.device_data and t1b.device_data
    t1a.train()
    t1b.train()
    for pa, pb in zip(jax.tree.leaves(t1a.params), jax.tree.leaves(t1b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=2e-5)

    # stage 2, conditional variant (covers the cond gather)
    ck = os.path.join(cfg_a.log_dir, "checkpoints", "vqgan_epoch_final.msgpack")
    c2a = synthetic_config("twophase_conditional", str(tmp_path / "a2"),
                           epochs=2, ckpt_every=99,
                           pretrained_checkpoint_path=None)
    c2b = synthetic_config("twophase_conditional", str(tmp_path / "b2"),
                           epochs=2, ckpt_every=99,
                           pretrained_checkpoint_path=None, device_data=True)
    t2a = Stage2Trainer(c2a, use_wandb=False)
    t2b = Stage2Trainer(c2b, use_wandb=False)
    assert not t2a.device_data and t2b.device_data
    t2a.train()
    t2b.train()
    for pa, pb in zip(jax.tree.leaves(t2a.prop_params),
                      jax.tree.leaves(t2b.prop_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_stage2_device_data_mesh_sharded_gather(tmp_path):
    """device_data composes with the DP mesh (VERDICT r4 item 5): the latent
    corpus is sharded across devices on its sample axis and each device
    gathers its batch slice from its own shard. One sharded-gather step must
    equal a direct DP step on the equivalent global batch, and the full
    epoch loop must run end-to-end."""
    from lns_tpu.parallel.mesh import batch_sharding

    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1, ckpt_every=99,
                           device_data=True, batch_size=4)
    mesh = data_mesh(jax.devices()[:4])
    t = Stage2Trainer(cfg, mesh=mesh, use_wandb=False)
    assert t.device_data and t._train_step_dev is not None

    n = len(t.train_ds)
    n_use = n - n % 4
    shard_len = n_use // 4
    zi, zo = t.train_ds.get_batch(np.arange(n_use))
    sh = batch_sharding(mesh)
    zi_d = jax.device_put(zi, sh)
    zo_d = jax.device_put(zo, sh)
    # [n_dev, b_per_dev] LOCAL indices; equivalent global rows offset by
    # each device's contiguous shard start
    idx = np.array([[1], [0], [2], [1 % shard_len]]) % shard_len
    rows = idx[:, 0] + shard_len * np.arange(4)

    key = jax.random.PRNGKey(0)
    pp = jax.tree.map(jnp.array, t.prop_params)
    st = jax.tree.map(jnp.array, t.opt_state)
    _, _, loss_g = t._train_step_dev(pp, st, zi_d, zo_d, None,
                                     jnp.asarray(idx), key)
    pp = jax.tree.map(jnp.array, t.prop_params)
    st = jax.tree.map(jnp.array, t.opt_state)
    _, _, loss_d = t._train_step(pp, st, jnp.asarray(zi[rows]),
                                 jnp.asarray(zo[rows]), None, key)
    np.testing.assert_allclose(np.asarray(loss_g), np.asarray(loss_d),
                               rtol=1e-5)

    t.train()  # full epoch loop: shard staging + stratified shuffle + best
    assert os.path.exists(os.path.join(cfg.log_dir, "checkpoints",
                                       "model_best.msgpack"))
    assert np.isfinite(t.best_val)


@pytest.mark.slow
def test_stage1_device_data_mesh_runs_and_saves_best(tmp_path):
    """Stage-1 device_data on a DP mesh: sharded corpus staging + per-shard
    gather trains end-to-end; best-val checkpoint is written."""
    cfg = synthetic_config("ns2d", str(tmp_path), epochs=1, ckpt_every=1,
                           device_data=True, batch_size=4)
    mesh = data_mesh(jax.devices()[:4])
    t = Stage1Trainer(cfg, mesh=mesh, use_wandb=False)
    assert t.device_data
    t.train()
    ckpt = os.path.join(cfg.log_dir, "checkpoints")
    assert os.path.exists(os.path.join(ckpt, "vqgan_epoch_best.msgpack"))
    import json as _json
    meta = _json.load(open(os.path.join(ckpt, "meta_epoch_best.json")))
    assert meta["val_recon_loss"] == t.best_val and np.isfinite(t.best_val)
