"""Training stack tests: schedules vs torch reference, optimizers, and the
sharded train step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from robseg_tpu import models
from robseg_tpu.parallel import make_data_mesh, shard_batch, replicate
from robseg_tpu.train import (AttackConfig, TrainState, make_train_step,
                              make_eval_step, make_optimizer, decay_mask,
                              get_scheduler, metrics_from_hist,
                              layerwise_lr_scales, save_params_npz,
                              load_params_npz)
from robseg_tpu.train.schedules import warmup_poly_lr


class TestSchedules:
    def test_warmup_poly_matches_torch_reference(self):
        # transcription of semseg/schedulers.py:80-139 (warmup='linear')
        base_lr, power, max_iter, warm, ratio = 0.01, 1.0, 100, 10, 1e-5
        fn = warmup_poly_lr(base_lr, power, max_iter, warm, ratio,
                            warmup="linear")
        for step in [0, 1, 5, 9, 10, 50, 99]:
            if step < warm:
                alpha = step / warm
                expect = base_lr * (ratio + (1 - ratio) * alpha)
            else:
                alpha = (step - warm) / (max_iter - warm)
                expect = base_lr * (1 - alpha) ** power
            assert np.isclose(float(fn(step)), expect, rtol=1e-6), step

    def test_scheduler_factory(self):
        for name in ["warmuppolylr", "warmupcosinelr", "polylr"]:
            fn = get_scheduler(name, 0.01, 100, 0.9, 10, 1e-5)
            v = float(fn(50))
            assert 0 <= v <= 0.011


class TestOptim:
    def test_decay_mask_rules(self):
        params = {
            "conv": {"kernel": jnp.zeros((3, 3, 4, 8)),
                     "bias": jnp.zeros((8,))},
            "norm1": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))},
        }
        mask = decay_mask(params)
        assert mask["conv"]["kernel"] is True
        assert mask["conv"]["bias"] is False
        assert mask["norm1"]["scale"] is False

    def test_adamw_matches_torch_single_step(self):
        import torch
        p0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
        g = np.array([[0.1, -0.2], [0.3, 0.4]], np.float32)
        lr, wd = 1e-2, 0.05
        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.AdamW([tp], lr=lr, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=wd)
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

        params = {"w": {"kernel": jnp.asarray(p0)}}
        tx = make_optimizer("AdamW", params, lambda s: lr, weight_decay=wd)
        st = tx.init(params)
        upd, st = tx.update({"w": {"kernel": jnp.asarray(g)}}, st, params)
        new = optax.apply_updates(params, upd)
        # torch AdamW decouples wd multiplicatively (p *= 1 - lr*wd) while
        # optax adds wd*p to the update before lr scaling — same first-order
        # step; assert close.
        np.testing.assert_allclose(np.asarray(new["w"]["kernel"]),
                                   tp.detach().numpy(), atol=1e-6)

    def test_pspnet_lr_scales_groups(self):
        """The x10 set must be exactly {ppm, cls, aux} on the REAL PSPNet
        param tree (parity: modules_new in train_rob_seg.py:185-204 and the
        5-vs-rest lr split at :356-361). A new top-level module sneaking in
        would silently train at x10 — assert the key set exhaustively."""
        from robseg_tpu.train import pspnet_lr_scales
        m = models.PSPNet(classes=5)
        x = jnp.zeros((1, 33, 33, 3))
        y = jnp.zeros((1, 33, 33), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, labels=y)["params"]
        assert set(params) == {"backbone", "ppm", "cls", "aux"}, set(params)
        scales = pspnet_lr_scales(params)
        for leaf in jax.tree.leaves(scales["backbone"]):
            assert leaf == 1.0
        for mod in ("ppm", "cls", "aux"):
            for leaf in jax.tree.leaves(scales[mod]):
                assert leaf == 10.0

    def test_freeze_mask_zeroes_backbone_updates(self):
        """TRAIN.FREEZE (freeze_some_layers(early=True) semantics,
        train_rob_seg.py:147-155): frozen leaves are BIT-unchanged after an
        optimizer step — weight decay must not leak in either."""
        from robseg_tpu.train import freeze_mask
        params = {
            "backbone": {"conv": {"kernel": jnp.ones((3, 3, 4, 8)),
                                  "bias": jnp.ones((8,))}},
            "head": {"kernel": jnp.ones((1, 1, 8, 5))},
        }
        mask = freeze_mask(params)
        assert mask["backbone"]["conv"]["kernel"] is True
        assert mask["head"]["kernel"] is False
        tx = make_optimizer("AdamW", params, lambda s: 1e-2,
                            weight_decay=0.05, frozen_mask=mask)
        st = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        upd, st = tx.update(grads, st, params)
        new = optax.apply_updates(params, upd)
        # frozen: bit-identical; live: moved
        np.testing.assert_array_equal(
            np.asarray(new["backbone"]["conv"]["kernel"]),
            np.asarray(params["backbone"]["conv"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(new["backbone"]["conv"]["bias"]),
            np.asarray(params["backbone"]["conv"]["bias"]))
        assert float(np.abs(np.asarray(new["head"]["kernel"])
                            - np.asarray(params["head"]["kernel"])).max()) > 0

        # a model without a backbone subtree rejects loudly
        with pytest.raises(ValueError, match="no 'backbone'"):
            freeze_mask({"encoder": {"kernel": jnp.ones((2, 2))}})

    def test_layerwise_scales(self):
        params = {
            "backbone": {
                "stem_cvst": {"conv0": {"kernel": jnp.zeros((3, 3, 3, 48))}},
                "stage0_block0": {"dwconv": {"kernel": jnp.zeros((7, 7, 1, 96))}},
                "stage3_block0": {"dwconv": {"kernel": jnp.zeros((7, 7, 1, 768))}},
            },
            "decode_head": {"classifier": {"kernel": jnp.zeros((1, 1, 512, 21))}},
        }
        scales = layerwise_lr_scales(params, decay_rate=0.9, num_layers=8)
        assert np.isclose(scales["backbone"]["stem_cvst"]["conv0"]["kernel"],
                          0.9 ** 7)
        assert np.isclose(
            scales["backbone"]["stage0_block0"]["dwconv"]["kernel"], 0.9 ** 6)
        assert np.isclose(
            scales["backbone"]["stage3_block0"]["dwconv"]["kernel"], 0.9 ** 3)
        assert np.isclose(
            scales["decode_head"]["classifier"]["kernel"], 0.9 ** 0)


class TestShardedTraining:
    @pytest.fixture()
    def setup(self):
        mesh = make_data_mesh(8)
        module = models.PSPNet(classes=5)
        x = jnp.zeros((1, 33, 33, 3))
        y = jnp.zeros((1, 33, 33), jnp.int32)
        variables = module.init(jax.random.PRNGKey(0), x, labels=y)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        sched = warmup_poly_lr(1e-3, 1.0, 100, 5, 1e-5)
        tx = make_optimizer("AdamW", params, sched, weight_decay=1e-4)
        state = TrainState(step=jnp.asarray(0), params=params,
                           batch_stats=batch_stats,
                           opt_state=tx.init(params),
                           rng=jax.random.PRNGKey(1))
        return mesh, module, tx, state

    def test_adversarial_train_step_runs_and_updates(self, setup):
        mesh, module, tx, state = setup
        step_fn = make_train_step(
            module, "PSPNet", tx, mesh,
            AttackConfig(enabled=True, eps=4 / 255, n_iters=2))
        imgs = np.random.default_rng(0).random((8, 33, 33, 3)
                                               ).astype(np.float32)
        lbls = np.random.default_rng(1).integers(
            0, 5, (8, 33, 33)).astype(np.int32)
        params0 = jax.device_get(state.params)  # snapshot before donation
        state_r = replicate(mesh, state)
        bi, bl = shard_batch(mesh, (imgs, lbls))
        new_state, metrics = step_fn(state_r, bi, bl)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        # params actually changed
        diff = jax.tree.map(
            lambda a, b: float(np.abs(a - b).max()),
            params0, jax.device_get(new_state.params))
        assert max(jax.tree.leaves(diff)) > 0

        # second step to ensure donation/caching works
        new_state2, _ = step_fn(new_state, bi, bl)
        assert int(new_state2.step) == 2

    def test_eval_step_global_hist(self, setup):
        mesh, module, tx, state = setup
        eval_fn = make_eval_step(module, 5, mesh)
        imgs = np.random.default_rng(2).random((8, 33, 33, 3)
                                               ).astype(np.float32)
        lbls = np.random.default_rng(3).integers(
            0, 5, (8, 33, 33)).astype(np.int32)
        bi, bl = shard_batch(mesh, (imgs, lbls))
        hist0 = replicate(mesh, jnp.zeros((5, 5), jnp.float32))
        hist = eval_fn(replicate(mesh, state.params),
                       replicate(mesh, state.batch_stats), bi, bl, hist0)
        hist = np.asarray(hist)
        assert hist.sum() == 8 * 33 * 33
        m = metrics_from_hist(jnp.asarray(hist))
        assert 0 <= m["mIoU"] <= 1


class TestCheckpointNpz:
    def test_roundtrip(self, tmp_path):
        params = {"a": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
                  "b": jnp.ones((4,))}
        p = str(tmp_path / "p.npz")
        save_params_npz(p, params)
        restored = load_params_npz(p, jax.tree.map(jnp.zeros_like, params))
        assert float(jnp.abs(restored["a"]["w"]
                             - params["a"]["w"]).max()) == 0


class TestOrbaxCheckpoint:
    def test_trainstate_roundtrip_and_resume(self, tmp_path):
        import optax
        from robseg_tpu.train import CheckpointManager
        params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
        tx = optax.adam(1e-3)
        state = TrainState(step=jnp.asarray(5), params=params,
                           batch_stats={}, opt_state=tx.init(params),
                           rng=jax.random.PRNGKey(3))
        mgr = CheckpointManager(str(tmp_path / "ckpts"))
        mgr.save(5, jax.device_get(state), metrics={"mIoU": 0.5})
        assert mgr.latest_step() == 5
        template = jax.tree.map(np.zeros_like, jax.device_get(state))
        restored = mgr.restore(template)
        assert int(restored.step) == 5
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(params["w"]))
        np.testing.assert_array_equal(np.asarray(restored.rng),
                                      np.asarray(jax.random.PRNGKey(3)))
        mgr.close()


class TestLossFnFamilies:
    def test_make_loss_fn_all_families(self):
        from robseg_tpu.train.trainer import make_loss_fn
        rngs = {"dropout": jax.random.PRNGKey(1),
                "droppath": jax.random.PRNGKey(2)}

        psp = models.PSPNet(classes=4)
        v = psp.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)),
                     labels=jnp.zeros((1, 33, 33), jnp.int32))
        loss, bs = make_loss_fn(psp, "PSPNet")(
            v["params"], v.get("batch_stats", {}),
            jnp.zeros((1, 33, 33, 3)), jnp.zeros((1, 33, 33), jnp.int32),
            rngs)
        assert jnp.isfinite(loss) and bs  # BN stats updated

        seg = models.create_segmenter("vit_small_patch16_224", n_cls=4,
                                      image_size=(32, 32))
        v = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        loss, bs = make_loss_fn(seg, "SegMenter")(
            v["params"], {}, jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 32, 32), jnp.int32), rngs)
        assert jnp.isfinite(loss) and not bs  # no BN in Segmenter


class TestTrainAttackDispatch:
    """TRAIN.ATTACK config dispatch (VERDICT Missing #4): 'apgd' runs the
    working training-time APGD the reference intended (its own branch dies
    on a ``gpuu=`` TypeError, ``train_rob_seg.py:303-315``); unknown names
    are rejected at build time."""

    def _setup(self):
        mesh = make_data_mesh(8)
        module = models.PSPNet(classes=5)
        x = jnp.zeros((1, 33, 33, 3))
        y = jnp.zeros((1, 33, 33), jnp.int32)
        variables = module.init(jax.random.PRNGKey(0), x, labels=y)
        params = variables["params"]
        tx = make_optimizer("AdamW", params,
                            warmup_poly_lr(1e-3, 1.0, 100, 5, 1e-5),
                            weight_decay=1e-4)
        state = TrainState(step=jnp.asarray(0), params=params,
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(params),
                           rng=jax.random.PRNGKey(1))
        return mesh, module, tx, state

    def test_apgd_attack_step_runs(self):
        mesh, module, tx, state = self._setup()
        step_fn = make_train_step(
            module, "PSPNet", tx, mesh,
            AttackConfig(enabled=True, name="apgd", eps=4 / 255, n_iters=2))
        imgs = np.random.default_rng(0).random((8, 33, 33, 3)
                                               ).astype(np.float32)
        lbls = np.random.default_rng(1).integers(
            0, 5, (8, 33, 33)).astype(np.int32)
        params0 = jax.device_get(state.params)
        state_r = replicate(mesh, state)
        bi, bl = shard_batch(mesh, (imgs, lbls))
        new_state, metrics = step_fn(state_r, bi, bl)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        diff = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                            params0, jax.device_get(new_state.params))
        assert max(jax.tree.leaves(diff)) > 0

    def test_unknown_attack_rejected(self):
        mesh, module, tx, _ = self._setup()
        with pytest.raises(ValueError, match="TRAIN.ATTACK"):
            make_train_step(module, "PSPNet", tx, mesh,
                            AttackConfig(enabled=True, name="cospgd"))
